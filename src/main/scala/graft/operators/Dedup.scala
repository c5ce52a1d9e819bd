package graft.operators

import graft.Tables
import graft.functions.VectorFunctions.cosine_similarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators over the `documents` / `embeddings` tables —
  * the training-data-pipeline surface (exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup).
  *
  * Scale design: every operator is expressed as shuffle-bounded
  * relational algebra — no driver-side loops, no O(n²) cross joins
  * without a blocking key. The LSH variants are the 100 TB path (cost
  * ∝ candidates, not pairs); the exact-Jaccard verify step only runs
  * over LSH candidates.
  */
object Dedup {

  type Q = (SparkSession, String) => DataFrame

  private def tokens(c: Column): Column = split(lower(c), "\\s+")

  /** Exact dedup by content hash (reference O12 generalized globally:
    * HashMap.entry.or_insert at `release.rs:185-187` deduped only
    * within a 10k batch; a groupBy on the hash is exact across the
    * dataset and scales as one shuffle on a uniformly distributed key).
    */
  def d01_dedup_exact: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("content_hash"))

  /** 3-word shingles of a token array (document order; native
    * expression — the HOF transform/slice chain interprets its lambda
    * per element and is 20×+ slower). */
  private def shingles(toks: Column): Column =
    graft.functions.TextHashFunctions.word_shingles(toks, 3)

  /** MinHash + LSH banding near-dup pipeline:
    *   3-word shingles → 64-slot minhash signature (one-pass native
    *   expression, map-only) → 16 bands × 4 rows → bucket self-join →
    *   candidate pairs → exact-Jaccard verify ≥ 0.5 (native expression,
    *   once per candidate).
    * The only shuffles are the band bucket join and the candidate
    * verify joins; candidate volume is governed by the band collision
    * probability (r=4, b=16 → s-curve threshold ≈0.5), not n² — this is
    * the scale path for document dedup.
    * No oracle: the minhash permutations are engine-specific.
    */
  def d02_minhash_lsh: Q = (s, d) => {
    import graft.functions.TextHashFunctions.{minhash_bands, array_jaccard}
    // repartition BEFORE the per-row signature stage: a small-file
    // table arrives as one partition, which would serialize the whole
    // (CPU-heavy) shingle+minhash map work onto a single core — at
    // cluster scale this is the "parallelize the signature scan" knob
    val docs = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), shingles(tokens(col("text"))).as("sh"))
      .persist() // referenced 3× (banding + both verify joins)
    val banded = docs
      .select(col("doc_id"),
        explode(array_distinct(minhash_bands(col("sh"), 16, 4))).as("bh"))
    val a = banded.select(col("bh"), col("doc_id").as("id_a"))
    val b = banded.select(col("bh"), col("doc_id").as("id_b"))
    val candidates = a.join(b, Seq("bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    candidates
      .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", round(array_jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash near-dup: 64-bit fingerprint per doc via the one-pass
    * native expression (map-only — no token shuffle), then candidate
    * pairs that share one of the 4 16-bit chunks (pigeonhole:
    * hamming ≤ 3 ⇒ ≥1 identical chunk), verified by bit_count(xor) ≤ 3
    * and deduped AFTER the cheap hamming filter so the distinct only
    * sees surviving pairs.
    * No oracle: fingerprint depends on the hash function.
    */
  def d03_simhash: Q = (s, d) => {
    import graft.functions.TextHashFunctions.simhash64
    val docs = Tables.documents(s, d)
    val sigs = docs.select(col("doc_id"),
      simhash64(tokens(col("text"))).as("simhash"))
    val chunks = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(j =>
        shiftrightunsigned(col("simhash"), j * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk_idx", "chunk")))
    val a = chunks.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("id_a"), col("simhash").as("fp_a"))
    val b = chunks.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("id_b"), col("simhash").as("fp_b"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Token-set Jaccard similarity, blocked on (source, lang) — the
    * standard blocking-key trick, never an unblocked n² at scale; a
    * finer key trades recall for a quadratic-factor cost cut. Exact
    * integer intersection/union counts via an inverted-index join, so
    * the DuckDB oracle matches bit-for-bit (single double division).
    */
  def d04_ngram_jaccard: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val tok = docs
      .select(col("doc_id"), col("source"), col("lang"),
        explode(tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct()
    val ta = tok.select(col("source"), col("lang"), col("doc_id").as("id_a"), col("tok"))
    val tb = tok.select(col("source"), col("lang"), col("doc_id").as("id_b"), col("tok"))
    val inter = ta.join(tb, Seq("source", "lang", "tok"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
    val sizes = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_tok", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_tok", "n_b"), Seq("id_b"))
      .withColumn("jaccard", round(col("n_inter").cast(DoubleType) /
        (col("n_a") + col("n_b") - col("n_inter")), 4))
      .filter(col("jaccard") >= 0.8)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Embedding-cosine near-duplicate candidates: for every vector, its
    * single most-similar neighbor within the same `label` block
    * (blocked brute force; the unblocked scale path is the LSH variant
    * in [[Similarity.s02_ann_lsh]]). Cosine runs in the custom
    * codegen'd [[graft.functions.CosineSimilarity]] expression.
    */
  def d05_embedding_neardup: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d)
    val a = e.select(col("label"), col("vec_id"), col("embedding").as("emb_a"))
    val b = e.select(col("label"), col("vec_id").as("nn_id"), col("embedding").as("emb_b"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nn_id"))
    a.join(b, Seq("label"))
      .filter(col("vec_id") =!= col("nn_id"))
      .withColumn("cos", round(cosine_similarity(col("emb_a"), col("emb_b")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("nn_id"), col("cos"))
      .orderBy(col("vec_id"))
  }

  /** Corpus-level (group-vs-group) similarity via the custom
    * [[graft.functions.MinHashUnionAgg]] typed aggregator: one map-side
    * pass computes a union MinHash signature per source, then the tiny
    * source×source matrix estimates Jaccard from slot agreement — no
    * document pairs ever materialize. The 100 TB shape for "which data
    * sources overlap?". Rows-only (sketch-based).
    */
  def d06_source_similarity: Q = (s, d) => {
    import graft.functions.TextHashFunctions.minhash_signature
    import graft.functions.MinHashUnionAgg.{minhash_union, estimated_jaccard}
    val sigs = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("source"),
        minhash_signature(shingles(tokens(col("text"))), 64).as("sig"))
      .groupBy(col("source"))
      .agg(minhash_union(col("sig"), 64).as("usig"))
      .persist() // both sides of the source×source matrix
    val a = sigs.select(col("source").as("src_a"), col("usig").as("sig_a"))
    val b = sigs.select(col("source").as("src_b"), col("usig").as("sig_b"))
    a.join(b, col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        round(estimated_jaccard(col("sig_a"), col("sig_b")), 4).as("est_jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val queries: Map[String, Q] = Map(
    "d01_dedup_exact" -> d01_dedup_exact,
    "d06_source_similarity" -> d06_source_similarity,
    "d02_minhash_lsh" -> d02_minhash_lsh,
    "d03_simhash" -> d03_simhash,
    "d04_ngram_jaccard" -> d04_ngram_jaccard,
    "d05_embedding_neardup" -> d05_embedding_neardup,
  )

  val oracles: Map[String, String] = Map(
    "d01_dedup_exact" ->
      """SELECT md5(text) AS content_hash, COUNT(*) AS n_copies,
        |  MIN(doc_id) AS keep_id
        |FROM documents GROUP BY md5(text) ORDER BY content_hash""".stripMargin,
    "d04_ngram_jaccard" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, source, lang,
        |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        |  FROM documents
        |), tok2 AS (SELECT * FROM tok WHERE length(tok) > 0),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        |  FROM tok2 a JOIN tok2 b
        |    ON a.source = b.source AND a.lang = b.lang AND a.tok = b.tok
        |    AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |), sizes AS (
        |  SELECT doc_id, COUNT(*) AS n_tok FROM tok2 GROUP BY doc_id)
        |SELECT id_a, id_b,
        |  round(CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter), 4)
        |    AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter), 4)
        |  >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "d05_embedding_neardup" ->
      """SELECT vec_id, nn_id, cos FROM (
        |  SELECT a.vec_id, b.vec_id AS nn_id,
        |    round(list_cosine_similarity(
        |      CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4)
        |      AS cos,
        |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(list_cosine_similarity(
        |        CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4)
        |        DESC, b.vec_id) AS rk
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id) t
        |WHERE rk = 1 ORDER BY vec_id""".stripMargin,
  )
}
