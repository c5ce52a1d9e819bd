package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators over the `documents` table: language-ID
  * (stopword-hit heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), and canonical fingerprinting.
  *
  * All are single-pass, per-row codegen'd expressions (regexp/string
  * builtins) followed by at most one low-cardinality aggregate — they
  * scan 100 TB at IO speed with no shuffle beyond the final agg.
  * Every formula is mirrored exactly in the DuckDB oracle (integer
  * counts + single double division, so hashes match bit-for-bit).
  */
object TextAnalysis {

  type Q = (SparkSession, String) => DataFrame

  /** (lang, stopword-alternation) — tiny inline lexicons; the heuristic
    * is argmax of whole-word stopword hits with a fixed priority order
    * for ties (en > de > fr > es > zh-placeholder).
    */
  private val lexicons: Seq[(String, String)] = Seq(
    "en" -> "(the|and|of|to|in|is|that|with)",
    "de" -> "(der|die|das|und|ist|nicht|mit|ein)",
    "fr" -> "(le|la|les|et|est|dans|pour|une)",
    "es" -> "(el|los|las|y|es|en|por|una)",
  )

  private def hits(c: Column, alternation: String): Column =
    size(regexp_extract_all(c, lit("\\b" + alternation + "\\b"), lit(0)))

  /** Language identification: stopword-hit scores per language, argmax
    * with deterministic tie-break; 'und' (undetermined) when no lexicon
    * hits at all. Compared against the labeled `lang` column.
    */
  def t01_lang_id: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("pred_lang", predLangCol(lower(col("text"))))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("pred_lang"))

  /** Quality scoring: length/token/punctuation/stopword ratios plus a
    * composite score. Integer counts; ratios are single double
    * divisions; score rounded to 4.
    */
  def t02_quality: Q = (s, d) => {
    val nTok = size(split(col("text"), "\\s+"))
    val nChars = length(col("text"))
    val nPunct = size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0)))
    val nStop = size(regexp_extract_all(lower(col("text")),
      lit("\\b(the|a|and|of|to|in)\\b"), lit(0)))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        nChars.as("n_chars_m"),
        nTok.as("n_tokens"),
        // rhalfup, not round: pure integer ratios — see Tables.rhalfup.
        // try_divide on the /nChars ratios: empty text NULLs the row's
        // ratios (DuckDB x/0 parity) instead of risking an ANSI throw.
        // nTok is never 0 (split('') is ['']) so /nTok stays bare.
        graft.Tables.rhalfup(try_divide(nPunct.cast(DoubleType),
          nChars.cast(DoubleType)), 6).as("punct_ratio"),
        graft.Tables.rhalfup(nStop.cast(DoubleType) / nTok, 6).as("stopword_ratio"),
        graft.Tables.rhalfup(
          least(nTok.cast(DoubleType) / 50.0, lit(1.0)) *
            (lit(1.0) - try_divide(nPunct.cast(DoubleType),
              nChars.cast(DoubleType))), 4).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens, BPE-ish regex tokens
    * (letter runs | digit runs | single non-space symbol), distinct
    * whitespace tokens, chars. */
  def t03_tokens: Q = (s, d) =>
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(split(col("text"), "\\s+")).as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("bpe_tokens"),
        size(array_distinct(split(lower(col("text")), "\\s+"))).as("distinct_tokens"),
        length(col("text")).as("n_chars_m"))
      .orderBy(col("doc_id"))

  /** Canonical document fingerprint: md5 of the lowercased text with
    * everything but [a-z0-9] stripped — whitespace/punctuation/case
    *-insensitive dedup key, grouped to find canonical duplicates.
    */
  def t04_fingerprint: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
        .as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("fingerprint"))

  /** Full winnowing pair listing: per-doc fingerprint sets from the
    * native rolling-hash expression, then an inverted index over
    * fingerprints with high-document-frequency fingerprints dropped
    * (the "common substring" stoplist — without it, boilerplate floods
    * the index), and pairs ranked by shared-fingerprint count.
    *
    * OUTPUT IS CORPUS-SHAPED (one row per matching pair — a
    * duplicate-heavy 100 TB corpus emits billions), so this is NOT the
    * default query surface: [[t05_winnow_neardup]] serves the bounded
    * per-doc summary; callers that need every pair write them straight
    * to parquet via [[winnowPairsWriter]] instead of returning them.
    */
  def winnowPairs(s: SparkSession, d: String): DataFrame = {
    val postings = winnowPostings(s, d)
    val a = postings.select(col("fp"), col("doc_id").as("id_a"))
    val b = postings.select(col("fp"), col("doc_id").as("id_b"))
    a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= 5)
  }

  /** Shared posting-list core of the winnowing pair builds: per-doc
    * fingerprints exploded, then restricted to fingerprints surviving
    * the stoplist band. PERSISTED — both pair builds re-read it.
    *
    * The stoplist cap must scale with the corpus: an ABSOLUTE cap
    * stoplists a near-dup family's every fingerprint once the corpus
    * replicates it past the cap (measured: 10× data → 0 output rows),
    * so like MOSS we cap at a corpus FRACTION (0.4%), floored at 20
    * so small corpora (≤5k docs — every driver SF) keep the exact
    * historical cap. The total arrives as a 1-row broadcast, not a
    * driver-side collect. df-count FIRST (count-only aggregate — no
    * posting-list buffers), THEN keep postings of surviving
    * fingerprints: a boilerplate fingerprint shared by millions of
    * docs never materializes a collect_list buffer on one executor.
    */
  private[graft] def winnowPostings(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextHashFunctions.winnow_fingerprints
    val docs = graft.CacheScope.persisted(
      Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(winnow_fingerprints(col("text"), 8, 4)).as("fp")))
    val total = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val rare = docs.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(total))
      .filter(col("df") >= 2 &&
        col("df") <= greatest(lit(20L), col("n_docs") / 250L))
      .select(col("fp"))
    graft.CacheScope.persisted(docs.join(rare, Seq("fp")))
  }

  /** Anchor cap for [[winnowPairsAnchored]]: a fingerprint pairs only
    * its [[T05AnchorC]] lowest-id postings against the rest. Equal to
    * the stoplist FLOOR, so at every corpus size where the fractional
    * stoplist bottoms out at its floor (all driver SFs — ≤ 5k docs)
    * df ≤ C and the anchored build is IDENTICAL to the exact one; the
    * cap only engages where the scaling stoplist admits hot
    * family fingerprints (df up to 0.4% of the corpus). */
  private[graft] val T05AnchorC = 20

  /** Bounded pair build for the default t05 surface: per fingerprint,
    * pair the C lowest-id posting rows (the ANCHORS) against every
    * higher-id posting. Emitting on `anchor_id < partner_id` yields
    * each pair at most once per posting-row combination — exactly the
    * full build's multiset when df ≤ C, a SUBSET of it otherwise
    * (pairs whose lower id is outside the anchor set are skipped, and
    * a reported pair's shared_fps counts only anchor-witnessed
    * fingerprints — never more than the truth).
    *
    * Why anchors keep duplicate FAMILIES complete: members of a
    * replicated family share posting lists, so every member pairs
    * with the family's lowest-C ids with the FULL shared count — each
    * member is reported, its max_shared is exact, and its exemplars
    * are real partners. What the cap sacrifices is only the O(m²)
    * interior of an m-member family (partner LISTS saturate around
    * the anchors), which is exactly the mass [[winnowPairsWriter]]
    * exists to serve.
    *
    * Scale: candidate rows per fingerprint drop from df² to C·df, so
    * the whole build is Σ C·df = C·|postings| — linear in the corpus
    * (measured at 25× driver scale: 713M candidates → ≤ 55M). The
    * anchor set comes from the bounded [[graft.functions.TopKPairsAgg]]
    * (score = −doc_id ⇒ k smallest ids), map-side combinable — no
    * per-fingerprint window, honoring the t05 skew discipline.
    */
  private[graft] def winnowPairsAnchored(s: SparkSession, d: String,
      c: Int): DataFrame = {
    import graft.functions.TopKPairsAgg.top_k_by
    val postings = winnowPostings(s, d)
    val anchors = postings.groupBy(col("fp"))
      .agg(top_k_by(-col("doc_id"), col("doc_id"), c).as("anch"))
      .select(col("fp"), explode(col("anch")).as("a"))
      .select(col("fp"), col("a._2").as("id_a"))
    anchors.join(postings.select(col("fp"), col("doc_id").as("id_b")),
        Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= 5)
  }

  /** Opt-in full pair listing, written directly executor→parquet so
    * the corpus-shaped result never flows back through the driver's
    * consumer. Returns the output row count. Releases only the frames
    * it persisted itself (scoped mark/releaseSince) — a global
    * releaseAll here would evict a calling pipeline's own persisted
    * intermediates mid-flight.
    */
  def winnowPairsWriter(s: SparkSession, d: String, out: String): Long = {
    val m = graft.CacheScope.mark()
    try {
      winnowPairs(s, d).write.mode("overwrite").parquet(out)
      s.read.parquet(out).count()
    } finally graft.CacheScope.releaseSince(m)
  }

  /** Rolling-hash near-duplicate detection (winnowing / MOSS), bounded
    * default surface: the anchored pair build ([[winnowPairsAnchored]]
    * — identical to [[winnowPairs]] at driver SFs, linear above them)
    * reduced to ONE row per matched document — partner count, best
    * score, and the top-3 exemplar partners. The full pair listing
    * grows with the corpus's duplicate-family mass (measured 46,000×
    * at 25× data — the scaled corpus's families, not a plan defect),
    * so the default query bounds BOTH its output (O(docs) rows) and
    * its compute (anchor-capped candidates); the complete listing is
    * an explicit parquet sink ([[winnowPairsWriter]]).
    *
    * Exemplars come from the bounded [[graft.functions.TopKPairsAgg]]
    * (O(k) buffer, map-side combinable) rather than a per-doc window —
    * a boilerplate-hub doc with millions of partners costs k slots,
    * not a single-task sort. They are emitted as ONE flat
    * `"partner:shared_fps;…"` string (score DESC, partner ASC — the
    * aggregator's total order, so the string is deterministic): a
    * nested array<struct> column breaks generic row-comparison
    * tooling (pandas can't sort it), and the flat form is what a
    * manifest/report consumer wants anyway. No oracle (hash-scheme
    * specific); rows-only check + DedupSpec subset-of-truth vs the
    * full listing.
    */
  def t05_winnow_neardup: Q = (s, d) => {
    import graft.functions.TopKPairsAgg.top_k_by
    // persisted: the symmetrize union references `pairs` twice — one
    // inverted-index build, not two. The pair build is the ANCHORED
    // one ([[winnowPairsAnchored]]): identical to the exact listing at
    // every driver SF, linear instead of quadratic in a scaled
    // corpus's duplicate-family mass.
    val pairs = graft.CacheScope.persisted(
      winnowPairsAnchored(s, d, T05AnchorC))
    val sym = pairs.select(col("id_a").as("doc_id"),
        col("id_b").as("partner"), col("shared_fps"))
      .unionAll(pairs.select(col("id_b").as("doc_id"),
        col("id_a").as("partner"), col("shared_fps")))
    sym.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        max(col("shared_fps")).as("max_shared"),
        top_k_by(col("shared_fps"), col("partner"), 3).as("topk"))
      .select(col("doc_id"), col("n_matches"), col("max_shared"),
        concat_ws(";", transform(col("topk"), x =>
          concat_ws(":", x("_2"), x("_1")))).as("exemplars"))
      .orderBy(col("doc_id"))
  }

  /** Fixed-size overlapping character chunks — the training-data prep
    * step that splits long documents into model-window-sized pieces.
    * Chunk starts advance by `stride` (< `size` ⇒ overlap keeps
    * context across boundaries); all arithmetic is integer so the
    * chunk grid is engine-exact, and the md5 pins the chunk CONTENT
    * in the oracle hash, not just its geometry. Map-only (explode of
    * a per-row sequence — no shuffle at any scale).
    */
  def t06_chunking: Q = (s, d) => {
    val size = 500
    val stride = 400
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
    // n_chunks = 1 + ceil((len - size) / stride) for len > size, else 1
    val extra = greatest(col("len") - size, lit(0))
    val nChunks = lit(1) +
      floor((extra + stride - 1) / stride).cast(IntegerType)
    docs
      .withColumn("chunk_id",
        explode(sequence(lit(0), nChunks - 1)))
      .select(col("doc_id"), col("chunk_id"),
        col("text").substr(col("chunk_id") * stride + 1, lit(size)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        length(col("chunk")).as("chunk_len"), md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Vocabulary building: top-30 tokens per language by document
    * frequency (ties broken lexically — fully deterministic). The
    * scale shape: map-side array_distinct per doc, one shuffle for
    * the (lang, token) counts, then per-lang top-k as a window over
    * the (small) count table — the full token stream is never sorted.
    */
  def t07_vocab: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val k = 30
    val counts = Tables.documents(s, d)
      .select(col("lang"),
        explode(array_remove(array_distinct(split(lower(col("text")), "\\s+")), ""))
          .as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("df").desc, col("tok"))
    counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk"), col("tok"), col("df"))
      .orderBy(col("lang"), col("rk"))
  }

  /** Per-row predicted language (argmax of stopword hits, lexicon
    * order breaking ties, 'und' when nothing hits) — the scalar form
    * of [[t01_lang_id]]'s scoring, reused by the curation pipeline. */
  private[operators] def predLangCol(tLower: Column): Column = {
    val scores = lexicons.map { case (lg, alt) => lg -> hits(tLower, alt) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lg, sc), acc) =>
      when(sc === best && best > 0, lit(lg)).otherwise(acc)
    }
  }

  /** The curation pipeline end to end — what a training-data run
    * actually executes before tokenization: canonical-fingerprint
    * dedup (keep lowest doc_id), language gate (lexicon argmax must
    * resolve), and quality gates (length + punctuation), emitting the
    * curated corpus manifest. Single scan + one window shuffle on the
    * fingerprint; every gate is a codegen'd expression.
    */
  def d08_curation: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val nTok = size(split(col("text"), "\\s+"))
    val nChars = length(col("text"))
    val nPunct = size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0)))
    val fp = md5(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        fp.as("fp"), nTok.as("n_tokens"),
        // rhalfup, not round: pure integer ratios — see Tables.rhalfup.
        // try_divide, not /: an empty-text row makes nChars 0 and ANSI
        // division would kill the whole job; NULL mirrors DuckDB's
        // x/0 and the punct_ratio filter then drops the row.
        graft.Tables.rhalfup(try_divide(nPunct.cast(DoubleType),
          nChars.cast(DoubleType)), 6).as("punct_ratio"),
        graft.Tables.rhalfup(least(nTok.cast(DoubleType) / 50.0, lit(1.0)) *
          (lit(1.0) - try_divide(nPunct.cast(DoubleType),
            nChars.cast(DoubleType))), 4).as("quality_score"),
        predLangCol(lower(col("text"))).as("pred_lang"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("pred_lang") =!= "und" &&
        col("n_tokens") >= 5 && col("punct_ratio") < 0.2)
      .select(col("doc_id"), col("pred_lang"), col("n_tokens"),
        col("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF: top-3 terms per document by tf·idf (tf = in-doc count /
    * doc length; idf = ln(N / df)). Three aggregations (term counts,
    * doc lengths, document frequency) + one broadcast of the scalar
    * corpus size, then a per-doc window over the small per-term table.
    * All inputs to the double math are exact integers, so both engines
    * compute ln/÷ on identical arguments — round(…,4) is stable.
    */
  def t08_tfidf: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("doc_id"),
      explode(array_remove(split(lower(col("text")), "\\s+"), "")).as("tok"))
    val tf = tok.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val dlen = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
    val dfc = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("tok"))
    tf.join(dlen, Seq("doc_id")).join(dfc, Seq("tok"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round((col("c") / col("len")) * log(col("n_docs") / col("df")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("tok"), col("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Adjacent-bigram counts for [[t09_bigram_lm]] / [[t10_pmi]]: the
    * one-pass native [[graft.functions.WordShingles]] expression (n=2)
    * over the empty-filtered token stream — map-only until the count
    * shuffle. Docs with <2 tokens contribute nothing (word_shingles
    * would emit the whole doc as one short shingle, which the DuckDB
    * zip-based oracle never generates). */
  private def bigramCounts(docs: DataFrame): DataFrame = {
    import graft.functions.TextHashFunctions.word_shingles
    val toks = array_remove(split(lower(col("text")), "\\s+"), "")
    docs.select(toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(word_shingles(col("toks"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_bigram"))
  }

  /** Bigram language-model table: global bigram counts and the
    * conditional next-word probability p(w2 | w1) = c(w1 w2) / c(w1·),
    * where c(w1·) is the head's count summed from the bigram table
    * itself (self-consistent, no separate unigram pass). The LM-count
    * shape every n-gram pipeline runs before training. */
  def t09_bigram_lm: Q = (s, d) => {
    val c = bigramCounts(Tables.documents(s, d))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
    val hc = c.groupBy(col("w1")).agg(sum(col("c_bigram")).as("c_head"))
    c.join(hc, Seq("w1"))
      .filter(col("c_bigram") >= 5)
      .select(col("bigram"), col("c_bigram"), col("c_head"),
        // rhalfup, not round: c_bigram/c_head is a pure integer ratio
        graft.Tables.rhalfup(col("c_bigram") / col("c_head"), 4).as("p_next"))
      .orderBy(col("bigram"))
  }

  /** t26 — interpolated Kneser–Ney bigram LM (Kneser & Ney 1995, the
    * Chen & Goodman 1999 benchmark winner and the KenLM default):
    * P(w2|w1) = (c12 − D)/c1 + (D·N1+(w1·)/c1)·(N1+(·w2)/N1+(··)),
    * D = 0.75. The continuation probability counts how many DISTINCT
    * contexts a word completes — the "Francisco problem" fix add-one
    * smoothing (t09) cannot express: a word frequent only inside one
    * collocation gets a LOW continuation weight no raw unigram count
    * reveals. Every input (c12, c1, N1+ head/cont, type total) is an
    * integer off the one bigram table; both engines run the identical
    * double op sequence and land on rhalfup-6, so the table is
    * hash-exact.
    *
    * Scale: t09's shape exactly — one bigram-count shuffle, two tiny
    * reaggregations, a scalar type-count broadcast. Seen bigrams only
    * (c12 ≥ 1 > D, so the max(·,0) clamp is vacuous); the backoff
    * weight for UNSEEN pairs is λ(w1) = D·N1+(w1·)/c1, the second
    * addend's head factor, recoverable from the emitted columns.
    */
  def t26_kneser_ney: Q = (s, d) => kneserNey(Tables.documents(s, d))

  private[graft] def kneserNey(docs: DataFrame): DataFrame = {
    val c = graft.CacheScope.persisted(
      bigramCounts(docs)
        .withColumn("w1", substring_index(col("bigram"), " ", 1))
        .withColumn("w2", substring_index(col("bigram"), " ", -1)))
    val heads = c.groupBy(col("w1"))
      .agg(sum(col("c_bigram")).as("c_head"),
        count(lit(1)).as("n1p_head"))
    val conts = c.groupBy(col("w2")).agg(count(lit(1)).as("n_cont"))
    val types = c.agg(count(lit(1)).as("n_types"))
    c.join(heads, Seq("w1")).join(conts, Seq("w2"))
      .crossJoin(broadcast(types))
      .filter(col("c_bigram") >= 5)
      .select(col("bigram"), col("c_bigram"), col("c_head"),
        col("n1p_head"), col("n_cont"),
        graft.Tables.rhalfup(
          (col("c_bigram") - 0.75) / col("c_head")
            + (lit(0.75) * col("n1p_head") / col("c_head"))
            * (col("n_cont") / col("n_types")), 6).as("p_kn"))
      .orderBy(col("bigram"))
  }

  /** Collocation mining by pointwise mutual information over adjacent
    * bigrams: pmi = ln(p(xy) / (p(x)·p(y))) = ln((c_xy/c_x)·(T/c_y)).
    * Head/tail marginals and the total T all derive from the one
    * bigram count table (two tiny reaggregations + one broadcast).
    * Computed as a product of two exact-int ratios, NOT as
    * (c_xy·T)/(c_x·c_y): the int64 cross-products overflow silently
    * in Spark (and error in DuckDB) once T reaches web-corpus scale,
    * while each ratio stays well inside double range; both engines
    * run the identical division/multiply/ln sequence, so the rounded
    * value is engine-stable. */
  def t10_pmi: Q = (s, d) => {
    val c = bigramCounts(Tables.documents(s, d))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
    val heads = c.groupBy(col("w1")).agg(sum(col("c_bigram")).as("c_x"))
    val tails = c.groupBy(col("w2")).agg(sum(col("c_bigram")).as("c_y"))
    val total = c.agg(sum(col("c_bigram")).as("t_bigrams"))
    c.join(heads, Seq("w1")).join(tails, Seq("w2"))
      .crossJoin(broadcast(total))
      .filter(col("c_bigram") >= 10)
      .select(col("bigram"), col("c_bigram"),
        round(log((col("c_bigram") / col("c_x")) *
          (col("t_bigrams") / col("c_y"))), 4).as("pmi"))
      .orderBy(col("bigram"))
  }

  /** t15 — token-entropy quality signal: per-document Shannon entropy
    * of the token distribution, the information-density counterpart to
    * t11's repetition ratios (a doc looping one phrase scores near 0
    * bits; diverse text approaches log2 of its distinct-token count).
    * Computed via H = log2(n) − (Σ c·log2 c)/n so each engine runs ONE
    * log per distinct token and one final combine — fewer float ops to
    * disagree on than the Σ p·log2(p) form, and round-4 absorbs the
    * summation-order ulps (same discipline as t08/t10). Shape: one
    * map-side explode + two partial aggregates keyed by doc — scans the
    * corpus once at any scale.
    */
  def t15_entropy: Q = (s, d) => {
    val cnt = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    cnt.groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * log2(col("c"))).as("slc"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(log2(col("n_tokens")) - col("slc") / col("n_tokens"), 4)
          .as("entropy"))
      .orderBy(col("doc_id"))
  }

  /** BM25 query terms + parameters — the ONE source for both the Spark
    * plan and the generated oracle SQL, so the ranking function and its
    * oracle cannot drift. Lucene-style idf (ln((N−df+0.5)/(df+0.5)+1)
    * is always ≥ 0). */
  private val bm25Terms: Seq[String] = Seq("spark", "hash", "window")
  private val bm25K1 = 1.2
  private val bm25B = 0.75
  private val bm25TopK = 20

  /** t16 — BM25 ranked retrieval: top-k documents for a fixed term set,
    * the retrieval primitive behind RAG corpus curation and dedup-by-
    * query. Scale shape: tf per term is a map-only array expression
    * (size − size(array_remove)) — the token stream is NEVER exploded
    * or shuffled; corpus stats (N, Σdl, per-term df) are ONE tiny
    * aggregate broadcast back; scoring is per-row arithmetic and the
    * top-k is TakeOrderedAndProject. One slim persisted projection
    * (doc_id, dl, tf_i) feeds both the stats pass and the score pass.
    *
    * Determinism: per-term scores are floored into exact integer
    * micro-units before the cross-term sum (the s06 pattern — integer-
    * valued doubles < 2^53 add exactly in any order in both engines);
    * idf/length-norm inputs are exact integers or decimal-exact
    * averages, so both engines evaluate ln/÷ on identical arguments.
    */
  def t16_bm25: Q = (s, d) => bm25(Tables.documents(s, d))

  private[graft] def bm25(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = array_remove(split(lower(col("text")), "\\s+"), "")
    val tf = graft.CacheScope.persisted(
      docs
        .select(col("doc_id"), toks.as("toks"))
        .select(Seq(col("doc_id"), size(col("toks")).as("dl")) ++
          bm25Terms.zipWithIndex.map { case (t, i) =>
            (size(col("toks")) - size(array_remove(col("toks"), t))).as(s"tf_$i")
          }: _*))
    val statAggs =
      Seq(count(lit(1)).as("n_docs"), Tables.dsum(col("dl")).as("sum_dl")) ++
        bm25Terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = tf.agg(statAggs.head, statAggs.tail: _*)
    val avgdl = col("sum_dl") / col("n_docs")
    // one term's BM25 contribution in exact integer micro-units
    def micro(i: Int): Column = {
      val tfc = col(s"tf_$i").cast(DoubleType)
      val idf = log((col("n_docs").cast(DoubleType) - col(s"df_$i") + 0.5) /
        (col(s"df_$i") + 0.5) + 1.0)
      val sc = idf * tfc * (bm25K1 + 1.0) /
        (tfc + lit(bm25K1) * (lit(1.0 - bm25B) +
          lit(bm25B) * col("dl").cast(DoubleType) / avgdl))
      when(col(s"tf_$i") > 0, floor(sc * 1e6 + 0.5)).otherwise(lit(0.0))
    }
    val nTerms = bm25Terms.indices
      .map(i => when(col(s"tf_$i") > 0, 1).otherwise(0)).reduce(_ + _)
    val top = tf.crossJoin(broadcast(stats))
      .withColumn("score_u", bm25Terms.indices.map(micro).reduce(_ + _))
      .filter(col("score_u") > 0)
      .select(col("doc_id"), nTerms.cast(IntegerType).as("n_terms"),
        (col("score_u") / 1e6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(bm25TopK)
    // rank assigned AFTER the global top-k: the single-partition window
    // only ever sees k rows, not the corpus
    top.withColumn("rk",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("n_terms"), col("score"), col("rk"))
      .orderBy(col("rk"))
  }

  /** t18 — per-document perplexity under the corpus's own bigram LM
    * (t09's table applied back to each document): cross-entropy
    * H(doc) = −(Σ log2 p(w2|w1))/n and ppl = 2^H. The CCNet-style
    * quality filter — documents whose word sequences the corpus LM
    * finds surprising (boilerplate soup, shuffled tokens, wrong
    * language) score high and get cut.
    *
    * Scale shape: doc-bigrams are persisted once and feed BOTH the LM
    * counts and the scoring join; shuffles are keyed by bigram (LM
    * build + probability join) and doc_id (final agg) — all uniform
    * keys. Determinism: each bigram's log2 p is floored into integer
    * micro-units before the per-doc sum (s06 pattern — exact in any
    * partition order; p is an exact integer ratio so both engines
    * feed log2 identical arguments, and the only ratios that can land
    * floor(x·1e6) on a boundary are powers of two, where log2 is
    * exact in both engines).
    */
  def t18_lm_perplexity: Q = (s, d) =>
    lmPerplexity(Tables.documents(s, d))

  private[graft] def lmPerplexity(docs: DataFrame): DataFrame = {
    import graft.functions.TextHashFunctions.word_shingles
    val toks = array_remove(split(lower(col("text")), "\\s+"), "")
    val docBigrams = graft.CacheScope.persisted(
      docs.select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(word_shingles(col("toks"), 2)).as("bigram")))
    val c = docBigrams.groupBy(col("bigram")).agg(count(lit(1)).as("cb"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
    val h = c.groupBy(col("w1")).agg(sum(col("cb")).as("ch"))
    val p = c.join(h, Seq("w1"))
      .select(col("bigram"), (col("cb").cast(DoubleType) / col("ch")).as("pr"))
    docBigrams.join(p, Seq("bigram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(floor(log2(col("pr")) * 1e6)).as("sm"))
      .select(col("doc_id"), col("n_bigrams"),
        // rhalfup, NOT round: -sm/n/1e6 is an exact integer ratio, so
        // it can land exactly on a .00005 boundary where Spark's
        // HALF_UP and DuckDB's multiply+nearest-even disagree
        // (observed at 25× scale: 5.59505 → 5.5951 vs 5.595)
        graft.Tables.rhalfup(-col("sm") / col("n_bigrams") / 1e6, 4)
          .as("cross_entropy"),
        graft.Tables.rhalfup(
          pow(lit(2.0), -col("sm") / col("n_bigrams") / 1e6), 4).as("ppl"))
      .orderBy(col("doc_id"))
  }

  /** t19 — Zipf power-law fit of the corpus token distribution: least-
    * squares slope of log(freq) vs log(rank) over the full vocabulary,
    * with intercept and r². A healthy natural-language corpus fits
    * slope ≈ −1 with high r²; a collapsed or machine-generated corpus
    * drifts — this is the distribution-level health check a training-
    * data pipeline runs per delivery next to t07's vocab listing.
    *
    * Determinism (cross-engine hash-exact): each term's ln(rank) /
    * ln(freq) is floored into integer MICRO-UNITS (t18's pattern —
    * ln's argument is a plain integer in both engines, and a 1-ulp
    * libm divergence only matters if ln(k)·1e6 straddles an integer
    * boundary), the five regression sums accumulate exactly over
    * longs/decimals (order-independent in any partition layout), and
    * the final slope/intercept/r² are a fixed IEEE expression tree
    * over those exact sums, mirrored token-for-token in the oracle.
    *
    * Ranking without a global single-partition sort: rank(t) =
    * (# tokens with strictly higher freq) + row_number within the
    * freq group ordered by token. The within-group window partitions
    * by freq (distributed); the cumulative-higher table is a window
    * over DISTINCT freq values — heavy-tailed, thousands of rows at
    * any corpus size — then broadcast back.
    */
  def t19_zipf: Q = (s, d) => zipfFit(Tables.documents(s, d))

  private[graft] def zipfFit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksCol = array_remove(split(lower(col("text")), "\\s+"), "")
    val vocab = docs
      .select(explode(toksCol).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val byFreq = vocab.groupBy(col("freq")).agg(count(lit(1)).as("nf"))
    val wCum = Window.orderBy(col("freq").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val higher = byFreq
      .withColumn("cum_higher", coalesce(sum(col("nf")).over(wCum), lit(0L)))
      .select(col("freq"), col("cum_higher"))
    val wIn = Window.partitionBy(col("freq")).orderBy(col("tok"))
    val ranked = vocab
      .withColumn("rn", row_number().over(wIn))
      .join(broadcast(higher), Seq("freq"))
      .select(col("freq"), (col("cum_higher") + col("rn")).as("rank"))
    val m = ranked.select(
      floor(log(col("rank").cast(DoubleType)) * 1e6).cast(LongType).as("x"),
      floor(log(col("freq").cast(DoubleType)) * 1e6).cast(LongType).as("y"))
    val sums = m.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(DecimalType(38, 0))).cast(DoubleType).as("sx"),
      sum(col("y").cast(DecimalType(38, 0))).cast(DoubleType).as("sy"),
      sum((col("x") * col("y")).cast(DecimalType(38, 0))).cast(DoubleType).as("sxy"),
      sum((col("x") * col("x")).cast(DecimalType(38, 0))).cast(DoubleType).as("sxx"),
      sum((col("y") * col("y")).cast(DecimalType(38, 0))).cast(DoubleType).as("syy"))
    val withBeta = sums.select(
      col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"),
      col("n").cast(DoubleType).as("nd"))
      .withColumn("beta",
        (col("nd") * col("sxy") - col("sx") * col("sy")) /
          (col("nd") * col("sxx") - col("sx") * col("sx")))
    withBeta.select(
      col("n").as("n_vocab"),
      Tables.rhalfup(col("beta"), 6).as("slope"),
      Tables.rhalfup(
        (col("sy") - col("beta") * col("sx")) / col("nd") / lit(1e6), 6)
        .as("intercept"),
      Tables.rhalfup(
        (col("nd") * col("sxy") - col("sx") * col("sy")) *
          (col("nd") * col("sxy") - col("sx") * col("sy")) /
          ((col("nd") * col("sxx") - col("sx") * col("sx")) *
            (col("nd") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
  }

  /** Count-min geometry shared by [[t20_heavy_hitters]] and its DuckDB
    * oracle: [[CmDepth]] hash rows × [[CmWidth]] counters (ε = e/2719
    * ≈ 0.001, δ = e⁻⁴ ≈ 0.018 — the same guarantee the old
    * `count_min_sketch(ε=0.001, δ=0.99)` call carried). */
  private[graft] val CmDepth = 4
  private[graft] val CmWidth = 2719

  /** t20 — heavy hitters via count-min sketch: one fixed-size sketch
    * aggregate over the token stream (the summary a one-pass or
    * streaming pipeline keeps instead of a full vocabulary), probed
    * for the exact top-20 tokens so every row carries the sketch
    * estimate next to the exact count. The count-min guarantee —
    * estimate ≥ exact, overshoot ≤ ε·N with confidence δ — is
    * asserted per row (`within_bound`) and in TextAnalysisSpec.
    *
    * The [[CmDepth]] hash rows are md5-keyed (row i buckets a token
    * at md5-60-bit(tok#i) mod [[CmWidth]]) — a standard independent-
    * hash CM family, chosen over Spark's opaque `count_min_sketch`
    * binary BECAUSE md5 is the hash both engines evaluate
    * bit-identically, which puts the sketch itself under the DuckDB
    * hash gate: counters, probes and the ε bound all mirror exactly.
    * The built-in-sketch variant survives as [[heavyHittersSketched]]
    * with the same spec properties as referee.
    *
    * Scale: the sketch is a partial+final (i, bucket) count aggregate
    * with CONSTANT state (4 × 2719 counter rows) regardless of corpus
    * size; the exact side is t07's partial-agg vocabulary path ending
    * in TakeOrdered(20); the probe joins 20·4 rows against the
    * broadcast counter table. The ε-bound arithmetic is integer
    * (⌈n/1000⌉ as (n+999) div 1000) so the bound bit cannot drift on
    * float rounding.
    */
  def t20_heavy_hitters: Q = (s, d) =>
    heavyHitters(Tables.documents(s, d))

  private[graft] def heavyHitters(docs: DataFrame, topK: Int = 20): DataFrame = {
    val tokens = docs.select(
      explode(array_remove(split(lower(col("text")), "\\s+"), "")).as("tok"))
    // the sketch: (row, bucket) → count, ≤ CmDepth·CmWidth rows total
    val cells = graft.CacheScope.persisted(
      tokens
        .select(explode(expr(
          s"""transform(sequence(0, ${CmDepth - 1}), i -> struct(
             |  i AS i,
             |  cast(conv(substring(md5(concat(tok, '#', cast(i AS string))),
             |    1, 15), 16, 10) AS bigint) % $CmWidth AS bucket))"""
            .stripMargin)).as("c"))
        .groupBy(col("c.i").as("i"), col("c.bucket").as("bucket"))
        .agg(count(lit(1)).as("cnt")))
    val stream = tokens.agg(count(lit(1)).as("n_stream"))
    val top = tokens.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok"))
      .limit(topK)
    top
      .select(col("tok"), col("exact_cnt"),
        explode(expr(s"sequence(0, ${CmDepth - 1})")).as("i"))
      .withColumn("bucket", expr(
        s"cast(conv(substring(md5(concat(tok, '#', cast(i AS string))), " +
          s"1, 15), 16, 10) AS bigint) % $CmWidth"))
      .join(broadcast(cells), Seq("i", "bucket"))
      .groupBy(col("tok"), col("exact_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
      .crossJoin(broadcast(stream))
      .withColumn("within_bound",
        col("est_cnt") >= col("exact_cnt") &&
          col("est_cnt") - col("exact_cnt") <=
            expr("(n_stream + 999) div 1000"))
      .select(col("tok"), col("exact_cnt"), col("est_cnt"), col("within_bound"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  /** The Spark-built-in-sketch variant of [[heavyHitters]] (the
    * pre-round-13 suite entry): `count_min_sketch` partial+final
    * aggregate probed by the [[graft.functions.SketchFunctions
    * .cms_estimate]] expression. Kept as the library's streaming-
    * friendly form (ONE binary sketch value travels, merge-able
    * across micro-batches) with the same ε-bound spec properties as
    * referee; the suite entry uses the md5-keyed twin the oracle
    * recomputes counter for counter. */
  private[graft] def heavyHittersSketched(docs: DataFrame,
      topK: Int = 20): DataFrame = {
    import graft.functions.SketchFunctions.cms_estimate
    val eps = 0.001
    val tokens = docs.select(
      explode(array_remove(split(lower(col("text")), "\\s+"), "")).as("tok"))
    val sketch = tokens.agg(
      count_min_sketch(col("tok"), lit(eps), lit(0.99), lit(42)).as("cms"),
      count(lit(1)).as("n_stream"))
    val top = tokens.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok"))
      .limit(topK)
    top.crossJoin(broadcast(sketch))
      .select(col("tok"), col("exact_cnt"),
        cms_estimate(col("cms"), col("tok")).as("est_cnt"),
        col("n_stream"))
      .withColumn("within_bound",
        col("est_cnt") >= col("exact_cnt") &&
          col("est_cnt") - col("exact_cnt") <=
            ceil(col("n_stream") * lit(eps)))
      .select(col("tok"), col("exact_cnt"), col("est_cnt"), col("within_bound"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  /** t21 — code-switching detection: language-ID per fixed 20-token
    * segment, rolled up per document into segment count, number of
    * distinct (non-und) languages, the majority language, and a
    * `mixed` flag. Mixed-language documents confuse monolingual
    * filters and are a standard curation drop/route signal that
    * doc-level lang-ID (t01) cannot see — a 50/50 en/de document
    * argmaxes to ONE language.
    *
    * Scale: segmenting is a per-row transform+explode (map-only);
    * the rollups shuffle on doc_id (uniform). Deterministic: the
    * majority breaks ties by language code, `und` segments count in
    * n_segments but never in n_langs/main_lang; a doc whose every
    * segment is `und` reports main_lang='und'.
    */
  def t21_code_switch: Q = (s, d) => t21Of(Tables.documents(s, d))

  private[graft] def t21Of(docs: DataFrame): DataFrame = {
    val segTok = 20
    val toksCol = array_remove(split(lower(col("text")), "\\s+"), "")
    val segs = docs
      .select(col("doc_id"), toksCol.as("toks"))
      .select(col("doc_id"), explode(expr(
        s"""transform(
           |  sequence(0, greatest(cast(ceil(size(toks) / $segTok.0) as int), 1) - 1),
           |  i -> array_join(slice(toks, i * $segTok + 1, $segTok), ' '))"""
          .stripMargin)).as("seg"))
      .select(col("doc_id"), predLangCol(col("seg")).as("seg_lang"))
    // Segments are scored ONCE: (doc, lang) partial+final counts, then a
    // doc-keyed rollup. n_segments = Σc; `und` rows are excluded from
    // n_langs and from the majority — their min_by ordering is NULL, so
    // an und-only doc yields NULL → 'und'. The majority orders by
    // (−c, code): count desc, ties to the lexically-first code.
    segs.groupBy(col("doc_id"), col("seg_lang"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_segments"),
        count(when(col("seg_lang") =!= "und", 1)).as("n_langs"),
        coalesce(
          min_by(col("seg_lang"), when(col("seg_lang") =!= "und",
            struct((-col("c")).as("nc"), col("seg_lang").as("lg")))),
          lit("und")).as("main_lang"))
      .withColumn("mixed", col("n_langs") >= 2)
      .orderBy(col("doc_id"))
  }

  /** t23 — BPE merge learning (Sennrich et al. 2016): the first k
    * byte-pair-encoding merges of the corpus, learned exactly. Words
    * start as character sequences; each round counts adjacent symbol
    * pairs weighted by word frequency, takes the max-count pair
    * (ties → lexicographic), and applies it greedily left-to-right
    * (within a run of overlapping matches, the 1st/3rd/5th… merge —
    * the standard BPE semantics). Output: one row per learned merge
    * with its pair weight. Both the argmax and the merge application
    * are pure relational algebra, mirrored round-for-round in the
    * oracle's templated CTEs.
    *
    * Scale: after the vocab agg, every round operates on the VOCAB
    * (distinct words), not the corpus — pair explode ∝ Σ word length
    * over the vocab. Each round's vocab table is lineage-cut
    * (CacheScope.cut): it feeds two consumers per round (pair
    * counting and merge application) and k stacked window+join rounds
    * would otherwise nest into one pathological plan.
    */
  def t23_bpe_merges: Q = (s, d) => bpeMerges(Tables.documents(s, d))

  private[graft] def bpeMerges(docs: DataFrame, rounds: Int = 4): DataFrame =
    bpeTrain(docs, rounds, applyLast = false)._1
      .reduce(_ unionByName _).orderBy(col("round"))

  /** Shared BPE training loop: learns `rounds` merges and returns
    * (one winner frame per round, final vocab). t23 reads the winners
    * (skipping the last unconsumed application); t25 applies ALL
    * rounds (`applyLast = true`) and reads the final vocab's symbol
    * sequences to encode the corpus. */
  private def bpeTrain(docs: DataFrame, rounds: Int,
      applyLast: Boolean): (Seq[DataFrame], DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val tok = array_remove(split(lower(col("text")), "\\s+"), "")
    var w = graft.CacheScope.cut(
      docs.select(explode(tok).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .withColumn("syms", split(col("word"), "")))
    val winners = Seq.newBuilder[DataFrame]
    for (round <- 1 to rounds) {
      val p = w.filter(size(col("syms")) >= 2)
        .select(col("word"), col("cnt"),
          explode(expr("sequence(1, size(syms) - 1)")).as("pos"),
          col("syms"))
        .select(col("word"), col("cnt"), col("pos"),
          element_at(col("syms"), col("pos")).as("a"),
          element_at(col("syms"), col("pos") + 1).as("b"))
      val win = p.groupBy(col("a"), col("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b")).limit(1)
      winners += win.select(lit(round).as("round"), col("a").as("lhs"),
        col("b").as("rhs"), concat(col("a"), col("b")).as("merged"),
        col("c").as("weight"))
      // t23's last winner is already recorded — its merge application
      // would go unconsumed there, so it only runs when the caller
      // wants the fully-merged vocab (t25 encode)
      if (round < rounds || applyLast) {
        // Greedy left-to-right application as ONE row-local fold per
        // word (state = (emitted, pending)): merge exactly when the
        // pending symbol is lhs and the current one is rhs, and a
        // merged symbol never becomes pending again — the same
        // odd-ranks-within-island semantics the old explode + two
        // windows + hit/skip joins + re-collect computed with FOUR
        // exchanges per round (r14: those exchanges were >½ of the
        // t23/t25/t27 walls). The winner rides in as a broadcast
        // 1-row aggregate (max over the 1-row win frame), so an
        // EMPTY winner (no mergeable pair anywhere) yields NULL
        // lhs/rhs → the condition is never true → syms pass through
        // unchanged, exactly like the old no-match join.
        val wb = broadcast(win.agg(max(col("a")).as("__a"),
          max(col("b")).as("__b")))
        w = graft.CacheScope.cut(
          w.crossJoin(wb)
            .select(col("word"), col("cnt"), expr(
              """aggregate(syms,
                |  named_struct('out', cast(array() as array<string>),
                |               'pend', cast(null as string)),
                |  (st, s) -> if(st.pend = __a and s = __b,
                |    named_struct('out',
                |      concat(st.out, array(concat(__a, __b))),
                |      'pend', cast(null as string)),
                |    named_struct('out',
                |      if(st.pend is null, st.out,
                |         concat(st.out, array(st.pend))),
                |      'pend', s)),
                |  st -> if(st.pend is null, st.out,
                |           concat(st.out, array(st.pend))))"""
                .stripMargin).as("syms")))
      }
    }
    (winners.result(), w)
  }

  /** t25 — BPE encoding: apply the k merges t23 learns back to the
    * corpus (tokenizer train→APPLY — the half of the BPE story t23's
    * training output doesn't cover). Per doc: word count, symbol
    * count before any merge (chars), token count after k merges, and
    * the compression ratio chars/tokens (engine-stable rounding).
    *
    * Scale: training cost is t23's (vocab-sized rounds); encoding
    * never touches symbol sequences per occurrence — it aggregates
    * the corpus to per-(doc, word) counts first (map-side combine),
    * joins that to the vocab-sized symbol-count table on the word
    * key, and folds weighted sums per doc. Two shuffles past
    * training, both on pre-aggregated rows.
    */
  def t25_bpe_encode: Q = (s, d) => bpeEncode(Tables.documents(s, d))

  private[graft] def bpeEncode(docs: DataFrame, rounds: Int = 4): DataFrame = {
    val enc = bpeTrain(docs, rounds, applyLast = true)._2
      .select(col("word"), size(col("syms")).as("n_sym"))
    val tok = array_remove(split(lower(col("text")), "\\s+"), "")
    val wc = docs.select(col("doc_id"), explode(tok).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("k"))
    wc.join(enc, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_words"),
        sum(col("k") * length(col("word"))).as("n_chars"),
        sum(col("k") * col("n_sym")).as("n_bpe"))
      .withColumn("compression",
        Tables.rhalfup(col("n_chars").cast("double") / col("n_bpe"), 4))
      .orderBy(col("doc_id"))
  }

  /** t27 — tokenizer fertility audit per (lang, source) slice: after
    * BPE training (the t23/t25 exact-integer machinery), how many
    * subword symbols does a word of this slice cost? `fertility` =
    * BPE symbols per word (the multilingual-tokenizer-bias metric: a
    * slice whose fertility is 2× pays 2× the context budget for the
    * same text), `compression` = chars per symbol, `single_tok` =
    * word occurrences encoded as ONE symbol (vocabulary-covered).
    * All ratios derive from exact integer sums, so the audit is
    * oracle-bearing end-to-end including the 4 training rounds.
    *
    * Scale: the corpus contributes one (lang, source, word) count agg
    * (corpus-linear, one shuffle); the encoding join is against the
    * vocab-sized `enc` table (broadcast); the final agg is
    * slice-count-sized. Training cost is t23's, shared shape.
    */
  def t27_fertility: Q = (s, d) => bpeFertility(Tables.documents(s, d))

  private[graft] def bpeFertility(docs: DataFrame, rounds: Int = 4): DataFrame = {
    val enc = bpeTrain(docs, rounds, applyLast = true)._2
      .select(col("word"), size(col("syms")).as("n_sym"))
    val tok = array_remove(split(lower(col("text")), "\\s+"), "")
    val wc = docs.select(col("lang"), col("source"), explode(tok).as("word"))
      .groupBy(col("lang"), col("source"), col("word"))
      .agg(count(lit(1)).as("k"))
    wc.join(enc, Seq("word"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("k")).as("n_words"),
        sum(col("k") * length(col("word"))).as("n_chars"),
        sum(col("k") * col("n_sym")).as("n_bpe"),
        sum(when(col("n_sym") === 1, col("k")).otherwise(0L)).as("single_tok"))
      .withColumn("fertility",
        Tables.rhalfup(col("n_bpe").cast("double") / col("n_words"), 4))
      .withColumn("compression",
        Tables.rhalfup(col("n_chars").cast("double") / col("n_bpe"), 4))
      .orderBy(col("lang"), col("source"))
  }

  /** Reference-vocabulary size for [[t28_token_drift]] — the drift
    * statistic lives on the corpus's top-V tokens, so the comparison
    * table is V rows no matter the corpus size. */
  private[graft] val T28Vocab = 200

  /** Rows emitted by [[t28_token_drift]]: the top drift contributors. */
  private[graft] val T28TopK = 50

  /** t28 — delivery-vs-corpus token-distribution drift: the token-side
    * twin of s12's embedding drift monitor (the admit-this-delivery
    * gate CCNet-style pipelines run on text statistics). The standing
    * corpus's top-[[T28Vocab]] tokens form the reference vocabulary;
    * both sides get add-one-smoothed probabilities over it, and each
    * token's KL contribution p·log₂(p/q) — delivery relative to
    * corpus — is floored to integer micro-units (t18's proven
    * log-parity discipline; each row is ONE scalar formula, so there
    * is no float-summation order to disagree on). Output: the
    * [[T28TopK]] largest contributors — the tokens a drifted delivery
    * over-represents — with raw counts for triage.
    *
    * Scale shape: one token-count shuffle per side (map-side combine
    * on uniform token keys), the vocabulary is a TakeOrdered top-V
    * (never a full sort), and everything after operates on ≤ V rows
    * with the two totals broadcast — the full token stream is touched
    * exactly twice, in one pass each.
    */
  def t28_token_drift: Q = (s, d) =>
    tokenDrift(Tables.documents(s, d))

  private[graft] def tokenDrift(docs: DataFrame): DataFrame =
    tokenDriftAgainst(docs.filter(col("doc_id") % 17 =!= 0),
      docs.filter(col("doc_id") % 17 === 0))

  /** The t28 core over an explicit (standing corpus, delivery) pair —
    * shared by the batch query (doc_id % 17 split) and the streaming
    * per-micro-batch gate
    * ([[graft.streaming.EventStreams.tokenDriftReports]]). */
  private[graft] def tokenDriftAgainst(corpus: DataFrame,
      delivery: DataFrame): DataFrame = {
    def toksOf(df: DataFrame) = df.select(
      explode(array_remove(split(lower(col("text")), "\\s+"), "")).as("tok"))
    val del = toksOf(delivery)
      .groupBy(col("tok")).agg(count(lit(1)).as("c_del"))
    val vocab = toksOf(corpus)
      .groupBy(col("tok")).agg(count(lit(1)).as("c_corp"))
      .orderBy(col("c_corp").desc, col("tok")).limit(T28Vocab)
    val joined = graft.CacheScope.persisted(
      vocab.join(del, Seq("tok"), "left")
        .select(col("tok"), col("c_corp"),
          coalesce(col("c_del"), lit(0L)).as("c_del")))
    val tot = joined.agg(sum(col("c_del")).as("nd"),
      sum(col("c_corp")).as("nc"), count(lit(1)).as("v"))
    joined.crossJoin(broadcast(tot))
      .withColumn("p",
        (col("c_del") + 1).cast(DoubleType) / (col("nd") + col("v")))
      .withColumn("q",
        (col("c_corp") + 1).cast(DoubleType) / (col("nc") + col("v")))
      .withColumn("contrib_micro",
        floor(col("p") * log2(col("p") / col("q")) * 1000000L)
          .cast(LongType))
      .select(col("tok"), col("c_del"), col("c_corp"), col("contrib_micro"))
      .orderBy(col("contrib_micro").desc, col("tok")).limit(T28TopK)
  }

  val queries: Map[String, Q] = Map(
    "t28_token_drift" -> t28_token_drift,
    "t27_fertility" -> t27_fertility,
    "t25_bpe_encode" -> t25_bpe_encode,
    "t23_bpe_merges" -> t23_bpe_merges,
    "t21_code_switch" -> t21_code_switch,
    "t20_heavy_hitters" -> t20_heavy_hitters,
    "t19_zipf" -> t19_zipf,
    "t15_entropy" -> t15_entropy,
    "t16_bm25" -> t16_bm25,
    "t18_lm_perplexity" -> t18_lm_perplexity,
    "d08_curation" -> d08_curation,
    "t08_tfidf" -> t08_tfidf,
    "t09_bigram_lm" -> t09_bigram_lm,
    "t26_kneser_ney" -> t26_kneser_ney,
    "t10_pmi" -> t10_pmi,
    "t07_vocab" -> t07_vocab,
    "t06_chunking" -> t06_chunking,
    "t01_lang_id" -> t01_lang_id,
    "t02_quality" -> t02_quality,
    "t03_tokens" -> t03_tokens,
    "t04_fingerprint" -> t04_fingerprint,
    "t05_winnow_neardup" -> t05_winnow_neardup,
  )

  /** DuckDB SQL fragments mirroring [[predLangCol]] — ONE source for
    * both oracle blocks (t01 + d08) so a lexicon change can't
    * desynchronize a query from its oracle. Returns (score select
    * list, argmax CASE expression). */
  private[operators] def langOracleSql: (String, String) = {
    val scores = lexicons.map { case (lg, alt) =>
      s"len(regexp_extract_all(lower(text), '\\b$alt\\b')) AS s_$lg"
    }.mkString(",\n    ")
    val best = "greatest(" + lexicons.map("s_" + _._1).mkString(", ") + ")"
    val pred = lexicons.map { case (lg, _) =>
      s"WHEN s_$lg = $best AND $best > 0 THEN '$lg'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    (scores, pred)
  }

  /** Shared DuckDB CTE block (`toks`/`bg`/`c`) mirroring
    * [[bigramCounts]] — one source for the t09 + t10 oracles. DuckDB
    * builds the adjacent pairs by zipping the token list with its own
    * 2-offset slice (lengths equalized so no NULL-padded tail pair);
    * the Spark side is the native word_shingles(toks, 2) expression,
    * which joins with the same single space. */
  private val bigramOracleCte: String =
    """toks AS (
      |  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
      |    t -> t <> '') AS l
      |  FROM documents
      |), bg AS (
      |  SELECT unnest(list_transform(list_zip(l[1:len(l)-1], l[2:]),
      |    p -> p[1] || ' ' || p[2])) AS bigram
      |  FROM toks WHERE len(l) >= 2
      |), c AS (SELECT bigram, COUNT(*) AS c_bigram FROM bg GROUP BY bigram)""".stripMargin

  /** DuckDB mirror of [[t16_bm25]], generated from the SAME
    * bm25Terms/k1/b/topK constants as the Spark plan. */
  private def bm25OracleSql: String = {
    val tfSel = bm25Terms.indices.map(i =>
      s"len(toks) - len(list_filter(toks, x -> x <> '${bm25Terms(i)}')) AS tf_$i")
      .mkString(",\n    ")
    val dfSel = bm25Terms.indices.map(i =>
      s"SUM(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i")
      .mkString(",\n    ")
    val microSum = bm25Terms.indices.map { i =>
      s"""CASE WHEN tf_$i > 0 THEN floor(
         |      ln((CAST(n_docs AS DOUBLE) - df_$i + 0.5) / (df_$i + 0.5) + 1.0)
         |        * CAST(tf_$i AS DOUBLE) * ${bm25K1 + 1.0}
         |        / (CAST(tf_$i AS DOUBLE) + $bm25K1 * (1.0 - $bm25B
         |            + $bm25B * CAST(dl AS DOUBLE) / (sum_dl / n_docs)))
         |        * 1e6 + 0.5) ELSE 0.0 END""".stripMargin
    }.mkString("(", "\n    + ", ")")
    val nTerms = bm25Terms.indices
      .map(i => s"CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH base AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |    x -> x <> '') AS toks
       |  FROM documents),
       |d AS (
       |  SELECT doc_id, len(toks) AS dl,
       |    $tfSel
       |  FROM base),
       |st AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(CAST(SUM(CAST(dl AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_dl,
       |    $dfSel
       |  FROM d),
       |sc AS (
       |  SELECT doc_id, CAST($nTerms AS INT) AS n_terms,
       |    $microSum AS score_u
       |  FROM d CROSS JOIN st),
       |top AS (
       |  SELECT doc_id, n_terms, score_u / 1e6 AS score
       |  FROM sc WHERE score_u > 0
       |  ORDER BY score DESC, doc_id LIMIT $bm25TopK)
       |SELECT doc_id, n_terms, score,
       |  CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS rk
       |FROM top ORDER BY rk""".stripMargin
  }

  /** One BPE round as SQL CTEs reading vocab w{i-1} — the exact mirror
    * of the bpeMerges loop body (pair counts → argmax → island-greedy
    * merge application). The final round only needs p/win. */
  private def bpeRoundCte(i: Int, last: Boolean): String = {
    val pw =
      s"""p$i AS (
         |  SELECT word, cnt, g AS pos, syms[g] AS a, syms[g+1] AS b
         |  FROM w${i - 1}, unnest(generate_series(1, len(syms) - 1)) u(g)),
         |win$i AS (
         |  SELECT a, b, c FROM (
         |    SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS c FROM p$i GROUP BY a, b)
         |  ORDER BY c DESC, a, b LIMIT 1)""".stripMargin
    if (last) pw else pw + ",\n" +
      s"""mi$i AS (
         |  SELECT p.word, p.pos,
         |    p.pos - ROW_NUMBER() OVER (PARTITION BY p.word ORDER BY p.pos)
         |      AS grp
         |  FROM p$i p, win$i w WHERE p.a = w.a AND p.b = w.b),
         |mm$i AS (
         |  SELECT word, pos FROM (
         |    SELECT word, pos,
         |      ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY pos) AS rn
         |    FROM mi$i) WHERE (rn - 1) % 2 = 0),
         |sp$i AS (
         |  SELECT word, cnt, g AS pos, syms[g] AS s1, syms[g+1] AS s2
         |  FROM w${i - 1}, unnest(generate_series(1, len(syms))) u(g)),
         |w$i AS (
         |  SELECT word, cnt, list(sym ORDER BY pos) AS syms FROM (
         |    SELECT sp.word, sp.cnt, sp.pos,
         |      CASE WHEN mm.pos IS NOT NULL THEN sp.s1 || sp.s2
         |           ELSE sp.s1 END AS sym,
         |      mp.pos IS NOT NULL AS skip
         |    FROM sp$i sp
         |    LEFT JOIN mm$i mm ON mm.word = sp.word AND mm.pos = sp.pos
         |    LEFT JOIN mm$i mp ON mp.word = sp.word AND mp.pos = sp.pos - 1)
         |  WHERE NOT skip GROUP BY word, cnt)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // the md5-keyed count-min recomputed counter for counter: same
    // token stream, same (row, bucket) cells, same min-probe, same
    // integer ε bound — the sketch itself under the hash gate
    "t20_heavy_hitters" ->
      s"""WITH tk AS (
         |  SELECT unnest(list_filter(regexp_split_to_array(lower(text),
         |    '\\s+'), x -> x <> '')) AS tok
         |  FROM documents),
         |cmcells AS MATERIALIZED (
         |  SELECT i, ('0x' || substr(md5(tok || '#' || i), 1, 15))::BIGINT
         |      % $CmWidth AS bucket, COUNT(*) AS cnt
         |  FROM tk CROSS JOIN (
         |    SELECT unnest(generate_series(0, ${CmDepth - 1})) AS i)
         |  GROUP BY 1, 2),
         |ns AS (SELECT COUNT(*) AS n_stream FROM tk),
         |topt AS (
         |  SELECT tok, COUNT(*) AS exact_cnt FROM tk GROUP BY tok
         |  ORDER BY exact_cnt DESC, tok LIMIT 20),
         |est AS (
         |  SELECT t.tok, t.exact_cnt, MIN(c.cnt) AS est_cnt
         |  FROM topt t
         |  CROSS JOIN (
         |    SELECT unnest(generate_series(0, ${CmDepth - 1})) AS i) d
         |  JOIN cmcells c ON c.i = d.i AND c.bucket =
         |    ('0x' || substr(md5(t.tok || '#' || d.i), 1, 15))::BIGINT
         |      % $CmWidth
         |  GROUP BY t.tok, t.exact_cnt)
         |SELECT e.tok, e.exact_cnt, e.est_cnt,
         |  e.est_cnt >= e.exact_cnt AND
         |    e.est_cnt - e.exact_cnt <= (n.n_stream + 999) // 1000
         |    AS within_bound
         |FROM est e, ns n
         |ORDER BY e.exact_cnt DESC, e.tok""".stripMargin,
    "t27_fertility" ->
      s"""WITH w0 AS (
         |  SELECT word, COUNT(*) AS cnt, regexp_split_to_array(word, '')
         |    AS syms
         |  FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text),
         |    '\\s+'), x -> x <> '')) AS word FROM documents)
         |  GROUP BY word),
         |${(1 to 4).map(i => bpeRoundCte(i, last = false)).mkString(",\n")},
         |enc AS (SELECT word, len(syms) AS n_sym FROM w4),
         |wc AS (
         |  SELECT lang, source, word, COUNT(*) AS k
         |  FROM (SELECT lang, source, unnest(list_filter(regexp_split_to_array(
         |    lower(text), '\\s+'), x -> x <> '')) AS word FROM documents)
         |  GROUP BY lang, source, word)
         |SELECT lang, source, n_words, n_chars, n_bpe, single_tok,
         |  floor(CAST(n_bpe AS DOUBLE) / n_words * 1e4 + 0.5) / 1e4
         |    AS fertility,
         |  floor(CAST(n_chars AS DOUBLE) / n_bpe * 1e4 + 0.5) / 1e4
         |    AS compression
         |FROM (
         |  SELECT lang, source, CAST(SUM(k) AS BIGINT) AS n_words,
         |    CAST(SUM(k * length(word)) AS BIGINT) AS n_chars,
         |    CAST(SUM(k * n_sym) AS BIGINT) AS n_bpe,
         |    CAST(SUM(CASE WHEN n_sym = 1 THEN k ELSE 0 END) AS BIGINT)
         |      AS single_tok
         |  FROM wc JOIN enc USING (word) GROUP BY lang, source)
         |ORDER BY lang, source""".stripMargin,
    "t25_bpe_encode" ->
      s"""WITH w0 AS (
         |  SELECT word, COUNT(*) AS cnt, regexp_split_to_array(word, '')
         |    AS syms
         |  FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text),
         |    '\\s+'), x -> x <> '')) AS word FROM documents)
         |  GROUP BY word),
         |${(1 to 4).map(i => bpeRoundCte(i, last = false)).mkString(",\n")},
         |enc AS (SELECT word, len(syms) AS n_sym FROM w4),
         |wc AS (
         |  SELECT doc_id, word, COUNT(*) AS k
         |  FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(
         |    lower(text), '\\s+'), x -> x <> '')) AS word FROM documents)
         |  GROUP BY doc_id, word)
         |SELECT doc_id, n_words, n_chars, n_bpe,
         |  floor(CAST(n_chars AS DOUBLE) / n_bpe * 1e4 + 0.5) / 1e4
         |    AS compression
         |FROM (
         |  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_words,
         |    CAST(SUM(k * length(word)) AS BIGINT) AS n_chars,
         |    CAST(SUM(k * n_sym) AS BIGINT) AS n_bpe
         |  FROM wc JOIN enc USING (word) GROUP BY doc_id)
         |ORDER BY doc_id""".stripMargin,
    "t23_bpe_merges" ->
      s"""WITH w0 AS (
         |  SELECT word, COUNT(*) AS cnt, regexp_split_to_array(word, '')
         |    AS syms
         |  FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text),
         |    '\\s+'), x -> x <> '')) AS word FROM documents)
         |  GROUP BY word),
         |${(1 to 4).map(i => bpeRoundCte(i, last = i == 4)).mkString(",\n")}
         |SELECT * FROM (
         |${(1 to 4).map(i =>
            s"  SELECT $i AS round, a AS lhs, b AS rhs, a || b AS merged, " +
              s"c AS weight FROM win$i").mkString("\n  UNION ALL\n")}
         |) ORDER BY round""".stripMargin,
    "t21_code_switch" -> {
      val (scores, pred) = langOracleSql
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |    x -> x <> '') AS l
         |  FROM documents),
         |ix AS (
         |  SELECT doc_id, l, unnest(generate_series(0,
         |    greatest(CAST(ceil(len(l) / 20.0) AS INT), 1) - 1)) AS i
         |  FROM t),
         |seg AS (
         |  SELECT doc_id,
         |    array_to_string(l[(i*20 + 1):least((i+1)*20, len(l))], ' ') AS text
         |  FROM ix),
         |scored AS (
         |  SELECT doc_id,
         |    $scores
         |  FROM seg),
         |sl AS (SELECT doc_id, $pred AS seg_lang FROM scored),
         |pl AS (SELECT doc_id, seg_lang, COUNT(*) AS c FROM sl GROUP BY 1, 2),
         |nu AS (SELECT * FROM pl WHERE seg_lang <> 'und'),
         |mn AS (
         |  SELECT doc_id, seg_lang AS main_lang FROM (
         |    SELECT doc_id, seg_lang, ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY c DESC, seg_lang) AS rk
         |    FROM nu) WHERE rk = 1),
         |st AS (SELECT doc_id, COUNT(*) AS n_segments FROM sl GROUP BY 1),
         |lg AS (SELECT doc_id, COUNT(*) AS n_langs FROM nu GROUP BY 1)
         |SELECT st.doc_id, st.n_segments,
         |  COALESCE(lg.n_langs, 0) AS n_langs,
         |  COALESCE(mn.main_lang, 'und') AS main_lang,
         |  COALESCE(lg.n_langs, 0) >= 2 AS mixed
         |FROM st
         |LEFT JOIN lg ON st.doc_id = lg.doc_id
         |LEFT JOIN mn ON st.doc_id = mn.doc_id
         |ORDER BY st.doc_id""".stripMargin
    },
    "t19_zipf" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    t -> t <> '')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, COUNT(*) AS freq FROM tok GROUP BY tok),
        |ranked AS (
        |  SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rk
        |  FROM vocab),
        |m AS (
        |  SELECT CAST(floor(ln(CAST(rk AS DOUBLE)) * 1e6) AS BIGINT) AS x,
        |         CAST(floor(ln(CAST(freq AS DOUBLE)) * 1e6) AS BIGINT) AS y
        |  FROM ranked),
        |s AS (
        |  SELECT COUNT(*) AS n, CAST(COUNT(*) AS DOUBLE) AS nd,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x*y) AS DOUBLE) AS sxy, CAST(SUM(x*x) AS DOUBLE) AS sxx,
        |    CAST(SUM(y*y) AS DOUBLE) AS syy
        |  FROM m),
        |f AS (
        |  SELECT n, nd, sx, sy, sxy, sxx, syy,
        |    (nd*sxy - sx*sy) / (nd*sxx - sx*sx) AS beta
        |  FROM s)
        |SELECT n AS n_vocab,
        |  floor(beta * 1e6 + 0.5) / 1e6 AS slope,
        |  floor((sy - beta*sx) / nd / 1e6 * 1e6 + 0.5) / 1e6 AS intercept,
        |  floor((nd*sxy - sx*sy) * (nd*sxy - sx*sy)
        |    / ((nd*sxx - sx*sx) * (nd*syy - sy*sy)) * 1e6 + 0.5) / 1e6 AS r2
        |FROM f""".stripMargin,
    "t16_bm25" -> bm25OracleSql,
    "t18_lm_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    t -> t <> '') AS l
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(list_zip(l[1:len(l)-1], l[2:]),
        |    p -> p[1] || ' ' || p[2])) AS bigram
        |  FROM toks WHERE len(l) >= 2),
        |c AS (SELECT bigram, COUNT(*) AS cb FROM bg GROUP BY bigram),
        |h AS (
        |  SELECT split_part(bigram, ' ', 1) AS w1,
        |    CAST(SUM(cb) AS BIGINT) AS ch
        |  FROM c GROUP BY 1),
        |p AS (
        |  SELECT bigram, CAST(cb AS DOUBLE) / ch AS pr
        |  FROM c JOIN h ON split_part(c.bigram, ' ', 1) = h.w1),
        |s AS (
        |  SELECT doc_id, COUNT(*) AS n_bigrams,
        |    SUM(floor(log2(pr) * 1e6)) AS sm
        |  FROM bg JOIN p USING (bigram) GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        |  floor(-sm / n_bigrams / 1e6 * 1e4 + 0.5) / 1e4 AS cross_entropy,
        |  floor(pow(2.0, -sm / n_bigrams / 1e6) * 1e4 + 0.5) / 1e4 AS ppl
        |FROM s ORDER BY doc_id""".stripMargin,
    "t15_entropy" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tok, COUNT(*) AS c FROM t
        |  WHERE tok <> '' GROUP BY doc_id, tok),
        |a AS (
        |  SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct,
        |    SUM(c * log2(c)) AS slc
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_distinct AS BIGINT) AS n_distinct,
        |  round(log2(n_tokens) - slc / n_tokens, 4) AS entropy
        |FROM a ORDER BY doc_id""".stripMargin,
    "d08_curation" -> {
      val (scores, pred) = langOracleSql
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    $scores,
         |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
         |    len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
         |    length(text) AS n_chars,
         |    len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
         |  FROM documents
         |), ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id)
         |    AS rn
         |  FROM scored)
         |SELECT doc_id, $pred AS pred_lang,
         |  CAST(n_tokens AS INT) AS n_tokens,
         |  floor(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) *
         |    (1.0 - CAST(n_punct AS DOUBLE) / n_chars) * 1e4 + 0.5) / 1e4
         |    AS quality_score
         |FROM ranked
         |WHERE rn = 1 AND ($pred) <> 'und' AND n_tokens >= 5
         |  AND floor(CAST(n_punct AS DOUBLE) / n_chars * 1e6 + 0.5) / 1e6 < 0.2
         |ORDER BY doc_id""".stripMargin
    },
    "t08_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        |  FROM documents
        |), tok2 AS (SELECT * FROM tok WHERE length(tok) > 0),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok2 GROUP BY doc_id, tok),
        |dlen AS (SELECT doc_id, COUNT(*) AS len FROM tok2 GROUP BY doc_id),
        |dfc AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY
        |    round((CAST(c AS DOUBLE) / len) * ln(CAST(n_docs AS DOUBLE) / df), 4)
        |      DESC, tok) AS INT) AS rk,
        |  tok,
        |  round((CAST(c AS DOUBLE) / len) * ln(CAST(n_docs AS DOUBLE) / df), 4)
        |    AS tfidf
        |FROM tf JOIN dlen USING (doc_id) JOIN dfc USING (tok) CROSS JOIN n
        |QUALIFY rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,
    "t26_kneser_ney" ->
      s"""WITH $bigramOracleCte,
        |h AS (
        |  SELECT split_part(bigram, ' ', 1) AS w1,
        |    CAST(SUM(c_bigram) AS BIGINT) AS c_head,
        |    COUNT(*) AS n1p_head
        |  FROM c GROUP BY 1),
        |ct AS (
        |  SELECT split_part(bigram, ' ', 2) AS w2,
        |    COUNT(*) AS n_cont
        |  FROM c GROUP BY 1),
        |t AS (SELECT COUNT(*) AS n_types FROM c)
        |SELECT bigram, CAST(c_bigram AS BIGINT) AS c_bigram, c_head,
        |  n1p_head, n_cont,
        |  floor(((c_bigram - CAST(0.75 AS DOUBLE)) / c_head
        |    + (CAST(0.75 AS DOUBLE) * n1p_head / c_head)
        |    * (CAST(n_cont AS DOUBLE) / n_types)) * 1e6 + 0.5) / 1e6
        |    AS p_kn
        |FROM c
        |JOIN h ON split_part(c.bigram, ' ', 1) = h.w1
        |JOIN ct ON split_part(c.bigram, ' ', 2) = ct.w2
        |CROSS JOIN t
        |WHERE c_bigram >= 5
        |ORDER BY bigram""".stripMargin,
    "t09_bigram_lm" ->
      s"""WITH $bigramOracleCte,
        |h AS (
        |  SELECT split_part(bigram, ' ', 1) AS w1,
        |    CAST(SUM(c_bigram) AS BIGINT) AS c_head
        |  FROM c GROUP BY 1)
        |SELECT bigram, c_bigram, c_head,
        |  floor(CAST(c_bigram AS DOUBLE) / c_head * 1e4 + 0.5) / 1e4 AS p_next
        |FROM c JOIN h ON split_part(c.bigram, ' ', 1) = h.w1
        |WHERE c_bigram >= 5
        |ORDER BY bigram""".stripMargin,
    "t10_pmi" ->
      s"""WITH $bigramOracleCte,
        |hx AS (
        |  SELECT split_part(bigram, ' ', 1) AS w1,
        |    CAST(SUM(c_bigram) AS BIGINT) AS c_x
        |  FROM c GROUP BY 1),
        |ty AS (
        |  SELECT split_part(bigram, ' ', 2) AS w2,
        |    CAST(SUM(c_bigram) AS BIGINT) AS c_y
        |  FROM c GROUP BY 1),
        |t AS (SELECT CAST(SUM(c_bigram) AS BIGINT) AS t_bigrams FROM c)
        |SELECT bigram, c_bigram,
        |  round(ln((CAST(c_bigram AS DOUBLE) / c_x)
        |    * (CAST(t_bigrams AS DOUBLE) / c_y)), 4) AS pmi
        |FROM c
        |JOIN hx ON split_part(c.bigram, ' ', 1) = hx.w1
        |JOIN ty ON split_part(c.bigram, ' ', 2) = ty.w2
        |CROSS JOIN t
        |WHERE c_bigram >= 10
        |ORDER BY bigram""".stripMargin,
    "t28_token_drift" ->
      s"""WITH tok_c AS (
        |  SELECT tok, COUNT(*) AS c_corp FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
        |    FROM documents WHERE doc_id % 17 <> 0)
        |  WHERE length(tok) > 0 GROUP BY tok),
        |vocab AS (
        |  SELECT tok, c_corp FROM tok_c
        |  ORDER BY c_corp DESC, tok LIMIT $T28Vocab),
        |tok_d AS (
        |  SELECT tok, COUNT(*) AS c_del FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
        |    FROM documents WHERE doc_id % 17 = 0)
        |  WHERE length(tok) > 0 GROUP BY tok),
        |j AS (
        |  SELECT v.tok, v.c_corp, COALESCE(d.c_del, 0) AS c_del
        |  FROM vocab v LEFT JOIN tok_d d USING (tok)),
        |tot AS (
        |  SELECT SUM(c_del) AS nd, SUM(c_corp) AS nc, COUNT(*) AS v FROM j)
        |SELECT tok, c_del, c_corp, contrib_micro FROM (
        |  SELECT j.tok, j.c_del, j.c_corp,
        |    CAST(floor(
        |      (CAST(j.c_del + 1 AS DOUBLE) / (t.nd + t.v)) *
        |      log2((CAST(j.c_del + 1 AS DOUBLE) / (t.nd + t.v)) /
        |           (CAST(j.c_corp + 1 AS DOUBLE) / (t.nc + t.v))) *
        |      1000000) AS BIGINT) AS contrib_micro
        |  FROM j CROSS JOIN tot t)
        |ORDER BY contrib_micro DESC, tok LIMIT $T28TopK""".stripMargin,
    "t07_vocab" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, lang,
        |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        |  FROM documents
        |), c AS (
        |  SELECT lang, tok, COUNT(*) AS df FROM tok
        |  WHERE length(tok) > 0 GROUP BY lang, tok)
        |SELECT lang,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY df DESC, tok) AS INT) AS rk,
        |  tok, df
        |FROM c
        |QUALIFY rk <= 30
        |ORDER BY lang, rk""".stripMargin,
    "t06_chunking" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len FROM documents
        |), g AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0,
        |      CAST(floor((greatest(len - 500, 0) + 399) / 400) AS INT)))
        |      AS chunk_id
        |  FROM d)
        |SELECT doc_id, chunk_id,
        |  CAST(length(substring(text, chunk_id * 400 + 1, 500)) AS INT)
        |    AS chunk_len,
        |  md5(substring(text, chunk_id * 400 + 1, 500)) AS chunk_md5
        |FROM g ORDER BY doc_id, chunk_id""".stripMargin,
    "t01_lang_id" -> {
      val (scores, pred) = langOracleSql
      s"""WITH scored AS (
         |  SELECT lang,
         |    $scores
         |  FROM documents)
         |SELECT lang, $pred AS pred_lang, COUNT(*) AS n_docs
         |FROM scored GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin
    },
    "t02_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars_m,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS INT) AS n_tokens,
        |  floor(CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
        |    / length(text) * 1e6 + 0.5) / 1e6 AS punct_ratio,
        |  floor(CAST(len(regexp_extract_all(lower(text),
        |      '\b(the|a|and|of|to|in)\b')) AS DOUBLE)
        |    / len(regexp_split_to_array(text, '\s+')) * 1e6 + 0.5) / 1e6
        |    AS stopword_ratio,
        |  floor(least(CAST(len(regexp_split_to_array(text, '\s+')) AS DOUBLE)
        |      / 50.0, 1.0) *
        |    (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
        |      / length(text)) * 1e4 + 0.5) / 1e4 AS quality_score
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t03_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
        |    AS INT) AS bpe_tokens,
        |  CAST(len(list_distinct(regexp_split_to_array(lower(text), '\s+')))
        |    AS INT) AS distinct_tokens,
        |  CAST(length(text) AS INT) AS n_chars_m
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t04_fingerprint" ->
      """SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
        |    AS fingerprint,
        |  COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
        |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin,
  )
}
