package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-corpus curation operators beyond d08's gate pipeline:
  * benchmark decontamination, repetition screening, PII scrubbing,
  * and temperature-based mixture rebalancing. These are the four
  * standard pre-training passes that run AFTER dedup (d01-d06) and
  * BEFORE sampling into the final mixture.
  *
  * Scale notes are per-operator; the common theme is that every pass
  * is map-side over the corpus with at most one bounded-cardinality
  * shuffle (per-doc or per-stratum), so each scans 100 TB at IO
  * speed. Every formula is mirrored exactly in the DuckDB oracle
  * (integer counts, single double division, round-6).
  */
object Curation {

  type Q = (SparkSession, String) => DataFrame

  /** Exact-split tokens: the corpus is single-space separated, and the
    * DuckDB mirror is string_split(text, ' ') — a \s+ split would
    * diverge on multi-space runs, so both sides split on the literal.
    */
  private def toks = split(col("text"), " ")

  /** d10 — benchmark decontamination: score every corpus document by
    * its distinct word-5-gram overlap against a benchmark set (here
    * the deterministic doc_id % 31 == 0 slice stands in for an eval
    * suite), flagging documents above the overlap threshold. This is
    * the n-gram test-set-contamination check every pre-training run
    * performs before training on scraped data.
    *
    * Scale: the benchmark side is an eval suite — thousands of docs,
    * not the corpus — so its distinct-n-gram set broadcasts; the
    * corpus side is one map pass (shingle + explode) into a broadcast
    * left join and a per-doc aggregate. The corpus never shuffles by
    * content, only by doc_id, and the per-doc n-gram count is bounded
    * by document length. At 100 TB this is a single IO-bound scan.
    */
  def d10_decontam: Q = (s, d) =>
    decontamOf(Tables.documents(s, d), D10MaxBenchGrams)

  /** Ceiling on the broadcast benchmark n-gram set of
    * [[d10_decontam]]. The design assumes the benchmark side is a
    * FIXED-SIZE eval suite (thousands of docs), not a corpus slice —
    * 2M distinct 5-grams ≈ 100 MB broadcast, comfortably under
    * executor memory but far over any real eval suite. The guard
    * makes the assumption checkable: if the benchmark set outgrows
    * it, the right fix is a smaller suite (or a bloom sketch of the
    * grams), not a silently bigger broadcast that OOMs executors. */
  private[graft] val D10MaxBenchGrams = 2000000L

  private[graft] def decontamOf(documents: DataFrame, maxBenchGrams: Long): DataFrame = {
    import graft.functions.TextHashFunctions.word_shingles
    val docs = documents
      .select(col("doc_id"),
        array_distinct(word_shingles(toks, 5)).as("grams"))
    // persisted: the count gate below and the broadcast build would
    // otherwise each run the benchmark gram pipeline (explode +
    // distinct) once — the gate's job now materializes the cache the
    // broadcast reads (guide §2.4: don't recompute)
    val bench = graft.CacheScope.persisted(
      docs.filter(col("doc_id") % 31 === 0)
        .select(explode(col("grams")).as("g")).distinct()
        .withColumn("__hit", lit(1)))
    // provably-bounded broadcast: count the benchmark gram set before
    // planning the join (one count-only job; the set itself is small).
    // Failing loudly here beats the alternative — an oversized
    // explicit broadcast bypasses autoBroadcastJoinThreshold and
    // surfaces only as an executor OOM mid-join.
    val nBench = bench.count()
    require(nBench <= maxBenchGrams,
      s"d10 benchmark n-gram set has $nBench distinct grams > cap " +
        s"$maxBenchGrams — the fixed-size eval-suite assumption broke; " +
        "shrink the benchmark or sketch it before broadcasting")
    docs.filter(col("doc_id") % 31 =!= 0)
      .select(col("doc_id"), explode(col("grams")).as("g"))
      .join(broadcast(bench), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hits"))
      // rhalfup, not round: pure integer ratio — see Tables.rhalfup
      .withColumn("overlap", graft.Tables.rhalfup(col("n_hits") / col("n_grams"), 6))
      .withColumn("contaminated", col("overlap") >= 0.05)
      .orderBy(col("doc_id"))
  }

  /** t11 — repetition screening (the Gopher-rule family): per-doc
    * type-token ratio, duplicated-3-gram fraction, and the share of
    * 2-grams taken by the single most frequent 2-gram. Degenerate
    * machine-generated or boilerplate text scores high on dup3/top2
    * and low on TTR; the flag is the standard "drop if dominated by
    * repetition" gate.
    *
    * Scale: TTR and dup3 are pure per-row array expressions (no
    * shuffle). top2 needs one explode + groupBy(doc_id, gram) — the
    * key includes doc_id, so cardinality is rows×doc-length with
    * near-uniform distribution: no hot keys, one well-behaved
    * shuffle. (Docs here have ≥10 tokens; the <n short-shingle
    * fallback never fires at any SF — see TESTDATA.md.)
    */
  def t11_repetition: Q = (s, d) => {
    import graft.functions.TextHashFunctions.word_shingles
    val base = Tables.documents(s, d).select(
      col("doc_id"),
      toks.as("toks"),
      word_shingles(toks, 2).as("g2"),
      word_shingles(toks, 3).as("g3"))
    val top2 = base.select(col("doc_id"), explode(col("g2")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top2_cnt"))
    base.join(top2, Seq("doc_id"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        // rhalfup, not round: pure integer ratios — see Tables.rhalfup
        graft.Tables.rhalfup(
          size(array_distinct(col("toks"))) / size(col("toks")), 6).as("ttr"),
        graft.Tables.rhalfup(
          lit(1.0) - size(array_distinct(col("g3"))) / size(col("g3")), 6)
          .as("dup3_frac"),
        graft.Tables.rhalfup(col("top2_cnt") / size(col("g2")), 6).as("top2_frac"))
      .withColumn("repetitive",
        col("dup3_frac") > 0.05 || col("top2_frac") > 0.1)
      .orderBy(col("doc_id"))
  }

  /** t12 — PII scrubbing: redact emails, phone numbers, and IPv4
    * addresses with typed placeholders, counting each redaction. The
    * corpus text carries no PII, so the query injects a deterministic
    * doc_id-derived contact line first — the oracle mirrors the
    * injection, making the scrub itself (three regexes, Java and RE2
    * compatible: no backreferences or lookarounds) the thing under
    * test. Output pins the scrubbed text by md5 so a single missed or
    * extra replacement anywhere fails the hash.
    *
    * Scale: map-only — three regexp_replace + three regexp_extract_all
    * per row inside whole-stage codegen; nothing shuffles but the
    * final per-doc projection.
    */
  def t12_pii_scrub: Q = (s, d) => {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phonePat = "\\b555-[0-9]{4}\\b"
    val ipPat = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val injected = concat(col("text"),
      lit(" contact user"), col("doc_id").cast(StringType),
      lit("@example.com or call 555-"),
      lpad((col("doc_id") % 10000).cast(StringType), 4, "0"),
      lit(" ip 10.0."), (col("doc_id") % 256).cast(StringType), lit(".1"))
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(injected, emailPat, "<EMAIL>"),
        ipPat, "<IP>"),
      phonePat, "<PHONE>")
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(regexp_extract_all(injected, lit(emailPat), lit(0)))
          .as("n_emails"),
        size(regexp_extract_all(injected, lit(ipPat), lit(0))).as("n_ips"),
        size(regexp_extract_all(injected, lit(phonePat), lit(0)))
          .as("n_phones"),
        length(scrubbed).as("n_chars_clean"),
        md5(scrubbed).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** d11 — mixture rebalancing (temperature sampling): downsample each
    * language stratum toward the smallest one at temperature α=0.5 —
    * keep rate √(n_min/n_lang) — via the same deterministic Knuth-hash
    * coin as q44/q49, so the sample is reproducible on any engine and
    * any partitioning. This is the "flatten the language distribution"
    * step of multilingual pre-training (upweight low-resource
    * strata); α=0.5 is the standard compromise between natural (α=1)
    * and uniform (α=0).
    *
    * Determinism: the threshold is round(√(n_min/n_l)·10⁶) — one
    * integer division, one IEEE sqrt, one round; no cross-row double
    * accumulation anywhere, so Spark and DuckDB agree bit-for-bit.
    * The membership test is pure integer arithmetic (% 2³¹ bounds the
    * product below 2⁶³ — Spark wraps silently, DuckDB would error).
    *
    * Scale: stratum stats are one tiny aggregate (5 rows) broadcast
    * back; membership is map-side integer math; the output aggregate
    * is per-stratum. One shuffle of stratum-count size — nothing
    * grows with the corpus but the IO-bound scan.
    */
  def d11_mixture_sample: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // stratum stats are tiny (one row per lang); the global min joins
    // back as a broadcast scalar (BNLJ over 1 row), not an
    // unpartitioned window that would force a single-partition sort
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("n_docs")).as("n_min"))))
      .withColumn("keep_thresh",
        round(sqrt(col("n_min") / col("n_docs")) * 1000000).cast(LongType))
      .drop("n_min")
    docs.join(broadcast(rates), Seq("lang"))
      .withColumn("keep",
        col("doc_id") % 2147483648L * 2654435761L % 4294967296L
          % 1000000L < col("keep_thresh"))
      .groupBy(col("lang"), col("n_docs"), col("keep_thresh"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("realized_rate",
        graft.Tables.rhalfup(col("n_kept") / col("n_docs"), 6))
      .orderBy(col("lang"))
  }

  /** t13 — sequence packing: greedily pack documents into fixed-size
    * (2048-token) training sequences in deterministic (doc_id) order,
    * reporting per-bin document count and fill. Packing is what turns
    * a curated corpus into actual pre-training batches; the bin
    * assignment floor(start_offset / 2048) reproduces the standard
    * greedy concat-and-slice packer (a doc belongs to the bin where
    * it starts).
    *
    * Scale: the running offset is a window cumsum partitioned by
    * (source, doc_id % 16) — the shard term exists purely to keep the
    * window keys numerous and uniform at cluster scale; a bare
    * per-source window would serialize each source's 100 TB slice
    * through one task. One shuffle for the window, one bounded
    * aggregate after. All arithmetic is exact integers (token counts
    * < 2^52, so the /2048.0 floor is exact in ieee754 on both
    * engines).
    */
  def t13_seq_pack: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        (col("doc_id") % 16).as("shard"),
        size(toks).cast(LongType).as("n_toks"))
      .withColumn("cum", sum(col("n_toks")).over(w))
      .withColumn("bin",
        floor((col("cum") - col("n_toks")) / lit(2048.0)).cast(LongType))
      .groupBy(col("source"), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      // rhalfup is ESSENTIAL here: n_tokens/2048 is dyadic, so ·1e6
      // lands exactly on representable halves whenever
      // n_tokens ≡ 16 (mod 32) — see Tables.rhalfup
      .withColumn("fill", graft.Tables.rhalfup(col("n_tokens") / lit(2048.0), 6))
      .orderBy(col("source"), col("shard"), col("bin"))
  }

  /** t14 — LM-novelty quality score: rate each document by the share
    * of its bigrams that are globally rare (corpus count ≤ 2) — the
    * integer-exact stand-in for perplexity-based quality filtering
    * (a doc made of bigrams the corpus LM has barely seen is exactly
    * a doc the LM finds surprising). Integer counts and one division
    * keep it bit-identical cross-engine, where a log-prob sum would
    * drift in the last ulp between libm implementations.
    *
    * Scale: same profile as t08's TF-IDF — one bigram-count shuffle
    * (uniform key space), one join of doc-bigrams to counts (same
    * key), one per-doc aggregate. No hot keys: the count table is
    * per-bigram, not per-token-prefix.
    */
  def t14_lm_quality: Q = (s, d) => {
    import graft.functions.TextHashFunctions.word_shingles
    val bigrams = Tables.documents(s, d)
      .select(col("doc_id"), explode(word_shingles(toks, 2)).as("bg"))
    val counts = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("n"))
    bigrams.join(counts, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("n") <= 2, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("rare_rate",
        graft.Tables.rhalfup(col("n_rare") / col("n_bigrams"), 6))
      .withColumn("novel", col("rare_rate") > 0.5)
      .orderBy(col("doc_id"))
  }

  /** d12 — incremental-delivery dedup: accept or reject a new delivery
    * (the deterministic doc_id % 10 == 7 slice stands in for today's
    * crawl) against the existing corpus by exact content fingerprint.
    * This is the day-2 shape of d01: the corpus is already deduped,
    * and each new delivery must be screened against it without
    * re-deduping the world.
    *
    * Scale: the corpus side reduces to DISTINCT fingerprints (one
    * md5 per doc — 16 bytes/row, not the text); the left join
    * shuffles both sides by fingerprint, a uniform key. At a real
    * 100 TB corpus the fingerprint set is persisted once (bucketed by
    * fp) and each daily delivery joins against it shuffle-free on the
    * corpus side.
    */
  def d12_incremental_dedup: Q = (s, d) => {
    val docs = Tables.documents(s, d).withColumn("fp", md5(col("text")))
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      .select(col("fp")).distinct().withColumn("__seen", lit(1))
    docs.filter(col("doc_id") % 10 === 7)
      .join(corpus, Seq("fp"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_new"),
        sum(when(col("__seen").isNotNull, 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_accepted"))
      .orderBy(col("source"))
  }

  /** d14 — SCD2 history build: compress the events change feed into
    * type-2 slowly-changing-dimension rows — per user, one row per
    * STATE RUN (consecutive events with the same event_type), with
    * [valid_from, valid_to) microsecond validity intervals, a version
    * sequence, and an is_current flag on the open row. This is the
    * merge/upsert shape every warehouse dimension load runs; built
    * declaratively it is change-detect (lag) → filter → interval
    * close (lead), and both windows share one (user_id)-clustered
    * sort, so the whole history build costs a single shuffle at any
    * scale. The oracle mirrors the two windows verbatim.
    */
  def d14_scd2: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val changes = Tables.events(s, d)
      .withColumn("ts_us", call_function("div", col("ts_ns"), lit(1000L)))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
    changes
      .select(col("user_id"), col("event_type").as("state"),
        col("ts_us").as("valid_from"),
        lead(col("ts_us"), 1).over(w).as("valid_to"),
        row_number().over(w).as("version"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col("user_id"), col("version"))
  }

  /** t17 — deterministic training-export shard plan: every document is
    * assigned a shard by a multiplicative hash of its id (Knuth's
    * 2654435761 mod 2³², then mod nShards) and a position within the
    * shard by hash order — a reproducible global shuffle with no RNG
    * state, so any two runs (or engines) agree on every byte of every
    * shard. `cum_tokens` is the running token budget the writer uses to
    * roll shard files at a size target.
    *
    * Scale shape: the hash is a map-only expression; the only shuffle
    * is partitionBy(shard), and position/cum_tokens are one window per
    * shard — t13's sharded-cumsum pattern, so keys stay numerous (in
    * production nShards is thousands, not 8) and no executor ever sees
    * more than one shard. The id is folded mod 2³¹ BEFORE the multiply
    * so the product stays inside int64 at any id scale: an unbounded
    * doc_id past ~3.46e9 would overflow — Spark wraps silently while
    * the SQL oracle raises on BIGINT overflow, so engine and oracle
    * would diverge exactly at the billion-doc scale this op targets.
    */
  def t17_shards: Q = (s, d) => shardPlan(Tables.documents(s, d))

  private[graft] def shardPlan(docs: DataFrame, nShards: Int = 8): DataFrame = {
    val h = pmod(col("doc_id") % 2147483648L * lit(2654435761L),
      lit(4294967296L))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    docs
      .select(col("doc_id"),
        size(array_remove(split(col("text"), "\\s+"), "")).as("n_tokens"))
      .withColumn("h", h)
      .withColumn("shard", (col("h") % nShards).cast(IntegerType))
      .withColumn("pos", row_number().over(w))
      .withColumn("cum_tokens",
        sum(col("n_tokens").cast(LongType)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("shard"), col("pos"),
        col("n_tokens"), col("cum_tokens"))
      .orderBy(col("shard"), col("pos"))
  }

  /** d20 — decontamination against a BLOOM SKETCH of the benchmark
    * n-grams: the scale escape hatch [[D10MaxBenchGrams]]'s doc
    * promises. Where d10 broadcasts the literal gram strings (fine for
    * a real eval suite, capped at 2M grams ≈ 100 MB), d20 folds the
    * benchmark into a fixed 8M-bit bloom filter (1 MB broadcast
    * REGARDLESS of gram count) and probes it with `might_contain` on
    * the corpus side — no join at all, one scalar-subquery broadcast
    * and a map-only probe pass.
    *
    * Semantics: a bloom can only over-report (false positives, rate
    * set by bits/items), never under-report — so every d10-contaminated
    * doc is d20-flagged, and the overlap estimate upper-bounds the
    * exact one. CurationSpec pins both properties. Rows-only (the
    * bloom layout is engine-specific — no DuckDB oracle can exist).
    */
  def d20_bloom_decontam: Q = (s, d) =>
    bloomDecontam(Tables.documents(s, d))

  private[graft] def bloomDecontam(documents: DataFrame): DataFrame = {
    import graft.functions.TextHashFunctions.word_shingles
    // bloom_filter_agg / might_contain are internal expressions (the
    // registry only resolves them for InjectRuntimeFilter), so build
    // them directly through the classic-mode bridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
    def xx(c: org.apache.spark.sql.Column) = new XxHash64(Seq(expression(c)))
    val docs = documents
      .select(col("doc_id"),
        array_distinct(word_shingles(toks, 5)).as("grams"))
    // expectedItems sized at the d10 cap; 8M bits → <1% fp at 1M items
    val bloom = docs.filter(col("doc_id") % 31 === 0)
      .select(explode(col("grams")).as("g")).distinct()
      .agg(column(new BloomFilterAggregate(xx(col("g")),
        Literal(1000000L), Literal(8388608L)).toAggregateExpression()).as("bf"))
    // might_contain requires its bloom input as a scalar subquery (the
    // same wiring InjectRuntimeFilter emits): the 1 MB filter is
    // computed once and shipped as a query-result literal — not a join
    val bf = ScalarSubquery(bloom.queryExecution.analyzed)
    docs.filter(col("doc_id") % 31 =!= 0)
      .select(col("doc_id"), explode(col("grams")).as("g"))
      .select(col("doc_id"),
        when(column(BloomFilterMightContain(bf, xx(col("g")))),
          1L).otherwise(0L).as("hit"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("hit")).as("n_hits_est"))
      .withColumn("overlap_est",
        graft.Tables.rhalfup(col("n_hits_est") / col("n_grams"), 6))
      .withColumn("flagged", col("overlap_est") >= 0.05)
      .orderBy(col("doc_id"))
  }

  /** t22 — DSIR-style importance weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"):
    * hashed bag-of-n-gram features (unigrams + bigrams → 1024
    * buckets via an md5-prefix hash both engines parse identically),
    * target distribution = the corpus's `lang = 'en'` slice, raw =
    * the whole corpus. Per-doc weight = Σ_b c_b · log λ_b where
    * λ_b = (t_b+1)(N_r+B) / ((r_b+1)(N_t+B)) is the add-one-smoothed
    * target/raw likelihood ratio of bucket b. log λ_b is floored to
    * integer micro-units (t19's pattern) so the per-doc sum is exact
    * in any partition order; `selected` = weight > 0 ("looks more
    * target-like than raw-like") needs no global sort.
    *
    * Scale: the feature explode is one map-side pass (persisted —
    * three consumers); bucket stats are a ≤1024-row agg broadcast
    * back over the features; the per-doc rollup is one doc_id-keyed
    * shuffle. Linear in token count at any corpus size.
    */
  def t22_dsir: Q = (s, d) => dsirWeights(Tables.documents(s, d))

  private[graft] def dsirWeights(docs: DataFrame,
                                 nBuckets: Int = 1024): DataFrame = {
    val toksCol = array_remove(split(lower(col("text")), "\\s+"), "")
    val feats = graft.CacheScope.persisted(
      docs.select(col("doc_id"), col("lang"), toksCol.as("toks"))
        .select(col("doc_id"), col("lang"), explode(concat(
          col("toks"),
          expr("""zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),
                 |         slice(toks, 2, greatest(size(toks) - 1, 0)),
                 |         (a, b) -> concat(a, ' ', b))""".stripMargin)))
          .as("f"))
        .select(col("doc_id"), col("lang"),
          (conv(substring(md5(col("f")), 1, 6), 16, 10).cast(LongType)
            % nBuckets).as("b")))
    // corpus totals are column sums of the ≤1024-row bucket table —
    // no second pass over the feature explode
    val buckets = graft.CacheScope.persisted(
      feats.groupBy(col("b"))
        .agg(count(lit(1)).as("rb"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tb")))
    val totals = buckets.agg(sum(col("rb")).as("nr"), sum(col("tb")).as("nt"))
    val lr = buckets
      .crossJoin(broadcast(totals))
      .select(col("b"),
        floor(log((col("tb") + 1.0) * (col("nr") + nBuckets) /
          ((col("rb") + 1.0) * (col("nt") + nBuckets))) * 1e6)
          .cast(LongType).as("lr_micro"))
    feats.join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lr_micro")).as("wm"))
      .select(col("doc_id"), col("n_feats"),
        (col("wm") / 1e6).as("weight"),
        (col("wm") > 0L).as("selected"))
      .orderBy(col("doc_id"))
  }

  /** t24 — learned quality-classifier scoring (the GPT-3-pipeline
    * "quality filter", Brown et al. 2020 Appendix A): train a
    * multinomial Naive-Bayes classifier over hashed bag-of-n-gram
    * features (unigrams + bigrams → 4096 md5 buckets, t22's feature
    * space) with the curated sources (numeric suffix % 5 == 0, i.e.
    * src0/src5/src10/src15) as positives and the rest negative, score
    * EVERY document by its mean per-feature log-odds, and keep it by
    * the published Pareto rule — keep iff a Pareto(α=9) sample
    * exceeds 1 − score — made deterministic by drawing the sample
    * through d11's Knuth-hash coin on doc_id.
    *
    * Everything that crosses the Spark/DuckDB boundary is floored
    * integer micro-units (log-odds, the sigmoid, the Pareto
    * quantile), so the keep decision is an exact int64 comparison in
    * both engines — no float drift can flip it.
    *
    * Scale: one feature explode (persisted — the bucket stats and the
    * scoring join both read it), a ≤4096-row weight table broadcast
    * back over it, one doc_id-keyed rollup; the coin and the Pareto
    * quantile are map-only arithmetic. Same linear shape as t22 at
    * any corpus size: training is a fixed-width aggregate, inference
    * is a broadcast hash join inside the scan pass.
    */
  def t24_quality_classifier: Q = (s, d) =>
    classifierScores(Tables.documents(s, d))

  private[graft] def classifierScores(docs: DataFrame,
                                      nBuckets: Int = 4096): DataFrame = {
    val toksCol = array_remove(split(lower(col("text")), "\\s+"), "")
    val posCol = substring(col("source"), 4, 10).cast(IntegerType) % 5 === 0
    val feats = graft.CacheScope.persisted(
      docs.select(col("doc_id"), posCol.as("pos"), toksCol.as("toks"))
        .select(col("doc_id"), col("pos"), explode(concat(
          col("toks"),
          expr("""zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),
                 |         slice(toks, 2, greatest(size(toks) - 1, 0)),
                 |         (a, b) -> concat(a, ' ', b))""".stripMargin)))
          .as("f"))
        .select(col("doc_id"), col("pos"),
          (conv(substring(md5(col("f")), 1, 6), 16, 10).cast(LongType)
            % nBuckets).as("b")))
    val buckets = graft.CacheScope.persisted(
      feats.groupBy(col("b"))
        .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("pb"),
          sum(when(col("pos"), 0L).otherwise(1L)).as("nb")))
    val totals = buckets.agg(sum(col("pb")).as("np"), sum(col("nb")).as("nn"))
    val weights = buckets
      .crossJoin(broadcast(totals))
      .select(col("b"),
        floor(log((col("pb") + 1.0) * (col("nn") + nBuckets) /
          ((col("nb") + 1.0) * (col("np") + nBuckets))) * 1e6)
          .cast(LongType).as("w_micro"))
    feats.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w_micro")).as("sw"))
      .select(col("doc_id"), col("n_feats"),
        floor(col("sw").cast(DoubleType) / col("n_feats"))
          .cast(LongType).as("mean_micro"))
      .select(col("doc_id"), col("n_feats"), col("mean_micro"),
        floor(lit(1e6) / (lit(1.0) + exp(-col("mean_micro") / 1e6)))
          .cast(LongType).as("s_micro"),
        floor((pow(lit(1.0) - (col("doc_id") % 2147483648L * 2654435761L
          % 4294967296L % 1000000L) / 1e6, lit(-1.0 / 9.0)) - 1.0) * 1e6)
          .cast(LongType).as("p_micro"))
      .select(col("doc_id"), col("n_feats"),
        (col("mean_micro") / 1e6).as("logodds"),
        (col("s_micro") / 1e6).as("score"),
        (col("p_micro") > lit(1000000L) - col("s_micro")).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** p01 — the preprocessing pipeline END TO END as ONE declarative
    * plan: d08's curation gates (canonical-fingerprint dedup + lang +
    * length + punctuation) → near-dup pruning over d04's verified
    * Jaccard pairs (d15's order-independent rule: drop any doc with a
    * lower-id near-dup, whatever that neighbor's own fate) → d10's
    * benchmark decontamination (benchmark slice leaves the corpus,
    * contaminated survivors dropped) → d11's per-language mixture
    * coin over the CLEAN corpus → t13's greedy sequence packing of
    * what remains. The composite is what a training-data run actually
    * executes; expressing it as one plan lets Catalyst pipeline the
    * gates into the scans and share the curated intermediate across
    * stages, instead of five materialization barriers.
    *
    * Every stage is the proven operator's exact formula (same
    * thresholds, same coins), so the oracle chains the same CTEs the
    * per-stage oracles use — including d04's pair body re-rooted at
    * the curated CTE. Scale = the max of its stages: d04's prefix
    * filter dominates; every other stage is map-side or
    * stratum-bounded.
    */
  def p01_pipeline: Q = (s, d) => {
    import graft.functions.TextHashFunctions.word_shingles
    val docs = Tables.documents(s, d)
    // stage 1: curate (d08's gates, keeping source/lang/text for later)
    val nTokW = size(split(col("text"), "\\s+"))
    val nChars = length(col("text"))
    val nPunct = size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0)))
    val fpc = md5(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
    val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    // eager lineage cut (not persist): curated is referenced by the
    // d04 pair build, the anti-join, and the decontam stage — uncut,
    // every downstream action re-analyzes this window + predLang
    // expression tree before cache substitution (see p03Stages)
    val curated = graft.CacheScope.checkpointed(
      docs
        .select(col("doc_id"), col("source"), col("lang"), col("text"),
          fpc.as("fp"), nTokW.as("n_tokens"),
          // try_divide: empty-text rows NULL (and fail the gate)
          // instead of ANSI-throwing — mirrors DuckDB x/0
          graft.Tables.rhalfup(try_divide(nPunct.cast(DoubleType),
            nChars.cast(DoubleType)), 6)
            .as("punct_ratio"),
          TextAnalysis.predLangCol(lower(col("text"))).as("pred_lang"))
        .withColumn("rn", row_number().over(wFp))
        .filter(col("rn") === 1 && col("pred_lang") =!= "und" &&
          col("n_tokens") >= 5 && col("punct_ratio") < 0.2)
        .select(col("doc_id"), col("source"), col("lang"), col("text"),
          col("pred_lang")))
    // stage 2: near-dup prune (d04 pairs over the curated corpus)
    val dominated = Dedup.ngramJaccardPairs(
        curated.select(col("doc_id"), col("source"), col("lang"), col("text")))
      .select(col("id_b").as("doc_id")).distinct()
    val deduped = curated.join(dominated, Seq("doc_id"), "left_anti")
    // stage 3: decontam (d10's gram overlap vs the doc_id%31 benchmark
    // slice of the ORIGINAL corpus; benchmark docs leave the corpus)
    val gramsOf = array_distinct(word_shingles(toks, 5))
    // persisted: the count gate materializes the cache the broadcast
    // build reads — one benchmark gram pipeline, not two (§2.4)
    val bench = graft.CacheScope.persisted(
      docs.filter(col("doc_id") % 31 === 0)
        .select(explode(gramsOf).as("g")).distinct()
        .withColumn("__hit", lit(1)))
    val nBench = bench.count()
    require(nBench <= D10MaxBenchGrams,
      s"p01 benchmark n-gram set has $nBench distinct grams > cap " +
        s"$D10MaxBenchGrams — shrink the benchmark or sketch it (d20)")
    val cleanIds = deduped.filter(col("doc_id") % 31 =!= 0)
      .select(col("doc_id"), explode(gramsOf).as("g"))
      .join(broadcast(bench), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hits"))
      .filter(graft.Tables.rhalfup(col("n_hits") / col("n_grams"), 6) < 0.05)
      .select(col("doc_id"))
    // persisted stage boundary — cheap to re-analyze now that curated
    // is lineage-cut above; see p03Stages' stage-boundary note
    val clean = graft.CacheScope.persisted(
      deduped.join(cleanIds, Seq("doc_id")))
    // stage 4: mixture (d11's coin, stratified by PREDICTED language
    // over the clean corpus — the pipeline samples what it curated)
    val counts = clean.groupBy(col("pred_lang")).agg(count(lit(1)).as("n_docs"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("n_docs")).as("n_min"))))
      .withColumn("keep_thresh",
        round(sqrt(col("n_min") / col("n_docs")) * 1000000).cast(LongType))
      .select(col("pred_lang"), col("keep_thresh"))
    val sampled = clean.join(broadcast(rates), Seq("pred_lang"))
      .filter(col("doc_id") % 2147483648L * 2654435761L % 4294967296L
        % 1000000L < col("keep_thresh"))
    // stage 5: pack (t13's greedy bins over the sampled survivors)
    val wPack = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sampled
      .select(col("doc_id"), col("source"),
        (col("doc_id") % 16).as("shard"),
        size(toks).cast(LongType).as("n_toks"))
      .withColumn("cum", sum(col("n_toks")).over(wPack))
      .withColumn("bin",
        floor((col("cum") - col("n_toks")) / lit(2048.0)).cast(LongType))
      .groupBy(col("source"), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("fill", graft.Tables.rhalfup(col("n_tokens") / lit(2048.0), 6))
      .orderBy(col("source"), col("shard"), col("bin"))
  }

  /** p03 — the full training-data build, end to end: the capstone
    * composite a 100 TB pretraining run would actually execute, every
    * stage the EXACT formula of its proven standalone operator so the
    * oracle chains the same CTE fragments:
    *   1. curate — p01's stage 1 (quality gates + exact-dup
    *      first-wins);
    *   2. canonical rewrite — d29 over the curated corpus: near-dup
    *      clusters keep their best-QUALITY member (upgrading p01's
    *      keep-min-id prune);
    *   3. decontam — d10's gram-overlap gate vs the held-out
    *      benchmark slice;
    *   4. mixture — d11's Knuth-coin language rebalance;
    *   5. span scrub — d30 over the sampled survivors (duplicate
    *      8-gram spans removed; clean token counts, the reconstructed
    *      text column is pruned away — only counts flow on);
    *   6. shard + pack — t17's hash sharding with t13's 2048-token
    *      bin packing over the CLEAN token counts.
    * Output: the per-doc train manifest (shard, position, clean
    * tokens, bin) — one row per surviving doc, ordered by (shard,
    * pos).
    *
    * Scale = the max of its stages (d04's prefix-filtered pair build
    * inside d29 dominates); stage boundaries persist via CacheScope,
    * the benchmark broadcast is count-guarded, and the manifest
    * windows partition by shard — nothing here is new plan shape,
    * which is the point: the capstone is composition, not invention.
    */
  def p03_training_build: Q = (s, d) => {
    val (_, scrub) = p03Stages(s, d)
    p03Manifest(scrub)
  }

  /** p03's stages 1–5 (curate → d29 canonical rewrite → d10 decontam
    * → d11 mixture → d30 span scrub), shared verbatim by [[
    * p03_training_build]] and [[p06_epoch_build]]. Returns (sampled,
    * scrub): the post-mixture survivors with their metadata, and the
    * per-doc CLEAN token counts. One source for the formulas so the
    * two capstones cannot drift — the same rule the oracle side keeps
    * with [[p03OracleStages]]. */
  private[graft] def p03Stages(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import graft.functions.TextHashFunctions.word_shingles
    val docs = Tables.documents(s, d)
    // stage 1: curate (p01 stage-1 formulas verbatim)
    val nTokW = size(split(col("text"), "\\s+"))
    val nChars = length(col("text"))
    val nPunct = size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0)))
    val fpc = md5(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
    val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    // eager lineage cut: curated is referenced by ≥4 downstream plans
    // (the d29 pair build, the canonical join, and through them every
    // later stage); uncut, each reference re-analyzes the window +
    // predLang expression tree per action — see the stage-boundary
    // note at `clean` below
    val curated = graft.CacheScope.checkpointed(
      docs
        .select(col("doc_id"), col("source"), col("lang"), col("text"),
          fpc.as("fp"), nTokW.as("n_tokens"),
          graft.Tables.rhalfup(try_divide(nPunct.cast(DoubleType),
            nChars.cast(DoubleType)), 6)
            .as("punct_ratio"),
          TextAnalysis.predLangCol(lower(col("text"))).as("pred_lang"))
        .withColumn("rn", row_number().over(wFp))
        .filter(col("rn") === 1 && col("pred_lang") =!= "und" &&
          col("n_tokens") >= 5 && col("punct_ratio") < 0.2)
        .select(col("doc_id"), col("source"), col("lang"), col("text"),
          col("pred_lang")))
    // stage 2: canonical rewrite (d29 over the curated corpus — keep
    // each near-dup cluster's best-quality member)
    val canonIds = Dedup.canonicalize(
        curated.select(col("doc_id"), col("source"), col("lang"), col("text")))
      .filter(col("is_canonical")).select(col("doc_id"))
    val canonical = curated.join(canonIds, Seq("doc_id"))
    // stage 3: decontam (d10's gate vs the doc_id%31 benchmark slice
    // of the ORIGINAL corpus; benchmark docs leave the corpus)
    val gramsOf = array_distinct(word_shingles(toks, 5))
    // persisted: the count gate materializes the cache the broadcast
    // build reads — one benchmark gram pipeline, not two (§2.4)
    val bench = graft.CacheScope.persisted(
      docs.filter(col("doc_id") % 31 === 0)
        .select(explode(gramsOf).as("g")).distinct()
        .withColumn("__hit", lit(1)))
    val nBench = bench.count()
    require(nBench <= D10MaxBenchGrams,
      s"p03 benchmark n-gram set has $nBench distinct grams > cap " +
        s"$D10MaxBenchGrams — shrink the benchmark or sketch it (d20)")
    val cleanIds = canonical.filter(col("doc_id") % 31 =!= 0)
      .select(col("doc_id"), explode(gramsOf).as("g"))
      .join(broadcast(bench), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hits"))
      .filter(graft.Tables.rhalfup(col("n_hits") / col("n_grams"), 6) < 0.05)
      .select(col("doc_id"))
    // persisted stage boundary: with `curated` lineage-cut above, the
    // remaining stage-2/3 subtree is cheap to re-analyze, and keeping
    // it a persist (not a cut) leaves the broadcast-decontam plan
    // shape visible to PlanSpec's pins. (The r13 probe measured the
    // UNCUT disease: every downstream action re-analyzed the whole
    // stage-1..3 tree at ~2-3 s of driver planning per action, and the
    // p06 final plan printed at 2.98 MB from the cloned subtree — the
    // `curated` cut above and the `scrub` cut in p06 remove that.)
    val clean = graft.CacheScope.persisted(
      canonical.join(cleanIds, Seq("doc_id")))
    // stage 4: mixture (d11's coin, stratified by predicted language)
    val counts = clean.groupBy(col("pred_lang")).agg(count(lit(1)).as("n_docs"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("n_docs")).as("n_min"))))
      .withColumn("keep_thresh",
        round(sqrt(col("n_min") / col("n_docs")) * 1000000).cast(LongType))
      .select(col("pred_lang"), col("keep_thresh"))
    val sampled = clean.join(broadcast(rates), Seq("pred_lang"))
      .filter(col("doc_id") % 2147483648L * 2654435761L % 4294967296L
        % 1000000L < col("keep_thresh"))
    // stage 5: span scrub (d30 over the sampled survivors; selecting
    // only counts lets Catalyst prune the clean-text reconstruction)
    val scrub = Dedup.spanScrub(sampled.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        (col("n_tokens") - col("n_removed")).as("n_clean"))
    (sampled, scrub)
  }

  /** p03's stage 6: t17's hash shard + t13's 2048-token bin packing
    * over per-doc token masses. `tokenCol` is the packed mass —
    * `n_clean` for p03, the epoch-weighted `w_tokens` for p06; `extra`
    * columns ride along into the manifest. */
  private def p03Manifest(perDoc: DataFrame,
      tokenCol: String = "n_clean", extra: Seq[String] = Nil): DataFrame = {
    val wSh = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    perDoc
      .withColumn("h",
        // fold mod 2^31 before the multiply (the stage-4 hash's bound):
        // unbounded doc_id overflows int64 past ~3.46e9 — Spark wraps
        // silently, the oracle raises, and the two diverge
        pmod(col("doc_id") % 2147483648L * lit(2654435761L),
          lit(4294967296L)))
      .withColumn("shard", (col("h") % 8).cast(IntegerType))
      .withColumn("pos", row_number().over(wSh))
      .withColumn("cum_tokens",
        sum(col(tokenCol)).over(
          wSh.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("bin",
        floor((col("cum_tokens") - col(tokenCol)) / lit(2048.0)).cast(LongType))
      .select(col("doc_id") +: col("shard") +: col("pos") +:
        col("n_clean").as("n_tokens") +: extra.map(col) :+
        col("bin") :+ col("cum_tokens"): _*)
      .orderBy(col("shard"), col("pos"))
  }

  /** p06 — the epoch-aware training build: p03's capstone with p05's
    * budgeted epoch mixture composed into the manifest (the loop p04
    * closed for s17, closed here for p05). Stages 1–5 are p03's
    * verbatim ([[p03Stages]]); then, instead of packing each surviving
    * document once, the per-SOURCE repeat plan is computed OVER THE
    * CLEAN SURVIVORS — budget = 2× the clean token mass, stratum
    * shares ∝ √tokens (α = 0.5 temperature), epochs capped at 4, the
    * fractional epoch landing as p05's deterministic per-doc coin —
    * and the manifest packs each document at its epoch-weighted mass.
    * Two deliberate departures from p05's knobs, both measured:
    * the stratum is `source`, not language — p03's stage-1 gate plus
    * the stage-4 mixture leave a single predicted-language stratum at
    * every test SF, so a language split would be vacuous here (and
    * domain/source mixtures are what epoch budgeting tunes in
    * practice — the DoReMi/data-constrained shape); and the budget is
    * 2×, not 4× — over post-mixture near-equal strata a 4× budget
    * collapses to "cap everyone at 4 epochs", while 2× lands the
    * per-stratum epochs in the fractional regime the coin exists
    * for, with the cap still guarding pathological small strata.
    * `w_tokens = n_clean · repeat_factor`, emitting `repeat_factor`
    * per row (zero-repeat docs leave the manifest). The bins a
    * training run reads now realize the epoch plan instead of
    * silently ignoring it.
    *
    * Scale = p03's (stages 1–5 dominate); the epoch plan adds one
    * |langs|-row aggregate broadcast back and a map-side coin —
    * p05's own shape.
    */
  def p06_epoch_build: Q = (s, d) => {
    val (sampled, scrub0) = p03Stages(s, d)
    // eager lineage CUT, consumed TWICE (the per-source token aggregate
    // that prices the epoch plan, and the repeat join) — unpersisted,
    // each consumer re-runs the d30 span-scrub pipeline (a full
    // duplicate corpus pass at 100 TB). A bare persist() shares the
    // DATA but not the PLAN: the r13 probe measured each consumer
    // action re-analyzing the whole stage-1..5 tree at ~2-3 s of
    // driver planning before the cache substitutes (guide §7.3's
    // planning-dominated driver stall), and p06's final plan printed
    // at 2.98 MB from the cloned subtree. The cut makes consumers
    // LogicalRDD scans: full p06 34.3 s -> ~20 s at sf0.1.
    val scrub = graft.CacheScope.checkpointed(
      scrub0.join(sampled.select(col("doc_id"), col("source")),
        Seq("doc_id")))
    val bySrc = scrub.groupBy(col("source"))
      .agg(sum(col("n_clean")).as("src_tokens"))
      .withColumn("sq", floor(sqrt(col("src_tokens"))).cast(LongType))
    val totals = bySrc.agg(sum(col("src_tokens")).as("total_tokens"),
      sum(col("sq")).as("sq_sum"))
    val rates = bySrc.crossJoin(broadcast(totals))
      .withColumn("epochs_micro",
        floor(least(expr("total_tokens * 2").cast(DoubleType) * col("sq")
          / col("sq_sum") / col("src_tokens"), lit(4.0)) * 1000000L + 0.5)
          .cast(LongType))
      .select(col("source"), col("epochs_micro"))
    val rep = scrub.join(broadcast(rates), Seq("source"))
      .withColumn("coin",
        col("doc_id") % 2147483648L * 2654435761L % 4294967296L % 1000000L)
      .withColumn("repeat_factor",
        floor(col("epochs_micro") / 1000000.0).cast(LongType) +
          when(col("coin") < col("epochs_micro") % 1000000L, 1L)
            .otherwise(0L))
      .filter(col("repeat_factor") > 0)
      .withColumn("w_tokens", col("n_clean") * col("repeat_factor"))
      .select(col("doc_id"), col("n_clean"), col("repeat_factor"),
        col("w_tokens"))
    p03Manifest(rep, tokenCol = "w_tokens",
      extra = Seq("repeat_factor", "w_tokens"))
  }

  /** p07 — the end-to-end SERVING pipeline: the batch/serve split as
    * one declarative chain, proving the three jobs compose.
    *   1. BUILD JOB — [[p06_epoch_build]]'s full epoch-aware training
    *      build; its manifest's distinct doc ids are the curated set;
    *   2. INDEX JOB — the serving index (IVF cells + symmetrized,
    *      bridged per-cell graph) over the curated documents'
    *      embeddings (vec_id = doc_id, m04's join convention),
    *      materialized as a fingerprint-gated
    *      [[graft.sources.IndexStore]] artifact — the saved-index leg;
    *   3. QUERY JOB — s23's probe-rank + per-cell beam + exact fuse
    *      reading that artifact.
    * Every stage is the proven standalone operator's exact formula,
    * so the oracle chains p06's committed CTEs (as a scoped subquery)
    * into the s23 stack re-targeted at the slice — one hash check
    * across the whole build → save → serve composition.
    *
    * Scale = p06's (its stages dominate) + the index build over the
    * curated slice; the query job on a warm artifact is s25's
    * bounded probe work. The semi-join slice is doc-keyed — no new
    * shuffle shape.
    */
  /** p08 — the full RAG data pipeline closed end to end: p06's curated
    * epoch build → the standing serving index over the curated slice
    * (p07's artifact, same key — the two pipelines share one saved
    * index for one corpus state) → [[Retrieval.s33_hybrid_rrf]]'s
    * hybrid retrieval, with BOTH arms re-targeted at the survivors:
    * the dense ranking probes the slice-built artifact, the sparse
    * rare-shingle ranking reads only kept documents. The oracle chains
    * p06's committed text, the slice CTEs, the s23 stack on the slice,
    * and the hybrid body on the kept docs — curation, index lifecycle,
    * and rank fusion under ONE hash check at every SF.
    *
    * Scale = p06's + the slice index build + s33's bounded query
    * work; both slice joins are doc-keyed semi-joins, no new shuffle
    * shape. `kept` is lineage-cut once and shared by both arms (the
    * p07 plan-cloning lesson). */
  def p08_hybrid_pipeline: Q = (s, d) => {
    val kept = graft.CacheScope.checkpointed(
      p06_epoch_build(s, d).select(col("doc_id")).distinct())
    val slice = graft.CacheScope.checkpointed(
      Tables.embeddings(s, d)
        .join(kept.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"),
          "left_semi"))
    val (cents, asg, entries, graph) =
      graft.sources.IndexStore.ensureCellIndex(s, s"${d}_p07", slice,
        nCells = Similarity.IvfNCells) // oracle fixture sizing — pinned
    val ann = Similarity.cellProbeSearchOn(cents, asg, entries, graph,
      asgRows = graft.sources.IndexStore.corpusRows(s, s"${d}_p07")
        .getOrElse(-1L))
    val keptDocs = Tables.documents(s, d)
      .join(kept, Seq("doc_id"), "left_semi")
    Retrieval.hybridRrf(ann, keptDocs)
  }

  def p07_serving_pipeline: Q = (s, d) => {
    val kept = p06_epoch_build(s, d).select(col("doc_id")).distinct()
    // eager lineage cut: the slice is referenced by the fingerprint
    // scan and every stage of the index build — uncut, each reference
    // would clone p06's ENTIRE plan tree (measured: driver heap death
    // at 8g from plan duplication, the d25/s20 loop trap in join form)
    val slice = graft.CacheScope.checkpointed(
      Tables.embeddings(s, d)
        .join(kept.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"),
          "left_semi"))
    val (cents, asg, entries, graph) =
      graft.sources.IndexStore.ensureCellIndex(s, s"${d}_p07", slice,
        nCells = Similarity.IvfNCells) // oracle fixture sizing — pinned
    Similarity.cellProbeSearchOn(cents, asg, entries, graph,
      asgRows = graft.sources.IndexStore.corpusRows(s, s"${d}_p07")
        .getOrElse(-1L))
  }

  /** p04 — the SEMANTIC training-data build: p03's capstone shape
    * with the embedding-graph arm closing the loop. Where p03
    * canonicalizes via d29 (pair-graph clusters from textual n-gram
    * similarity), p04's canonical set comes from the semantic
    * pipeline: s14's kNN graph → s15's LPA communities → s17's
    * community-scoped keep rule, the way d29 closed d09's loop.
    *   1. curate — p01/p03's stage-1 quality gates + exact-dup
    *      first-wins (verbatim);
    *   2. semantic canonical set — keep every doc whose embedding
    *      (vec_id = doc_id, m04's join convention) survives s17's
    *      domination rule; docs with no embedding row carry no
    *      semantic signal and stay (a real deployment embeds
    *      everything, making the left join total);
    *   3. manifest — t17's hash shard + position plan over the
    *      survivors (verbatim formula, shared [[shardPlan]] code).
    * Every stage is the proven standalone operator's exact formula,
    * so the oracle chains the same CTE fragments — including the
    * whole LPA round chain ([[Similarity.lpaDomChainSql]]).
    *
    * Scale = s17's (the LPA rounds + community-capped pair join
    * dominate; the doc side adds one window and one map-only gate).
    */
  def p04_semantic_build: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // stage 1: curate (p03 stage-1 formulas verbatim)
    val nTokW = size(split(col("text"), "\\s+"))
    val nChars = length(col("text"))
    val nPunct = size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0)))
    val fpc = md5(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
    val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val curated = docs
      .select(col("doc_id"), col("text"), fpc.as("fp"), nTokW.as("n_tokens"),
        graft.Tables.rhalfup(try_divide(nPunct.cast(DoubleType),
          nChars.cast(DoubleType)), 6).as("punct_ratio"),
        TextAnalysis.predLangCol(lower(col("text"))).as("pred_lang"))
      .withColumn("rn", row_number().over(wFp))
      .filter(col("rn") === 1 && col("pred_lang") =!= "und" &&
        col("n_tokens") >= 5 && col("punct_ratio") < 0.2)
      .select(col("doc_id"), col("text"))
    // stage 2: semantic keep rule (s17 verbatim over the embeddings)
    val verdicts = Similarity
      .communityDedup(Tables.embeddings(s, d), Similarity.S17MaxExactCommunity)
      .select(col("vec_id").as("doc_id"), col("kept"))
    val canon = curated.join(verdicts, Seq("doc_id"), "left")
      .filter(coalesce(col("kept"), lit(true)))
      .select(col("doc_id"), col("text"))
    // stage 3: manifest (t17's shard plan, shared code)
    shardPlan(canon)
  }

  /** p02 — the INCREMENTAL pipeline (p01 is the bootstrap; this is
    * the daily run): a delivery slice (doc_id % 10 == 7, the d12
    * convention) screened against the STANDING corpus and a held-out
    * benchmark (doc_id % 31 == 0), each doc labeled with the first
    * gate it fails:
    *   1. `curate`  — d08's gates (lang-ID ≠ und, ≥5 tokens, punct
    *      ratio < 0.2), delivery-local, map-only;
    *   2. `exact_dup` — md5(text) already in the standing corpus
    *      (d12's screen) OR a lower-id delivery twin (first-wins);
    *   3. `near_dup` — ≥ 70% of the doc's distinct 8-grams already in
    *      the standing gram index (d23's novelty, inverted);
    *   4. `contaminated` — d10's distinct-5-gram benchmark overlap
    *      ≥ 0.05 (count-guarded broadcast, same cap);
    *   5. `kept`.
    * Every gate is the proven per-stage operator's exact formula, so
    * the oracle chains the same CTE fragments.
    *
    * Scale: work ∝ delivery size + one distinct over standing
    * fingerprints/grams (both 16-byte digests on the shuffle; at a
    * real deployment the standing fp/gram indexes are persisted once,
    * bucketed, and each delivery probes them shuffle-free on the
    * corpus side — the same note as d12/d23). The benchmark set
    * broadcasts; every verdict column is a delivery-keyed agg.
    */
  def p02_incremental: Q = (s, d) =>
    incrementalVerdicts(Tables.documents(s, d))

  private[graft] def incrementalVerdicts(documents: DataFrame): DataFrame = {
    import graft.functions.TextHashFunctions.word_shingles
    val docs = graft.CacheScope.persisted(
      documents
        .withColumn("is_bench", col("doc_id") % 31 === 0)
        .withColumn("is_delivery",
          col("doc_id") % 10 === 7 && col("doc_id") % 31 =!= 0))
    val standing = docs.filter(!col("is_delivery") && !col("is_bench"))
    val delivery = docs.filter(col("is_delivery"))
    // gate 1: d08's curation columns (p01's exact formulas)
    val nTokW = size(split(col("text"), "\\s+"))
    val nChars = length(col("text"))
    val nPunct = size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0)))
    val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val cur = delivery
      .select(col("doc_id"), col("source"), md5(col("text")).as("fp"),
        nTokW.as("n_tokens"),
        graft.Tables.rhalfup(try_divide(nPunct.cast(DoubleType),
          nChars.cast(DoubleType)), 6)
          .as("punct_ratio"),
        TextAnalysis.predLangCol(lower(col("text"))).as("pred_lang"))
      .withColumn("rn", row_number().over(wFp))
    // gate 2: standing-corpus fingerprints (d12's screen)
    val corpFp = standing.select(md5(col("text")).as("fp")).distinct()
      .withColumn("__corp", lit(1))
    // gate 3: standing 8-gram index (d23's novelty, known-side)
    val toksLower = array_remove(split(lower(col("text")), "\\s+"), "")
    def g8(df: DataFrame): DataFrame = df
      .select(col("doc_id"), toksLower.as("tk"))
      .filter(size(col("tk")) >= 8)
      .select(col("doc_id"),
        explode(array_distinct(word_shingles(col("tk"), 8))).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("gh"))
    val standingG = g8(standing).select(col("gh")).distinct()
      .withColumn("__seen", lit(1))
    val known = g8(delivery).join(standingG, Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n8"), count(col("__seen")).as("n_seen"))
      .select(col("doc_id"),
        graft.Tables.rhalfup(col("n_seen") / col("n8"), 6).as("known_frac"))
    // gate 4: benchmark 5-gram overlap (d10's formula + count guard)
    def g5(df: DataFrame): DataFrame = df.select(col("doc_id"),
      array_distinct(word_shingles(toks, 5)).as("grams"))
    // persisted: one benchmark gram pipeline for gate + broadcast (§2.4)
    val bench = graft.CacheScope.persisted(
      g5(docs.filter(col("is_bench")))
        .select(explode(col("grams")).as("g")).distinct()
        .withColumn("__hit", lit(1)))
    val nBench = bench.count()
    require(nBench <= D10MaxBenchGrams,
      s"p02 benchmark n-gram set has $nBench distinct grams > cap " +
        s"$D10MaxBenchGrams — shrink or sketch the benchmark")
    val overlap = g5(delivery)
      .select(col("doc_id"), explode(col("grams")).as("g"))
      .join(broadcast(bench), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n5"), count(col("__hit")).as("n_hits"))
      .select(col("doc_id"),
        graft.Tables.rhalfup(col("n_hits") / col("n5"), 6).as("overlap"))
    // overlap is EXPLICITLY broadcast: it is ≤ delivery-doc-count
    // rows of (doc_id, double) — provably tiny — but its size
    // ESTIMATE runs through the persisted benchmark-gram cache, whose
    // accurate (columnar) byte size inflates the chain past the
    // auto-broadcast threshold and flipped this gate to a
    // SortMergeJoin (caught by the PlanSpec pin). Guide §3.1: pick
    // the strategy deliberately when a side is provably small.
    cur.join(corpFp, Seq("fp"), "left")
      .join(known, Seq("doc_id"), "left")
      .join(broadcast(overlap), Seq("doc_id"), "left")
      .withColumn("verdict",
        when(col("pred_lang") === "und" || col("n_tokens") < 5 ||
          col("punct_ratio") >= 0.2, "curate")
          .when(col("__corp").isNotNull || col("rn") > 1, "exact_dup")
          .when(coalesce(col("known_frac"), lit(0.0)) >= 0.7, "near_dup")
          .when(coalesce(col("overlap"), lit(0.0)) >= 0.05, "contaminated")
          .otherwise("kept"))
      .select(col("doc_id"), col("source"), col("verdict"))
      .orderBy(col("doc_id"))
  }

  /** p05 — budgeted epoch mixture: turn a token budget into a per-
    * document repeat plan. Language strata get budget shares by
    * temperature sampling over token mass (α=0.5 — share ∝ √tokens,
    * d11's flatten rule applied to budgets instead of keep-rates), and
    * each stratum's share becomes an epoch count capped at 4 — past ~4
    * repetitions, additional epochs of the same data stop buying loss
    * (the data-constrained scaling result), so an over-allocated small
    * stratum is truncated rather than burned. The budget is 4× the
    * corpus — the data-constrained regime where the budget EXCEEDS the
    * unique data, so up-weighted small strata hit the repetition cap
    * while the head stratum trains under 3 epochs (both branches live
    * at every SF, since the testdata lang masses are ~3× skewed).
    * Fractional epochs land as a per-document deterministic coin (the
    * Knuth-hash idiom), so the emitted repeat_factor column IS the
    * training plan: feeding each document repeat_factor times realizes
    * the budget split exactly in expectation with zero RNG state.
    *
    * Determinism: per-stratum epochs are ONE fixed left-assoc double
    * chain (budget·√tokens/Σ√tokens/tokens) — no cross-row float
    * accumulation — micro-floored to an integer both engines agree
    * on; everything per-document is integer arithmetic.
    *
    * Scale: one per-stratum aggregate (|langs| rows) broadcast back;
    * the per-doc pass is map-side. Nothing grows beyond the scan.
    */
  def p05_epoch_mixture: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(array_remove(split(col("text"), "\\s+"), ""))
          .cast(LongType).as("n_tokens"))
    val byLang = toks.groupBy(col("lang"))
      .agg(sum(col("n_tokens")).as("lang_tokens"))
      .withColumn("sq", floor(sqrt(col("lang_tokens"))).cast(LongType))
    val totals = byLang.agg(sum(col("lang_tokens")).as("total_tokens"),
      sum(col("sq")).as("sq_sum"))
    val rates = byLang.crossJoin(broadcast(totals))
      .withColumn("budget", expr("total_tokens * 4"))
      .withColumn("epochs_micro",
        floor(least(col("budget").cast(DoubleType) * col("sq")
          / col("sq_sum") / col("lang_tokens"), lit(4.0)) * 1000000L + 0.5)
          .cast(LongType))
      .select(col("lang"), col("lang_tokens"), col("epochs_micro"))
    toks.join(broadcast(rates), Seq("lang"))
      .withColumn("coin",
        col("doc_id") % 2147483648L * 2654435761L % 4294967296L
          % 1000000L)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("epochs_micro"),
        (floor(col("epochs_micro") / 1000000.0).cast(LongType) +
          when(col("coin") < col("epochs_micro") % 1000000L, 1L)
            .otherwise(0L)).as("repeat_factor"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "p02_incremental" -> p02_incremental,
    "t22_dsir" -> t22_dsir,
    "t24_quality_classifier" -> t24_quality_classifier,
    "p01_pipeline" -> p01_pipeline,
    "p03_training_build" -> p03_training_build,
    "t17_shards" -> t17_shards,
    "d20_bloom_decontam" -> d20_bloom_decontam,
    "d14_scd2" -> d14_scd2,
    "d10_decontam" -> d10_decontam,
    "t11_repetition" -> t11_repetition,
    "t12_pii_scrub" -> t12_pii_scrub,
    "d11_mixture_sample" -> d11_mixture_sample,
    "t13_seq_pack" -> t13_seq_pack,
    "t14_lm_quality" -> t14_lm_quality,
    "d12_incremental_dedup" -> d12_incremental_dedup,
    "p04_semantic_build" -> p04_semantic_build,
    "p05_epoch_mixture" -> p05_epoch_mixture,
    "p06_epoch_build" -> p06_epoch_build,
    "p07_serving_pipeline" -> p07_serving_pipeline,
    "p08_hybrid_pipeline" -> p08_hybrid_pipeline,
  )

  /** Oracle CTE chain for p03's stages 1–5 (curate → d29 canonical
    * rewrite → d10 decontam → d11 mixture → d30 span scrub) — ONE
    * source shared by the p03 and p06 oracles, mirroring [[p03Stages]]
    * on the engine side so the capstones cannot drift. Ends at `scrub`
    * (doc_id, n_clean); `sampled` stays referencable for p06's
    * language join. Returns MARGIN-BEARING text: the consuming
    * entries interpolate it inside their own stripMargin, and a
    * second strip would eat one pipe of every `||` concat. */
  private def p03OracleStages: String = {
    val (scores, pred) = TextAnalysis.langOracleSql
    s"""WITH RECURSIVE scored AS (
         |  SELECT doc_id, source, lang, text,
         |    $scores,
         |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
         |    len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
         |    length(text) AS n_chars,
         |    len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
         |  FROM documents
         |), ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id)
         |    AS rn
         |  FROM scored
         |), curated AS MATERIALIZED (
         |  SELECT doc_id, source, lang, text, $pred AS pred_lang
         |  FROM ranked
         |  WHERE rn = 1 AND ($pred) <> 'und' AND n_tokens >= 5
         |    AND floor(CAST(n_punct AS DOUBLE) / n_chars * 1e6 + 0.5) / 1e6
         |      < 0.2
         |), pairs AS MATERIALIZED (
         |${Dedup.d04OracleBodyOn("curated")}
         |), edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs
         |), reach(id, r) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst
         |), cl AS (
         |  SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
         |), qsc AS (
         |  SELECT doc_id,
         |    floor(least(CAST(len(regexp_split_to_array(text, '\\s+'))
         |        AS DOUBLE) / 50.0, 1.0) *
         |      (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]'))
         |        AS DOUBLE) / length(text)) * 1e4 + 0.5) / 1e4
         |      AS quality_score
         |  FROM curated
         |), basec AS (
         |  SELECT q.doc_id, COALESCE(cl.cluster_id, q.doc_id) AS cluster_id,
         |    q.quality_score
         |  FROM qsc q LEFT JOIN cl USING (doc_id)
         |), canon AS (
         |  SELECT cluster_id, doc_id AS canonical_id FROM (
         |    SELECT cluster_id, doc_id, ROW_NUMBER() OVER (
         |      PARTITION BY cluster_id
         |      ORDER BY quality_score DESC, doc_id) AS rn
         |    FROM basec) WHERE rn = 1
         |), canonical AS MATERIALIZED (
         |  SELECT cu.* FROM curated cu
         |  JOIN basec b ON b.doc_id = cu.doc_id
         |  JOIN canon c ON c.cluster_id = b.cluster_id
         |  WHERE cu.doc_id = c.canonical_id
         |), tg AS (
         |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |gb AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(l) < 5 THEN [array_to_string(l, ' ')]
         |    ELSE list_transform(
         |      list_zip(l[1:len(l)-4], l[2:len(l)-3], l[3:len(l)-2],
         |               l[4:len(l)-1], l[5:len(l)]),
         |      p -> p[1]||' '||p[2]||' '||p[3]||' '||p[4]||' '||p[5])
         |    END)) AS gram
         |  FROM tg),
         |bench AS (SELECT DISTINCT gram FROM gb WHERE doc_id % 31 = 0),
         |tgc AS (
         |  SELECT cc.doc_id, string_split(cc.text, ' ') AS l
         |  FROM canonical cc WHERE cc.doc_id % 31 <> 0),
         |gc AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(l) < 5 THEN [array_to_string(l, ' ')]
         |    ELSE list_transform(
         |      list_zip(l[1:len(l)-4], l[2:len(l)-3], l[3:len(l)-2],
         |               l[4:len(l)-1], l[5:len(l)]),
         |      p -> p[1]||' '||p[2]||' '||p[3]||' '||p[4]||' '||p[5])
         |    END)) AS gram
         |  FROM tgc),
         |clean_ids AS (
         |  SELECT g.doc_id
         |  FROM gc g LEFT JOIN bench b ON g.gram = b.gram
         |  GROUP BY g.doc_id
         |  HAVING floor(COUNT(b.gram) / COUNT(*) * 1e6 + 0.5) / 1e6 < 0.05
         |), clean AS MATERIALIZED (
         |  SELECT cc.* FROM canonical cc JOIN clean_ids ci
         |    ON cc.doc_id = ci.doc_id
         |), counts AS (
         |  SELECT pred_lang, COUNT(*) AS n_docs FROM clean GROUP BY pred_lang),
         |rates AS (
         |  SELECT pred_lang,
         |    CAST(round(sqrt(MIN(n_docs) OVER () / n_docs) * 1000000)
         |      AS BIGINT) AS keep_thresh
         |  FROM counts),
         |sampled AS MATERIALIZED (
         |  SELECT c.* FROM clean c JOIN rates r ON c.pred_lang = r.pred_lang
         |  WHERE c.doc_id % 2147483648 * 2654435761 % 4294967296 % 1000000
         |    < r.keep_thresh
         |), toks3 AS MATERIALIZED (
         |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |    t -> t <> '') AS l
         |  FROM sampled),
         |g8 AS MATERIALIZED (
         |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
         |    SELECT doc_id, unnest(list_transform(range(0, len(l) - 7),
         |      i -> {'pos': i, 'gram': l[i+1]||' '||l[i+2]||' '||l[i+3]||' '
         |        ||l[i+4]||' '||l[i+5]||' '||l[i+6]||' '||l[i+7]||' '||l[i+8]}))
         |      AS u
         |    FROM toks3 WHERE len(l) >= 8)),
         |dup AS (SELECT gram FROM g8 GROUP BY gram
         |  HAVING COUNT(DISTINCT doc_id) >= 2),
         |cov AS (
         |  SELECT DISTINCT g8.doc_id, g8.pos + s.s AS pos
         |  FROM g8 JOIN dup USING (gram)
         |  CROSS JOIN (SELECT unnest(range(0, 8)) AS s) s),
         |tp AS (
         |  SELECT doc_id, u.pos AS pos FROM (
         |    SELECT doc_id, unnest(list_transform(range(0, len(l)),
         |      i -> {'pos': i})) AS u
         |    FROM toks3)),
         |ka AS (
         |  SELECT tp.doc_id, COUNT(*) AS n_kept FROM tp
         |  WHERE NOT EXISTS (SELECT 1 FROM cov
         |    WHERE cov.doc_id = tp.doc_id AND cov.pos = tp.pos)
         |  GROUP BY tp.doc_id),
         |scrub AS (
         |  SELECT t.doc_id, COALESCE(ka.n_kept, 0) AS n_clean
         |  FROM toks3 t LEFT JOIN ka USING (doc_id))"""
  }


  val oracles: Map[String, String] = Map(
    "p05_epoch_mixture" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), lg AS (
        |  SELECT lang, SUM(n_tokens) AS lang_tokens,
        |    CAST(floor(sqrt(SUM(n_tokens))) AS BIGINT) AS sq
        |  FROM t GROUP BY lang
        |), tot AS (
        |  SELECT SUM(lang_tokens) AS total_tokens, SUM(sq) AS sq_sum
        |  FROM lg
        |), rates AS (
        |  SELECT lang, lang_tokens,
        |    CAST(floor(least(
        |        CAST(total_tokens * 4 AS DOUBLE) * sq / sq_sum
        |          / lang_tokens,
        |        4.0) * 1000000 + 0.5) AS BIGINT) AS epochs_micro
        |  FROM lg, tot
        |)
        |SELECT t.doc_id, t.lang, t.n_tokens, r.epochs_micro,
        |  epochs_micro // 1000000 +
        |    CASE WHEN doc_id % 2147483648 * 2654435761 % 4294967296
        |      % 1000000 < epochs_micro % 1000000 THEN 1 ELSE 0 END
        |    AS repeat_factor
        |FROM t JOIN rates r USING (lang)
        |ORDER BY t.doc_id""".stripMargin,
    "p04_semantic_build" -> {
      val (scores, pred) = TextAnalysis.langOracleSql
      s"""WITH ${Similarity.lpaDomChainSql},
         |keptv AS (
         |  SELECT c.vec_id AS doc_id, dom.dominated_by IS NULL AS kept
         |  FROM com c LEFT JOIN dom USING (vec_id)),
         |scored AS (
         |  SELECT doc_id, text,
         |    $scores,
         |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
         |    len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
         |    length(text) AS n_chars,
         |    len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
         |  FROM documents),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id)
         |    AS rn
         |  FROM scored),
         |curated AS MATERIALIZED (
         |  SELECT doc_id, text FROM ranked
         |  WHERE rn = 1 AND ($pred) <> 'und' AND n_tokens >= 5
         |    AND floor(CAST(n_punct AS DOUBLE) / n_chars * 1e6 + 0.5) / 1e6
         |      < 0.2),
         |canon AS MATERIALIZED (
         |  SELECT cu.doc_id, cu.text FROM curated cu
         |  LEFT JOIN keptv k ON k.doc_id = cu.doc_id
         |  WHERE COALESCE(k.kept, TRUE)),
         |dsh AS (
         |  SELECT doc_id,
         |    len(list_filter(regexp_split_to_array(text, '\\s+'),
         |      x -> x <> '')) AS n_tokens,
         |    (doc_id % 2147483648 * 2654435761) % 4294967296 AS h
         |  FROM canon),
         |ash AS (SELECT doc_id, n_tokens, h,
         |    CAST(h % 8 AS INT) AS shard FROM dsh)
         |SELECT doc_id, shard,
         |  CAST(ROW_NUMBER() OVER w AS INT) AS pos,
         |  CAST(n_tokens AS INT) AS n_tokens,
         |  CAST(SUM(n_tokens) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
         |    AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |FROM ash
         |WINDOW w AS (PARTITION BY shard ORDER BY h, doc_id)
         |ORDER BY shard, pos""".stripMargin
    },
    "p03_training_build" ->
      s"""$p03OracleStages,
         |po AS (
         |  SELECT doc_id, n_clean,
         |    (doc_id % 2147483648 * 2654435761) % 4294967296 AS h,
         |    CAST((doc_id % 2147483648 * 2654435761) % 4294967296 % 8
         |      AS INT) AS shard
         |  FROM scrub),
         |cm AS (
         |  SELECT *, SUM(n_clean) OVER (PARTITION BY shard
         |    ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM po)
         |SELECT doc_id, shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
         |    AS INT) AS pos,
         |  CAST(n_clean AS BIGINT) AS n_tokens,
         |  CAST(floor((cum - n_clean) / 2048.0) AS BIGINT) AS bin,
         |  CAST(cum AS BIGINT) AS cum_tokens
         |FROM cm ORDER BY shard, pos""".stripMargin,
    "p06_epoch_build" -> p06OracleSql,
    "p07_serving_pipeline" -> p07OracleSql,
    "p08_hybrid_pipeline" -> p08OracleSql,
  ) ++ oraclesTail

  /** p06's oracle as a def so [[p07OracleSql]] can embed it as the
    * build-job subquery — one committed text, two consumers. */
  private def p06OracleSql: String =
      s"""$p03OracleStages,
         |scrubl AS (
         |  SELECT s.doc_id, s.n_clean, sp.source
         |  FROM scrub s JOIN sampled sp USING (doc_id)),
         |lg AS (
         |  SELECT source, SUM(n_clean) AS src_tokens,
         |    CAST(floor(sqrt(SUM(n_clean))) AS BIGINT) AS sq
         |  FROM scrubl GROUP BY source),
         |tot AS (
         |  SELECT SUM(src_tokens) AS total_tokens, SUM(sq) AS sq_sum
         |  FROM lg),
         |erates AS (
         |  SELECT source,
         |    CAST(floor(least(
         |        CAST(total_tokens * 2 AS DOUBLE) * sq / sq_sum
         |          / src_tokens,
         |        4.0) * 1000000 + 0.5) AS BIGINT) AS epochs_micro
         |  FROM lg, tot),
         |rep AS (
         |  SELECT s.doc_id, s.n_clean, r.epochs_micro,
         |    epochs_micro // 1000000 +
         |      CASE WHEN s.doc_id % 2147483648 * 2654435761 % 4294967296
         |        % 1000000 < epochs_micro % 1000000 THEN 1 ELSE 0 END
         |      AS repeat_factor
         |  FROM scrubl s JOIN erates r USING (source)),
         |po AS (
         |  SELECT doc_id, n_clean, repeat_factor,
         |    n_clean * repeat_factor AS w_tokens,
         |    (doc_id % 2147483648 * 2654435761) % 4294967296 AS h,
         |    CAST((doc_id % 2147483648 * 2654435761) % 4294967296 % 8
         |      AS INT) AS shard
         |  FROM rep WHERE repeat_factor > 0),
         |cm AS (
         |  SELECT *, SUM(w_tokens) OVER (PARTITION BY shard
         |    ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM po)
         |SELECT doc_id, shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
         |    AS INT) AS pos,
         |  CAST(n_clean AS BIGINT) AS n_tokens,
         |  CAST(repeat_factor AS BIGINT) AS repeat_factor,
         |  CAST(w_tokens AS BIGINT) AS w_tokens,
         |  CAST(floor((cum - w_tokens) / 2048.0) AS BIGINT) AS bin,
         |  CAST(cum AS BIGINT) AS cum_tokens
         |FROM cm ORDER BY shard, pos""".stripMargin

  /** p07's oracle: p06's committed text as a SCOPED subquery (its CTE
    * names stay inside the parens), the curated slice, then the s23
    * stack re-targeted at it. Composed by plain concatenation — the
    * embedded fragments are already margin-stripped and p06's carries
    * `||` concats a second stripMargin would eat. */
  private def p07OracleSql: String =
    "WITH kept AS MATERIALIZED (\n" +
      "  SELECT DISTINCT doc_id FROM (\n" + p06OracleSql + "\n  ) pm),\n" +
      "slice AS MATERIALIZED (\n" +
      "  SELECT e.* FROM embeddings e JOIN kept k ON k.doc_id = e.vec_id),\n" +
      Similarity.s23OracleSqlOn("slice embeddings").stripPrefix("WITH ")

  /** p08's oracle: p07's kept/slice prefix plus the kept-docs view,
    * the s23 CTE stack on the slice, and the hybrid ann+lexical+RRF
    * body on the kept docs — same plain-concatenation discipline as
    * [[p07OracleSql]]. */
  private def p08OracleSql: String =
    "WITH kept AS MATERIALIZED (\n" +
      "  SELECT DISTINCT doc_id FROM (\n" + p06OracleSql + "\n  ) pm),\n" +
      "slice AS MATERIALIZED (\n" +
      "  SELECT e.* FROM embeddings e JOIN kept k ON k.doc_id = e.vec_id),\n" +
      "kdocs AS MATERIALIZED (\n" +
      "  SELECT d.* FROM documents d JOIN kept k USING (doc_id)),\n" +
      Similarity.s23OracleCtes("slice embeddings").stripPrefix("WITH ") +
      ",\n" + Retrieval.hybridOracleBody("kdocs")

  private def oraclesTail: Map[String, String] = Map(
    "p02_incremental" -> {
      val (scores, pred) = TextAnalysis.langOracleSql
      s"""WITH base AS (
         |  SELECT doc_id, source, text,
         |    doc_id % 31 = 0 AS is_bench,
         |    (doc_id % 10 = 7 AND doc_id % 31 <> 0) AS is_delivery
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, source, $scores,
         |    md5(text) AS fp,
         |    len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
         |    length(text) AS n_chars,
         |    len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
         |  FROM base WHERE is_delivery),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id)
         |    AS rn
         |  FROM scored),
         |corp AS (
         |  SELECT DISTINCT md5(text) AS fp FROM base
         |  WHERE NOT is_delivery AND NOT is_bench),
         |tl AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |      t -> t <> '') AS l,
         |    string_split(text, ' ') AS lraw
         |  FROM base),
         |g8 AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    list_zip(l[1:len(l)-7], l[2:len(l)-6], l[3:len(l)-5],
         |             l[4:len(l)-4], l[5:len(l)-3], l[6:len(l)-2],
         |             l[7:len(l)-1], l[8:len(l)]),
         |    p -> md5(p[1]||' '||p[2]||' '||p[3]||' '||p[4]||' '||p[5]
         |      ||' '||p[6]||' '||p[7]||' '||p[8])))) AS gh
         |  FROM tl WHERE len(l) >= 8),
         |sg AS (
         |  SELECT DISTINCT g8.gh FROM g8 JOIN base USING (doc_id)
         |  WHERE NOT is_delivery AND NOT is_bench),
         |kf AS (
         |  SELECT g8.doc_id,
         |    floor(CAST(SUM(CASE WHEN s.gh IS NOT NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6 AS known_frac
         |  FROM g8 JOIN base USING (doc_id)
         |  LEFT JOIN sg s ON g8.gh = s.gh
         |  WHERE is_delivery
         |  GROUP BY g8.doc_id),
         |g5 AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(lraw) < 5 THEN [array_to_string(lraw, ' ')]
         |    ELSE list_transform(
         |      list_zip(lraw[1:len(lraw)-4], lraw[2:len(lraw)-3],
         |               lraw[3:len(lraw)-2], lraw[4:len(lraw)-1],
         |               lraw[5:len(lraw)]),
         |      p -> p[1]||' '||p[2]||' '||p[3]||' '||p[4]||' '||p[5])
         |    END)) AS gram
         |  FROM tl),
         |bg AS (
         |  SELECT DISTINCT g5.gram FROM g5 JOIN base USING (doc_id)
         |  WHERE is_bench),
         |ov AS (
         |  SELECT g5.doc_id,
         |    floor(COUNT(b.gram) / COUNT(*) * 1e6 + 0.5) / 1e6 AS overlap
         |  FROM g5 JOIN base USING (doc_id)
         |  LEFT JOIN bg b ON g5.gram = b.gram
         |  WHERE is_delivery
         |  GROUP BY g5.doc_id)
         |SELECT r.doc_id, r.source,
         |  CASE
         |    WHEN ($pred) = 'und' OR r.n_tokens < 5
         |      OR floor(CAST(r.n_punct AS DOUBLE) / r.n_chars * 1e6 + 0.5)
         |        / 1e6 >= 0.2
         |      THEN 'curate'
         |    WHEN c.fp IS NOT NULL OR r.rn > 1 THEN 'exact_dup'
         |    WHEN COALESCE(kf.known_frac, 0.0) >= 0.7 THEN 'near_dup'
         |    WHEN COALESCE(ov.overlap, 0.0) >= 0.05 THEN 'contaminated'
         |    ELSE 'kept' END AS verdict
         |FROM ranked r
         |LEFT JOIN corp c ON c.fp = r.fp
         |LEFT JOIN kf ON kf.doc_id = r.doc_id
         |LEFT JOIN ov ON ov.doc_id = r.doc_id
         |ORDER BY r.doc_id""".stripMargin
    },
    "t22_dsir" ->
      """WITH t AS (
        |  SELECT doc_id, lang, list_filter(regexp_split_to_array(lower(text),
        |    '\s+'), x -> x <> '') AS l
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, lang, unnest(l || list_transform(
        |    list_zip(l[1:len(l)-1], l[2:len(l)]),
        |    p -> p[1] || ' ' || p[2])) AS f
        |  FROM t WHERE len(l) >= 1),
        |bk AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(f), 1, 6))::BIGINT % 1024 AS b
        |  FROM f),
        |tot AS (
        |  SELECT COUNT(*) AS nr,
        |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS nt
        |  FROM bk),
        |lr AS (
        |  SELECT bk.b,
        |    CAST(floor(ln((SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1.0)
        |      * (tot.nr + 1024)
        |      / ((COUNT(*) + 1.0) * (tot.nt + 1024))) * 1e6) AS BIGINT)
        |      AS lr_micro
        |  FROM bk, tot GROUP BY bk.b, tot.nr, tot.nt),
        |w AS (
        |  SELECT doc_id, COUNT(*) AS n_feats,
        |    CAST(SUM(lr_micro) AS BIGINT) AS wm
        |  FROM bk JOIN lr USING (b) GROUP BY doc_id)
        |SELECT doc_id, n_feats, CAST(wm AS DOUBLE) / 1e6 AS weight,
        |  wm > 0 AS selected
        |FROM w ORDER BY doc_id""".stripMargin,
    "t24_quality_classifier" ->
      """WITH t AS (
        |  SELECT doc_id, substr(source, 4)::INT % 5 = 0 AS pos,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      x -> x <> '') AS l
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, pos, unnest(l || list_transform(
        |    list_zip(l[1:len(l)-1], l[2:len(l)]),
        |    p -> p[1] || ' ' || p[2])) AS f
        |  FROM t WHERE len(l) >= 1),
        |bk AS (
        |  SELECT doc_id, pos,
        |    ('0x' || substr(md5(f), 1, 6))::BIGINT % 4096 AS b
        |  FROM f),
        |tot AS (
        |  SELECT SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
        |    SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
        |  FROM bk),
        |w AS (
        |  SELECT bk.b,
        |    CAST(floor(ln((SUM(CASE WHEN pos THEN 1 ELSE 0 END) + 1.0)
        |      * (tot.nn + 4096)
        |      / ((SUM(CASE WHEN pos THEN 0 ELSE 1 END) + 1.0)
        |         * (tot.np + 4096))) * 1e6) AS BIGINT) AS w_micro
        |  FROM bk, tot GROUP BY bk.b, tot.np, tot.nn),
        |sc AS (
        |  SELECT doc_id, COUNT(*) AS n_feats,
        |    CAST(floor(CAST(SUM(w_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
        |      AS mean_micro
        |  FROM bk JOIN w USING (b) GROUP BY doc_id),
        |s2 AS (
        |  SELECT doc_id, n_feats, mean_micro,
        |    CAST(floor(1e6 / (1.0 + exp(-mean_micro / 1e6))) AS BIGINT)
        |      AS s_micro,
        |    CAST(floor((pow(1.0 - (doc_id % 2147483648 * 2654435761
        |      % 4294967296 % 1000000) / 1e6, -1.0/9.0) - 1.0) * 1e6)
        |      AS BIGINT) AS p_micro
        |  FROM sc)
        |SELECT doc_id, n_feats, CAST(mean_micro AS DOUBLE) / 1e6 AS logodds,
        |  CAST(s_micro AS DOUBLE) / 1e6 AS score,
        |  p_micro > 1000000 - s_micro AS kept
        |FROM s2 ORDER BY doc_id""".stripMargin,
    "p01_pipeline" -> {
      val (scores, pred) = TextAnalysis.langOracleSql
      s"""WITH scored AS (
         |  SELECT doc_id, source, lang, text,
         |    $scores,
         |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
         |    len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
         |    length(text) AS n_chars,
         |    len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
         |  FROM documents
         |), ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id)
         |    AS rn
         |  FROM scored
         |), curated AS (
         |  SELECT doc_id, source, lang, text, $pred AS pred_lang
         |  FROM ranked
         |  WHERE rn = 1 AND ($pred) <> 'und' AND n_tokens >= 5
         |    AND floor(CAST(n_punct AS DOUBLE) / n_chars * 1e6 + 0.5) / 1e6
         |      < 0.2
         |), dominated AS (
         |  SELECT DISTINCT id_b AS doc_id FROM (
         |${Dedup.d04OracleBodyOn("curated")})
         |), deduped AS (
         |  SELECT c.* FROM curated c
         |  LEFT JOIN dominated dd ON c.doc_id = dd.doc_id
         |  WHERE dd.doc_id IS NULL
         |), tg AS (
         |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |gb AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(l) < 5 THEN [array_to_string(l, ' ')]
         |    ELSE list_transform(
         |      list_zip(l[1:len(l)-4], l[2:len(l)-3], l[3:len(l)-2],
         |               l[4:len(l)-1], l[5:len(l)]),
         |      p -> p[1]||' '||p[2]||' '||p[3]||' '||p[4]||' '||p[5])
         |    END)) AS gram
         |  FROM tg),
         |bench AS (SELECT DISTINCT gram FROM gb WHERE doc_id % 31 = 0),
         |tgc AS (
         |  SELECT dd.doc_id, string_split(dd.text, ' ') AS l
         |  FROM deduped dd WHERE dd.doc_id % 31 <> 0),
         |gc AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(l) < 5 THEN [array_to_string(l, ' ')]
         |    ELSE list_transform(
         |      list_zip(l[1:len(l)-4], l[2:len(l)-3], l[3:len(l)-2],
         |               l[4:len(l)-1], l[5:len(l)]),
         |      p -> p[1]||' '||p[2]||' '||p[3]||' '||p[4]||' '||p[5])
         |    END)) AS gram
         |  FROM tgc),
         |clean_ids AS (
         |  SELECT g.doc_id
         |  FROM gc g LEFT JOIN bench b ON g.gram = b.gram
         |  GROUP BY g.doc_id
         |  HAVING floor(COUNT(b.gram) / COUNT(*) * 1e6 + 0.5) / 1e6 < 0.05
         |), clean AS (
         |  SELECT dd.* FROM deduped dd JOIN clean_ids ci
         |    ON dd.doc_id = ci.doc_id
         |), counts AS (
         |  SELECT pred_lang, COUNT(*) AS n_docs FROM clean GROUP BY pred_lang),
         |rates AS (
         |  SELECT pred_lang,
         |    CAST(round(sqrt(MIN(n_docs) OVER () / n_docs) * 1000000)
         |      AS BIGINT) AS keep_thresh
         |  FROM counts),
         |sampled AS (
         |  SELECT c.* FROM clean c JOIN rates r ON c.pred_lang = r.pred_lang
         |  WHERE c.doc_id % 2147483648 * 2654435761 % 4294967296 % 1000000
         |    < r.keep_thresh
         |), t AS (
         |  SELECT doc_id, source, doc_id % 16 AS shard,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
         |  FROM sampled),
         |cm AS (
         |  SELECT *, SUM(n_toks) OVER (PARTITION BY source, shard
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t),
         |bn AS (
         |  SELECT source, shard, n_toks,
         |    CAST(floor((cum - n_toks) / 2048.0) AS BIGINT) AS bin
         |  FROM cm)
         |SELECT source, shard, bin,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |  floor(CAST(SUM(n_toks) AS DOUBLE) / 2048.0 * 1e6 + 0.5) / 1e6
         |    AS fill
         |FROM bn GROUP BY source, shard, bin
         |ORDER BY source, shard, bin""".stripMargin
    },
    "t17_shards" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '')) AS n_tokens,
        |    (doc_id % 2147483648 * 2654435761) % 4294967296 AS h
        |  FROM documents),
        |a AS (SELECT doc_id, n_tokens, h,
        |    CAST(h % 8 AS INT) AS shard FROM d)
        |SELECT doc_id, shard,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS pos,
        |  CAST(n_tokens AS INT) AS n_tokens,
        |  CAST(SUM(n_tokens) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |FROM a
        |WINDOW w AS (PARTITION BY shard ORDER BY h, doc_id)
        |ORDER BY shard, pos""".stripMargin,
    "d14_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events),
        |c AS (
        |  SELECT * FROM e
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type AS state, ts_us AS valid_from,
        |  lead(ts_us) OVER w AS valid_to,
        |  CAST(row_number() OVER w AS INT) AS version,
        |  (lead(ts_us) OVER w IS NULL) AS is_current
        |FROM c
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, version""".stripMargin,
    "d10_decontam" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(l) < 5 THEN [array_to_string(l, ' ')]
        |    ELSE list_transform(
        |      list_zip(l[1:len(l)-4], l[2:len(l)-3], l[3:len(l)-2],
        |               l[4:len(l)-1], l[5:len(l)]),
        |      p -> p[1]||' '||p[2]||' '||p[3]||' '||p[4]||' '||p[5])
        |    END)) AS gram
        |  FROM t),
        |b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 31 = 0)
        |SELECT g.doc_id,
        |  COUNT(*) AS n_grams,
        |  COUNT(b.gram) AS n_hits,
        |  floor(COUNT(b.gram) / COUNT(*) * 1e6 + 0.5) / 1e6 AS overlap,
        |  floor(COUNT(b.gram) / COUNT(*) * 1e6 + 0.5) / 1e6 >= 0.05
        |    AS contaminated
        |FROM g LEFT JOIN b ON g.gram = b.gram
        |WHERE g.doc_id % 31 <> 0
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "t11_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |s AS (
        |  SELECT doc_id, l,
        |    list_transform(list_zip(l[1:len(l)-1], l[2:len(l)]),
        |      p -> p[1]||' '||p[2]) AS g2,
        |    list_transform(list_zip(l[1:len(l)-2], l[2:len(l)-1], l[3:len(l)]),
        |      p -> p[1]||' '||p[2]||' '||p[3]) AS g3
        |  FROM t),
        |top2 AS (
        |  SELECT doc_id, MAX(c) AS top2_cnt FROM (
        |    SELECT doc_id, g, COUNT(*) AS c
        |    FROM (SELECT doc_id, unnest(g2) AS g FROM s)
        |    GROUP BY doc_id, g)
        |  GROUP BY doc_id)
        |SELECT s.doc_id,
        |  CAST(len(l) AS INT) AS n_tokens,
        |  floor(len(list_distinct(l)) / len(l) * 1e6 + 0.5) / 1e6 AS ttr,
        |  floor((1.0 - len(list_distinct(g3)) / len(g3)) * 1e6 + 0.5) / 1e6
        |    AS dup3_frac,
        |  floor(top2_cnt / len(g2) * 1e6 + 0.5) / 1e6 AS top2_frac,
        |  floor((1.0 - len(list_distinct(g3)) / len(g3)) * 1e6 + 0.5) / 1e6 > 0.05
        |    OR floor(top2_cnt / len(g2) * 1e6 + 0.5) / 1e6 > 0.1 AS repetitive
        |FROM s JOIN top2 ON s.doc_id = top2.doc_id
        |ORDER BY s.doc_id""".stripMargin,
    "t12_pii_scrub" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com or call 555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
        |      AS injected
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, injected,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(injected,
        |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |          '<EMAIL>', 'g'),
        |        '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |      '\b555-[0-9]{4}\b', '<PHONE>', 'g') AS scrubbed
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(injected,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(injected,
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS INT) AS n_ips,
        |  CAST(len(regexp_extract_all(injected,
        |    '\b555-[0-9]{4}\b')) AS INT) AS n_phones,
        |  CAST(len(scrubbed) AS INT) AS n_chars_clean,
        |  md5(scrubbed) AS clean_md5
        |FROM s ORDER BY doc_id""".stripMargin,
    "d11_mixture_sample" ->
      """WITH c AS (
        |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        |r AS (
        |  SELECT lang, n_docs,
        |    CAST(round(sqrt(MIN(n_docs) OVER () / n_docs) * 1000000)
        |      AS BIGINT) AS keep_thresh
        |  FROM c)
        |SELECT r.lang, r.n_docs, r.keep_thresh,
        |  CAST(SUM(CASE WHEN d.doc_id % 2147483648 * 2654435761
        |      % 4294967296 % 1000000 < r.keep_thresh
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  floor(CAST(SUM(CASE WHEN d.doc_id % 2147483648 * 2654435761
        |      % 4294967296 % 1000000 < r.keep_thresh
        |    THEN 1 ELSE 0 END) AS DOUBLE) / r.n_docs * 1e6 + 0.5) / 1e6
        |    AS realized_rate
        |FROM documents d JOIN r ON d.lang = r.lang
        |GROUP BY r.lang, r.n_docs, r.keep_thresh
        |ORDER BY r.lang""".stripMargin,
    "t13_seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source, doc_id % 16 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |c AS (
        |  SELECT *, SUM(n_toks) OVER (PARTITION BY source, shard
        |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t),
        |b AS (
        |  SELECT source, shard, n_toks,
        |    CAST(floor((cum - n_toks) / 2048.0) AS BIGINT) AS bin
        |  FROM c)
        |SELECT source, shard, bin,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
        |  floor(CAST(SUM(n_toks) AS DOUBLE) / 2048.0 * 1e6 + 0.5) / 1e6 AS fill
        |FROM b GROUP BY source, shard, bin
        |ORDER BY source, shard, bin""".stripMargin,
    "t14_lm_quality" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(l) < 2 THEN [array_to_string(l, ' ')]
        |    ELSE list_transform(list_zip(l[1:len(l)-1], l[2:len(l)]),
        |      p -> p[1]||' '||p[2]) END) AS bg
        |  FROM t),
        |c AS (SELECT bg, COUNT(*) AS n FROM g GROUP BY bg)
        |SELECT g.doc_id,
        |  COUNT(*) AS n_bigrams,
        |  CAST(SUM(CASE WHEN c.n <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |  floor(SUM(CASE WHEN c.n <= 2 THEN 1 ELSE 0 END) / COUNT(*)
        |    * 1e6 + 0.5) / 1e6 AS rare_rate,
        |  floor(SUM(CASE WHEN c.n <= 2 THEN 1 ELSE 0 END) / COUNT(*)
        |    * 1e6 + 0.5) / 1e6 > 0.5 AS novel
        |FROM g JOIN c ON g.bg = c.bg
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "d12_incremental_dedup" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS fp FROM documents),
        |corp AS (
        |  SELECT DISTINCT fp FROM d WHERE doc_id % 10 <> 7),
        |newd AS (SELECT * FROM d WHERE doc_id % 10 = 7)
        |SELECT n.source,
        |  COUNT(*) AS n_new,
        |  CAST(SUM(CASE WHEN c.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup,
        |  CAST(SUM(CASE WHEN c.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_accepted
        |FROM newd n LEFT JOIN corp c ON n.fp = c.fp
        |GROUP BY n.source ORDER BY n.source""".stripMargin,
  )
}
