package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality audit: the physical plans that make these queries
  * survive a 100 TB scale-up are asserted here so a refactor that
  * silently loses pushdown / broadcast / top-k pruning fails CI.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q02 point lookup pushes the predicate into the parquet scan") {
    val p = plan("q02_point_lookup")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"))
  }

  test("q02/q04/q08 scans are column-pruned") {
    assert(plan("q02_point_lookup").contains(
      "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double>"))
    // the fact scan must read exactly the 3 needed lineitem columns
    assert(plan("q04_dim_join").contains(
      "ReadSchema: struct<l_suppkey:bigint,l_extendedprice:double,l_discount:double>"))
    assert(plan("q08_sort_limit").contains(
      "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_orderdate:timestamp"))
  }

  test("q04 snowflake joins broadcast every dim (fact side never shuffles)") {
    val p = plan("q04_dim_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3)
    assert(!p.contains("SortMergeJoin"))
    // the only exchanges are the broadcasts + the final tiny aggregate
    assert(!p.contains("Exchange hashpartitioning(l_"))
  }

  test("q01 aggregate is partial (map-side) + final, not single-phase") {
    val p = plan("q01_agg")
    assert(p.contains("partial_sum"))
    assert(p.contains("HashAggregate"))
  }

  test("q08 sort+limit plans as TakeOrderedAndProject, never a global sort") {
    val p = plan("q08_sort_limit")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange rangepartitioning"))
  }

  test("q03 aggregates the fact side BEFORE the join") {
    val p = plan("q03_fanout_join")
    val aggIdx = p.indexOf("partial_sum")
    val joinIdx = math.max(p.indexOf("SortMergeJoin"), p.indexOf("BroadcastHashJoin"))
    assert(aggIdx >= 0 && joinIdx >= 0)
    // partial agg appears deeper in the tree (later in the string) than
    // the join that consumes it
    assert(aggIdx > joinIdx)
  }

  test("no query falls back to a cartesian product") {
    for (name <- SparkEntry.queries.keys) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name uses CartesianProduct")
    }
  }

  test("custom expressions generate code (no CodegenFallback in hot paths)") {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback}
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
    import org.apache.spark.sql.types._
    val arrS = BoundReference(0, ArrayType(StringType), nullable = true)
    val arrF = BoundReference(0, ArrayType(FloatType), nullable = true)
    val exprs: Seq[Expression] = Seq(
      functions.SimHash64(arrS),
      functions.WordShingles(arrS, 3),
      functions.MinHashSignature(arrS, 64),
      functions.MinHashBands(arrS, 16, 4),
      functions.ArrayJaccard(arrS, arrS),
      functions.CosineSimilarity(arrF, arrF),
      functions.DotProduct(arrF, arrF))
    exprs.foreach { e =>
      assert(!e.isInstanceOf[CodegenFallback], s"${e.prettyName} is CodegenFallback")
      val code = e.genCode(new CodegenContext) // throws if codegen is broken
      assert(code.code.toString.nonEmpty)
    }
  }

  test("q24 as-of join is one shuffle, zero join operators") {
    val p = plan("q24_asof_join")
    // the union+window composition: no SMJ/BHJ/NLJ anywhere, and the
    // only hash exchange is the window's partition-by-key shuffle
    assert(!p.contains("SortMergeJoin") && !p.contains("NestedLoop"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
  }

  test("q27 range join stays an equi-join (no nested-loop fallback)") {
    val p = plan("q27_range_join")
    assert(!p.contains("NestedLoop"), s"range join degenerated:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"))
  }

  test("d04 joins the prefix-filtered index and verifies per-candidate") {
    val p = plan("d04_ngram_jaccard")
    // exact verify is one array_jaccard per candidate pair, not a
    // per-token intersection count over full posting lists
    assert(p.contains("array_jaccard"))
    // the candidate join's inputs are the sliced per-doc prefix, not
    // the full posting list, and no window sort touches the tokens
    assert(p.contains("slice(ord_toks"))
    assert(!p.contains("Window"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q37 EXISTS decorrelates to an existence join, no per-row subquery") {
    val p = plan("q37_exists_subquery")
    assert(p.contains("ExistenceJoin"))
    assert(!p.contains("Subquery"), "per-row subquery execution survived")
  }

  test("q39 grid build broadcasts (never a cartesian shuffle)") {
    val p = plan("q39_gap_fill")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("d07 snapshot diff shuffles only (key, digest), hashes scan-side") {
    val p = plan("d07_snapshot_diff")
    // md5 must be computed below the exchange: the join inputs project
    // exactly (doc_id, md5-digest), never the full text column
    assert(p.contains("FullOuter"))
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(doc_id")
    assert(exchangeIdx > 0)
    assert(p.indexOf("md5", exchangeIdx) > 0,
      "md5 should appear below the exchange (computed pre-shuffle)")
    assert(!p.substring(0, p.indexOf("SortMergeJoin")).contains("text#"),
      "full text column visible above the join")
  }

  test("q45 non-equi band join broadcasts the band dim (fact never shuffles)") {
    val p = plan("q45_band_join")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Exchange hashpartitioning(o_"))
  }

  test("s01 ANN broadcasts the query side so the corpus is scanned once") {
    val p = plan("s01_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("s16 broadcasts the quantized queries so the code table is scanned once") {
    val p = plan("s16_int8_search")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"),
      "the 32-query side must never shuffle the quantized corpus")
    CacheScope.releaseAll()
  }

  test("s19 exact IVF broadcasts centroids and probes; corpus never sort-merges") {
    val p = plan("s19_ivf_exact")
    // centroid table rides in as ONE broadcast nested row; the probe
    // join broadcasts the query side — the corpus-sized side must
    // never shuffle to meet a 16- or 210-row one
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"))
    // cell assignment is MAP-ONLY (array_min over the broadcast
    // nested centroids) — the corpus never pays an argmin exchange
    assert(!"Exchange hashpartitioning\\(vec_id".r.findFirstIn(p).isDefined,
      "cell assignment must be row-local, not a corpus-keyed aggregate")
    CacheScope.releaseAll()
  }

  test("s02 multi-table LSH broadcasts probes; corpus index never shuffles to meet them") {
    val p = plan("s02_ann_lsh")
    // the (tbl, bucket) probe table is tiny (|queries|·L·(b+1) rows) —
    // it must broadcast so the L-fold corpus index is scanned in place
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q67 injects a runtime bloom filter into the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "64MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val qe = operators.Relational2.bloomSemiJoin(spark, sfDir).queryExecution
      val opt = qe.optimizedPlan.toString
      // InjectRuntimeFilter rewrites the probe side to
      // might_contain(<bloom_filter_agg subquery>, xxhash64(key))
      assert(opt.contains("might_contain"), opt.take(2000))
      assert(opt.contains("bloom_filter_agg"), opt.take(2000))
      // and with broadcast off the join must actually be a shuffle
      // join — the regime where the bloom prunes shuffle volume
      assert(qe.executedPlan.toString.contains("SortMergeJoin"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("t16 BM25 never explodes the token stream and top-k is TakeOrdered") {
    val p = plan("t16_bm25")
    CacheScope.releaseAll()
    // tf is per-row array arithmetic — an Explode/Generate of tokens
    // would shuffle the whole token stream at scale
    assert(!p.contains("Generate"), "token stream exploded")
    // corpus stats come back as ONE broadcast row, never a shuffle join
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    // global top-k prunes per partition (no full sort of the corpus)
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("d18 overlap matrix joins per-source totals by broadcast") {
    val p = plan("d18_source_overlap")
    CacheScope.releaseAll()
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "per-source totals should broadcast, not shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("s07 centroid aggregate is partial+final on (label, dim)") {
    val p = plan("s07_label_centroids")
    assert(p.contains("partial_count") || p.contains("partial_sum"))
    assert("Exchange hashpartitioning\\(label".r.findAllIn(p).size == 1)
  }

  test("t18 scores off the cached doc-bigram pass (LM build and probe share one scan)") {
    val p = plan("t18_lm_perplexity")
    CacheScope.releaseAll()
    // the persisted doc-bigram frame must feed BOTH the LM count side
    // and the scoring join — two InMemoryTableScans, one source scan
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      "doc-bigrams recomputed instead of reused")
    assert(!p.contains("CartesianProduct"))
  }

  test("d19 counts digests with a partial aggregate (gram text dies at the scan)") {
    val p = plan("d19_repeated_ngrams")
    // partial agg (and the gram explode feeding it) sit BELOW the
    // count shuffle — only (digest, count, min) rows ever cross it
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx > 0)
    assert(p.indexOf("partial_count", exchangeIdx) > 0,
      "count not combined map-side before the shuffle")
    assert(p.indexOf("Generate", exchangeIdx) > 0,
      "gram explode above the shuffle — gram strings would cross the wire")
  }

  test("s08 benchmark broadcasts; per-vector max is partial+final") {
    val p = plan("s08_semantic_decontam")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_max"))
  }

  test("q12 candidate join is keyed on the prefix gram, never the bare block") {
    val p = plan("q12_levenshtein")
    // the self-join's shuffle key must include the gram — a
    // (brand,type)-only exchange means the quadratic block join is back
    assert("Exchange hashpartitioning\\(p_brand[^)]*gram".r
      .findFirstIn(p).isDefined,
      s"no gram-keyed exchange — candidate join degenerated:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("d22 postings shuffle 16-byte digests, not gram text") {
    val p = plan("d22_substring_pairs")
    // every exchange after the scan is keyed by the md5 digest (gh) or
    // the pair ids — the gram string itself dies at the scan projection
    assert(p.contains("Exchange hashpartitioning(gh"))
    assert(!"Exchange hashpartitioning\\(gram".r.findFirstIn(p).isDefined,
      "gram text crossed a shuffle")
  }

  test("p01 shares the curated intermediate and broadcasts the small sides") {
    val p = plan("p01_pipeline")
    // curated is CacheScope-persisted and read by stages 2/3/4 — the
    // plan must reference the in-memory relation, not recompute it
    assert(p.contains("InMemoryTableScan"))
    // bench grams and mixture rates ship as broadcasts
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
    assert(!p.contains("CartesianProduct"))
  }

  test("p03 persists stage boundaries, broadcasts small sides, prunes clean_text") {
    val p = plan("p03_training_build")
    // curated/clean are CacheScope-persisted and read by later stages
    assert(p.contains("InMemoryTableScan"))
    // bench grams and mixture rates ship as broadcasts
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
    assert(!p.contains("CartesianProduct"))
    // stage 5 consumes only clean token COUNTS — Catalyst must prune
    // d30's clean-text reconstruction (collect_list + array_join)
    // out of the plan entirely
    assert(!p.contains("collect_list"),
      "p03 rebuilds clean_text it never outputs")
    CacheScope.releaseAll()
  }

  test("t21 scores segments in ONE corpus pass (no second scan, partial aggs)") {
    val p = plan("t21_code_switch")
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      "per-doc rollup must derive from the single (doc, lang) count pass")
    assert(p.contains("partial_count"))
  }

  test("t05 summary aggregates with the bounded top-k agg, never a doc-keyed window") {
    val p = plan("t05_winnow_neardup")
    // exemplars come from the O(k)-buffer TopKPairsAgg with a map-side
    // partial; a hot doc (boilerplate hub with millions of partners)
    // must never fund a single-task window sort or an unbounded
    // collect_list buffer
    assert(p.contains("topkpairsagg"))
    assert(!p.contains("windowspecdefinition"),
      "t05 exemplars regressed to a doc-keyed window (skew-prone)")
    assert(!p.contains("collect_list"),
      "t05 buffers unbounded partner lists")
    CacheScope.releaseAll()
  }

  test("s15 LPA rounds hash-join the cached edges; vote argmax is combinable") {
    val p = plan("s15_communities")
    // the symmetrized edge list is persisted once and every round's
    // label join reads it back shuffle-hash (no per-round sort of the
    // edges)
    assert(p.contains("InMemoryTableScan"))
    assert(p.contains("ShuffledHashJoin"))
    // the winner-label argmax must be the combinable max(struct(n,-lbl))
    // — a viral community's hub node gets a partial-agg slot, not a
    // single-task window sort (only blockedKnn's bounded per-vector
    // top-k window may appear)
    assert(p.contains("partial_max(struct(n"))
    assert(!p.contains("windowspecdefinition(src"),
      "s15 vote argmax regressed to a src-keyed window (skew-prone)")
    CacheScope.releaseAll()
  }

  test("s17 persists the community-annotated corpus once for all pair-join sides") {
    val p = plan("s17_community_dedup")
    // the (community, csize, vec_id, embedding) frame is CacheScope-
    // persisted and read by the exact tier's two sides, the LSH tier's
    // two sides, and the final carry — the parquet corpus and the LPA
    // round chain must never re-run per consumer
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3,
      "s17 pair-join sides are not reading the persisted community frame")
    // the LPA chain underneath keeps its s15 shape
    assert(p.contains("ShuffledHashJoin"))
    assert(p.contains("partial_max(struct(n"))
    // domination is the combinable min(dom_id) aggregate (the only
    // window in the plan is blockedKnn's bounded per-vector top-k,
    // pinned by the s14 test)
    assert(p.contains("partial_min"))
    CacheScope.releaseAll()
  }

  test("p04 chains the persisted LPA arm; manifest windows partition by shard") {
    val p = plan("p04_semantic_build")
    // the semantic arm rides s17's persisted community frame and s15's
    // combinable vote argmax — composing into the pipeline must not
    // re-derive them with weaker plans
    assert(p.contains("InMemoryTableScan"))
    assert(p.contains("partial_max(struct(n"))
    // the manifest window partitions by shard (t13/t17's sharded-cumsum
    // discipline) — a global (empty-partition) window would serialize
    // the whole manifest through one task
    assert(p.contains("windowspecdefinition(shard"))
    CacheScope.releaseAll()
  }

  test("d24 first-wins combines map-side; line text never keys a shuffle") {
    val p = plan("d24_line_dedup")
    // first-wins is min(struct(doc_id, line_no)) per digest with a
    // map-side partial — the boilerplate hot keys this op targets
    // would land whole on one task under the old digest window
    assert(p.contains("partial_min(struct"))
    assert(!p.contains("windowspecdefinition"),
      "first-wins regressed to a digest-keyed window (skew-prone)")
    assert(!"Exchange hashpartitioning\\(line".r.findFirstIn(p).isDefined,
      "raw line text crossed a shuffle as a key")
    assert(p.contains("partial_collect_list"))
  }

  test("t22 bucket log-ratios broadcast over the persisted feature explode") {
    val p = plan("t22_dsir")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      "the ≤1024-row bucket table must never shuffle the feature stream")
    assert(p.contains("InMemoryTableScan"))
    assert(p.contains("partial_sum"))
  }

  test("t24 classifier weights broadcast over the persisted feature explode") {
    val p = plan("t24_quality_classifier")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      "the ≤4096-row weight table must never shuffle the feature stream")
    assert(p.contains("InMemoryTableScan"))
    assert(p.contains("partial_sum"))
    CacheScope.releaseAll()
  }

  test("q70 cohort joins broadcast (events never shuffle to meet cohort sizes)") {
    val p = plan("q70_cohort")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("partial_min"))
  }

  test("s09 PQ assignment is map-only over the broadcast nested codebook") {
    val p = plan("s09_pq_codes")
    // the nested codebook arrives as ONE broadcast row; assignment is
    // a row-local argmin over it — no join ever shuffles the vector
    // stream, and no corpus-keyed aggregate/window exchange remains
    // (the old shape fanned (vec, dim) ×k and collapsed n·m·k rows)
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"),
      "the codebook must never shuffle the vector stream")
    assert(!"Exchange hashpartitioning\\(vec_id".r.findFirstIn(p).isDefined,
      "PQ assignment must be row-local, not an aggregate over a fan")
    // the milli corpus stays persisted (shared by rounds + assignment)
    assert(p.contains("InMemoryTableScan"))
    CacheScope.releaseAll()
  }

  test("t23 BPE rounds are vocab-sized: argmax is TakeOrdered, corpus scanned zero times") {
    val p = plan("t23_bpe_merges")
    // every round hangs off the lineage-cut vocab (LogicalRDD); the
    // corpus parquet was consumed once, at vocab build time
    assert(!p.contains("FileScan parquet"))
    assert("TakeOrderedAndProject\\(limit=1".r.findAllIn(p).size == 4)
    CacheScope.releaseAll()
  }

  test("t25 encode pre-aggregates (doc, word) counts before the vocab join") {
    val p = plan("t25_bpe_encode")
    // the corpus collapses to per-(doc, word) counts map-side, so the
    // vocab join input is distinct words per doc, never raw occurrences
    assert("HashAggregate\\(keys=\\[doc_id[^\\]]*word[^\\]]*\\], functions=\\[partial_count"
      .r.findFirstIn(p).isDefined)
    // weighted char/token sums fold partial+final per doc
    assert(p.contains("partial_sum(k"))
    assert(!p.contains("CartesianProduct"))
    CacheScope.releaseAll()
  }

  test("s10 ADC search never reads embeddings after training and prunes top-k pre-shuffle") {
    val p = plan("s10_pq_search")
    // the query-id scan is the ONLY post-training parquet read, pruned
    // to vec_id — the 64-float embedding column dies at the train pass
    assert(p.contains("ReadSchema: struct<vec_id:bigint>"))
    // the m·k-per-query lookup table ships as a broadcast to the code
    // table — never a shuffle join (code assignment and the per-query
    // distance grid are now row-local over the broadcast nested
    // codebook, so exactly one (blk, j)-keyed join remains)
    assert("BroadcastHashJoin \\[blk".r.findAllIn(p).size >= 1)
    assert(!p.contains("SortMergeJoin"))
    // per-query top-k is rank-limit-pruned before the final exchange
    assert(p.contains("WindowGroupLimit [query_id"))
    assert(!p.contains("CartesianProduct"))
    CacheScope.releaseAll()
  }

  test("q72 merge actions are PK-keyed joins with pruned, filter-pushed scans") {
    val p = plan("q72_merge_upsert")
    // update + delete inner joins and the insert anti join, all keyed
    // on the order PK; at this SF all three broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3)
    assert(p.contains("LeftAnti"))
    // the delivery-derivation predicates reach the scans
    assert(p.contains("DataFilters: [(pmod(o_orderkey"))
    // no scan reads more than the key + price
    assert(!p.contains("o_orderdate"))
  }

  test("d26 scrub join broadcasts the boilerplate set; no window anywhere") {
    val p = plan("d26_boilerplate")
    // line-frequency output (tiny) broadcast into the scrub join
    assert(p.contains("BroadcastHashJoin [h#") && p.contains("LeftOuter"))
    // distinct-doc counting is two-phase, keyed on the md5 digest
    assert(p.contains("partial_count(distinct doc_id"))
    // the d24 difference: removal everywhere needs no first-wins window
    assert(!p.contains("Window ["))
  }

  test("d27 prefix is a map-side slice and candidates dedup partial+final") {
    val p = plan("d27_containment")
    // the contained-side prefix never sorts the gram stream — it is a
    // slice of the (df, gram)-struct-sorted per-doc array
    assert(p.contains("explode(slice(ord_grams"))
    // candidate (id_a, id_b) dedup has a map-side phase
    assert("HashAggregate\\(keys=\\[id_a#\\d+L, id_b#\\d+L\\], functions=\\[\\]"
      .r.findAllIn(p).size >= 2)
    CacheScope.releaseAll()
  }

  test("s11 top-C pool prunes pre-shuffle; query set broadcasts into one scan") {
    val p = plan("s11_mmr")
    // rank-16 pruning happens on the map side before the q_id exchange
    assert(p.contains("row_number(), 16, Partial"))
    // the 32-query set is the broadcast side of the corpus scan
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"))
    // the query-budget bound reaches the parquet scan
    assert(p.contains("LessThan(vec_id,3104)"))
    CacheScope.releaseAll()
  }

  test("s12 scans the corpus once: both sides come from conditional partial aggs") {
    val p = plan("s12_drift")
    // old- and new-side stats are CASE-gated partials of ONE pass —
    // a second corpus scan for the delivery side would show up as a
    // second ungated partial_count
    assert(p.contains("partial_count(CASE WHEN NOT is_new"))
    assert(p.contains("partial_count(CASE WHEN is_new"))
    assert(p.contains("partial_sum(CASE WHEN NOT is_new"))
    CacheScope.releaseAll()
  }

  test("p02 delivery twins dedup on a fingerprint window; gates join doc-keyed") {
    val p = plan("p02_incremental")
    // within-delivery first-wins runs on the md5 fingerprint
    assert(p.contains("windowspecdefinition(fp"))
    // the three gate signals attach as left joins (verdict is a CASE,
    // not a filter cascade that would re-scan the delivery)
    assert("BroadcastHashJoin \\[doc_id#\\d+L\\], \\[doc_id#\\d+L\\], LeftOuter"
      .r.findAllIn(p).size == 2)
    CacheScope.releaseAll()
  }

  test("d30 gram text dies at the scan; spans anti-join on (doc_id, pos)") {
    val p = plan("d30_span_scrub")
    // the per-position gram is digested in the scan-side projection —
    // only the 16-byte gh ever reaches an exchange
    assert(p.contains("md5(cast(col"))
    assert(!"Exchange hashpartitioning\\(col#".r.findFirstIn(p).isDefined,
      "raw gram text crossed a shuffle")
    // covered positions remove tokens via an anti-join, not a filter scan
    assert(p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct"))
    CacheScope.releaseAll()
  }

  test("d29 canonical argmax is a combinable struct max, never a window") {
    val p = plan("d29_canonicalize")
    // max(struct(quality, -doc_id)) combines map-side — a giant
    // duplicate cluster never lands whole on one task, which the
    // window formulation this replaced would force
    assert(p.contains("partial_max(struct"),
      "argmax not combined map-side")
    assert(!p.contains("windowspecdefinition(cluster_id"),
      "argmax regressed to a cluster-keyed window (skew-prone)")
    // the pair-derived cluster map broadcasts into the corpus scan
    assert("BroadcastHashJoin \\[doc_id#\\d+L\\], \\[doc_id#\\d+L\\], LeftOuter"
      .r.findFirstIn(p).isDefined)
    CacheScope.releaseAll()
  }

  test("s14 top-k prunes per-partition BEFORE the rank shuffle") {
    val p = plan("s14_knn_graph")
    // WindowGroupLimit Partial under the exchange: each map task keeps
    // only its local top-3 per vec_id, so the rank shuffle moves O(k·n)
    // rows, not the full B² block fan-out
    val ex = p.indexOf("Exchange hashpartitioning(vec_id")
    assert(ex > 0)
    assert(p.indexOf("WindowGroupLimit", ex) > 0,
      "no partial top-k below the rank exchange")
    assert(!p.contains("CartesianProduct"))
    CacheScope.releaseAll()
  }

  test("s20 NN-descent re-ranks bounded candidates; no cartesian, partial top-k") {
    val p = plan("s20_nn_descent")
    // the candidate set is built by equi-joins only (id buckets, then
    // the shared-middle-node 2-hop join) — an all-pairs regression
    // would surface as a cartesian/BNLJ over the corpus
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // final re-rank keeps only the local top-k per src before its
    // rank exchange, so each round shuffles O(k·n), never the full
    // candidate fan-out
    val ex = p.indexOf("Exchange hashpartitioning(src")
    assert(ex > 0)
    assert(p.indexOf("WindowGroupLimit", ex) > 0,
      "no partial top-k below the rank exchange")
    CacheScope.releaseAll()
  }

  test("t28 drift tops-k via TakeOrdered; no global sort, no 1-partition window") {
    val p = plan("t28_token_drift")
    // vocab selection and the final contributor ranking must both be
    // TakeOrdered (distributed partial top-k), never a full sort or a
    // partition-less window over the token table
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Window "), "rank regressed to a global window")
    assert(!p.contains("CartesianProduct"))
    CacheScope.releaseAll()
  }

  test("m07 frame audit aggregates map-side; no pair join ever forms") {
    val p = plan("m07_video_frame_dedup")
    // the duplicate set is a count on fp keys with map-side combine —
    // a frame×frame similarity join would appear as a self-join of
    // the exploded frames (or worse, a cartesian)
    assert(p.contains("partial_count") || p.contains("partial_finalmerge"),
      "duplicate-frame count lost its map-side combine")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    CacheScope.releaseAll()
  }

  test("s21 graph search probes the graph via broadcast; corpus never scanned") {
    val p = plan("s21_graph_search")
    // the beam (|queries|·8 rows) must broadcast into the graph/vector
    // joins — a sort-merge would shuffle the corpus-sized graph to
    // meet a few hundred rows
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    // re-rank keeps only local top-beam per q_id before the exchange
    val ex = p.indexOf("Exchange hashpartitioning(q_id")
    assert(ex > 0)
    assert(p.indexOf("WindowGroupLimit", ex) > 0,
      "no partial top-k below the rank exchange")
    CacheScope.releaseAll()
  }

  test("s22 cell graph keys its init exchange on the cell; partial top-k holds") {
    // rounds=0 keeps the init in ONE lazy plan (the refinement rounds'
    // eager lineage cuts would hide it from the final executedPlan):
    // the init pair join must carry the cell in its key — that is what
    // lets a cluster build every cell's graph with zero cross-cell
    // traffic (the centroid fan is the one permitted BNLJ: 16 rows)
    val p0 = operators.Similarity.cellGraph(
        Tables.embeddings(spark, sfDir), rounds = 0)
      .queryExecution.executedPlan.toString
    assert(p0.contains("Exchange hashpartitioning(cell"))
    assert(!p0.contains("CartesianProduct"))
    val ex0 = p0.indexOf("Exchange hashpartitioning(src")
    assert(ex0 > 0)
    assert(p0.indexOf("WindowGroupLimit", ex0) > 0,
      "no partial top-k below the rank exchange")
    // the full query's final round keeps the same top-k discipline
    val p = plan("s22_cell_graph")
    assert(!p.contains("CartesianProduct"))
    CacheScope.releaseAll()
  }

  test("s23 probes are cell-keyed broadcasts; both top-ks prune pre-shuffle") {
    val p = plan("s23_cell_search")
    // beam + query frames broadcast into the graph/vector joins — the
    // graph (the one corpus-sized frame) is only ever probed, never
    // shuffled to meet a few hundred beam rows
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    // per-(query, cell) beam prune AND the per-query fuse both keep
    // only local top-k before their exchange
    assert("row_number\\(\\), 8, Partial".r.findAllIn(p).nonEmpty,
      "per-cell beam shuffles its full candidate list instead of local top-8")
    assert("row_number\\(\\), 5, Partial".r.findAllIn(p).nonEmpty,
      "fuse shuffles unpruned beams instead of local top-5")
    // the beam re-rank is keyed on (q_id, cell) — the exchange that
    // lets a cluster serve every probed cell independently
    assert("Exchange hashpartitioning\\(q_id#\\d+L, cell".r
      .findAllIn(p).nonEmpty, "beam re-rank lost its cell key")
    CacheScope.releaseAll()
  }

  test("s24 merge is delivery-bounded: broadcast probes, no corpus rescan") {
    val p = plan("s24_incremental_graph")
    // the touched set and beam frames broadcast into every join — a
    // sort-merge against the standing graph would shuffle it to meet
    // a delivery-sized frame; a cartesian would mean a corpus rescan
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // both re-ranks (delivery beam, touched update) keep only local
    // top-k before their exchange
    assert("row_number\\(\\), 8, Partial".r.findAllIn(p).nonEmpty,
      "a re-rank shuffles its full candidate list instead of local top-8")
    CacheScope.releaseAll()
  }

  test("s26 audit routes deliveries map-only + bounded cell aggregates") {
    val p = plan("s26_index_health")
    // the delivery routes against the broadcast NESTED centroid row (a
    // nested-loop over ONE row); nothing is ever pair-joined
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    // the argmin is row-local (array_min over the nested centroids) —
    // the only delivery-sized exchange left is the per-cell aggregate
    assert(!"Exchange hashpartitioning\\(vec_id".r.findFirstIn(p).isDefined,
      "delivery argmin must be row-local, not a vec_id-keyed aggregate")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "per-cell audit stats must partial-aggregate map-side")
    CacheScope.releaseAll()
  }

  test("s27 serves the refreshed artifact with s23's broadcast discipline") {
    // the audit + rebuild already ran eagerly inside the entry (that
    // is the composition under test); the RETURNED plan is the query
    // job and must read the swapped artifact's parquet, broadcast the
    // beam sides, and never go cartesian
    val p = plan("s27_index_refresh")
    assert(p.contains("FileScan parquet"),
      "s27's query job does not read the refreshed saved index")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    CacheScope.releaseAll()
  }

  test("s28 ADC scan is broadcast-fed; shortlist and fuse prune pre-shuffle") {
    val p = plan("s28_pq_serving")
    // probes, ADC lookup table, and shortlist all broadcast into the
    // code/assignment joins — the code table (the one corpus-sized
    // frame after training) is only ever the probe target
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    // the ADC lookup-sum partial-aggregates map-side before the
    // (q_id, cell, cand) exchange — the scan never shuffles the raw
    // member×block fan-out
    assert(p.contains("partial_sum"),
      "ADC lookup-sum not combined map-side before the shuffle")
    // per-(query, cell) shortlist and the per-query exact fuse both
    // keep only local top-k before their exchange
    assert("row_number\\(\\), 16, Partial".r.findAllIn(p).nonEmpty,
      "ADC shortlist shuffles full cell scans instead of local top-16")
    assert("row_number\\(\\), 5, Partial".r.findAllIn(p).nonEmpty,
      "re-rank fuse shuffles the full shortlist instead of local top-5")
    CacheScope.releaseAll()
  }

  test("s29 tombstone fuse is a broadcast anti-join on the beam frame") {
    val p = plan("s29_tombstone_serve")
    // the delete set broadcasts into the fuse as a LeftAnti against
    // the beam-sized frame — a shuffled anti would drag the beams to
    // meet the delete set; the standing index itself is never rebuilt
    // (the artifact-untouched half is pinned in SimilaritySpec)
    assert(p.contains("LeftAnti, BuildRight"),
      "tombstone exclusion is not a broadcast anti-join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    CacheScope.releaseAll()
  }

  test("s30 serves the compacted artifact with s23's broadcast discipline") {
    // the audit + compaction already ran eagerly inside the entry;
    // the RETURNED plan is the query job over the swapped artifact
    val p = plan("s30_delete_compact")
    assert(p.contains("FileScan parquet"),
      "s30's query job does not read the compacted saved index")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    CacheScope.releaseAll()
  }

  test("s31 serves PQ codes off the saved artifact with s28's discipline") {
    val p = plan("s31_pq_standing")
    // the ADC scan and the re-rank read the cell-partitioned artifact
    assert(p.contains("FileScan parquet"),
      "s31's query job does not read the saved PQ index")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    // shortlist and fuse keep s28's local top-k discipline
    assert("row_number\\(\\), 16, Partial".r.findAllIn(p).nonEmpty,
      "ADC shortlist shuffles full cell scans instead of local top-16")
    assert("row_number\\(\\), 5, Partial".r.findAllIn(p).nonEmpty,
      "re-rank fuse shuffles the full shortlist instead of local top-5")
    CacheScope.releaseAll()
  }

  test("p07 serves from the saved artifact; no cartesians anywhere") {
    // the query job's plan must READ the index artifact (the build
    // and slice stages already ran as the batch job — that is the
    // point of the composition), with s23's broadcast discipline
    val p = plan("p07_serving_pipeline")
    assert(p.contains("FileScan parquet"),
      "p07's query job does not read the saved index")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    CacheScope.releaseAll()
  }

  test("s13 arms prune top-K pre-shuffle; fusion joins two K-lists only") {
    val p = plan("s13_hybrid_rrf")
    // dense arm broadcasts the fixed query set into one corpus scan
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    // all three rankings (dense, lexical, fused) keep only local top-K
    // per query before their q_id exchange
    assert("WindowGroupLimit .*row_number\\(\\), 5, Partial".r
      .findAllIn(p).size == 3,
      "an arm shuffles its full candidate list instead of local top-K")
    CacheScope.releaseAll()
  }

  test("d31 report aggregates once on source with map-side combine") {
    val p = plan("d31_corpus_report")
    // one exchange keyed on source ALONE (the pair pipeline's
    // (source, lang, …) block exchanges also start with source) fed
    // by a partial agg over ALL signals
    val m = "Exchange hashpartitioning\\(source#\\d+, \\d+\\)".r
      .findAllMatchIn(p).toSeq
    assert(m.size == 1, s"expected 1 source-only exchange, got ${m.size}")
    assert(p.indexOf("partial_sum", m.head.start) > 0,
      "signal sums not combined map-side before the source shuffle")
    assert(!p.contains("CartesianProduct"))
    CacheScope.releaseAll()
  }

  test("t27 fertility pre-aggregates slice word counts under the vocab join") {
    val p = plan("t27_fertility")
    // (lang, source, word) counts combine map-side; the final slice
    // agg is partial+final too — the corpus shuffles counts, not words
    assert("HashAggregate\\(keys=\\[lang#\\d+, source#\\d+, word#\\d+\\], functions=\\[partial_count"
      .r.findFirstIn(p).isDefined)
    assert("HashAggregate\\(keys=\\[lang#\\d+, source#\\d+\\], functions=\\[partial_sum"
      .r.findFirstIn(p).isDefined)
    assert(!p.contains("CartesianProduct"))
    CacheScope.releaseAll()
  }

  test("q74 daily sketches combine map-side: user ids never shuffle") {
    val p = plan("q74_sketch_rollup")
    // the (day, type) exchange must be fed by a partial sketch agg —
    // each map task ships ~1 KB sketches, not its user_id stream
    val ex = p.indexOf("Exchange hashpartitioning(day")
    assert(ex > 0)
    assert(p.indexOf("partial_hll_sketch_agg", ex) > 0,
      "sketches built only after the shuffle — user ids crossed the wire")
    // ...and the rollup is a sketch-union agg, also partial+final
    assert(p.contains("partial_hll_union_agg"))
    CacheScope.releaseAll()
  }

  test("d25 rank rounds hash-build on the node-sized side (edge list never sorts)") {
    val p = plan("d25_pair_rank")
    // rounds 1–4 sit behind the two-round batched lineage cuts
    // (measured faster than the fully-lazy chain — see pairRank's
    // scaladoc), so the RETURNED plan carries round 5 only: one
    // shuffled-hash join with the rank table as build side. An SMJ
    // anywhere here would re-sort the E-row edge list per round —
    // every round shares this shape, cut segments included (same
    // builder expression round for round).
    assert("ShuffledHashJoin \\[src[^\\]]*\\], \\[node[^\\]]*\\], Inner, BuildRight"
      .r.findAllIn(p).size == 1)
    // no rank round may fall back to sort-merge against the edge
    // list (the pair-PRODUCER subtree upstream has its own joins,
    // pinned by the d04 tests — only the [src]=[node] shape is ours)
    assert("SortMergeJoin \\[src[^\\]]*\\], \\[node"
      .r.findAllIn(p).isEmpty,
      "a rank round fell back to sort-merge against the edge list")
    // per-round share sums are partial+final (map-side combine on dst)
    assert(p.contains("partial_sum((("))
    CacheScope.releaseAll()
  }

  test("s32 filtered fuse broadcasts the beam into the label scan; ranks prune pre-shuffle") {
    val p = plan("s32_filtered_search")
    // the standing artifact is read, beam sides broadcast; the label
    // predicate joins the (beam-sized) fuse frame as the BUILD side
    // against one pruned 2-column corpus scan -- never the reverse
    assert(p.contains("FileScan parquet"),
      "s32's query job does not read the standing saved index")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    // the filtered fuse still keeps only local top-5 pre-exchange
    assert("row_number\\(\\), 5, Partial".r.findAllIn(p).nonEmpty,
      "filtered fuse shuffles unpruned beams instead of local top-5")
    CacheScope.releaseAll()
  }

  test("s33 hybrid: lexical arm is df-capped hash joins; all rankings prune pre-shuffle") {
    val p = plan("s33_hybrid_rrf")
    assert(p.contains("FileScan parquet"),
      "s33's dense arm does not read the standing saved index")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the lexical candidate join degenerated to a nested loop")
    // dense fuse keeps local top-5; lexical and hybrid rankings keep
    // local top-10 before their q_id exchanges
    assert("row_number\\(\\), 5, Partial".r.findAllIn(p).nonEmpty,
      "dense fuse shuffles unpruned beams instead of local top-5")
    assert("row_number\\(\\), 10, Partial".r.findAllIn(p).size >= 2,
      "lexical/hybrid rankings shuffle full candidate lists instead of local top-10")
    CacheScope.releaseAll()
  }

  test("p08 hybrid pipeline serves from the saved slice artifact; no cartesians") {
    // p06 + the index build already ran as batch jobs; the RETURNED
    // plan is the fused query job -- it must read the slice artifact,
    // broadcast the beam sides, and keep the lexical arm on hash joins
    val p = plan("p08_hybrid_pipeline")
    assert(p.contains("FileScan parquet"),
      "p08's query job does not read the saved slice index")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert("row_number\\(\\), 10, Partial".r.findAllIn(p).size >= 2,
      "lexical/hybrid rankings shuffle full candidate lists instead of local top-10")
    CacheScope.releaseAll()
  }

  test("s34 recall eval: broadcast query fan, truth top-K prunes pre-shuffle") {
    val p = plan("s34_serving_recall")
    // the serve reads the standing artifact; the brute truth fans the
    // constant query set via a nested-loop broadcast (s01's shape) and
    // keeps only local top-K before its q_id exchange
    assert(p.contains("FileScan parquet"),
      "s34's serve does not read the standing saved index")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the truth fan is not a broadcast of the constant query set")
    assert(!p.contains("CartesianProduct"))
    assert("row_number\\(\\), 5, Partial".r.findAllIn(p).nonEmpty,
      "a top-5 ranking shuffles unpruned candidates")
    CacheScope.releaseAll()
  }

  test("d02 md5-minhash signatures are one map-only projection; " +
      "verify joins are hash joins") {
    val p = plan("d02_minhash_lsh")
    // the 64-slot signature + banding must happen in the scan's
    // projection (no exchange between the parquet read and the band
    // explode) — the only shuffles are the band bucket join and the
    // candidate verify joins
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "band bucket join degenerated")
    // the signature stage rides the explicit repartition (the
    // parallelize-the-scan knob), not an implicit aggregation
    assert(!p.contains("Exchange hashpartitioning(sh"),
      "signature stage introduced its own shuffle")
    CacheScope.releaseAll()
  }

  test("t20 count-min cells aggregate partial+final; probe joins the " +
      "broadcast counter table") {
    val p = plan("t20_heavy_hitters")
    assert(p.contains("partial_count") || p.contains("Partial"),
      "sketch cells are not map-side partially aggregated")
    assert(p.contains("BroadcastHashJoin"),
      "the 20x4 probe does not broadcast against the counter table")
    assert(!p.contains("CartesianProduct"))
    CacheScope.releaseAll()
  }

  test("dq01/dq05 star joins broadcast the dim side; dq03 top-3 " +
      "prunes pre-shuffle") {
    val p1 = plan("dq01_label_fanout")
    assert(p1.contains("BroadcastHashJoin"),
      "label dim join is not broadcast")
    assert(!p1.contains("CartesianProduct"))
    val p3 = plan("dq03_top_videos_per_label")
    assert("row_number\\(\\), 3, Partial".r.findAllIn(p3).nonEmpty,
      "per-label top-3 shuffles unpruned release lists")
    val p5 = plan("dq05_master_credits")
    assert(!p5.contains("CartesianProduct") &&
      !p5.contains("BroadcastNestedLoopJoin"))
    CacheScope.releaseAll()
  }
}
