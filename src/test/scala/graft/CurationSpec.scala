package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral tests for operators.Curation on handcrafted corpora —
  * the oracle gate proves engine-vs-DuckDB agreement; these prove the
  * operators do the right thing on inputs built to trip them.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def corpus(rows: (Long, String)*): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, t) =>
        Row(id, t, "en", "src0", t.length.toLong)
      }: _*),
      docSchema)

  // ---- d10 decontamination ------------------------------------------

  test("d10 flags a verbatim copy of a benchmark doc and clears disjoint text") {
    // doc 31 is benchmark (31 % 31 == 0); doc 1 copies it verbatim;
    // doc 2 shares no 5-gram with it
    val bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    withTempView(corpus(
      31L -> bench,
      1L -> bench,
      2L -> "one two three four five six seven eight nine ten")) { dir =>
      val out = operators.Curation.d10_decontam(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
      assert(out(1L) === true)   // exact copy => overlap 1.0
      assert(out(2L) === false)  // disjoint => overlap 0.0
      assert(!out.contains(31L)) // benchmark docs are not scored
    }
  }

  test("d10 benchmark side is broadcast (corpus never shuffles by n-gram)") {
    val p = SparkEntry.queries("d10_decontam")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  // ---- t11 repetition ----------------------------------------------

  test("t11 scores a degenerate one-token loop as repetitive, varied text as clean") {
    val loop = Seq.fill(40)("spam").mkString(" ")
    val varied = (1 to 40).map(i => s"w$i").mkString(" ")
    withTempView(corpus(1L -> loop, 2L -> varied)) { dir =>
      val rows = operators.Curation.t11_repetition(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
      val (ttrLoop, dup3Loop, top2Loop, flagLoop) = rows(1L)
      assert(ttrLoop === 0.025) // 1 distinct / 40 tokens
      assert(dup3Loop > 0.9 && top2Loop === 1.0 && flagLoop)
      val (ttrVar, dup3Var, _, flagVar) = rows(2L)
      assert(ttrVar === 1.0 && dup3Var === 0.0 && !flagVar)
    }
  }

  // ---- t12 PII scrub ------------------------------------------------

  test("t12 redacts every injected PII token exactly once") {
    val body = "hello world foo bar baz qux quux corge grault garply"
    withTempView(corpus(7L -> body)) { dir =>
      val r = operators.Curation.t12_pii_scrub(spark, dir).collect().head
      assert(r.getInt(1) === 1 && r.getInt(2) === 1 && r.getInt(3) === 1)
      // placeholders are shorter than what they replace, so the clean
      // length must land below the injected length deterministically:
      // body + injected tail with all three PII tokens swapped out
      val injected = body + " contact user7@example.com or call 555-0007 ip 10.0.7.1"
      val expected = injected
        .replace("user7@example.com", "<EMAIL>")
        .replace("555-0007", "<PHONE>")
        .replace("10.0.7.1", "<IP>")
      assert(r.getInt(4) === expected.length)
    }
  }

  test("t12 scrub removes emails/phones/IPs already present in text") {
    // PII in the body, not just the injected tail
    val text = "reach me at bob.smith+x@corp.example.org or 555-1234 " +
      "from 192.168.0.1 thanks"
    withTempView(corpus(3L -> text)) { dir =>
      val r = operators.Curation.t12_pii_scrub(spark, dir).collect().head
      // 1 body + 1 injected of each kind
      assert(r.getInt(1) === 2, "emails")
      assert(r.getInt(2) === 2, "ips")
      assert(r.getInt(3) === 2, "phones")
    }
  }

  // ---- d11 mixture sampling ----------------------------------------

  test("d11 keeps the smallest stratum whole and downsamples others at sqrt rate") {
    val rows = (0L until 400L).map { i =>
      val lang = if (i < 100) "small" else "big"
      Row(i, ("tok " * 10).trim, lang, "src0", 40L)
    }
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), docSchema)
    withTempDf(df) { dir =>
      val out = operators.Curation.d11_mixture_sample(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val (nBig, threshBig, keptBig) = out("big")
      val (nSmall, threshSmall, keptSmall) = out("small")
      assert(nSmall === 100L && threshSmall === 1000000L && keptSmall === 100L)
      assert(nBig === 300L && threshBig === 577350L)
      // hash coin realizes close to the sqrt(100/300) ≈ 0.577 target
      assert(keptBig > 120L && keptBig < 230L)
    }
  }

  test("d14 SCD2 intervals tile each user's timeline with alternating states") {
    val rows = operators.Curation.d14_scd2(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getInt(4),
        r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, hist0) =>
      val hist = hist0.sortBy(_._5)
      // versions are 1..k with exactly one open (is_current) row
      assert(hist.map(_._5).toSeq == (1 to hist.length))
      assert(hist.count(_._6) == 1 && hist.last._6)
      hist.sliding(2).foreach {
        case Array(a, b) =>
          // adjacent intervals touch exactly and states actually change
          assert(a._4.contains(b._3), s"user $user: gap or overlap")
          assert(a._2 != b._2, s"user $user: run not compressed")
        case _ => ()
      }
      assert(hist.last._4.isEmpty)
    }
  }

  // ---- helpers ------------------------------------------------------

  test("d10 benchmark gram cap: bounded broadcast, loud failure above cap") {
    // 62 docs → ids 0 and 31 form the benchmark slice; every doc has
    // enough tokens for several distinct 5-grams
    val docs = corpus((0L until 62L).map(i =>
      i -> s"alpha bravo charlie delta echo fox$i golf hotel india"): _*)
    // generous cap: runs, and scores the 60 non-benchmark docs
    val ok = operators.Curation.decontamOf(docs, operators.Curation.D10MaxBenchGrams)
    assert(ok.count() == 60)
    // cap below the benchmark's distinct-gram count: refuse loudly at
    // plan-build time instead of OOMing an executor mid-broadcast
    val ex = intercept[IllegalArgumentException] {
      operators.Curation.decontamOf(docs, 1L)
    }
    assert(ex.getMessage.contains("eval-suite assumption"))
  }

  /** Writes the frame as the `documents` table of a temp sf dir. */
  private def withTempDf(df: org.apache.spark.sql.DataFrame)(
      f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("curation_test").toString
    try {
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      f(dir)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  private def withTempView(df: org.apache.spark.sql.DataFrame)(
      f: String => Unit): Unit = withTempDf(df)(f)

  // ---- d20 bloom decontamination -------------------------------------

  test("d20 bloom decontam never under-reports the exact d10 result") {
    // real corpus: per-doc bloom hit counts must dominate d10's exact
    // hits (a bloom has false positives, never false negatives), and
    // every exactly-contaminated doc must be flagged
    val exact = operators.Curation.d10_decontam(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Boolean]("contaminated")))).toMap
    val est = operators.Curation.d20_bloom_decontam(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_hits_est"), r.getAs[Boolean]("flagged")))).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (id, (nExact, contaminated)) =>
      assert(est(id)._1 >= nExact, s"doc $id: bloom under-reported")
      if (contaminated) assert(est(id)._2, s"doc $id: exact hit not flagged")
    }
    // and the sketch must stay tight enough to be useful: false
    // positives may only inflate the corpus-wide hit count a little
    val totExact = exact.values.map(_._1).sum
    val totEst = est.values.map(_._1).sum
    assert(totEst <= totExact + math.max(50L, totExact / 10),
      s"bloom fp blow-up: exact $totExact vs est $totEst")
  }

  test("d20 probes the bloom without joining (no gram ever shuffles to meet the benchmark)") {
    val p = SparkEntry.queries("d20_bloom_decontam")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("BroadcastHashJoin"),
      "gram-keyed join present — the bloom should replace the join entirely")
  }

  // ---- t17 shard plan ------------------------------------------------

  test("t17 shard plan: hash arithmetic, contiguous positions, exact running budget") {
    val rows = operators.Curation.t17_shards(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // shard is the multiplicative hash mod 8, bit-for-bit
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val h = java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
      assert(r.getAs[Int]("shard") == (h % 8).toInt, s"doc $id")
    }
    // per shard: pos is 1..n with no gaps, cum_tokens is the exact
    // prefix sum of n_tokens in pos order
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("pos"))
      assert(sorted.map(_.getAs[Int]("pos")).toSeq == (1 to rs.length),
        s"shard $shard positions not contiguous")
      val prefix = sorted.map(_.getAs[Int]("n_tokens").toLong)
        .scanLeft(0L)(_ + _).tail
      assert(sorted.map(_.getAs[Long]("cum_tokens")).toSeq == prefix.toSeq,
        s"shard $shard running budget drifted")
    }
    // every document lands in exactly one shard
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
  }

  test("t22 DSIR weights separate target-like from raw-like docs") {
    val enText = (1 to 10).map(_ => "alpha beta").mkString(" ")   // 20 toks
    val xxText = (1 to 10).map(_ => "zork quux").mkString(" ")
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, enText, "en", "src0", enText.length.toLong),
        Row(2L, enText, "en", "src0", enText.length.toLong),
        Row(3L, xxText, "xx", "src1", xxText.length.toLong),
        Row(4L, xxText, "xx", "src1", xxText.length.toLong),
        // raw doc that LOOKS target-like: must come out selected even
        // though its own lang label is not the target
        Row(5L, enText, "xx", "src1", enText.length.toLong)),
      docSchema)
    val got = operators.Curation.dsirWeights(docs, nBuckets = 64).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_feats"), r.getAs[Double]("weight"),
          r.getAs[Boolean]("selected")))).toMap
    CacheScope.releaseAll()
    // 20 unigrams + 19 bigrams per doc
    assert(got.values.forall(_._1 == 39L))
    assert(got(1L)._2 > 0 && got(1L)._3, "target doc must score positive")
    assert(got(2L) == got(1L), "identical docs must score identically")
    assert(got(3L)._2 < 0 && !got(3L)._3, "off-target doc must score negative")
    assert(got(5L)._2 > 0 && got(5L)._3,
      "target-LIKE raw doc must be selected regardless of its label")
  }

  test("t24 classifier separates curated-source-like text; Pareto keep is exact") {
    val goodText = (1 to 10).map(_ => "alpha beta").mkString(" ")   // 20 toks
    val junkText = (1 to 10).map(_ => "zork quux").mkString(" ")
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        // positives: source suffix % 5 == 0
        Row(1L, goodText, "en", "src0", goodText.length.toLong),
        Row(2L, goodText, "en", "src5", goodText.length.toLong),
        Row(3L, junkText, "en", "src1", junkText.length.toLong),
        Row(4L, junkText, "en", "src2", junkText.length.toLong),
        // negative-source doc that LOOKS curated: must score high even
        // though its own source label is negative (that's inference)
        Row(5L, goodText, "en", "src3", goodText.length.toLong)),
      docSchema)
    val got = operators.Curation.classifierScores(docs, nBuckets = 64)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_feats"), r.getAs[Double]("logodds"),
          r.getAs[Double]("score"), r.getAs[Boolean]("kept")))).toMap
    CacheScope.releaseAll()
    assert(got.values.forall(_._1 == 39L))  // 20 unigrams + 19 bigrams
    assert(got(1L)._2 > 0, "curated-source doc must score positive")
    assert(got(2L)._2 == got(1L)._2, "identical docs score identically")
    assert(got(3L)._2 < 0, "junk doc must score negative")
    assert(got(5L)._2 > 0,
      "curated-LIKE doc must score positive regardless of source label")
    assert(got(1L)._3 > got(3L)._3, "sigmoid preserves the ordering")
    // the keep bit is exactly the published rule, recomputed here from
    // the output score and the doc_id coin with the same JVM arithmetic
    got.foreach { case (id, (_, _, score, kept)) =>
      val sMicro = math.rint(score * 1e6).toLong
      val u = (id % 2147483648L * 2654435761L % 4294967296L % 1000000L) / 1e6
      val pMicro = math.floor((math.pow(1.0 - u, -1.0 / 9.0) - 1.0) * 1e6).toLong
      assert(kept == (pMicro > 1000000L - sMicro), s"doc $id keep bit")
    }
  }

  test("p03 manifest is internally consistent and respects the gates") {
    val rows = operators.Curation.p03_training_build(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty, "empty manifest — vacuous")
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "duplicate docs in manifest")
    // gate invariants: benchmark docs never train
    assert(!ids.exists(_ % 31 == 0), "a benchmark doc leaked into the manifest")
    // per shard: pos is 1..n contiguous, cum_tokens is the exact
    // running sum of clean tokens, bin the 2048-token grid of it
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("pos"))
      assert(sorted.map(_.getAs[Int]("pos")).toSeq == (1 to rs.length),
        s"shard $shard positions not contiguous")
      var cum = 0L
      sorted.foreach { r =>
        val n = r.getAs[Long]("n_tokens")
        cum += n
        assert(r.getAs[Long]("cum_tokens") == cum,
          s"shard $shard cum_tokens drifted at pos ${r.getAs[Int]("pos")}")
        assert(r.getAs[Long]("bin") == (cum - n) / 2048,
          s"shard $shard bin grid broken at pos ${r.getAs[Int]("pos")}")
      }
    }
  }

  test("p02 labels each delivery doc with the first failing gate") {
    import spark.implicits._
    val s1 = "the " + (1 to 19).map(i => s"s$i").mkString(" ")  // standing
    val m  = "the " + (1 to 29).map(i => s"m$i").mkString(" ")  // standing
    val b  = "the b1 b2 b3 b4 b5 b6 b7 b8 b9"                   // benchmark
    val f  = "the " + (1 to 10).map(i => s"f$i").mkString(" ")  // fresh
    val docs = Seq(
      (1L, "web", s1), (2L, "web", m),            // standing corpus
      (62L, "web", b),                            // benchmark (62 % 31 = 0)
      (7L, "web", f),                             // kept
      (17L, "web", s1),                           // exact_dup (corpus fp)
      (27L, "web", f),                            // exact_dup (delivery twin)
      (37L, "web", m.split(" ").dropRight(1).mkString(" ") + " zz"), // 22/23 grams known
      (47L, "web", "the c1 c2 c3 c4 c5 c6 b1 b2 b3 b4 b5"), // 1/8 bench 5-grams
      (57L, "web", "the x y"),                    // 3 tokens: curate
    ).toDF("doc_id", "source", "text")
    val got = operators.Curation.incrementalVerdicts(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    CacheScope.releaseAll()
    assert(got == Map(7L -> "kept", 17L -> "exact_dup", 27L -> "exact_dup",
      37L -> "near_dup", 47L -> "contaminated", 57L -> "curate"))
  }

  test("p04 manifest excludes s17-dominated docs and keeps t17 shard math") {
    import spark.implicits._
    val p04 = operators.Curation.p04_semantic_build(spark, sfDir).collect()
    val dominated = operators.Similarity.s17_community_dedup(spark, sfDir)
      .filter(!col("kept")).select("vec_id").as[Long].collect().toSet
    CacheScope.releaseAll()
    assert(p04.nonEmpty && dominated.nonEmpty,
      "fixture exercises neither arm — vacuous")
    val ids = p04.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.intersect(dominated).isEmpty,
      s"semantically dominated docs survived: ${ids.intersect(dominated)}")
    // the manifest core stays t17's: per-shard positions are 1..n and
    // cum_tokens is the running token sum in position order
    p04.groupBy(_.getAs[Int]("shard")).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("pos"))
      assert(sorted.map(_.getAs[Int]("pos")).toSeq == (1 to sorted.length),
        s"shard $shard positions not contiguous")
      val cums = sorted.scanLeft(0L)(_ + _.getAs[Int]("n_tokens")).tail
      assert(sorted.map(_.getAs[Long]("cum_tokens")).toSeq == cums.toSeq,
        s"shard $shard cum_tokens drifted from the running sum")
    }
  }

  test("t17 shard plan is reproducible and complete") {
    val a = operators.Curation.t17_shards(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Int]("pos")))
    val b = operators.Curation.t17_shards(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Int]("pos")))
    assert(a.toSeq == b.toSeq)
    assert(a.length == Tables.documents(spark, sfDir).count())
  }

  test("p06 epoch build: manifest packs epoch-weighted masses over p03's survivors") {
    val p06 = operators.Curation.p06_epoch_build(spark, sfDir).collect()
    val p03ids = operators.Curation.p03_training_build(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    CacheScope.releaseAll()
    assert(p06.nonEmpty, "empty epoch manifest — vacuous")
    val ids = p06.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "duplicate docs in manifest")
    assert(ids.toSet.subsetOf(p03ids),
      "p06 trained a doc p03's gates rejected")
    assert(!ids.exists(_ % 31 == 0), "a benchmark doc leaked into the manifest")
    p06.foreach { r =>
      val rep = r.getAs[Long]("repeat_factor")
      assert(rep >= 1 && rep <= 4,
        s"doc ${r.getAs[Long]("doc_id")}: repeat_factor $rep outside [1,4]")
      assert(r.getAs[Long]("w_tokens") ==
        r.getAs[Long]("n_tokens") * rep, "w_tokens != n_tokens * repeat")
    }
    assert(p06.map(_.getAs[Long]("repeat_factor")).distinct.length >= 2,
      "all docs repeat identically — the temperature split did nothing")
    // the packing grid runs over the WEIGHTED masses
    p06.groupBy(_.getAs[Int]("shard")).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("pos"))
      assert(sorted.map(_.getAs[Int]("pos")).toSeq == (1 to rs.length),
        s"shard $shard positions not contiguous")
      var cum = 0L
      sorted.foreach { r =>
        val w = r.getAs[Long]("w_tokens")
        cum += w
        assert(r.getAs[Long]("cum_tokens") == cum,
          s"shard $shard cum_tokens drifted at pos ${r.getAs[Int]("pos")}")
        assert(r.getAs[Long]("bin") == (cum - w) / 2048,
          s"shard $shard bin grid broken at pos ${r.getAs[Int]("pos")}")
      }
    }
  }

  test("p05 epoch plan: cap and fractional branches live, coin arithmetic exact") {
    val out = SparkEntry.queries("p05_epoch_mixture")(
      spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, e, rep) = (r.getLong(0), r.getLong(3), r.getLong(4))
      assert(e <= 4000000L, s"doc $id epochs over the repetition cap")
      val coin = id % 2147483648L * 2654435761L % 4294967296L % 1000000L
      val want = e / 1000000L + (if (coin < e % 1000000L) 1L else 0L)
      assert(rep == want, s"doc $id repeat_factor off the documented coin")
    }
    val perLang = out.map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(perLang.values.exists(_ == 4000000L),
      "repetition cap never fired — budget no longer exceeds small strata")
    assert(perLang.values.exists(e => e < 4000000L && e % 1000000L != 0L),
      "no fractional-epoch stratum — the coin path is untested")
  }
}
