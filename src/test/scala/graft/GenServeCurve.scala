package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

/** SERVECURVE.md generator — the committed serve-quality tradeoff
  * artifact: recall@5 (vs the exact milli-L2 brute force) and query
  * wall vs nProbe for the cell-probed serving path (s23/s25), per
  * dataset, over the standing index. Three levers, each swept:
  *  - nProbe (query-time): cells probed per query;
  *  - nCells (build-time): the SHIPPED default is the √n sizing
  *    (`servingNCells`) — the legacy pinned-16 build is kept in the
  *    tables as the before/after contrast;
  *  - beam width (query-time): `spark.graft.ann.beamWidth`, swept at
  *    10× over the shipped build.
  * Run (after ScaleGen for the 10× leg):
  *
  *   sbt "Test/runMain graft.GenServeCurve SERVECURVE.md \
  *     sf0.1=/root/testdata/sf0.1 10x=/tmp/graft_scale/sf1"
  */
object GenServeCurve {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("SERVECURVE.md")
    val sets = (if (args.length > 1) args.drop(1).toSeq
      else Seq("sf0.1=/root/testdata/sf0.1", "10x=/tmp/graft_scale/sf1"))
      .map { a => val Array(l, p) = a.split("=", 2); (l, p) }
    val spark = TestSpark.spark
    import graft.functions.VectorFunctions.milli_l2
    val pinned = operators.Similarity.IvfNCells
    val staticProbe = operators.Similarity.S23NProbe
    val sb = new StringBuilder
    sb ++= "# SERVECURVE — the s23/s25 cell-probe serving tradeoff\n\n"
    sb ++= ("Recall@5 vs the exact milli-L2 brute force, and per-sweep " +
      "query wall,\nfor the cell-probed search over the standing " +
      "serving index (the s25\npath: build once, queries read the " +
      s"artifact), beam rounds = ${operators.Similarity.GsRounds} " +
      "(shipped).\nWalls are best-of-2 on a warm JVM at local[32]; " +
      "ambient VM noise is\n±40% (see BENCH notes). The shipped " +
      "serving default is the √n cell\nsizing (`servingNCells`: ⌈√n⌉ " +
      "rounded up to a multiple of 16) with\nthe ADAPTIVE probe " +
      "recommendation the build measures and folds into\nthe " +
      "artifact meta (`adaptiveNProbe`: the probe depth covering " +
      "90% of a\ndeterministic sample's true neighbors) and beam " +
      s"width ${operators.Similarity.GsBeam} — marked *\nin the " +
      s"tables; the pre-round-13 static default (nprobe = " +
      s"$staticProbe) stays as an\nunmarked row for contrast, and " +
      "the legacy pinned-16 build (which the\nSUITE still pins, " +
      "because its committed oracles carry the cell count\nas " +
      "Lloyd-CTE literals) is kept as the before/after contrast. " +
      "Generated\nby `sbt \"Test/runMain graft.GenServeCurve\"`.\n\n" +
      "Reading the curves: nprobe buys recall only when a query's " +
      "true\nneighbors straddle cells. The 10× ScaleGen corpus is " +
      "CLONE-CLUSTERED\n(each vector has 9 near-twins), so truth " +
      "lives almost entirely in the\nquery's own cell, the probe " +
      "curve goes flat, and the adaptive\nrecommendation clamps at " +
      "the static floor — no probe work is wasted\nat the 100 TB " +
      "shape. On a DIFFUSE corpus (the sf0.1 tables — true\n" +
      "neighbors straddle cells) recall tracks the probed FRACTION, " +
      "and the\nbuild-time measurement raises the recommendation " +
      "toward the covering\nfraction — which is why the shipped " +
      "default row now sits near the\nfull-probe ceiling instead of " +
      "a third of it. `spark.graft.ann.nprobe`\nstill outranks the " +
      "recommendation for operators pinning a fleet-wide\nvalue. " +
      "The suite pins (16 cells, nprobe 6, beam 8) for oracle " +
      "parity\nat test SFs.\n")
    for ((label, dir) <- sets) {
      val e = Tables.embeddings(spark, dir)
      val n = e.count()
      // exact truth for the engine's own query set
      val m = e.select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast(DoubleType) * 1000).cast(LongType)).as("mv"))
      val q = m.filter(col("vec_id") % 97 === 0 &&
          col("vec_id") < operators.Similarity.QueryIdBound)
        .select(col("vec_id").as("q_id"), col("mv").as("q_mv"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("d2"), col("vec_id"))
      val truth = m.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("d2", milli_l2(col("q_mv"), col("mv")))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      CacheScope.releaseAll()
      val defCells = operators.Similarity.servingNCells(n)
      val cellCounts =
        if (defCells == pinned) Seq(pinned) else Seq(pinned, defCells)
      var shippedIdx
          : Option[(DataFrame, DataFrame, DataFrame, DataFrame)] = None
      // the shipped default probe for THIS corpus: the build-time
      // recommendation (resolved off the shipped build's artifact
      // meta below); until then the static floor
      var shippedProbe = staticProbe
      for (nCells <- cellCounts) {
        val shippedBuild = nCells == defCells
        val tb = System.nanoTime()
        val (cents0, asg0, entries0, graph0) =
          if (!shippedBuild) operators.Similarity.servingIndex(e, nCells)
          else {
            // the shipped build goes THROUGH the store (cold, scratch
            // root) so the curve measures exactly what ensureCellIndex
            // ships: the saved layout plus the adaptive recommendation
            val prior = sources.IndexStore.root
            sources.IndexStore.root = "/tmp/graft_index_servecurve"
            org.apache.commons.io.FileUtils.deleteDirectory(
              new java.io.File(sources.IndexStore.root))
            val idx = try {
              val i = sources.IndexStore.ensureCellIndex(spark, dir, e)
              shippedProbe = sources.IndexStore
                .recommendedNProbe(spark, dir).getOrElse(staticProbe)
              i
            } finally sources.IndexStore.root = prior
            idx
          }
        val cents = CacheScope.persisted(cents0)
        val asg = CacheScope.persisted(asg0)
        val entries = CacheScope.persisted(entries0)
        val graph = CacheScope.persisted(graph0)
        graph.count()
        val buildSec = (System.nanoTime() - tb) / 1e9
        val tag = if (shippedBuild) " — the shipped √n default" +
            s" (adaptive nprobe = $shippedProbe)"
          else " — the legacy pinned build"
        sb ++= s"\n## $label ($dir) — $n vectors, " +
          s"${truth.map(_._1).toSet.size} queries, nCells = $nCells$tag " +
          f"(~${n / nCells}%d vectors/cell), index build $buildSec%.1f s\n\n"
        sb ++= "| nprobe | probed fraction | recall@5 | query wall (s) " +
          "|\n|---|---|---|---|\n"
        for (nProbe <- (Seq(2, 4, 6, 8, 16) ++
            (if (shippedBuild) Seq(shippedProbe) else Seq.empty) ++
            Seq(nCells)).distinct.sorted.filter(_ <= nCells)) {
          var best = Double.MaxValue
          var recall = 0.0
          for (_ <- 1 to 2) {
            val t0 = System.nanoTime()
            val got = operators.Similarity
              .cellProbeSearchOn(cents, asg, entries, graph, nProbe)
              .collect()
            best = math.min(best, (System.nanoTime() - t0) / 1e9)
            recall = got.map(x => (x.getLong(0), x.getLong(2))).toSet
              .count(truth.contains).toDouble / truth.size
          }
          val mark =
            if (nProbe == shippedProbe && shippedBuild) "*" else ""
          sb ++= f"| $nProbe$mark | ${nProbe.toDouble / nCells}%.3f " +
            f"| $recall%.4f | $best%.2f |\n"
        }
        if (shippedBuild)
          shippedIdx = Some((cents, asg, entries, graph))
        else CacheScope.releaseAll()
      }
      // beam-width sweep over the SHIPPED build at the shipped probe
      // count: the second query-time lever, priced like the first
      for ((cents, asg, entries, graph) <- shippedIdx) {
        sb ++= s"\n### $label beam-width sweep (nCells = $defCells, " +
          s"nprobe = $shippedProbe, via spark.graft.ann.beamWidth)\n\n"
        sb ++= "| beam width | recall@5 | query wall (s) " +
          "|\n|---|---|---|\n"
        for (bw <- Seq(4, 8, 16, 32)) {
          spark.conf.set("spark.graft.ann.beamWidth", bw.toString)
          var best = Double.MaxValue
          var recall = 0.0
          for (_ <- 1 to 2) {
            val t0 = System.nanoTime()
            val got = operators.Similarity
              .cellProbeSearchOn(cents, asg, entries, graph, shippedProbe)
              .collect()
            best = math.min(best, (System.nanoTime() - t0) / 1e9)
            recall = got.map(x => (x.getLong(0), x.getLong(2))).toSet
              .count(truth.contains).toDouble / truth.size
          }
          val mark = if (bw == operators.Similarity.GsBeam) "*" else ""
          sb ++= f"| $bw$mark | $recall%.4f | $best%.2f |\n"
        }
        spark.conf.unset("spark.graft.ann.beamWidth")
      }
      // filtered-search sweep over the SHIPPED build: s32's knob
      // story priced — a same-label (1/|labels|-selective) predicate
      // applied at the fuse, recall vs the FILTERED brute truth,
      // swept over the (nprobe, beam) grid
      for ((cents, asg, entries, graph) <- shippedIdx) {
        val ml = e.select(col("vec_id"), col("label"),
          transform(col("embedding"),
            x => floor(x.cast(DoubleType) * 1000).cast(LongType)).as("mv"))
        val ql = ml.filter(col("vec_id") % 97 === 0 &&
            col("vec_id") < operators.Similarity.QueryIdBound)
          .select(col("vec_id").as("q_id"), col("label").as("q_lbl"),
            col("mv").as("q_mv"))
        val fw = Window.partitionBy(col("q_id"))
          .orderBy(col("d2"), col("vec_id"))
        val ftruth = ml.join(broadcast(ql),
            col("vec_id") =!= col("q_id") && col("label") === col("q_lbl"))
          .withColumn("d2", milli_l2(col("q_mv"), col("mv")))
          .withColumn("rk", row_number().over(fw)).filter(col("rk") <= 5)
          .select(col("q_id"), col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        sb ++= s"\n### $label filtered-search sweep (s32: same-label " +
          s"fuse predicate, nCells = $defCells)\n\n"
        sb ++= "Recall@5 vs the FILTERED brute truth (same-label " +
          "milli-L2 top-5).\nThe predicate is ~1/10-selective, so " +
          "each fused beam thins ~10× — the\nquery-time knobs are " +
          "the recovery lever (the shipped index is\nuntouched " +
          "across every row).\n\n"
        sb ++= "| nprobe | beam width | recall@5 | query wall (s) " +
          "|\n|---|---|---|---|\n"
        for ((np, bw) <- Seq((shippedProbe, operators.Similarity.GsBeam),
            (16, operators.Similarity.GsBeam), (shippedProbe, 32),
            (16, 32), (math.min(64, defCells), 32)).distinct
            .filter(_._1 <= defCells)) {
          var best = Double.MaxValue
          var recall = 0.0
          for (_ <- 1 to 2) {
            val t0 = System.nanoTime()
            val got = operators.Retrieval
              .filteredSearch(e, cents, asg, entries, graph,
                nProbe = np, beamWidth = bw)
              .collect()
            best = math.min(best, (System.nanoTime() - t0) / 1e9)
            recall = got.map(x => (x.getLong(0), x.getLong(2))).toSet
              .count(ftruth.contains).toDouble / ftruth.size
          }
          val mark = if (np == shippedProbe &&
            bw == operators.Similarity.GsBeam) "*" else ""
          sb ++= f"| $np$mark | $bw | $recall%.4f | $best%.2f |\n"
        }
        CacheScope.releaseAll()
      }
      // PQ serving sweep (s28/s31's memory-bounded path): codebook
      // size × re-rank budget at the shipped √n cells and the
      // adaptive probe count — the grid that prices the shipped
      // (k=8, rerank=16) shortlist default like the dense path's
      // beam sweep prices its default
      sb ++= s"\n### $label PQ serving sweep (s28: nCells = $defCells, " +
        s"nprobe = $shippedProbe, shipped codebook k = " +
        s"${operators.Similarity.PqK}, shipped rerank = " +
        s"${operators.Similarity.S28Rerank})\n\n"
      sb ++= "Recall@5 vs the same milli brute truth; the ADC scan " +
        "reads codes only,\nthe re-rank touches nprobe·rerank exact " +
        "vectors per query. Each codebook\nrow is its own index " +
        "build (build wall listed once per k).\n\n"
      sb ++= "| codebook k | rerank | recall@5 | query wall (s) " +
        "| index build (s) |\n|---|---|---|---|---|\n"
      for (pqK <- Seq(4, 8, 16)) {
        val tb = System.nanoTime()
        val (pc0, pa0, pb0, pcd0) =
          operators.Similarity.pqIndex(e, defCells, pqK)
        val pc = CacheScope.persisted(pc0)
        val pa = CacheScope.persisted(pa0)
        val pb = CacheScope.persisted(pb0)
        val pcd = CacheScope.persisted(pcd0)
        pcd.count()
        val pqBuild = (System.nanoTime() - tb) / 1e9
        var first = true
        for (rr <- Seq(8, 16, 32, 64)) {
          var best = Double.MaxValue
          var recall = 0.0
          for (_ <- 1 to 2) {
            val t0 = System.nanoTime()
            val got = operators.Similarity
              .pqServeOn(pc, pa, pb, pcd, nProbe = shippedProbe,
                rerank = rr)
              .collect()
            best = math.min(best, (System.nanoTime() - t0) / 1e9)
            recall = got.map(x => (x.getLong(0), x.getLong(2))).toSet
              .count(truth.contains).toDouble / truth.size
          }
          val mark = if (pqK == operators.Similarity.PqK &&
            rr == operators.Similarity.S28Rerank) "*" else ""
          val buildCol = if (first) f"$pqBuild%.1f" else ""
          sb ++= f"| $pqK$mark | $rr | $recall%.4f | $best%.2f " +
            s"| $buildCol |\n"
          first = false
        }
        CacheScope.releaseAll()
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      sb.toString)
    println(s"[servecurve] wrote $out")
  }
}
