package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** All-pairs edit-distance self-join at scale — the machinery behind
  * q12 and the discogs `nearDuplicateArtists`, extracted because both
  * previously relied on fixed-cardinality blocking keys ((brand,type),
  * first letter) whose blocks grow linearly with the catalog and whose
  * within-block pairs therefore grow quadratically (and first-letter
  * blocking was additionally recall-LOSSY: one edit can change the
  * first letter).
  *
  * Two lossless candidate paths, unioned and deduped before the
  * bounded-levenshtein verify:
  *
  *  - **q-gram prefix filtering** (Gravano et al. / ED-Join) for names
  *    long enough for the overlap guarantee: ed(a,b) ≤ τ ⇒ multiset
  *    q-gram overlap ≥ max(|Ga|,|Gb|) − q·τ, so under one per-block
  *    (df asc, gram, occurrence) total order any qualifying pair
  *    shares a gram within each side's first q·τ+1 entries, at
  *    position displacement ≤ τ. Rare grams lead every prefix — a hot
  *    gram can never flood the join. Mixed short/long pairs are
  *    covered here too: the short side's whole gram list IS its
  *    prefix, and the guarantee only needs the longer side.
  *  - **symmetric deletion neighborhoods** (FastSS / SymSpell) for the
  *    short tail (len < q·(τ+1)), where gram overlap proves nothing:
  *    ed(a,b) ≤ τ ⇒ some ≤τ-deletion variant of a equals some
  *    ≤τ-deletion variant of b, so joining on variant digests is
  *    lossless and each short name emits ≤ 1 + L + C(L,2) ≤ 37
  *    variants. Unlike a short-name block join, candidates are
  *    ∝ variant collisions, not the square of the short population.
  */
object EditDistanceJoin {

  /** Pairs `(id_a < id_b)` with `levenshtein(name_a, name_b) ≤ tau`,
    * optionally restricted to rows agreeing on `blockCols`. Input
    * needs columns `id` (unique across all blocks) and `name` plus
    * `blockCols`; output carries blockCols, id/name pairs, and the
    * exact `dist`.
    */
  def pairs(named: DataFrame, blockCols: Seq[String], tau: Int,
      q: Int = 3): DataFrame = {
    require(tau >= 1 && tau <= 2,
      s"deletion neighborhoods implemented to depth 2, got tau=$tau")
    val prefixLen = q * tau + 1
    val minLongLen = q * (tau + 1)
    val keep = blockCols.map(col)
    val base = named
      .select((keep :+ col("id") :+ col("name")): _*)
      .withColumn("len", length(col("name")))

    // ---- gram-prefix path: every name with at least one q-gram
    val grams = base.filter(col("len") >= q)
      .select((keep :+ col("id") :+ col("name") :+ col("len") :+
        posexplode(expr(
          s"transform(sequence(1, length(name) - ${q - 1}), i -> substring(name, i, $q))"))
          .as(Seq("pos", "gram"))): _*)
    val df = grams.groupBy((keep :+ col("gram")): _*)
      .agg(count(lit(1)).as("gdf"))
    val wPrefix = Window.partitionBy(col("id"))
      .orderBy(col("gdf"), col("gram"), col("pos"))
    val prefixes = graft.CacheScope.persisted(
      grams.join(df, blockCols :+ "gram")
        .withColumn("rn", row_number().over(wPrefix))
        .filter(col("rn") <= prefixLen)
        .select((keep :+ col("gram") :+ col("pos") :+ col("id") :+
          col("name") :+ col("len")): _*))
    def gSide(s: String) = prefixes.select((keep :+ col("gram") :+
      col("pos").as(s"pos_$s") :+ col("id").as(s"id_$s") :+
      col("name").as(s"name_$s") :+ col("len").as(s"len_$s")): _*)
    val gramPairs = gSide("a").join(gSide("b"), blockCols :+ "gram")
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= tau &&
        // positional filter (ED-Join): a gram surviving τ edits moves
        // by at most τ positions — lossless, cuts same-gram candidates
        abs(col("pos_a") - col("pos_b")) <= tau)
      .select((keep :+ col("id_a") :+ col("id_b") :+ col("name_a") :+
        col("name_b")): _*)

    // ---- symmetric-deletion path: short-short pairs (mixed
    // short/long pairs ride the gram path above — the short side's
    // whole gram list is its prefix and the overlap guarantee only
    // needs the longer side; names under q chars have no grams but
    // can only pair with names within τ of their length, which are
    // also short and therefore here)
    val del1 = "transform(sequence(1, length(name)), i -> " +
      "concat(substring(name, 1, i-1), substring(name, i+1, length(name))))"
    val del2 = "flatten(transform(sequence(1, length(name)), i -> " +
      "filter(transform(sequence(1, length(name)), j -> if(j > i, " +
      "concat(substring(name, 1, i-1), substring(name, i+1, j-i-1), " +
      "substring(name, j+1, length(name))), null)), x -> isnotnull(x))))"
    val variants =
      if (tau == 1)
        s"array_distinct(concat(array(name), if(length(name) < 1, array(), $del1)))"
      else
        s"array_distinct(concat(array(name), if(length(name) < 1, array(), $del1), " +
          s"if(length(name) < 2, array(), $del2)))"
    val shorts = base.filter(col("len") < minLongLen)
      .select((keep :+ col("id") :+ col("name") :+ col("len") :+
        explode(expr(variants)).as("variant")): _*)
      .select((keep :+ md5(col("variant")).as("vh") :+ col("id") :+
        col("name") :+ col("len")): _*)
    def sSide(s: String) = shorts.select((keep :+ col("vh") :+
      col("id").as(s"id_$s") :+ col("name").as(s"name_$s") :+
      col("len").as(s"len_$s")): _*)
    val shortPairs = sSide("a").join(sSide("b"), blockCols :+ "vh")
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= tau)
      .select((keep :+ col("id_a") :+ col("id_b") :+ col("name_a") :+
        col("name_b")): _*)

    gramPairs.union(shortPairs)
      .distinct()
      // bounded levenshtein early-exits past the threshold — exact
      // for distances within it, O(len·τ) instead of O(len²)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), tau + 1))
      .filter(col("dist").between(0, tau))
  }
}
