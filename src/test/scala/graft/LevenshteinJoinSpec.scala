package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Losslessness of q12's ED-Join candidate generation (q-gram prefix
  * filtering + positional filter + short-name fallback) against the
  * naive within-block pair join. The DuckDB oracle proves equality on
  * the real catalog at three SFs; these fixtures force the paths real
  * part names never hit: short names (below the q-gram guarantee),
  * exact distance boundaries, and randomized mutated families.
  */
class LevenshteinJoinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def parts(rows: (Long, String, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("p_partkey", "p_brand", "p_type", "p_name")
  }

  /** Naive reference: full block join + unbounded levenshtein. */
  private def naive(df: DataFrame): Set[(Long, Long, Int)] = {
    val a = df.select(col("p_brand"), col("p_type"),
      col("p_partkey").as("id_a"), col("p_name").as("name_a"))
    val b = df.select(col("p_brand"), col("p_type"),
      col("p_partkey").as("id_b"), col("p_name").as("name_b"))
    a.join(b, Seq("p_brand", "p_type"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 2)
      .select(col("id_a"), col("id_b"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def edjoin(df: DataFrame): Set[(Long, Long, Int)] = {
    val got = operators.Relational.levenshteinPairs(df)
      .select(col("id_a"), col("id_b"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    CacheScope.releaseAll()
    got
  }

  test("boundary distances: 2 kept with exact dist, 3 dropped; blocks respected") {
    val df = parts(
      (1L, "B1", "T1", "almond antique blue"),
      (2L, "B1", "T1", "almond antique blux"),      // dist 1
      (3L, "B1", "T1", "almond antiqeu blxe"),      // dist ~3 from 1
      (4L, "B1", "T1", "almond antique bl"),        // dist 2 from 1 (2 dels)
      (5L, "B1", "T2", "almond antique blue"),      // other type: excluded
      (6L, "B2", "T1", "almond antique blue"),      // other brand: excluded
    )
    val got = edjoin(df)
    assert(got == naive(df))
    assert(got.contains((1L, 2L, 1)))
    assert(got.contains((1L, 4L, 2)))
    assert(!got.exists { case (a, b, _) => Set(a, b).contains(5L) || Set(a, b).contains(6L) })
    assert(!got.contains((1L, 3L, 3)))
  }

  test("short names (below the q-gram guarantee) go through the fallback") {
    val df = parts(
      (1L, "B1", "T1", "ab"),        // len < q: no grams at all
      (2L, "B1", "T1", "abc"),       // dist 1 from 1
      (3L, "B1", "T1", "abcdefgh"),  // len 8 < 9: below guarantee
      (4L, "B1", "T1", "abcdefg"),   // dist 1 from 3
      (5L, "B1", "T1", "abcdefghijk"), // len 11: gram path, dist 3 from 3
      (6L, "B1", "T1", "zz"),        // dist 2 from 1 via subst+subst? ("ab"->"zz")
    )
    val got = edjoin(df)
    assert(got == naive(df))
    assert(got.contains((1L, 2L, 1)))
    assert(got.contains((3L, 4L, 1)))
    assert(got.contains((1L, 6L, 2)))
    // mixed short/long pair at dist 3 must be excluded like any other
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(3L, 5L) })
  }

  test("unblocked mode finds cross-first-letter pairs the old blocking lost") {
    import spark.implicits._
    val artists = Seq(
      (1L, "Zebra"), (2L, "Aebra"),          // first letter edited: dist 1
      (3L, "The Persuader"), (4L, "She Persuader"), // dist 1, letter differs
      (5L, "ABBA"), (6L, "ABBB"),            // short tail, dist 1
      (7L, "Unrelated Name"),
    ).toDF("id", "name")
    val got = operators.EditDistanceJoin.pairs(artists, Seq.empty, tau = 2)
      .select(col("id_a"), col("id_b"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    CacheScope.releaseAll()
    assert(got == Set((1L, 2L, 1), (3L, 4L, 1), (5L, 6L, 1)))
  }

  test("randomized mutated families: ED-Join equals the naive join") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghij"
    def word(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (1 to edits).foreach { _ =>
        val i = rnd.nextInt(math.max(cur.length, 1))
        rnd.nextInt(3) match {
          case 0 if cur.length > 1 => cur = cur.take(i) + cur.drop(i + 1) // del
          case 1 => cur = cur.take(i) + alphabet(rnd.nextInt(10)) + cur.drop(i) // ins
          case _ if cur.nonEmpty =>
            cur = cur.updated(math.min(i, cur.length - 1), alphabet(rnd.nextInt(10))) // sub
          case _ => ()
        }
      }
      cur
    }
    // 40 base names (len 9-24 — spans the guarantee boundary), each
    // spawning 0-3 mutants at 1-4 edits, spread over 2 blocks
    var id = 0L
    val rows = (1 to 40).flatMap { k =>
      val base = word(9 + rnd.nextInt(16))
      val brand = s"B${k % 2}"
      (0 to rnd.nextInt(3)).map { _ =>
        id += 1
        val name = if (id % 3 == 0L) base else mutate(base, 1 + rnd.nextInt(4))
        (id, brand, "T1", name)
      }
    }
    val df = parts(rows: _*)
    val want = naive(df)
    assert(want.nonEmpty, "fixture produced no qualifying pairs — vacuous")
    assert(edjoin(df) == want)
  }
}
