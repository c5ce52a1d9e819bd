package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: registers graft's native
  * functions for SQL use. Wire up with either
  *   `spark.sql.extensions=graft.GraftExtensions` or
  *   `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * Injected functions: cosine_similarity, dot_product, l2_normalize,
  * normalized_dot, simhash64, word_shingles, minhash_signature,
  * minhash_bands, array_jaccard, winnow_fingerprints, hyperplane_sigs.
  * Injected optimizer rules: [[graft.plans.CosineFusionRule]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, usage, b) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        GraftExtensions.info(name, usage), b))
    }
    // post-resolution optimizer rule: single-pass cosine fusion (see
    // CosineFusionRule scaladoc for the semantics trade)
    ext.injectOptimizerRule(_ => graft.plans.CosineFusionRule)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def intArg(es: Seq[Expression], i: Int, default: Int): Int =
    if (es.length <= i) default
    else es(i).eval() match {
      case n: Int => n
      case n: Long => n.toInt
      case n: Short => n.toInt
      case n: Byte => n.toInt
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} must be an integer literal, got $other")
    }

  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      "cosine_similarity(a, b) - cosine similarity of two float/double arrays",
      es => functions.CosineSimilarity(es.head, es(1))),
    ("dot_product", "dot_product(a, b) - dot product of two arrays",
      es => functions.DotProduct(es.head, es(1))),
    ("l2_normalize", "l2_normalize(v) - v / ||v||",
      es => functions.L2Normalize(es.head)),
    ("normalized_dot",
      "normalized_dot(a, b) - dot(a, b) / (||a|| * ||b||), full-length norms",
      es => functions.NormalizedDot(es.head, es(1))),
    ("simhash64", "simhash64(tokens) - 64-bit simhash fingerprint",
      es => functions.SimHash64(es.head)),
    ("word_shingles", "word_shingles(tokens[, n]) - n-token shingles",
      es => functions.WordShingles(es.head, intArg(es, 1, 3))),
    ("minhash_signature", "minhash_signature(shingles[, k]) - k minhash slots",
      es => functions.MinHashSignature(es.head, intArg(es, 1, 64))),
    ("minhash_bands", "minhash_bands(shingles[, bands, rows]) - LSH bucket keys",
      es => functions.MinHashBands(es.head, intArg(es, 1, 16), intArg(es, 2, 4))),
    ("array_jaccard", "array_jaccard(a, b) - exact set Jaccard similarity",
      es => functions.ArrayJaccard(es.head, es(1))),
    ("winnow_fingerprints",
      "winnow_fingerprints(text[, k, w]) - MOSS winnowing fingerprints",
      es => functions.WinnowFingerprints(es.head,
        intArg(es, 1, 8), intArg(es, 2, 4))),
    ("hyperplane_sigs",
      "hyperplane_sigs(v[, nTables, bits, dim, seed]) - multi-table LSH signatures",
      es => functions.HyperplaneSigs(es.head, intArg(es, 1, 16),
        intArg(es, 2, 8), intArg(es, 3, 64), intArg(es, 4, 42).toLong)),
  )

  /** Register the same functions on an already-built session (e.g. one
    * created without `withExtensions`). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, _, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, b, "built-in")
    }
}
