package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("synthesized media has the declared schema and binary payloads") {
    val m = Multimodal.synthesizeMedia(spark, sfDir)
    assert(m.schema.fieldNames.toSeq ==
      Seq("doc_id", "media", "format", "width", "height", "n_frames"))
    val row = m.orderBy("doc_id").first()
    assert(row.getAs[Array[Byte]]("media").length == 128) // 2 md5 × 4 reps
    assert(Set("jpeg", "png", "webm").contains(row.getAs[String]("format")))
  }

  test("decodeFeatures is deterministic and preserves row count") {
    val m = Multimodal.synthesizeMedia(spark, sfDir)
    val f1 = Multimodal.decodeFeatures(m).orderBy("doc_id").collect()
    val f2 = Multimodal.decodeFeatures(m).orderBy("doc_id").collect()
    assert(f1.length == m.count())
    def feats(rows: Array[org.apache.spark.sql.Row]): Seq[Seq[Float]] =
      rows.map(_.getAs[scala.collection.Seq[Float]]("features").toSeq).toSeq
    assert(feats(f1) == feats(f2))
    // feature vectors are 8-dim normalized histograms
    val feats0 = feats(f1).head
    assert(feats0.length == 8)
    assert(math.abs(feats0.sum - 1.0f) < 1e-3)
  }

  test("frameSample yields ceil(n_frames/stride) frames per doc") {
    val m = Multimodal.synthesizeMedia(spark, sfDir)
    val sampled = Multimodal.frameSample(m, stride = 4)
      .groupBy("doc_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = m.select("doc_id", "n_frames").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1) + 3) / 4).toLong).toMap
    assert(sampled == expected)
  }

  test("m01/m02 query entries run and return rows") {
    assert(Multimodal.m01_media_features(spark, sfDir).count() == 3)
    assert(Multimodal.m02_frame_sample(spark, sfDir).count() == 500)
  }
}
