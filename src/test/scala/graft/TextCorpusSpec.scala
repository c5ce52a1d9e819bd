package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextCorpus

/** JSONL/CSV corpus ingestion: roundtrip fidelity against the parquet
  * documents table, and the malformed-record policy (bad lines become
  * counted rejects, never silent null rows or job failures).
  */
class TextCorpusSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

  private def docs = Tables.documents(spark, sfDir)

  test("JSONL roundtrip preserves every document bit-for-bit") {
    val dir = tempDir("graft-jsonl")
    try {
      TextCorpus.writeJsonl(docs, s"$dir/out", shards = 3)
      val back = TextCorpus.readJsonl(spark, s"$dir/out")
      assert(back.count() === docs.count())
      // symmetric difference empty = exact content equality
      assert(back.exceptAll(docs.select(back.columns.map(col): _*)).isEmpty)
      assert(docs.select(back.columns.map(col): _*).exceptAll(back).isEmpty)
    } finally cleanup(dir)
  }

  test("CSV roundtrip preserves every document (corpus has no newlines)") {
    val dir = tempDir("graft-csv")
    try {
      TextCorpus.writeCsv(docs, s"$dir/out", shards = 2)
      val back = TextCorpus.readCsv(spark, s"$dir/out")
      assert(back.count() === docs.count())
      assert(back.exceptAll(docs.select(back.columns.map(col): _*)).isEmpty)
    } finally cleanup(dir)
  }

  test("malformed JSONL lines and null ids become counted rejects, not rows") {
    val dir = tempDir("graft-jsonl-bad")
    try {
      val lines = Seq(
        """{"doc_id": 1, "text": "good one", "lang": "en", "source": "s", "n_chars": 8}""",
        """{"doc_id": 2, "text": "also good", "lang": "en", "source": "s", "n_chars": 9}""",
        """{"doc_id": 3, "text": "truncated...""", // malformed JSON
        """{"text": "no id at all", "lang": "en", "source": "s", "n_chars": 12}""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/in.jsonl"),
        lines.mkString("\n").getBytes("UTF-8"))
      val good = TextCorpus.readJsonl(spark, s"$dir/in.jsonl")
      assert(good.count() === 2)
      assert(good.agg(sum("doc_id")).head.getLong(0) === 3L)
      val rej = TextCorpus.jsonlRejects(spark, s"$dir/in.jsonl")
        .groupBy("reason").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rej === Map("corrupt" -> 1L, "null_id" -> 1L))
    } finally cleanup(dir)
  }

  test("malformed CSV rows become counted rejects") {
    val dir = tempDir("graft-csv-bad")
    try {
      val lines = Seq(
        "doc_id,text,lang,source,n_chars",
        "1,hello,en,s,5",
        "not_a_number,world,en,s,5", // doc_id fails the long cast
        ",orphan,en,s,6")            // null id
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/in.csv"),
        lines.mkString("\n").getBytes("UTF-8"))
      val good = TextCorpus.readCsv(spark, s"$dir/in.csv")
      assert(good.count() === 1)
      val rej = TextCorpus.csvRejects(spark, s"$dir/in.csv")
      assert(rej.count() === 2)
    } finally cleanup(dir)
  }

  test("writeCsv escapes embedded newlines so the export stays splittable") {
    val dir = tempDir("graft-csv-nl")
    try {
      import spark.implicits._
      val df = Seq((1L, "line one\nline two", "en", "s", 17L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      TextCorpus.writeCsv(df, s"$dir/out")
      val back = TextCorpus.readCsv(spark, s"$dir/out")
      assert(back.count() === 1)
      assert(back.select("text").head.getString(0) === "line one line two")
    } finally cleanup(dir)
  }
}
