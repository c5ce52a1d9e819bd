package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL / CSV corpus ingestion and export — the wire formats
  * training-data pipelines actually exchange (web-scrape deliveries,
  * annotation-vendor roundtrips) before everything becomes parquet.
  *
  * Same malformed-record policy as the XML path
  * ([[DiscogsXml.rejects]]): explicit schema (never inference — an
  * inference pass is a second full scan at 100 TB and a schema that
  * drifts with the sample), PERMISSIVE parse into a corrupt-record
  * column, good rows filtered, rejects counted not crashed.
  *
  * Scale: uncompressed JSONL and CSV are SPLITTABLE — Spark assigns
  * `maxPartitionBytes` slices of one file to parallel tasks, so a
  * single 1 TB delivery fans out across the cluster without any
  * re-stage (the gz variants are 1 task/file — re-stage those via
  * [[DiscogsXml.restage]]-style compaction first). Parsing is
  * per-line Jackson/Univocity inside codegen; nothing shuffles.
  */
object TextCorpus {

  private val CorruptCol = "__corrupt_record"

  /** documents-table schema, the library's canonical corpus shape. */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType))

  /** Parsed-clean rows of a JSONL file: records that fail to parse or
    * carry a null id are dropped here and surface in [[jsonlRejects]].
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType = documentSchema, idCol: String = "doc_id"): DataFrame =
    rawJsonl(spark, path, schema)
      .filter(col(CorruptCol).isNull && col(idCol).isNotNull)
      .drop(CorruptCol)

  /** Counted rejects of a JSONL file — one row per bad record with the
    * reason and the raw line for triage. */
  def jsonlRejects(spark: SparkSession, path: String,
      schema: StructType = documentSchema, idCol: String = "doc_id"): DataFrame =
    rawJsonl(spark, path, schema)
      .filter(col(CorruptCol).isNotNull || col(idCol).isNull)
      .select(
        when(col(CorruptCol).isNotNull, "corrupt")
          .otherwise("null_id").as("reason"),
        col(idCol).cast(StringType).as("id_raw"),
        col(CorruptCol).as("corrupt_record"))

  private def rawJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** One JSON object per line, newline-delimited. `lines` controls the
    * file count (shard count) of the delivery; compression "none" keeps
    * the output splittable, "gzip" trades that for size. */
  def writeJsonl(df: DataFrame, path: String, shards: Int = 0,
      compression: String = "none"): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .json(path)
  }

  /** Parsed-clean rows of a headered CSV file, same reject policy as
    * JSONL. multiLine stays OFF (the default): quoted embedded
    * newlines would require it, but turning it on makes the file
    * non-splittable — one task per file regardless of size — so the
    * contract is "writer escapes newlines", enforced by [[writeCsv]].
    */
  def readCsv(spark: SparkSession, path: String,
      schema: StructType = documentSchema, idCol: String = "doc_id"): DataFrame =
    rawCsv(spark, path, schema)
      .filter(col(CorruptCol).isNull && col(idCol).isNotNull)
      .drop(CorruptCol)

  /** Counted rejects of a CSV file. */
  def csvRejects(spark: SparkSession, path: String,
      schema: StructType = documentSchema, idCol: String = "doc_id"): DataFrame =
    rawCsv(spark, path, schema)
      .filter(col(CorruptCol).isNotNull || col(idCol).isNull)
      .select(
        when(col(CorruptCol).isNotNull, "corrupt")
          .otherwise("null_id").as("reason"),
        col(idCol).cast(StringType).as("id_raw"),
        col(CorruptCol).as("corrupt_record"))

  private def rawCsv(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      // a malformed row shorter/longer than the schema is a reject,
      // not a silently null-padded row
      .option("enforceSchema", "false")
      .csv(path)

  /** Headered CSV export with newlines escaped out of every string
    * column, keeping the files splittable for the next reader (see
    * [[readCsv]]). */
  def writeCsv(df: DataFrame, path: String, shards: Int = 0): Unit = {
    val cleaned = df.schema.fields.foldLeft(df) {
      case (acc, f) if f.dataType == StringType =>
        acc.withColumn(f.name,
          regexp_replace(col(f.name), "[\\r\\n]", " "))
      case (acc, _) => acc
    }
    val out = if (shards > 0) cleaned.repartition(shards) else cleaned
    out.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .csv(path)
  }
}
