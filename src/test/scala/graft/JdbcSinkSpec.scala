package graft

import graft.sources.{PgCopy, Sinks}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import java.sql.DriverManager

/** End-to-end coverage of the relational sink (reference O14/O16,
  * `db.rs:55-180`) against embedded Derby — the JDBC engine on the
  * Spark runtime classpath. local-mode executors share the driver JVM,
  * so Derby's in-memory database is visible to foreachPartition tasks.
  *
  * Derby has no SQL ARRAY type, which also exercises the documented
  * degradation: array columns land as postgres-array-literal text.
  */
class JdbcSinkSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val cfg = Sinks.JdbcConfig(
    "jdbc:derby:memory:graftsink;create=true", "", "", batchSize = 100)

  private def query[A](sql: String)(f: java.sql.ResultSet => A): Vector[A] = {
    val conn = DriverManager.getConnection(cfg.url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val out = Vector.newBuilder[A]
      while (rs.next()) out += f(rs)
      out.result()
    } finally conn.close()
  }

  test("initTable + writeJdbc land every row through batched INSERTs") {
    import spark.implicits._
    Sinks.initTable(cfg,
      """CREATE TABLE release_sink (
        |  id INT NOT NULL, title VARCHAR(200), genres VARCHAR(400))""".stripMargin)
    // 250 rows at batchSize=100 exercises both the mid-stream flush
    // and the final partial batch
    val df = (1 to 250)
      .map(i => (i, s"Title $i", Seq(s"g${i % 3}", "common")))
      .toDF("id", "title", "genres")
      .repartition(4) // multiple partitions → one connection each
    Sinks.writeJdbc(df, "release_sink", cfg)
    val n = query("SELECT COUNT(*) FROM release_sink")(_.getLong(1))
    assert(n == Vector(250L))
    val row42 = query(
      "SELECT title, genres FROM release_sink WHERE id = 42")(
      rs => (rs.getString(1), rs.getString(2)))
    assert(row42 == Vector(("Title 42", """{"g0","common"}""")))
  }

  test("initTable implements truncate-and-reload (drop + recreate)") {
    Sinks.initTable(cfg, "CREATE TABLE reload_t (x INT)")
    val conn = DriverManager.getConnection(cfg.url)
    try conn.createStatement().execute("INSERT INTO reload_t VALUES (1)")
    finally conn.close()
    // second init: caller-supplied DDL drops and recreates empty
    Sinks.initTable(cfg,
      "DROP TABLE reload_t; CREATE TABLE reload_t (x INT)")
    assert(query("SELECT COUNT(*) FROM reload_t")(_.getLong(1)) == Vector(0L))
  }

  test("streaming events land in Derby via the foreachBatch bridge") {
    Sinks.initTable(cfg,
      "CREATE TABLE stream_sink (event_id BIGINT, user_id BIGINT, value DOUBLE)")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-jdbc").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val events = graft.streaming.EventStreams.readEventStream(spark, dir)
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("value"))
    val q = Sinks.jdbcStreamWriter(events, "stream_sink", cfg).start()
    try q.processAllAvailable() finally q.stop()
    val n = query("SELECT COUNT(*) FROM stream_sink")(_.getLong(1))
    val want = Tables.events(spark, "/root/testdata/sf0.001").count()
    assert(n == Vector(want))
  }

  test("COPY CSV stream is byte-exact on a mixed golden batch") {
    val rows = Iterator(
      Row(1, "plain", Seq("Electronic", "Jazz"), null),
      Row(2, "say \"hi\"", Seq.empty[String], 3.5),
      Row(3, "a,b\nc", Seq("x\"y", "z\\w"), 0.25),
      Row(null, null, null, null))
    val r = new PgCopy.RowReader(rows)
    val sb = new StringBuilder
    val buf = new Array[Char](7) // odd size: exercises buffer refills
    var n = r.read(buf, 0, buf.length)
    while (n >= 0) { sb.appendAll(buf, 0, n); n = r.read(buf, 0, buf.length) }
    val golden =
      "1,\"plain\",\"{\"\"Electronic\"\",\"\"Jazz\"\"}\",\n" +
        "2,\"say \"\"hi\"\"\",\"{}\",3.5\n" +
        "3,\"a,b\nc\",\"{\"\"x\\\"\"y\"\",\"\"z\\\\w\"\"}\",0.25\n" +
        ",,,\n"
    assert(sb.toString == golden)
  }
}
