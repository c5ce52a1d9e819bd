package graft.sources

import org.apache.spark.sql.Row

import java.io.Reader
import java.sql.Connection

/** Postgres COPY fast path (reference O14: `COPY ... FROM STDIN`,
  * `db.rs:242-244`) wired via reflection so the library compiles with
  * zero JDBC-driver dependency; at runtime it activates iff pgjdbc is
  * on the executor classpath, else [[Sinks.writeJdbc]] falls back to
  * batched INSERTs.
  *
  * The CSV serialization (the part with real correctness risk —
  * quoting, nulls, array literals) is pure and unit-tested; the
  * reflective plumbing is a thin adapter over pgjdbc's CopyManager.
  */
object PgCopy {

  /** True iff the postgres driver (and thus the COPY API) is loadable. */
  def available(): Boolean =
    try { Class.forName("org.postgresql.PGConnection"); true }
    catch { case _: ClassNotFoundException => false }

  /** CSV-encode one field per COPY CSV rules: null → empty unquoted,
    * strings quoted with doubled quotes, Seq → postgres array literal.
    */
  def fieldToCsv(v: Any): String = v match {
    case null => ""
    case s: String => quote(s)
    case seq: scala.collection.Seq[_] =>
      quote(seq.map {
        case null => "NULL"
        case e =>
          val s = e.toString
          "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      }.mkString("{", ",", "}"))
    case other => other.toString
  }

  private def quote(s: String): String =
    "\"" + s.replace("\"", "\"\"") + "\""

  def rowToCsv(row: Row): String =
    (0 until row.length).map(i => fieldToCsv(row.get(i))).mkString(",") + "\n"

  /** Streaming Reader over an iterator of rows — COPY consumes it
    * without materializing the partition. */
  final class RowReader(rows: Iterator[Row]) extends Reader {
    private var buf: String = ""
    private var pos = 0
    override def read(cbuf: Array[Char], off: Int, len: Int): Int = {
      if (pos >= buf.length) {
        if (!rows.hasNext) return -1
        buf = rowToCsv(rows.next()); pos = 0
      }
      val n = math.min(len, buf.length - pos)
      buf.getChars(pos, pos + n, cbuf, off)
      pos += n
      n
    }
    override def close(): Unit = ()
  }

  /** COPY the rows into `table` over `conn` (must be a pgjdbc
    * connection). Returns rows written. */
  def copyIn(conn: Connection, table: String, columns: Seq[String],
      rows: Iterator[Row]): Long = {
    val pgIface = Class.forName("org.postgresql.PGConnection")
    val unwrapped = conn.unwrap(pgIface.asInstanceOf[Class[AnyRef]])
    val copyApi = pgIface.getMethod("getCopyAPI").invoke(unwrapped)
    val sql = s"""COPY $table (${columns.mkString(", ")})
                 |FROM STDIN WITH (FORMAT csv)""".stripMargin
    val m = copyApi.getClass.getMethod("copyIn", classOf[String], classOf[Reader])
    m.setAccessible(true)
    m.invoke(copyApi, sql, new RowReader(rows)).asInstanceOf[java.lang.Long].longValue()
  }
}
