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

  /** True iff the postgres driver (and thus the COPY API) is loadable.
    * LinkageError (broken/mismatched jar) must also take the INSERT
    * fallback instead of killing the task. */
  def available(): Boolean =
    try { Class.forName("org.postgresql.PGConnection"); true }
    catch {
      case _: ClassNotFoundException => false
      case _: LinkageError => false
    }

  /** True iff THIS connection is a postgres connection — classpath
    * presence alone must not route a Derby/H2/SQLite connection into
    * COPY (unwrap would throw and the write would die without ever
    * reaching the INSERT fallback). */
  def isPostgres(conn: Connection): Boolean =
    available() && {
      try conn.isWrapperFor(
        Class.forName("org.postgresql.PGConnection")
          .asInstanceOf[Class[AnyRef]])
      catch { case _: Throwable => false }
    }

  /** CSV-encode one field per COPY CSV rules: null → empty unquoted,
    * strings quoted with doubled quotes, Seq → postgres array literal,
    * binary → bytea hex. Nested structs/maps are rejected loudly —
    * silently emitting their toString would shift columns mid-stream.
    */
  /** Postgres array-literal text form of a Seq — shared by the COPY
    * CSV encoder and [[Sinks.writeJdbc]]'s no-ARRAY-support fallback. */
  def arrayLiteral(seq: scala.collection.Seq[_]): String =
    seq.map {
      case null => "NULL"
      case e =>
        val s = e.toString
        "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")

  def fieldToCsv(v: Any): String = v match {
    case null => ""
    case s: String => quote(s)
    case bytes: Array[Byte] =>
      quote("\\x" + bytes.map("%02x".format(_)).mkString)
    case seq: scala.collection.Seq[_] => quote(arrayLiteral(seq))
    case _: org.apache.spark.sql.Row | _: scala.collection.Map[_, _] =>
      throw new IllegalArgumentException(
        s"COPY CSV does not support nested struct/map columns; " +
          "flatten the DataFrame before writeJdbc")
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
    // quote identifiers: mixed-case/reserved names survive, and no
    // identifier can smuggle SQL into the COPY statement
    def q(ident: String) = "\"" + ident.replace("\"", "\"\"") + "\""
    val sql = s"""COPY ${q(table)} (${columns.map(q).mkString(", ")})
                 |FROM STDIN WITH (FORMAT csv)""".stripMargin
    val m = copyApi.getClass.getMethod("copyIn", classOf[String], classOf[Reader])
    m.setAccessible(true)
    m.invoke(copyApi, sql, new RowReader(rows)).asInstanceOf[java.lang.Long].longValue()
  }
}
