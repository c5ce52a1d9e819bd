package graft

import graft.sources.PgCopy
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The COPY CSV serializer is the correctness-bearing part of the
  * postgres fast path (the reflective plumbing is a thin adapter and
  * needs a live server); it is tested exhaustively here.
  */
class PgCopySpec extends AnyFunSuite {

  test("scalar fields: nulls empty, strings quoted, quotes doubled") {
    assert(PgCopy.fieldToCsv(null) == "")
    assert(PgCopy.fieldToCsv(42) == "42")
    assert(PgCopy.fieldToCsv("plain") == "\"plain\"")
    assert(PgCopy.fieldToCsv("say \"hi\"") == "\"say \"\"hi\"\"\"")
    assert(PgCopy.fieldToCsv("a,b\nc") == "\"a,b\nc\"")
  }

  test("array fields render as quoted postgres array literals") {
    // array literal {"a","b"} → CSV-quoted with doubled quotes
    assert(PgCopy.fieldToCsv(Seq("a", "b")) == "\"{\"\"a\"\",\"\"b\"\"}\"")
    // inner quote/backslash escaped for the array literal, then CSV-doubled
    assert(PgCopy.fieldToCsv(Seq("x\"y")) == "\"{\"\"x\\\"\"y\"\"}\"")
    assert(PgCopy.fieldToCsv(Seq("z\\w")) == "\"{\"\"z\\\\w\"\"}\"")
    assert(PgCopy.fieldToCsv(Seq.empty[String]) == "\"{}\"")
  }

  test("rowToCsv joins fields with commas and terminates the line") {
    val row = Row(8, "Accepted", Seq("Electronic"), null)
    val csv = PgCopy.rowToCsv(row)
    assert(csv == "8,\"Accepted\",\"{\"\"Electronic\"\"}\",\n")
  }

  test("RowReader streams multiple rows without materializing") {
    val rows = Iterator(Row(1, "a"), Row(2, "b"))
    val r = new PgCopy.RowReader(rows)
    val sb = new StringBuilder
    val buf = new Array[Char](4)
    var n = r.read(buf, 0, 4)
    while (n >= 0) { sb.appendAll(buf, 0, n); n = r.read(buf, 0, 4) }
    assert(sb.toString == "1,\"a\"\n2,\"b\"\n")
  }

  test("available() sees the test-scope PGConnection; non-pg connections still refuse COPY") {
    // the test classpath deliberately carries org.postgresql.PGConnection
    // (see that trait's scaladoc) so CopySinkE2ESpec can drive the real
    // COPY writers — so available() is true HERE while remaining false
    // on the production classpath (no pgjdbc dep). What must still hold
    // everywhere: a non-postgres connection never routes into COPY.
    assert(PgCopy.available())
    val derby = java.sql.DriverManager
      .getConnection("jdbc:derby:memory:pgcopyprobe;create=true")
    try assert(!PgCopy.isPostgres(derby)) finally derby.close()
    assert(PgCopy.isPostgres(FakePg.connection()))
  }
}
