package graft.lake

import org.scalatest.funsuite.AnyFunSuite

/** The path-source scanner's lexical robustness (round-12 advice):
  * double-quoted literals, backticked identifiers and SQL comments must
  * be skipped exactly like single-quoted literals — a `from 'x'` INSIDE
  * any of them must never be rewritten to a temp view — while real path
  * sources around them still resolve. Plus the INSERT head guard: a
  * multi-line parenthesized query head is a query, not a column list.
  */
class LakeSqlScannerSpec extends AnyFunSuite {

  test("from-inside-double-quoted-literal is not a path source") {
    assert(LakeSql.rewritePathSources(
      """SELECT "from 'x'" AS s FROM t""").isEmpty)
    // escaped double quote inside the literal
    assert(LakeSql.rewritePathSources(
      "SELECT \"a\\\" from 'x'\" AS s FROM t").isEmpty)
  }

  test("from-inside-comments is not a path source") {
    assert(LakeSql.rewritePathSources(
      "SELECT 1 /* from 'x' */ FROM t").isEmpty)
    assert(LakeSql.rewritePathSources(
      "SELECT 1 -- from 'x'\nFROM t").isEmpty)
  }

  test("backticked identifiers are skipped") {
    assert(LakeSql.rewritePathSources(
      "SELECT `from` FROM t").isEmpty)
    assert(LakeSql.rewritePathSources(
      "SELECT `weird from 'x' col` FROM t").isEmpty)
  }

  test("real path sources still rewrite with decoys around") {
    val Some((rw, srcs)) = LakeSql.rewritePathSources(
      "SELECT \"from 'y'\" AS s FROM '/tmp/x' /* from 'z' */"): @unchecked
    assert(srcs.map(_.path) === Seq("/tmp/x"))
    assert(rw.contains("\"from 'y'\"") && rw.contains("/* from 'z' */"))
    assert(!rw.contains("'/tmp/x'"))
  }

  test("TABLE_CHANGES over an unresolvable identifier falls through " +
      "to Spark (never claimed, never an error at parse time)") {
    // a user TVF named table_changes / a typo'd name: the scanner must
    // leave the statement verbatim for Spark's parser, exactly like
    // every other unclaimed identifier
    assert(LakeSql.rewritePathSources(
      "SELECT * FROM table_changes(not_a_lake_table, 0, 1)").isEmpty)
    // mixed: the quoted-path source still rewrites, the unresolvable
    // TVF stays
    val Some((rw, srcs)) = LakeSql.rewritePathSources(
      "SELECT * FROM '/tmp/x' JOIN table_changes(nope, 0, 1)"
    ): @unchecked
    assert(srcs.map(_.path) === Seq("/tmp/x"))
    assert(rw.contains("table_changes(nope, 0, 1)"))
  }

  test("multi-line parenthesized INSERT head is a query, not a column " +
      "list") {
    val cmd = LakeSql.parse("INSERT INTO '/tmp/t' (SELECT\n a FROM x)")
    cmd match {
      case Some(c: LakeSql.InsertIntoPathCommand) =>
        assert(c.cols.isEmpty)
        assert(c.query.replaceAll("\\s+", " ").contains("SELECT a FROM x"))
      case other => fail(s"expected InsertIntoPathCommand, got $other")
    }
  }
}
