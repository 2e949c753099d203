package graft.sql

import graft.SparkSpec
import graft.operators.{Cdc, Dedup, Relational}
import org.apache.spark.sql.functions._

/** The maintenance family's SQL front door: `CALL graft.<proc>(...)`
  * must resolve to the SAME fold the Scala facade builds (row-set
  * equality per procedure), ordinary SQL must pass through the
  * delegate untouched, and unknown procedures / bad arity raise. The
  * shared test session is built with spark.sql.extensions =
  * graft.expr.GraftExtensions, so spark.sql(...) goes through
  * GraftSqlParser end-to-end — the same wiring Verify/Bench use. */
class GraftSqlSpec extends SparkSpec {

  private def sameRows(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, what: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what: CALL result diverges from the Scala facade")

  test("CALL statement parses: args, quoting, case, semicolon") {
    assert(GraftSql.matchCall("CALL graft.cdc_apply('t1')") ===
      Some(("cdc_apply", Seq("t1"))))
    assert(GraftSql.matchCall("  call GRAFT . ER_Increment('s', \"b\", 2); ") ===
      Some(("er_increment", Seq("s", "b", "2"))))
    assert(GraftSql.matchCall("SELECT 1").isEmpty)
    assert(GraftSql.matchCall("CALL other.proc('x')").isEmpty)
  }

  test("scd2_assemble and cdc_apply via SQL equal the Scala facade") {
    val log = Cdc.eventChangeLog(sf001)
    log.createOrReplaceTempView("graft_sqltest_log")
    sameRows(spark.sql("CALL graft.scd2_assemble('graft_sqltest_log')"),
      Cdc.scd2Over(log), "scd2_assemble")
    sameRows(spark.sql("CALL graft.cdc_apply('graft_sqltest_log')"),
      Cdc.mergeApply(None, log), "cdc_apply")
  }

  test("delete-capable dedup and ER reachable from SQL") {
    import spark.implicits._
    val docs = Seq(1L -> "a b c d e f", 2L -> "a b c d e g",
      10L -> "x y z w v u").toDF("doc_id", "text")
    Dedup.buildDedupIndexFull(docs, $"doc_id", $"text", "graft_sqltest_ddx")
    Seq(2L).toDF("doc_id").createOrReplaceTempView("graft_sqltest_del")
    sameRows(spark.sql(
        "CALL graft.dedup_delete('graft_sqltest_ddx', 'graft_sqltest_del')"),
      Dedup.dedupApplyDeletes(Seq(2L).toDF("doc_id"), "graft_sqltest_ddx"),
      "dedup_delete")
    val ents = Seq((1L, "B", "aaaa"), (2L, "B", "aaab"), (3L, "C", "zzzz"))
      .toDF("id", "block", "name")
    Relational.buildErIndexFull(ents, $"id", $"block", $"name", 2,
      "graft_sqltest_erx")
    Seq(2L).toDF("id").createOrReplaceTempView("graft_sqltest_erdel")
    sameRows(spark.sql(
        "CALL graft.er_delete('graft_sqltest_erx', 'graft_sqltest_erdel')"),
      Relational.erApplyDeletes(Seq(2L).toDF("id"), "graft_sqltest_erx"),
      "er_delete")
  }

  test("ordinary SQL passes through the delegate; failures raise") {
    import spark.implicits._
    assert(spark.sql("SELECT 1 + 1 AS x").collect().map(_.getInt(0)).toSeq
      === Seq(2))
    val e = intercept[IllegalArgumentException] {
      spark.sql("CALL graft.no_such_proc('x')")
    }
    assert(e.getMessage.contains("unknown procedure"))
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("CALL graft.scd2_increment('only_one')")
    }
    assert(e2.getMessage.contains("expects 2"))
  }
}
