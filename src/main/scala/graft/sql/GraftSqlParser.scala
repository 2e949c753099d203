package graft.sql

import graft.operators.{Cdc, Dedup, Ivm, Relational}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}

/** The maintenance family's SQL entry point — `CALL graft.<proc>(...)`.
  *
  * The stateful folds (CDC apply, SCD2 assembly/increment, snapshot
  * diff, retractable IVM, incremental/delete-capable dedup and ER)
  * were Scala-API-only; a warehouse user expects them reachable from
  * SQL the way q94 reaches the read queries. Spark has no stored
  * procedures, so the surface is a tiny CALL statement handled by a
  * delegating parser ([[GraftSqlParser]], injected through
  * `spark.sql.extensions=graft.expr.GraftExtensions`): a matching
  * statement resolves to the SAME lazy DataFrame the Scala facade
  * builds — one code path, two front doors — and everything else
  * parses through the stock parser untouched. Arguments are string
  * literals (table/view names, resolved against the session catalog —
  * temp views included) or bare integers.
  *
  * Contracts are the facade functions' own (documented there): e.g.
  * `cdc_apply` changes lead with (key, us, seq, op); `dedup_increment`
  * deltas are (doc_id, text). Procedures whose fail-loud checks run
  * driver-side actions (the phantom-delete counts) run them at
  * `spark.sql(...)` time — CALL semantics are eager.
  *
  * Why a parser and not Spark 4's native V2 ProcedureCatalog: a
  * `BoundProcedure.call` returns its result as a `Scan`, i.e. a
  * MATERIALIZED result set (the Iceberg-procedure shape, built for
  * small command outputs). These folds return corpus-scale frames —
  * an updated SCD2 dimension, a re-clustered corpus — that must stay
  * LAZY distributed plans the caller can write wherever it wants;
  * intercepting the statement and answering with the fold's logical
  * plan is the only route that keeps CALL results plan-sized. Without
  * the extension installed, the stock parser still parses the CALL
  * and fails with MISSING_CATALOG_ABILITY — a clear pointer, not a
  * syntax error. */
object GraftSql {

  /** Dispatch a procedure by name. Table-name arguments resolve via
    * `spark.table` (catalog tables and temp views alike). */
  def call(spark: SparkSession, proc: String, args: Seq[String]): DataFrame = {
    def t(i: Int) = spark.table(args(i))
    def n(want: Int): Unit = require(args.length == want,
      s"graft.$proc expects $want arguments, got ${args.length}")
    proc match {
      case "cdc_apply" if args.length == 1 => Cdc.mergeApply(None, t(0))
      case "cdc_apply" => n(2); Cdc.mergeApply(Some(t(0)), t(1))
      case "scd2_assemble" => n(1); Cdc.scd2Over(t(0))
      case "scd2_increment" => n(2); Cdc.scd2Increment(t(0), t(1))
      case "table_diff" => n(2); Cdc.tableDiff(t(0), t(1))
      case "ivm_merge_retract" =>
        n(3); Ivm.mergeDeltaRetract(t(2), args(0), args(1))
      case "dedup_increment" =>
        n(2); Dedup.dedupIncrementalOver(t(1), col("doc_id"), col("text"),
          args(0))
      case "dedup_delete" => n(2); Dedup.dedupApplyDeletes(t(1), args(0))
      case "er_increment" =>
        n(3); Relational.goldenRecordsIncrement(t(1), args(0), args(2).toInt)
      case "er_delete" => n(2); Relational.erApplyDeletes(t(1), args(0))
      case other => throw new IllegalArgumentException(
        s"unknown procedure graft.$other — supported: cdc_apply, " +
          "scd2_assemble, scd2_increment, table_diff, ivm_merge_retract, " +
          "dedup_increment, dedup_delete, er_increment, er_delete")
    }
  }

  private val Call =
    """(?is)\s*CALL\s+graft\s*\.\s*([A-Za-z0-9_]+)\s*\((.*)\)\s*;?\s*""".r
  private val ArgToken = """'([^']*)'|"([^"]*)"|(-?\d+)""".r

  /** `Some((proc, args))` when the statement is a graft CALL. */
  private[sql] def matchCall(sqlText: String): Option[(String, Seq[String])] =
    sqlText match {
      case Call(proc, argList) =>
        val args = ArgToken.findAllMatchIn(argList).map { m =>
          Option(m.group(1)).orElse(Option(m.group(2))).getOrElse(m.group(3))
        }.toSeq
        Some((proc.toLowerCase, args))
      case _ => None
    }
}

/** Delegating parser: intercepts `CALL graft.<proc>(...)` and returns
  * the procedure's logical plan; every other statement — and every
  * other parse surface — goes to the stock parser verbatim. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSql.matchCall(sqlText) match {
      case Some((proc, args)) =>
        GraftSql.call(session, proc, args).queryExecution.logical
      case None => delegate.parsePlan(sqlText)
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
