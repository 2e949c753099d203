package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Epoch-micros from any timestamp-like column, dispatching on the
  * ANALYZED input type — the fix for the silent-wrong-instant trap in
  * the old cast-based helper: `cast(LongType → TIMESTAMP)` interprets
  * a raw-nanos bigint as epoch SECONDS, off by 1e9 with no error.
  * Here each encoding gets its own exact arithmetic and anything else
  * (string, double, …) fails analysis loudly:
  *
  *  - TIMESTAMP       — internal value IS epoch micros; identity.
  *  - TIMESTAMP_NTZ   — internal micros of the naive wall clock, read
  *    under graft's pinned-UTC convention (every entry point pins the
  *    session zone to UTC; DuckDB applies the same naive semantics),
  *    so also identity.
  *  - DATE            — days × 86 400 000 000 (UTC midnight).
  *  - BIGINT          — raw TIMESTAMP(NANOS) as surfaced by the
  *    `nanosAsLong` legacy conf; floor-divided to micros (floor, not
  *    truncate, so pre-epoch instants round toward -∞ like a cast).
  *
  * Codegen'd arithmetic on the unboxed internal value — stays inside
  * whole-stage codegen with zero overhead vs raw `unix_micros`.
  */
case class TsMicros(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "ts_micros"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType | DateType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a timestamp-like column " +
        s"(timestamp, timestamp_ntz, date, or raw-nanos bigint), " +
        s"got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => Math.floorDiv(input.asInstanceOf[Long], 1000L)
    case DateType => input.asInstanceOf[Int].toLong * 86400000000L
    case _        => input.asInstanceOf[Long] // both timestamp flavors
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case LongType => defineCodeGen(ctx, ev, c => s"java.lang.Math.floorDiv($c, 1000L)")
      case DateType => defineCodeGen(ctx, ev, c => s"((long) $c) * 86400000000L")
      case _        => defineCodeGen(ctx, ev, c => s"$c")
    }

  override protected def withNewChildInternal(newChild: Expression): TsMicros =
    copy(child = newChild)
}
