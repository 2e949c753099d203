package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.unix_micros
import org.apache.spark.sql.types.TimestampType

/** Timestamp-encoding-tolerant time helpers.
  *
  * Real-world parquet carries event time in several physical encodings
  * — TIMESTAMP (isAdjustedToUTC=1), TIMESTAMP_NTZ (isAdjustedToUTC=0),
  * and occasionally raw INT64 nanos — and a fixture regeneration
  * between rounds 4 and 5 silently flipped the `events.ts` column from
  * NANOS to NTZ, breaking every operator that called
  * `unix_micros(ts)` directly (`unix_micros` requires TIMESTAMP).
  * All graft operators now go through [[tsMicros]], so an encoding
  * drift breaks (and is fixed in) exactly one function.
  *
  * [[graft.Tables]] additionally normalizes fixture timestamp columns
  * to TIMESTAMP at the read boundary, so the helper's cast is a no-op
  * on the hot path (Catalyst folds the identity cast away — the plans
  * are unchanged vs raw `unix_micros`).
  */
object TimeFunctions {

  /** Microseconds since the epoch from any timestamp-like column.
    *
    * TIMESTAMP passes through (identity cast, folded by Catalyst);
    * TIMESTAMP_NTZ is interpreted under the session time zone (pinned
    * to UTC by every graft entry point, so NTZ wall-clock == UTC
    * instant — the same convention DuckDB applies to naive
    * timestamps); DATE becomes midnight. Codegen'd end to end: cast +
    * unix_micros are both native expressions.
    */
  def tsMicros(c: Column): Column = unix_micros(c.cast(TimestampType))
}
