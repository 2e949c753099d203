package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function

/** Timestamp-encoding-tolerant time helpers.
  *
  * Real-world parquet carries event time in several physical encodings
  * — TIMESTAMP (isAdjustedToUTC=1), TIMESTAMP_NTZ (isAdjustedToUTC=0),
  * and occasionally raw INT64 nanos — and a fixture regeneration
  * between rounds 4 and 5 silently flipped the `events.ts` column from
  * NANOS to NTZ, breaking every operator that called
  * `unix_micros(ts)` directly (`unix_micros` requires TIMESTAMP).
  * All graft operators go through [[tsMicros]], so an encoding drift
  * breaks (and is fixed in) exactly one function.
  *
  * [[graft.Tables]] additionally normalizes every fixture timestamp
  * column to TIMESTAMP at the read boundary, so the helper is an
  * identity on the hot path (the plans are unchanged vs raw
  * `unix_micros`).
  */
object TimeFunctions {

  /** Microseconds since the epoch from any timestamp-like column —
    * [[graft.expr.TsMicros]], a native expression dispatching on the
    * ANALYZED input type: TIMESTAMP and TIMESTAMP_NTZ (pinned-UTC
    * naive convention) pass through, DATE becomes UTC midnight, and a
    * raw-nanos BIGINT floor-divides to micros (the old cast-based
    * helper silently read it as epoch SECONDS — off by 1e9). Any
    * other type fails analysis loudly. Codegen'd end to end.
    *
    * Resolved through the session function registry (the repo-wide
    * convention for native expressions — `GraftFunctions.register`,
    * called by `Tables` and by every entry point's session build).
    */
  def tsMicros(c: Column): Column = call_function("ts_micros", c)
}
