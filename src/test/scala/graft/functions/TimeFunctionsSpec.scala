package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The timestamp-encoding tolerance contract: every physical flavor a
  * parquet writer can ship event time in yields the SAME epoch-micros
  * through [[TimeFunctions.tsMicros]] / `Tables.normalizeTs` (session
  * zone pinned UTC). This is the spec the round-5 regression lacked —
  * `unix_micros` over a fixture column whose encoding drifted. */
class TimeFunctionsSpec extends SparkSpec {
  import TimeFunctions.tsMicros

  // 2024-01-02 03:04:05.123456 UTC
  private val WantUs = 1704164645123456L

  test("tsMicros: TIMESTAMP (tz-adjusted) input") {
    val df = spark.sql(
      "SELECT TIMESTAMP '2024-01-02 03:04:05.123456' AS ts")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(tsMicros(col("ts"))).head.getLong(0) == WantUs)
  }

  test("tsMicros: TIMESTAMP_NTZ input is read as UTC wall-clock") {
    val df = spark.sql(
      "SELECT TIMESTAMP_NTZ '2024-01-02 03:04:05.123456' AS ts")
    assert(df.schema("ts").dataType == TimestampNTZType)
    assert(df.select(tsMicros(col("ts"))).head.getLong(0) == WantUs)
  }

  test("tsMicros: DATE input is UTC midnight") {
    val df = spark.sql("SELECT DATE '2024-01-02' AS ts")
    assert(df.select(tsMicros(col("ts"))).head.getLong(0) == 1704153600000000L)
  }

  test("tsMicros stays codegen'd: the identity cast folds away") {
    // TIMESTAMP input: Catalyst must remove the no-op cast, so the
    // helper costs nothing over raw unix_micros on the hot path
    val df = spark.sql("SELECT TIMESTAMP '2024-01-02 03:04:05' AS ts")
      .select(tsMicros(col("ts")).as("us"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("cast("),
      s"identity cast not folded:\n$optimized")
  }

  test("normalizeTs: parquet round-trip of all three fixture encodings") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ts-enc").toString
    // TIMESTAMP_NTZ file (what the round-5 fixture regeneration shipped)
    spark.sql("SELECT TIMESTAMP_NTZ '2024-01-02 03:04:05.123456' AS ts")
      .write.mode("overwrite").parquet(s"$dir/ntz")
    // TIMESTAMP file
    spark.sql("SELECT TIMESTAMP '2024-01-02 03:04:05.123456' AS ts")
      .write.mode("overwrite").parquet(s"$dir/tz")
    // raw INT64 nanos (how TIMESTAMP(NANOS) surfaces under the
    // nanosAsLong conf Spark sets at session build)
    Seq(WantUs * 1000L).toDF("ts").write.mode("overwrite").parquet(s"$dir/nanos")
    for (enc <- Seq("ntz", "tz", "nanos")) {
      val norm = graft.Tables.normalizeTs(spark.read.parquet(s"$dir/$enc"), "ts")
      assert(norm.schema("ts").dataType == TimestampType, s"$enc not normalized")
      assert(norm.select(unix_micros($"ts")).head.getLong(0) == WantUs,
        s"$enc: wrong instant after normalization")
    }
    graft.Tables.deleteRec(new java.io.File(dir))
  }
}
