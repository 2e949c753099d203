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

  test("normalizeAllTs: parquet round-trip of all three fixture encodings") {
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
      val norm = graft.Tables.normalizeAllTs(spark.read.parquet(s"$dir/$enc"))
      assert(norm.schema("ts").dataType == TimestampType, s"$enc not normalized")
      assert(norm.select(unix_micros($"ts")).head.getLong(0) == WantUs,
        s"$enc: wrong instant after normalization")
    }
    graft.Tables.deleteRec(new java.io.File(dir))
  }

  test("normalizeAllTs: schema sweep is type-driven, keys stay bigint") {
    import spark.implicits._
    // a frame mixing an NTZ column, a declared-ts long column, and a
    // plain key long: only the first two normalize
    val df = spark.sql(
      """SELECT TIMESTAMP_NTZ '2024-01-02 03:04:05.123456' AS o_orderdate,
        |       CAST(1704164645123456000 AS BIGINT) AS ts,
        |       CAST(42 AS BIGINT) AS o_orderkey""".stripMargin)
    val norm = graft.Tables.normalizeAllTs(df)
    assert(norm.schema("o_orderdate").dataType == TimestampType)
    assert(norm.schema("ts").dataType == TimestampType)
    assert(norm.schema("o_orderkey").dataType == LongType, "key column retyped!")
    val r = norm.select(unix_micros($"o_orderdate"), unix_micros($"ts"), $"o_orderkey").head
    assert(r.getLong(0) == WantUs && r.getLong(1) == WantUs && r.getLong(2) == 42L)
  }

  test("tsMicros: raw-nanos bigint input is micros, not epoch-seconds") {
    import spark.implicits._
    // the silent-wrong-instant trap this expression exists to close:
    // the old cast-based helper read a LongType as epoch SECONDS
    val df = Seq(WantUs * 1000L).toDF("ts")
    assert(df.select(tsMicros(col("ts"))).head.getLong(0) == WantUs)
  }

  test("tsMicros: non-timestamp-like input fails analysis loudly") {
    import spark.implicits._
    val df = Seq("2024-01-02").toDF("ts")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(tsMicros(col("ts"))).queryExecution.analyzed
    }
    assert(e.getMessage.contains("ts_micros"))
  }
}
