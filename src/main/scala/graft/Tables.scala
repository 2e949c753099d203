package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the driver-generated fixture tables
  * (`/root/testdata/<sf>/<table>.parquet`, schemas in FIXTURES.md §B).
  *
  * Each accessor is a fresh logical scan — Catalyst prunes columns and
  * pushes filters down to the parquet reader per query, so there is no
  * benefit (and a pruning penalty) to caching these eagerly. At cluster
  * scale the same code reads a partitioned table directory unchanged.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // Make graft's native expressions (simhash64, cosine_sim) available
  // to any query built over these tables.
  graft.expr.GraftFunctions.register(spark)

  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark
    * has no native type for. Read it as raw nanos (legacy conf) and
    * surface microsecond precision — same truncation DuckDB applies
    * when casting TIMESTAMP_NS to TIMESTAMP. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t("events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
