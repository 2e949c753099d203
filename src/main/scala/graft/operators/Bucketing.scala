package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-storage co-located joins — the storage-layout half of the
  * scale story. A fact table bucketed by its join key is written
  * pre-partitioned: every future join on that key reads matching
  * buckets side by side and needs NO shuffle at query time. At 100 TB
  * this converts the recurring O(data) join shuffle into a one-time
  * layout cost at ingest — the standard warehouse trade for
  * fact-to-fact joins too big to broadcast.
  *
  * (The fixture queries don't use this path because the driver's
  * parquet is plain files; BucketingSpec proves the plan property —
  * join with zero Exchange operators — on a temp warehouse.)
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. Bucket count is a
    * layout decision: at cluster scale pick it so one bucket ≈ one
    * task's worth of data (128–512 MB), and keep it IDENTICAL across
    * tables that join together — equal bucket counts on the same key
    * are what let the planner skip both exchanges. */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With matching
    * bucket counts this plans as a shuffle-free sort-merge join. */
  def colocatedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Morton (z-order) interleaving of two non-negative integer keys —
    * the multi-dimensional clustering key. Sorting a table by `zvalue`
    * keeps BOTH dimensions locally dense in every file, so parquet
    * min/max stats prune files for range predicates on EITHER (or
    * both) dimensions — where a linear sort clusters only its leading
    * column. Built purely from codegen'd builtin bit ops (`bits`
    * unrolled shift/mask/or terms): no UDF, no custom expression
    * needed. `bits` must cover the key range (values ≥ 2^bits would
    * alias); z of two `bits`-wide keys occupies `2·bits` bits. */
  def zvalue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{shiftleft, shiftright, lit}
    require(bits > 0 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` z-ordered on (xCol, yCol): range-partition by the
    * interleaved key, sort within partitions, write parquet. The
    * range partitioning keeps files globally disjoint in z-space —
    * the property file-level stats pruning needs. */
  def writeZOrdered(
      df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int, files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", zvalue(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Write `df` hive-partitioned by `partitionCol` — the OTHER half of
    * the layout story: a predicate on the partition column prunes
    * whole directories at planning time, so a year-of-data query over
    * a decade-long 100 TB table lists and reads one-tenth of the
    * files. PartitionPruningSpec asserts the plan property (scan's
    * PartitionFilters populated, partition count reduced). */
  def writePartitioned(
      df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)
}
