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
    // pre-partition to the bucket spec: bucketBy from an N-task
    // upstream otherwise writes up to N files PER BUCKET (measured 256
    // files for an 8-bucket table off a 32-partition scan), and every
    // later bucketed read pays per-file open cost — pre-partitioned,
    // one well-sized file per bucket (guide §6). repartition's hash is
    // the same Murmur3 bucketBy uses, so each writer task holds
    // exactly one bucket.
    df.repartition(buckets, org.apache.spark.sql.functions.col(bucketCol))
      .write
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

  /** One-time bucketed layout of the fixture's lineitem/orders join
    * columns, memoized per (context, fixture fingerprint) — the
    * ingest-side layout cost the co-located join amortizes. Table
    * names embed the fixture fingerprint so a regenerated fixture
    * rewrites instead of serving stale buckets. */
  private val laidOut = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String), (String, String)]()
  private def bucketedTables(t: graft.Tables, buckets: Int): (String, String) = {
    val fp = Integer.toHexString(
      (graft.Tables.parallelLayout(t.spark, t.dir, "lineitem") + "|" +
        graft.Tables.parallelLayout(t.spark, t.dir, "orders")).hashCode)
    laidOut.computeIfAbsent((t.spark.sparkContext, fp), _ => {
      import t.spark.implicits._
      val li = s"graft_bkt_lineitem_$fp"
      val or = s"graft_bkt_orders_$fp"
      // a PREVIOUS JVM's warehouse dir survives while the in-memory
      // catalog does not — drop both the entry and any orphaned
      // location, or saveAsTable refuses the managed-table name
      Seq(li, or).foreach { name =>
        t.spark.sql(s"DROP TABLE IF EXISTS $name")
        val wh = t.spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:")
        graft.Tables.deleteRec(new java.io.File(wh, name))
      }
      writeBucketed(t.lineitem.select($"l_orderkey", $"l_extendedprice",
        $"l_discount"), li, "l_orderkey", buckets)
      writeBucketed(t.orders.select($"o_orderkey", $"o_orderpriority"),
        or, "o_orderkey", buckets)
      (li, or)
    })
  }

  /** The co-located fact-fact join frame (pre-aggregation): both
    * sides bucketed on the order key with equal bucket counts, the
    * `merge` hint pinning the sort-merge path a 100 TB fact join
    * takes (neither side broadcastable) — which the bucketed layout
    * then plans with ZERO exchanges (BucketedJoinQuerySpec asserts).
    * At cluster scale the write happens once at ingest; here it is
    * memoized per fixture. */
  def bucketedOrderJoin(t: graft.Tables, buckets: Int = 8): DataFrame = {
    val (li, or) = bucketedTables(t, buckets)
    t.spark.table(li).hint("merge")
      .join(t.spark.table(or),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
  }

  /** q116: revenue by order priority THROUGH the co-located bucketed
    * join — the recurring query whose per-run shuffle the one-time
    * bucket layout eliminates. DECIMAL-exact revenue (q01 recipe). */
  def bucketedRevenueByPriority(t: graft.Tables): DataFrame = {
    import org.apache.spark.sql.functions._
    import t.spark.implicits._
    bucketedOrderJoin(t)
      .groupBy($"o_orderpriority")
      .agg(
        sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }

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
