package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** q162 scale self-consistency at SFs where the DuckDB brute-force
  * closure oracle is intractable (the same envelope as q103 — at sf1
  * the 50k-doc pair oracle is ~1.25e9 list intersections): the
  * incremental composition (index over 90% of the corpus + delta
  * dedup against it) must produce the SAME (doc_id, cluster_id,
  * is_keeper) table as the one-shot q103 clustering of the union —
  * banding is a per-doc function, so the verified pair sets coincide
  * and so must the components. This is the q162 spec's equivalence
  * assertion run at generated scale.
  *
  * Usage: runMain graft.tools.IncrDedupCheck <sfDir>
  */
object IncrDedupCheck {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args.take(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.warmLayout(spark, sfDir)
    val t = Tables(spark, sfDir)
    val incr = Dedup.incrementalDedupClusters(t)
    val scratch = Dedup.dedupClustersFast(t)
      .select("doc_id", "cluster_id", "is_keeper")
    val onlyIncr = incr.exceptAll(scratch).count()
    val onlyScratch = scratch.exceptAll(incr).count()
    val n = incr.count()
    println(s"[incrdedup] rows=$n onlyIncremental=$onlyIncr " +
      s"onlyFromScratch=$onlyScratch " +
      (if (onlyIncr == 0 && onlyScratch == 0) "EQUAL" else "DIVERGED"))
    require(onlyIncr == 0 && onlyScratch == 0,
      "incremental clustering diverged from one-shot clustering")
    spark.stop()
  }
}
