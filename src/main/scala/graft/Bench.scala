package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
  * - The whole suite runs SPARK_GRAFT_PASSES times (default 3) and
  *   every reported number is the per-key MEDIAN across passes: a
  *   single concurrent pass's per-query walls include scheduler
  *   queue time, which reads as phantom 2–3× regressions for
  *   whichever query happened to land behind a wide stage (round-3
  *   telemetry showed q86 at 16.1 s vs a 6.98 s solo cost for
  *   exactly this reason). The median keeps the numbers stable
  *   (±20% across consecutive runs).
  * - After the concurrent passes, ONE warm serial solo run per query
  *   lands in bench_full.json's "solo" map (telemetry only — "value"
  *   stays the two-lane wall): the queue-free number a regression diff
  *   should read first. SPARK_GRAFT_SOLO=0 skips it.
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

  // ── machine calibration ─────────────────────────────────────────────
  // The bench wall is only comparable across runs if the machine is —
  // and round 10 measured the same code at 67.8 s / 97.4 s / 122.0 s
  // purely from host-state drift, leaving the 2×-of-baseline gate
  // unfalsifiable. So every artifact now embeds a deterministic
  // calibration probe: a constant-row, constant-plan, in-memory
  // xxhash64 fold (no I/O, no shuffle — pure codegen'd CPU) timed
  // solo at 1 task and at 32 tasks, min-of-3 after an untimed JIT
  // pass. The emitted JSON carries the measured walls (calib_1t /
  // calib_32t, plus a post-lanes calib_post_32t so drift DURING the
  // run is visible too) alongside the pinned reference walls from the
  // machine state the board's trajectory is anchored to, and a
  // calibration-NORMALIZED total (value_norm = value · ref/measured on
  // the 32-task probe — the lanes are 32-thread-throughput-bound, so
  // the wide probe is the right scale) — the number the board quotes.
  private val CalibRows1t = 120000000L // ~1–2 s/task at the anchor state

  /** Reference probe walls, pinned on the round-11 build machine state
    * (2026-08-16, local[32], Java 17; measured across 3 Bench launches:
    * 32t stable at 2.60–2.68, 1t noisier at 1.77–2.19 — the 32t probe
    * is the normalizer precisely because it is the stable one). A
    * future run on this state reads calib_factor ≈ 1.0; a degraded or
    * recovered host scales the normalized totals back onto this
    * anchor. Re-anchor ONLY with a board note — these constants are
    * what make cross-round totals comparable. */
  private val CalibRef1t = 1.90
  private val CalibRef32t = 2.62

  // Round 12: the r11 verdict proved the CPU probe measures the wrong
  // MODE — three runs of identical code read 71.7/88.9/137.9 s while
  // calib_factor sat at 0.91–1.04, because the degradation lives in
  // CONCURRENT-lane contention (the driver's SOLO lane was 13% faster
  // than the builder's while its 16-stream lanes ran 2× slow), which
  // a single-query probe cannot see. Two additions make the 2× gate
  // decidable from one artifact:
  //  - a CONCURRENT probe: the same constant-plan fold submitted as
  //    16 simultaneous FAIR-pool streams (total work = one 32t probe,
  //    split 16 ways), measured as MAKESPAN — this saturates the
  //    scheduler and the memory subsystem the way the lanes do, so a
  //    host that degrades under concurrency moves THIS number;
  //    value_conc_norm = value · ref/measured on it.
  //  - a SOLO-LANE ratio normalization: solo lanes agreed within ±13%
  //    across all five r10/r11 measurements while makespans varied
  //    1.9×, so value_solo_norm = value · (ref_solo_lane /
  //    measured_solo_lane) anchors the lane total to the one surface
  //    that is stable across hosts. The ref is this build's solo-lane
  //    wall on the anchor machine — re-pinned whenever the query set
  //    changes (it names the whole set, so it must).
  // VALIDATED in a deliberately loaded window (16–32 busy-loop
  // threads competing with the lanes, round 12): raw wall 110.5 s vs
  // clean 84.8–87.3, and value_solo_norm read 87.8 — within 2% of the
  // clean walls — while the pure-CPU probes OVER-corrected (factors
  // 1.65/1.80 → normalized 67/61 s; a compute-only probe degrades
  // more under CPU contention than the mixed scan/shuffle/driver
  // workload does). Decision rule for cross-run comparison: read
  // value_solo_norm as the corrected wall; read calib_factor /
  // calib_conc_factor as LOAD DETECTORS (≫1 ⇒ the raw wall is
  // measuring the host, not the code).
  /** Pinned on the round-12 build machine, 2026-08-16: CalibRefConc =
    * median of EIGHT full-bench launches (2.38–2.80); SoloRefLane =
    * median of the three final-query-set (214) launches
    * (310.5/321.7/363.9). Within-session spread worth knowing: the
    * batch lane wandered 58.9–76.0 s across the eight launches while
    * the probes held within ±9% — even the concurrent probe (run
    * solo, before the lanes) does not fully capture slow intra-run
    * host drift, which is why the artifact also carries
    * value_solo_norm and the frozen r4 subset (19.2–26.1 s across all
    * eight, the tightest surface relative to its own scale). */
  private val CalibRefConc = 2.50
  private val SoloRefLane = 321.7

  /** The FROZEN round-4-era query list (110 queries, extracted from
    * the round-4 commit's SparkEntry) — the cross-round bench
    * comparable. The r4 anchor (105-ish mostly-relational queries at
    * 0.155–0.182 s/query concurrent) is no longer comparable to a
    * 212-query mix dominated by iterative graph/ANN/streaming gates,
    * so the artifact carries a second concurrent-makespan total over
    * exactly this list, forever. Do not edit — frozen means frozen. */
  private val SubsetR4: Seq[String] = Seq(
    "q01_pricing_summary", "q02_revenue_filter", "q03_top_orders",
    "q04_order_priority", "q05_customers_no_orders", "q06_nation_revenue",
    "q07_market_segments", "q08_top_per_customer", "q09_running_total",
    "q10_order_gaps", "q11_rollup", "q12_cube", "q13_distinct_counts",
    "q14_setop_intersect", "q15_conditional_agg", "q16_having",
    "q17_string_funcs", "q18_date_parts", "q19_json_extract",
    "q20_event_windows", "q21_fingerprints", "q22_exact_dedup",
    "q23_token_stats", "q24_lang_profile", "q25_quality_scores",
    "q26_jaccard_pairs", "q27_simhash", "q28_cosine_pairs",
    "q29_knn_bruteforce", "q30_label_centroids", "q31_minhash_pairs",
    "q32_simhash_pairs", "q33_media_profile", "q34_media_knn",
    "q35_union_except", "q36_weighted_avg", "q37_grouping_sets",
    "q38_bigram_counts", "q39_approx_distinct", "q40_asof_join",
    "q41_tfidf", "q42_salted_agg", "q43_ann_lsh", "q44_lang_id",
    "q45_scalar_subquery", "q46_pivot", "q47_typed_api",
    "q48_range_window", "q49_median_rank", "q50_embedding_neardup",
    "q51_minhash_fast", "q52_ann_ivf", "q53_winnow_fp",
    "q54_bpeish_tokens", "q55_rank_family", "q56_percentiles",
    "q57_dedup_clusters", "q58_dispersion", "q59_vocab_topk",
    "q60_top_suppliers", "q61_tfidf_exact", "q62_pack_windows",
    "q63_chunking", "q64_hash_split", "q65_repetition", "q66_sessionize",
    "q67_contamination", "q68_mixture_sample", "q69_funnel", "q70_ewma",
    "q71_simhash_portable", "q72_portable_pairs", "q73_cross_dedup",
    "q74_pii_redact", "q75_strat_sample", "q76_url_domains",
    "q77_markup_strip", "q78_interval_join", "q79_unigram_nll",
    "q80_pmi_collocations", "q81_zorder", "q82_full_outer", "q83_unpivot",
    "q84_fuzzy_match", "q85_pagerank", "q86_triangles", "q87_degree_dist",
    "q88_bm25", "q89_containment", "q90_dedup_survivors",
    "q91_assortativity", "q92_copurchase_top", "q93_inverted_index",
    "q94_sql_tpch5", "q95_column_profile", "q96_locf_resample",
    "q97_transitions", "q98_value_histogram", "q99_cohort_retention",
    "q100_conversion", "q101_ann_lsh_gate", "q102_ann_ivf_gate",
    "q103_clusters_fast", "q104_embed_banded_gate", "q105_semantic_dedup",
    "q106_heavy_hitters", "q107_approx_quantiles", "q108_bigram_nll",
    "q109_approx_distinct_gate", "q110_correlation")

  private def calibProbe(spark: SparkSession, parts: Int): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      // pmod bounds each term to [0, 1e9) so the ANSI-checked sum can
      // never overflow (≤ 3.84e9 rows · 1e9 < 2⁶³)
      spark.range(0, CalibRows1t * parts, 1, parts)
        .select(pmod(xxhash64(xxhash64(col("id"))), lit(1000000007L)).as("h"))
        .agg(sum(col("h"))).head()
      (System.nanoTime() - t0) / 1e9
    }
    once() // untimed: JIT + codegen
    (1 to 3).map(_ => once()).min
  }

  /** The concurrent-mode anchor: total work of one 32-task probe,
    * split across `streams` simultaneous FAIR-pool jobs of 32 tasks
    * each, measured as makespan (min-of-3 after an untimed pass) —
    * the probe that sees concurrent-scheduling degradation the
    * single-query probe provably missed (round-11 verdict). */
  private def calibProbeConc(spark: SparkSession, streams: Int)(
      implicit ec: ExecutionContext): Double = {
    def oneStream(): Unit = {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", "default")
      spark.range(0, CalibRows1t * 32 / streams, 1, 32)
        .select(pmod(xxhash64(xxhash64(col("id"))), lit(1000000007L)).as("h"))
        .agg(sum(col("h"))).head()
      (): Unit
    }
    def once(): Double = {
      val t0 = System.nanoTime()
      Await.result(
        Future.sequence((1 to streams).map(_ => Future(oneStream()))),
        10.minutes)
      (System.nanoTime() - t0) / 1e9
    }
    once() // untimed: JIT + codegen + pool warm-up
    (1 to 3).map(_ => once()).min
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
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      // NOTE: AQE's default size-based coalescing can squash a
      // byte-light / CPU-heavy stage (merge-walk jaccard verify:
      // 225k pairs ≈ 3.6 MB but seconds of CPU) to a handful of
      // tasks. That costs SOLO latency — Profile sets
      // coalescePartitions.minPartitionSize=64k and q51 drops
      // 6.4 s → 3.5 s at sf1 — but under 16 concurrent streams the
      // cores are already saturated by other queries, and the extra
      // tasks only add scheduler overhead (measured: +40% total
      // wall). Throughput mode keeps the default; single-query
      // deployments should lower minPartitionSize.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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

    // calibration probes run SOLO, after warm-up (JIT settled), before
    // any lane — and once more after everything, so intra-run drift is
    // in the artifact too. SPARK_GRAFT_CALIB=0 skips (quick iterations).
    val doCalib = sys.env.getOrElse("SPARK_GRAFT_CALIB", "1") != "0"
    val calib1t = if (doCalib) calibProbe(spark, 1) else -1.0
    val calib32t = if (doCalib) calibProbe(spark, 32) else -1.0

    implicit val ec: ExecutionContextExecutorService =
      ExecutionContext.fromExecutorService(Executors.newFixedThreadPool(streams))
    // the concurrent-mode anchor (round 12): 16 simultaneous probe
    // streams, measured as makespan — the number that moves when the
    // host degrades under concurrency (the r11 failure mode the CPU
    // probe missed)
    val calibConc = if (doCalib) calibProbeConc(spark, 16) else -1.0
    // Longest-processing-time-first order (classic makespan heuristic):
    // submit the known-heavy queries first so no multi-second query
    // starts when the pool is nearly drained. Ranking from measured
    // sf0.1 runs; unlisted queries follow alphabetically — ordering
    // only affects scheduling, never a query's own measured duration.
    val heavyFirst = Seq(
      // refreshed from the round-10 full-suite solo map (bench_full
      // "solo", 185 queries): descending solo cost, so no
      // multi-second query starts into a draining pool
      // q198 builds the persisted ER state on first touch (q157's
      // class) — launch it first; q204 pays two full index builds
      // (base fit + drift retrain) on first touch — same class
      "q204_ann_drift_gate", "q198_incr_golden",
      // q208 builds the full CC state + runs the touched-component
      // re-solve loop on first touch; q209 builds the full multi view
      // + fact sidecar — both multi-second first-touch, launch early
      "q208_cc_retract", "q209_multi_ivm_minmax",
      // round 13: the delete-capable dedup/ER states pay the full
      // banding/PassJoin + CC build on first touch (q198/q208's
      // class) — launch them with the other state builders; q218
      // builds its own HLL view state (q209's class)
      "q215_dedup_delete", "q216_er_delete", "q218_hll_ivm_gate",
      "q161_rrf_ann_gate", "q181_scc", "q157_golden_record",
      "q135_ann_pq_gate", "q163_sssp", "q85_pagerank", "q144_ppr",
      "q171_damerau_match", "q175_robust_outliers", "q151_hits",
      "q185_adaptive_skew", "q145_label_prop", "q105_semantic_dedup",
      "q170_kcore", "q101_ann_lsh_gate", "q57_dedup_clusters",
      "q169_interp_resample", "q160_rrf_fusion", "q84_fuzzy_match",
      "q139_kmeans", "q182_ann_index_gate", "q180_ivm_retract",
      "q103_clusters_fast", "q162_incr_dedup", "q173_fk_audit",
      "q86_triangles", "q43_ann_lsh", "q52_ann_ivf",
      "q90_dedup_survivors", "q61_tfidf_exact", "q88_bm25",
      "q94_sql_tpch5", "q39_approx_distinct", "q73_cross_dedup",
      "q95_column_profile", "q79_unigram_nll")
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
      "q103_clusters_fast", "q105_semantic_dedup", "q52_ann_ivf",
      "q41_tfidf", "q31_minhash_pairs", "q85_pagerank",
      // 17 concurrent quantizer fits = many small sequential jobs,
      // the exact latency-bound shape the heavy pool exists for
      "q135_ann_pq_gate",
      // the round-8/9 iterative drivers: per-round count actions +
      // eager checkpoints = the same many-small-sequential-jobs shape
      "q163_sssp", "q144_ppr", "q151_hits", "q157_golden_record",
      "q161_rrf_ann_gate", "q170_kcore", "q162_incr_dedup",
      // round 10: SCC's coloring phases and the ANN index build's
      // m+1 fits are the same many-small-sequential-jobs shape
      "q181_scc", "q182_ann_index_gate",
      // the incremental-ER build runs PassJoin + the CC driver loop
      // on first touch — q157's latency-bound shape
      "q198_incr_golden",
      // round 11: the drift lifecycle's first touch is 2× the q182
      // build (base fit + retrain fit) — many small sequential
      // k-means jobs, the heavy pool's exact clientele
      "q204_ann_drift_gate",
      // round 12: the touched-component CC re-solve is the same
      // many-small-sequential-rounds shape as q57/q103's driver loop
      "q208_cc_retract",
      // round 13: the delete-capable state builds + touched-cluster
      // re-solves are the same latency-bound driver-loop shape
      "q215_dedup_delete", "q216_er_delete",
      // round 14: the two-pass median/MAD chain now runs as three
      // sequential checkpoint jobs (med → mad → final agg) — a
      // multi-job latency shape that sat at the top of the in-lane
      // board (29.5 s vs a 2.5 s solo) purely from weight-1 queueing
      "q175_robust_outliers")
    // The streaming replay harness runs in its OWN measured lane,
    // after the throughput pool drains. A replay's wall is micro-batch
    // turnaround (state-store commits + offset-log latency), not data:
    // inside the 16-stream pool each replay squatted a stream slot for
    // 30–104 s (round 5) and every batch query's measured wall
    // inflated x4–9 with queue time behind them. Separating the lanes
    // restores the batch numbers AND measures the replays without
    // contention; they still run concurrently with EACH OTHER (5
    // driver-latency-bound queries interleave on an idle executor
    // pool).
    val replayLane = names.filter(_.contains("_stream_"))
    val batchNames = names.filterNot(replayLane.contains)
    def runQuery(n: String): (String, Double) = {
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
    def runPass(qs: Seq[String]): (Double, Seq[(String, Double)]) = {
      val t0 = System.nanoTime()
      val futures = qs.map(n => Future(runQuery(n)))
      val results = Await.result(Future.sequence(futures), 60.minutes)
      ((System.nanoTime() - t0) / 1e9, results)
    }

    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    require(passes >= 1, s"SPARK_GRAFT_PASSES must be >= 1, got $passes")
    // one untimed throughput pass first: the flagship-query warm-up
    // above does not JIT/codegen the other 100+ queries, and a cold
    // first pass runs ~30% slower end to end — measured medians would
    // then depend on which side of the JIT cliff each pass landed.
    // Its per-query walls are RECORDED (first_touch_sec in the full
    // artifact) so the state-build work the maintained-state families
    // do on first touch is on the record and auditable round-over-
    // round — it still contributes nothing to "value".
    val firstTouch = runPass(batchNames)
    val runs = (1 to passes).map(_ => runPass(batchNames))
    // replay lane: one untimed pass (streaming-engine JIT + the
    // memoized event slice build), then the same median-of-passes as
    // the throughput lane — replays are deterministic, but their
    // micro-batch turnaround shares the JVM with GC like everything
    // else
    val firstTouchReplay =
      if (replayLane.isEmpty) (0.0, Seq.empty[(String, Double)])
      else runPass(replayLane)
    val replayRuns = if (replayLane.isEmpty) Seq.empty else {
      (1 to passes).map(_ => runPass(replayLane))
    }
    // SOLO lane (telemetry, not part of "value"): one warm serial run
    // per query, nothing else on the pool — the per-query number that
    // queue time cannot pollute. Concurrent-lane walls inflate 2–3×
    // for whichever query lands behind a wide stage, which every round
    // masqueraded as regression until the solo sweep re-explained it
    // (round-7 verdict: q06 4.6→6.2 s on an unchanged plan). Next
    // round's regression diff should read THIS map first. Skippable
    // with SPARK_GRAFT_SOLO=0 for quick iterations.
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val soloT0 = System.nanoTime()
    // per-query in-lane medians, needed now to police the solo lane
    val inLaneMed: Map[String, Double] = (runs ++ replayRuns)
      .flatMap(_._2).groupBy(_._1).view
      .mapValues(ts =>
        if (ts.exists(_._2 < 0)) -1.0 else median(ts.map(_._2))).toMap
    val solo: Map[String, Double] =
      if (sys.env.getOrElse("SPARK_GRAFT_SOLO", "1") == "0") Map.empty
      else {
        val first = names.map(runQuery).toMap
        // min-of-2, but only where it matters: a solo wall ABOVE the
        // query's own 16-stream in-lane median is physically
        // impossible except as measurement contamination (round 12's
        // q69–q96 block read 4–9× on untouched code and masqueraded
        // as regression) — re-run those once and keep the min; clean
        // readings stay single-shot so the lane cost barely moves
        first.map { case (n, s) =>
          val lane = inLaneMed.getOrElse(n, -1.0)
          if (s > 0 && lane > 0 && s > lane)
            n -> (runQuery(n)._2 match {
              case s2 if s2 > 0 => math.min(s, s2)
              case _ => s
            })
          else n -> s
        }
      }
    // still-contaminated solo readings, flagged so the next round's
    // regression diff can discard them instead of chasing ghosts
    val soloGtLane = names.filter { n =>
      val s = solo.getOrElse(n, -1.0)
      val l = inLaneMed.getOrElse(n, -1.0)
      s > 0 && l > 0 && s > l
    }
    val soloWall = if (solo.isEmpty) 0.0 else (System.nanoTime() - soloT0) / 1e9
    // FROZEN r4-era subset lane (cross-round comparable, round 12):
    // one warm concurrent pass over exactly [[SubsetR4]], in the same
    // LPT order and stream count as the main lanes — the total that
    // stays comparable to the r4-era walls no matter how many
    // iterative graph/ANN/streaming queries later rounds add. Runs
    // only when the full set is benched (subset sweeps would make it
    // meaningless); SPARK_GRAFT_SUBSET=0 skips.
    val subsetWall =
      if (sys.env.getOrElse("SPARK_GRAFT_SUBSET", "1") == "0" ||
          !SubsetR4.forall(n => names.contains(n))) -1.0
      else runPass(all.filter(SubsetR4.toSet))._1
    val calibPost32t = if (doCalib) calibProbe(spark, 32) else -1.0

    // median over the passes, per query and for the wall; a failure
    // (-1) in ANY pass surfaces as -1 rather than being median'd away
    // (median defined above the solo lane, which also needs it)
    // total = throughput-lane wall + replay-lane wall: the suite cost
    // is the sum of the two sequential lanes, reported per-lane below
    val batchWall = median(runs.map(_._1))
    val replayWall = if (replayRuns.isEmpty) 0.0 else median(replayRuns.map(_._1))
    val wall = batchWall + replayWall
    val byQuery = (runs ++ replayRuns).flatMap(_._2).groupBy(_._1).view
      .mapValues(ts => if (ts.exists(_._2 < 0)) -1.0 else median(ts.map(_._2)))
    def fmt(d: Double): String =
      if (d < 0) "-1" else BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // calibration-normalized totals: scale by ref/measured on the
    // 32-task probe (the lanes are throughput-bound at 32 threads).
    // A degraded host reads calib_32t > ref → value_norm < value; the
    // board's headline is value_norm, raw stays alongside.
    val calibFactor = if (calib32t > 0) calib32t / CalibRef32t else -1.0
    def norm(x: Double): Double = if (calibFactor > 0) x / calibFactor else -1.0
    // round-12 normalizations (see the calibration block up top):
    //  - value_conc_norm: by the 16-stream probe's makespan ratio —
    //    the mode that actually varied 1.9× across r11's three runs
    //  - value_solo_norm: by the run's own solo-lane ratio against
    //    the pinned anchor lane — the stable cross-host surface
    // The board quotes value_conc_norm first from round 12 on.
    val concFactor = if (calibConc > 0) calibConc / CalibRefConc else -1.0
    val soloFactor = if (soloWall > 0) soloWall / SoloRefLane else -1.0
    def cnorm(x: Double): Double = if (concFactor > 0) x / concFactor else -1.0
    def snorm(x: Double): Double = if (soloFactor > 0) x / soloFactor else -1.0
    val calibJson =
      s""""calib_1t":${fmt(calib1t)},"calib_32t":${fmt(calib32t)},""" +
        s""""calib_post_32t":${fmt(calibPost32t)},""" +
        s""""calib_ref_1t":${fmt(CalibRef1t)},"calib_ref_32t":${fmt(CalibRef32t)},""" +
        s""""calib_factor":${fmt(calibFactor)},""" +
        s""""calib_conc":${fmt(calibConc)},"calib_ref_conc":${fmt(CalibRefConc)},""" +
        s""""calib_conc_factor":${fmt(concFactor)},""" +
        s""""value_conc_norm":${fmt(cnorm(wall))},""" +
        s""""solo_ref_lane":${fmt(SoloRefLane)},"solo_factor":${fmt(soloFactor)},""" +
        s""""value_solo_norm":${fmt(snorm(wall))},""" +
        s""""value_subset_r4":${fmt(subsetWall)},"subset_r4_n":${SubsetR4.length},""" +
        s""""value_norm":${fmt(norm(wall))},"batch_lane_norm":${fmt(norm(batchWall))},""" +
        s""""replay_lane_norm":${fmt(norm(replayWall))},"""
    def line(qmap: Seq[String], extra: String): String =
      s"""{"metric":"total","value":${fmt(wall)},"unit":"sec",""" +
        s""""batch_lane_sec":${fmt(batchWall)},"replay_lane_sec":${fmt(replayWall)},""" +
        calibJson +
        s""""queries":${qmap.mkString("{", ",", "}")},""" +
        s""""n_queries":${names.length},"streams":$streams,"passes":$passes,"sf":"$sfDir"$extra}"""
    // The FULL per-query map goes to a file: the driver's artifact
    // keeps only a ~2000-char stdout tail, which silently truncated
    // the 110-query map (round-4 BENCH had "parsed": null and lost
    // q01–q21). Default lands in the repo cwd so the artifact is
    // committed alongside BASELINE.md each round.
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json"))
    // best-effort: an unwritable cwd must not cost the stdout line —
    // that line is the driver's only guaranteed artifact
    val soloJson =
      if (solo.isEmpty) ""
      else s""","solo_lane_sec":${fmt(soloWall)},""" +
        s""""solo_gt_lane":${soloGtLane.map("\"" + _ + "\"")
          .mkString("[", ",", "]")},"solo":""" +
        names.map(n => "\"" + n + "\":" + fmt(solo(n)))
          .mkString("{", ",", "}")
    // the untimed warm-up pass's per-query walls: where all first-touch
    // state builds (IVM sidecars, dedup/ER indexes, ANN index fits, the
    // q203 prior) happen — recorded so that work is auditable, never
    // part of "value"
    val firstTouchJson =
      s""","first_touch_sec":${(firstTouch._2 ++ firstTouchReplay._2)
        .map { case (n, s) => "\"" + n + "\":" + fmt(s) }
        .mkString("{", ",", "}")}"""
    val wrote = try {
      java.nio.file.Files.writeString(outPath,
        line(names.map(n => "\"" + n + "\":" + fmt(byQuery(n))),
          soloJson + firstTouchJson) + "\n")
      true
    } catch {
      case e: java.io.IOException =>
        System.err.println(s"[bench] could not write $outPath: $e"); false
    }
    // stdout (last line, tail-safe): totals + the slowest 10 only
    val slowest = names.sortBy(n => -byQuery(n)).take(10)
    val stdoutLine =
      line(slowest.map(n => "\"" + n + "\":" + fmt(byQuery(n))),
        (if (solo.isEmpty) "" else s""","solo_lane_sec":${fmt(soloWall)}""") +
          (if (wrote) s""","full":"${outPath.toAbsolutePath}"""" else ""))
    // the driver-parseable contract, belt and braces: the same compact
    // line lands in a BARE file too (no sbt logger prefix, no tail
    // truncation risk) — 13 rounds of BENCH artifacts carried
    // "parsed": null because the stdout line rode sbt's "[info] "
    // decoration (fixed in build.sbt via outputStrategy, this file is
    // the fallback that works regardless of how the JVM is launched)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_LINE", "bench_line.json")),
      stdoutLine + "\n")
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write bench_line.json: $e") }
    println(stdoutLine)
    ec.shutdown()
    spark.stop()
  }
}
