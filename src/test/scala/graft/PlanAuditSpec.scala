package graft

/** Cross-cutting physical-plan audit: no declared query may regress
  * into an unintended cartesian product or nested-loop join. The
  * whitelist is the set whose SEMANTICS are non-equi pairing with a
  * tiny broadcast side (exact all-pairs similarity, centroid/probe
  * cross joins) — there, BroadcastNestedLoopJoin IS the right plan. */
class PlanAuditSpec extends SparkSpec {

  // intended non-equi joins: probe/centroid broadcasts, exact
  // all-pairs similarity, and the one-row corpus-size scalar broadcast
  // in exact TF-IDF
  private val intendedNonEqui = Set(
    "q28_cosine_pairs", "q29_knn_bruteforce", "q30_label_centroids",
    "q34_media_knn", "q43_ann_lsh", "q52_ann_ivf",
    "q61_tfidf_exact",
    // one-row id-bounds broadcast for the deterministic bucketing
    "q62_pack_windows",
    // one-row corpus-total broadcasts (token count / bigram count /
    // N + Σdl for the BM25 idf and length normalization / train-half
    // token total T for the Stupid-Backoff tiers)
    "q79_unigram_nll", "q80_pmi_collocations", "q88_bm25",
    "q108_bigram_nll",
    // one-row node-count broadcast per power iteration
    "q85_pagerank",
    // the same one-row node-count broadcast, in both the base-graph
    // seed fold and the warm rounds
    "q203_pagerank_warm",
    // one-row seed-count broadcast per personalized power iteration
    "q144_ppr",
    // one-row token-total broadcast for the CMS eps·N bound
    "q123_cms_freq_gate",
    // one-row global-span broadcast for the resample grid
    "q96_locf_resample",
    // same one-row global-span broadcast, interpolation variant
    "q169_interp_resample",
    // one-row per-edge totals crossJoined onto one-row orphan counts
    // (eight single-row frames — the audit output is 8 rows total)
    "q173_fk_audit",
    // one-row digit-total broadcast for the frequency division
    "q178_benford",
    // one-row per-column row-total broadcast for the p = c/n terms
    "q179_key_skew",
    // probe-broadcast non-equi scans on BOTH ranking paths (exact
    // q28-style + the quantized codes) — the Q×N scan IS the gate
    "q127_quantized_knn",
    // the fused dense half is the q29 probe-broadcast brute-force
    // scan (q160: the oracle-exact truth ranking; q161: the same
    // exact ranking embedded as the gate's reference fusion)
    "q160_rrf_fusion", "q161_rrf_ann_gate",
    // one-row (N, Σdl) corpus-stats broadcast inherited from q88's
    // BM25 matrix; the query-term join itself is an equi-join
    "q128_bm25_topk",
    // one-row Σ√c normalizer broadcast over the 20-row domain table
    "q138_mixture_alloc",
    // anchor-broadcast non-equi scan (the q29 shape): the corpus side
    // never shuffles, the agg folds each task to ≤ |anchors| rows
    "q140_contrastive",
    // six-row literal (scheme × split-pair) grid joined against the
    // leak counts so zeros are emitted, not omitted
    "q141_split_leakage",
    // one-row broadcasts: global horizon, user total, and the
    // ≤64-row K-M table array for the ordered product fold
    "q142_survival",
    // the R×C contingency grid: a cross of the two DISTINCT category
    // sets (each category-cardinality rows), so absent cells enter
    // the χ² at o = 0 — never corpus-scale
    "q147_chisq")

  private val constructionHeavy = PlanAuditSpec.constructionHeavy

  test("projection pushdown: no query scans every lineitem column") {
    // lineitem is the widest fact table (11 columns). No declared
    // query needs them all, so a full-width ReadSchema means a
    // projection stopped reaching the scan — at 100 TB that is the
    // difference between reading the columns you use and reading the
    // table. (Cheap construction-only queries; the CC/ml ones are
    // excluded for build cost, not plan shape.)
    val width = "ReadSchema: struct<([^>]*)>".r
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(constructionHeavy)
      .flatMap { name =>
        val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString
        val full = plan.linesIterator.filter(_.contains("lineitem")).exists { ln =>
          width.findFirstMatchIn(ln).exists(_.group(1).split(",").length >= 11)
        }
        if (full) Some(name) else None
      }
    assert(offenders.isEmpty, s"full-width lineitem scans in: $offenders")
  }

  test("no query plans an unintended cartesian or nested-loop join") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(constructionHeavy)
      .flatMap { name =>
        val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString
        val bad =
          (plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin")) &&
            !intendedNonEqui(name)
        if (bad) Some(name) else None
      }
    assert(offenders.isEmpty, s"unintended cartesian/nested-loop joins in: $offenders")
  }
}

object PlanAuditSpec {
  // queries that train/iterate during CONSTRUCTION (ml fits, the CC
  // driver loop) — their plan shape is asserted by their own specs.
  // The ANN recall gates embed q29+q43/q52 (probe broadcast + fit).
  // Shared with AnalysisSmokeSpec (which can only analyze queries
  // whose construction does not execute).
  val constructionHeavy: Set[String] = Set(
    "q31_minhash_pairs", "q41_tfidf", "q43_ann_lsh", "q52_ann_ivf",
    "q57_dedup_clusters", "q90_dedup_survivors",
    "q101_ann_lsh_gate", "q102_ann_ivf_gate", "q103_clusters_fast",
    // IVF-PQ gate: m+1 k-means fits + the one-row verdict broadcast,
    // same construction/verdict shape as q101/q102
    "q135_ann_pq_gate",
    // banded-dedup gate: one-row verdict broadcast crossJoined onto
    // the probe ids (same scalar-broadcast shape as q101/q102);
    // q105 runs the banding checkpoint + the CC driver loop during
    // construction, like q57/q103
    "q104_embed_banded_gate", "q105_semantic_dedup",
    // streaming replays: construction RUNS a full MemoryStream
    // micro-batch replay (graft.streaming.StreamReplay); the returned
    // frame is the finalized local result (plus, for the gates, the
    // one-row verdict broadcast) — plan shape is asserted by the
    // streaming specs
    "q111_stream_windows", "q112_stream_heavy_hitters",
    "q113_stream_quantile_gate", "q114_stream_dedup",
    "q115_stream_embed_gate", "q117_stream_interval_join",
    "q118_stream_sessions", "q119_stream_ewma", "q120_stream_outer_join",
    "q124_stream_cms_gate", "q132_stream_asof_join", "q150_stream_anomaly",
    // construction runs the foreachBatch upsert replay end-to-end
    // (StreamCdc); plan per batch is mergeApply's agg+join, asserted
    // by CdcSpec on the batch operator
    "q172_stream_cdc",
    // same: foreachBatch view-fold replay (StreamIvm); per-batch plan
    // is Ivm.mergePartials' agg+join, asserted by IvmSpec
    "q177_stream_ivm",
    // run the k merge rounds (one bounded top-1 collect per round)
    // during construction, like the CC driver loop
    "q133_bpe_merges", "q134_bpe_vocab",
    // eagerly checkpoints each HITS phase's node-count contribution
    // frame during construction (read twice: L1 total + division)
    "q151_hits",
    // runs the CC driver loop during construction, like q57/q103
    "q157_golden_record",
    // writes the bucketed tables on first construction; its plan
    // property (zero-exchange SMJ) is BucketedJoinQuerySpec's job
    "q116_bucketed_join",
    // round 10: q180 writes the view + fact indexes on first
    // construction (IvmSpec asserts the no-persisted-rows-shuffle
    // plan); q181 runs the SCC phase loop during construction (like
    // q157's CC driver); q182 builds/extends the partitioned ANN
    // index + runs the m+1 fits (AnnIndexSpec asserts the DPP probe
    // plan); q185 reads the key profiles + collects the
    // child-session hub rollup during construction (SkewAdaptiveSpec
    // plan-asserts every branch)
    "q180_ivm_retract", "q181_scc", "q182_ann_index_gate",
    "q185_adaptive_skew",
    // streaming retractable fold: construction runs the foreachBatch
    // replay (q177's class); per-batch plan is mergeDeltaRetractFrames,
    // asserted by IvmSpec / StreamIvmSpec
    "q187_stream_ivm_retract",
    // filtered/delete ANN gates: construction ensures the shared q182
    // index (17 fits on first touch) + the q189 copy/tombstone write;
    // probe plans (DPP scan + broadcast anti-join) are AnnIndexSpec's
    "q188_ann_filtered_gate", "q189_ann_delete_gate",
    // streaming SCD2 fold: construction runs the foreachBatch replay
    // (q172's class); per-batch plan is scd2Over/scd2Increment,
    // asserted by CdcSpec
    "q194_stream_scd2",
    // builds the per-customer aggregate index on first construction
    // (q180's class); the move-fold plan is asserted by IvmSpec
    "q195_ivm_dim_move",
    // builds the persisted ER state (PassJoin + CC driver loop) on
    // first construction and runs the incremental CC at query time —
    // q157's class
    "q198_incr_golden",
    // streaming dim-move fold: foreachBatch replay (q177's class);
    // per-batch plan is mergeDimMove, asserted by IvmSpec
    "q199_stream_dim_move",
    // round 11: q204 builds the base index + PSI decision + retrain
    // swap on first touch (2× q182's fit cost) and carries the
    // one-row verdict + decision broadcasts; q205 runs the
    // foreachBatch ingest replay during construction (q177's class)
    // and the same verdict broadcast
    "q204_ann_drift_gate", "q205_stream_ann_gate",
    // round 12: q208 builds the component-bucketed edge state on
    // first touch and runs the touched-component CC driver loop (plus
    // the delta-bounded phantom-check actions) during construction —
    // q202's class with q57's loop; q210/q211 are foreachBatch
    // replays (q177's class; per-batch plans are ccIncrementFrames /
    // mergeMultiDimMove, asserted by GraphIncrementSpec / MultiIvmSpec)
    "q208_cc_retract", "q210_stream_cc", "q211_stream_multi_move",
    "q213_stream_cc_retract", "q214_stream_move_minmax",
    // round 13: q215/q216 build the full delete-capable dedup/ER
    // states (banding/PassJoin + the CC driver loop) on first touch
    // and run the touched-cluster CC re-solve at query time — q208's
    // class; DedupRetractSpec / ErRetractSpec assert the
    // no-state-shuffle delete plan
    "q215_dedup_delete", "q216_er_delete")
}
