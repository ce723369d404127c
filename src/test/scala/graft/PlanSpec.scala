package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan regression guards (SURVEY.md §4.2 — "verify in plans,
  * don't rebuild"): pushdown, pruning, join strategy, top-k, partial
  * aggregation, and the custom codegen kernel. These lock in the
  * scale-relevant plan shapes the scaladocs claim. */
class PlanSpec extends SparkTestBase {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString()

  test("filter predicates are pushed down to the parquet scan") {
    val p = plan(ops.Relational.filterPurchases(spark, sf0001))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("EqualTo(event_type,purchase)"), p)
    assert(p.contains("GreaterThan(value,100.0)"), p)
  }

  test("column pruning: unreferenced columns never reach the scan") {
    val p = plan(ops.Relational.mapEnrichValue(spark, sf0001))
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("props"), s"props should be pruned from scan:\n$p")
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val p = plan(ops.Joins.joinOrdersCustomer(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("orderBy+limit compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan(ops.Relational.topkOrdersByPrice(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("aggregation is two-phase (map-side partial + final)") {
    val p = plan(ops.Relational.aggValueByType(spark, sf0001))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("hits-step per-role top-20 runs as TakeOrdered, not a lit()-keyed window") {
    // round 14: the partitionBy(lit(role)) rank was the one data-grain
    // member of the r13 lit()-window sweep — now orderBy+limit per role
    val p = plan(ops.Analytics.hitsStep(spark, sf0001))
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("WindowExec"), p)
  }

  test("similarity joins run the native codegen'd dot-product kernel") {
    val p = plan(ops.Llm.annLsh(spark, sf0001))
    assert(p.contains("graft_dot_product"), p)
  }

  test("exact similarity top-k runs the broadcast-Q kernel (no pair join)") {
    val p = plan(ops.Llm.simTopk(spark, sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"sim_topk must not materialize the QxN pair join:\n$p")
    assert(p.contains("MapPartitions"), p)
  }

  test("llm token count scan prunes to the referenced document columns") {
    val p = plan(ops.Llm.tokenCount(spark, sf0001))
    assert(!p.contains("lang"), s"lang should be pruned:\n$p")
    assert(!p.contains("doc_id"), s"doc_id should be pruned:\n$p")
  }

  test("date-bounded lineitem scan pushes the shipdate predicate") {
    val p = plan(ops.Relational.aggPricingSummary(spark, sf0001))
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
  }

  // ---- round-2 operators ----

  test("pivot with explicit values is a single two-phase aggregation (no distinct pre-pass)") {
    val p = plan(ops.Analytics.pivotValueByType(spark, sf0001))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // one shuffle for the groupBy, one for the final orderBy — nothing else
    assert("Exchange".r.findAllIn(p).size <= 2, s"pivot should not add shuffles:\n$p")
  }

  test("unpivot is shuffle-free up to the final sort (row-local generator)") {
    val p = plan(ops.Analytics.unpivotLineitemMeasures(spark, sf0001))
    // only the rangepartitioning exchange of the deterministic orderBy
    assert("Exchange".r.findAllIn(p).size <= 1, p)
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,100)")
      || p.contains("LessThan(l_orderkey,100)"), s"orderkey bound should push down:\n$p")
  }

  test("grouping sets plans a single scan through Expand (no per-set replay)") {
    val p = plan(ops.Analytics.aggGroupingSetsShip(spark, sf0001))
    assert(p.contains("Expand"), p)
    assert("Scan parquet".r.findAllIn(p).size === 1, s"one scan only:\n$p")
  }

  test("semi join keeps the semi form in the physical plan") {
    val p = plan(ops.Analytics.joinSemiActiveCustomers(spark, sf0001))
    assert(p.contains("LeftSemi"), p)
  }

  test("hash sample aggregates two-phase after the row-local filter") {
    val p = plan(ops.Analytics.sampleHashEvents(spark, sf0001))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("IVF probe broadcasts the centroid table") {
    val p = plan(ops.Llm2.ivfAnn(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("graft_dot_product"), p)
  }

  test("round-7 TPC-H shapes: broadcast dims, bounded shuffle-exchange counts") {
    // "(?<!Broadcast)Exchange" counts SHUFFLE exchanges only — a
    // BroadcastExchange is the cheap dim ship these shapes exist to use
    def shuffles(name: String): Int =
      "(?<!Broadcast)Exchange".r
        .findAllIn(plan(SparkEntry.queries(name)(spark, sf0001))).size
    // q6 is a pure scan-filter-agg: only the single-partition final agg
    assert(shuffles("tpch_q6_forecast_revenue") <= 1)
    assert(!plan(SparkEntry.queries("tpch_q6_forecast_revenue")(spark, sf0001))
      .contains("Join"), "q6 must have no join at all")
    // q7/q8: every dim broadcast; shuffles = final agg + output sort only
    assert(shuffles("tpch_q7_nation_volume") <= 3)
    assert(shuffles("tpch_q8_market_share") <= 3)
    // q19: one broadcast part join + the single-partition agg
    assert(shuffles("tpch_q19_discount_bands") <= 1)
    assert(plan(SparkEntry.queries("tpch_q19_discount_bands")(spark, sf0001))
      .contains("BroadcastHashJoin"))
    // q21 decorrelation: pair agg + order agg + name agg + sort, and the
    // orderkey semi join — must never exceed the one-lineitem-pass budget
    assert(shuffles("tpch_q21_sole_blame") <= 6)
  }

  test("no query plans an unbounded cartesian/nested-loop join (bounded exceptions listed)") {
    // Every allowed entry is a deliberately-bounded NLJ/cross documented at
    // its definition site: small-dims theta band, 25-row string-distance
    // matrix, bounded query-set similarity scans, k-row centroid probes.
    val allowed = Set("join_theta_price_band", "scalar_string_distance",
      "llm_ivf_ann", "llm_kmeans_step",
      // the exact-baseline row's scan-cost count: corpus x the 5-row
      // broadcast query frame (|Q| bounded by the simTopk contract),
      // plus the inherited ivfProbe k-row centroid probe
      "llm_ann_recall",
      // per-config 1-row count crosses (n_candidates x n_true x
      // n_detected) assembling each audit row — the graph_rich_club shape
      "llm_dedup_band_audit",
      // per-round 1-row median/MAD broadcasts over the calendar-bounded
      // surviving day frame (see Audit.esdResidual)
      "anomaly_esd_residual",
      // 1-row edge-counts x 1-row node-counts cross assembling the
      // 4-row k panel (the graph_triangle_count shape)
      "graph_rich_club",
      // 1-row sum-vector/norm-total broadcasts — the identity that
      // replaces the O(n²) pair sum (see Llm9.embedAnisotropy)
      "llm_embed_anisotropy",
      // composes the same bounded k-row centroid probe as llm_ivf_ann
      "llm_ivfpq_ann",
      // k-row centroid probe, same broadcast shape as llm_kmeans_step
      "llm_centroid_accuracy",
      "llm_ann_lsh",
      // 1-row corpus-size aggregate broadcast into the TF-IDF scorer
      "llm_tfidf_topterms",
      // 1-row decimal-total broadcasts (corpus token count / weight sum)
      "llm_unigram_logprob", "llm_temperature_mix",
      // both reuse llm_unigram_logprob's 1-row corpus-token-total
      // broadcast (the LM they share — see Llm13.minKProb);
      // llm_ccnet_ppl_buckets adds the 5-row per-language
      // tertile-cut broadcast
      "llm_min_k_prob", "llm_ccnet_ppl_buckets",
      // 1-row train-corpus-total broadcast (N of the unigram rung); the
      // four LM tables themselves join as broadcast HASH joins
      "llm_stupid_backoff",
      // |sources|-row signature table (loud 1000-source bound) paired with
      // itself — the sketch exists precisely so this side stays tiny
      "llm_minhash_src_sim",
      // 1-row scalar-subquery broadcasts: Q11's global stock-value total
      // and Q22's average positive balance (see Warehouse3 scaladoc)
      "tpch_q11_important_parts", "tpch_q22_idle_customers",
      // 1-row node-count broadcast (teleport term 1/N)
      "graph_pagerank_step",
      // 1-row stratum-stats + sample-count broadcasts onto the 1-row
      // butterfly aggregate (see Analytics.butterflyCappedOn)
      "graph_butterfly_capped",
      // 1-row count-min sketch broadcast into the estimate probe
      "llm_cms_heavy_hitters",
      // two 1-row KMV sketch broadcasts onto the 1-row exact-sides
      // aggregate (see Llm6.kmvSetops)
      "agg_kmv_setops",
      // 1-row histogram-totals broadcast onto the 10-bucket PSI frame
      "drift_psi_length",
      // 1-row pair-total / order-total broadcasts into the PMI and lift
      // scorers (marginals join as broadcast HASH joins)
      "llm_pmi_collocations", "basket_lift_pairs",
      // 1-row quartile-boundary broadcast onto the customer scoring pass
      "rfm_segments",
      // 1-row [p1, p99] clip-boundary broadcast onto the event scan
      "agg_winsorized_stats",
      // 1-row max-date anchor broadcast onto the decayed-weight scan
      "trending_decayed_parts",
      // 1-row p90 revenue boundary broadcast onto the customer pass
      "concentration_revenue",
      // 1-row corpus-stats broadcast (N, Σdl) into the BM25 scorer; the
      // hybrid adds the 1-row query-embedding broadcast of the cosine leg
      "llm_bm25_topk", "llm_hybrid_rrf",
      // 1-row LM-total broadcasts (target/corpus token totals, |vocab|)
      "llm_dsir_weights",
      // 5-row class-table + 1-row vocab/train-total broadcasts into the
      // smoothing grid and prior (see Ml.naiveBayes)
      "ml_naive_bayes",
      // 10-row centroid-table broadcast probe (the L44 k-means shape)
      "llm_silhouette",
      // three 1-row aggregate broadcasts (nodes / wedges / triangles)
      // onto the 1-row edge-count base (the agg_kmv_setops shape)
      "graph_triangle_count",
      // per-round 1-row node-count broadcast onto the edge-count row
      "graph_kcore_peel",
      // 1-row min/max bounds broadcast onto the bucket-assignment scan
      "layout_zorder_prune",
      // per-role 1-row score-total broadcast for L1 normalization
      "graph_hits_step",
      // 1-row corpus-size broadcast into the contingency scorer
      "ml_chi2_terms",
      // 1-row revenue-total broadcast for the share division
      "attr_last_touch",
      // 1-row node-count broadcast onto the 1-row six-sums reduce
      "graph_assortativity",
      // 1-row best-|r| broadcast onto the 13-lag correlation frame
      "ts_crosscorr_types",
      // two 1-row count broadcasts onto the 1-row candidate count
      "er_blocking_quality",
      // 10-row decile-grid broadcast range-located into the bounded
      // distinct-revenue frame (plus the 1-row gini/total broadcast)
      "stats_gini_lorenz",
      // 1-row horizon (max ts) broadcast onto the per-user lifetime agg
      "stats_kaplan_meier",
      // 1-row μ/v-vector and n broadcasts onto each matrix-free C·v scan
      "ml_pca_power",
      // 1-row corpus totals (X, n) broadcast onto the 25-nation frame
      "stats_theil_decomposition",
      // calendar-bounded hourly frame self-paired (≤10⁴ rows at any
      // corpus size) plus the 1-row tie-table broadcast
      "stats_mann_kendall",
      // 1-row full-mean broadcast onto the 32-row replica frame
      "stats_poisson_bootstrap",
      // 9-row threshold grid broadcast over the bounded score histogram
      // plus the 1-row class-totals broadcast
      "ml_threshold_sweep",
      // 1-row x_(k+1) threshold broadcast onto the 200-row top frame
      "stats_hill_tail",
      // 1-row collected language-array broadcast crossed into the
      // per-source totals (|S|×|L| grid; never a data-sized cartesian)
      "stats_jsd_sources",
      // 1-row violation-count aggregates broadcast-crossed per constraint
      "audit_referential",
      // 1-row stats / max-day frames broadcast-crossed into bounded tops
      "profile_key_skew", "dau_rolling_7d",
      // 1-row raw-doc-count broadcast crossed into the funnel stack
      "llm_e2e_pipeline",
      // 1-row tie-adjustment aggregate broadcast into the 5-group frame
      "stats_kruskal_wallis",
      // 10-row decile grid broadcast range-joined into the score frame
      // (the stats_gini_lorenz shape)
      "ml_gains_table",
      // 1-row treatment-count broadcast gating complete blocks
      "stats_friedman",
      // 1-row dcg-cutoffs frame crossed with the ≤20-row ideal frame
      "ml_ndcg",
      // calendar-bounded daily frame self-paired (the stats_mann_kendall
      // shape at day grain)
      "stats_kendall_tau",
      // bounded 10-row query panel broadcast against the corpus scan
      // (the llm_ivf_ann probe shape), twice — full-dim and truncated
      "llm_matryoshka_recall",
      // 1-row tie-adjustment aggregate broadcast onto the 1-row
      // signed-rank reduce (the stats_kruskal_wallis shape)
      "stats_wilcoxon_signed_rank",
      // two 1-row median/MAD broadcasts onto the calendar-bounded daily
      // frame (the anomaly_mad_robust shape at count grain)
      "dq_volume_anomaly",
      // 1-row corpus-total broadcast onto the QI-class × 10-bin grid
      "privacy_t_closeness",
      // 1-row corpus-total broadcast onto the histogram-scored scan
      "anomaly_hbos",
      // 1-row grand-mean broadcast onto the calendar-bounded daily frame
      "ts_stl_daily",
      // composes ts_stl_daily plus two 1-row median/MAD broadcasts
      "anomaly_stl_residual",
      // 1-row distinct-bigram-total broadcast into the KN probability
      "llm_kneser_ney_ppl",
      // 1-row global-summary broadcast onto the 5-row band frame
      "ts_interarrival_dist",
      // 1-row chunk-totals broadcast onto the chunk-frequency frame
      // (replaced the r12 whole-frame window — see Llm9.cdcChunks)
      "llm_cdc_chunks",
      // 1-row component-totals broadcast onto the component-size frame
      // (replaced the r12 whole-frame window — see Analytics CC notes)
      "graph_connected_components",
      // 1-row hour-count and first-half-mean broadcasts onto the
      // calendar-bounded hourly frame (see Stats4.pageHinkleyFrameMicro)
      "drift_page_hinkley",
      // ≤k-row selected-center broadcast crossed into each maximin scan
      // (the llm_kmeans_step centroid-probe shape; see Llm12)
      "llm_kcenter_select",
      // 1-row distinct-user-total broadcast onto the ≤|types|²+|types|³
      // pattern-support frame (see Llm12.seqPatternSupport)
      "seq_pattern_support",
      // 1-row fit / q-hat broadcasts onto the calendar-bounded daily
      // frame (see Stats5.conformalInterval)
      "ml_conformal_interval",
      // 1-row hour-count broadcast + the calendar-bounded subsequence
      // frame self-paired (the stats_mann_kendall shape at subsequence
      // grain; see Stats4.matrixProfile)
      "ts_matrix_profile")
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!allowed(name)) {
        val p = plan(fn(spark, sf0001))
        assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unbounded pair join:\n$p")
      }
    }
  }

  test("butterfly: orders broadcasts into the edge build; exchanges stay edge-linear") {
    val p = plan(ops.Analytics.butterflyCount(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p) // orders side never shuffles lineitem
    // static plan: the edge subtree appears under BOTH join inputs
    // (broadcast 1 + distinct 1 + c-re-shuffle 1, ×2) + pair agg 1 = 7;
    // at runtime AQE's exchange reuse collapses the twin subtrees — the
    // measured 35.3 MB (ShuffleVolumeSpec bound) is 3 edge-set moves,
    // not 6. Anything beyond 7 statically means the wedge stream itself
    // started moving (the 12.5M-row explosion this plan keeps inside
    // the join→partial-agg pipeline).
    assert("Exchange".r.findAllIn(p).size <= 7, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("CEP pattern match shuffles once on the key (plus the final sort)") {
    val p = plan(ops.Joins.cepClickClickPurchase(spark, sf0001))
    assert("Exchange".r.findAllIn(p).size <= 2, s"one key shuffle + one sort:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("n-gram generation is shuffle-free before the count aggregation") {
    val p = plan(ops.Llm2.ngramBigrams(spark, sf0001))
    // bigram construction adds no exchange: count agg, top-N window, final
    // sort only
    assert("Exchange".r.findAllIn(p).size <= 3, p)
    assert(!p.contains("WindowExec\n   +- Sort\n      +- Generate"),
      "no per-doc window over exploded tokens expected")
  }

  test("extrema-by aggregates two-phase like any other aggregation") {
    val p = plan(ops.Analytics.aggExtremaBy(spark, sf0001))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("moment statistics are one partial-aggregable pass (six decimal sums, two-phase)") {
    val p = plan(ops.Analytics.aggStatsMoments(spark, sf0001))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert("Scan parquet".r.findAllIn(p).size === 1, s"one scan only:\n$p")
  }

  // ---- round-3 operators ----

  test("tpch q3: segment and ship-date predicates reach the scans") {
    val p = plan(ops.Warehouse.tpchQ3(spark, sf0001))
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("GreaterThan(l_shipdate"), p)
  }

  test("tpch q5: star join broadcasts every dimension leg at fixture scale") {
    val p = plan(ops.Warehouse.tpchQ5(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch q10: returnflag predicate prunes lineitem at the scan") {
    val p = plan(ops.Warehouse.tpchQ10(spark, sf0001))
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
  }

  test("sessionization reuses one user_id shuffle for lag, cumsum and the session aggregate") {
    val p = plan(ops.Warehouse.sessionizeEvents(spark, sf0001))
    assert("Exchange".r.findAllIn(p).size <= 2, s"one key shuffle + final sort:\n$p")
  }

  test("cdc compaction is one key shuffle plus the final sort") {
    val p = plan(ops.Warehouse.cdcLatestPerKey(spark, sf0001))
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("scd2 history build reuses one user_id shuffle for both window passes") {
    val p = plan(ops.Warehouse.cdcScd2Intervals(spark, sf0001))
    assert("Exchange".r.findAllIn(p).size <= 2, s"one key shuffle + final sort:\n$p")
  }

  test("context packing: the bin aggregate reuses the source window partitioning") {
    val p = plan(ops.Llm3.packContext(spark, sf0001))
    assert("Exchange".r.findAllIn(p).size <= 2, s"one source shuffle + final sort:\n$p")
  }

  test("cep kleene: row_number, lag/lead and both island windows share one user_id shuffle") {
    val p = plan(ops.Joins.cepKleeneTimeout(spark, sf0001))
    assert("Exchange".r.findAllIn(p).size <= 2, s"one key shuffle + final sort:\n$p")
  }

  test("cep skip strategies: island agg and user rollup reuse the window shuffle") {
    val p = plan(ops.Joins.cepSkipStrategies(spark, sf0001))
    assert("Exchange".r.findAllIn(p).size <= 2, s"one key shuffle + final sort:\n$p")
  }

  test("profile pass is genuinely one scan (single agg + stack unpivot)") {
    val p = plan(ops.Analytics.profileEventsColumns(spark, sf0001))
    assert("Scan parquet".r.findAllIn(p).size === 1, s"one scan only:\n$p")
  }

  test("histogram aggregates two-phase after row-local binning") {
    val p = plan(ops.Warehouse.aggHistogramValue(spark, sf0001))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q18 aggregates BEFORE joining: the HAVING pre-filter sits under the join") {
    val opt = ops.Warehouse.tpchQ18(spark, sf0001).queryExecution.optimizedPlan
    val joins = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    // some join input subtree must contain the lineitem aggregate — i.e.
    // only qualifying order keys reach the join, not raw lineitem rows
    val aggUnderJoin = joins.exists(j =>
      (j.left.collect { case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a } ++
        j.right.collect { case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a })
        .nonEmpty)
    assert(aggUnderJoin, opt.toString)
  }

  test("funnel is two aggregations with no join (per-user pass then global rollup)") {
    val p = plan(ops.Warehouse.funnelStages(spark, sf0001))
    assert("HashAggregate".r.findAllIn(p).size >= 3, p) // partial+final × 2 levels
    assert(!p.contains("Join"), p)
  }

  test("correlated scalar subquery decorrelates to aggregate + join (no per-row re-execution)") {
    // (cartesian-freedom is covered by the global sweep above)
    val p = plan(ops.Warehouse.sqlCorrelatedScalar(spark, sf0001))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("Join"), p)
  }

  test("LATERAL top-n decorrelates to a ranked join with the bound pushed to the scan") {
    // Round-9 pin (VERDICT r8 #1): the correlated ORDER BY … LIMIT 2 must
    // plan as WindowGroupLimit (partial top-k before the group shuffle) +
    // a broadcast equi-join — NOT per-outer-row re-execution — and the
    // custkey bound must reach the orders scan as a pushed filter (without
    // it, the whole orders table is sorted + window-limited first).
    val p = plan(ops.Warehouse.sqlLateralTopn(spark, sf0001))
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the orders-side scan carries the custkey bound as a pushed filter
    assert("LessThan\\(o_custkey,50\\)".r.findFirstIn(p).nonEmpty, p)
  }
}
