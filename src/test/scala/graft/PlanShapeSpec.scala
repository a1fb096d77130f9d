package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Physical-plan regressions the 100 TB posture depends on, pinned as
  * tests: pushdown reaching the parquet scan, column pruning, broadcast
  * choice on the star join, and the no-join rewrite of the interval join.
  * (Shapes that already have a home — qx11's codegen span in
  * MultimodalCodecSpec, exchange shapes in OperatorSpec, bucketed joins
  * in ScaleTechniqueSpec — stay there.)
  */
class PlanShapeSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def sparkPlan(name: String) =
    SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan

  private def scans(name: String): Seq[FileSourceScanExec] =
    sparkPlan(name).collect { case f: FileSourceScanExec => f }.toSeq

  test("q01: the value filter reaches the parquet scan") {
    assert(scans("q01_stateless_pipeline").exists(
      _.metadata.get("PushedFilters").exists(_.contains("value"))))
  }

  test("q16: lineitem scan is column-pruned to what the aggregates need") {
    val read = scans("q16_lineitem_pricing").head.requiredSchema.fieldNames.toSet
    assert(read == Set("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax"))
  }

  test("q17: the customer dimension joins as a broadcast hash join") {
    assert(sparkPlan("q17_segment_revenue").toString.contains("BroadcastHashJoin"))
  }

  test("q09: interval join compiles to a window plan with no join at all") {
    val p = sparkPlan("q09_interval_join").toString
    assert(!p.contains("Join"), "the range-frame rewrite must not join")
    assert(p.contains("Window"))
  }

  test("q05b: shuffled as-of windows per bucket and hash-joins the carries") {
    val p = sparkPlan("q05b_asof_shuffled").toString
    assert(p.contains("Window"))
    assert(p.contains("BroadcastHashJoin"), "carries must join by bucket equality")
  }

  test("qx95: with broadcast off, the salted join exchanges on (domain, salt)") {
    // At gate scale AQE rightly broadcasts the tiny policy table, so
    // the salt is invisible in the default plan. The 100 TB claim is
    // about the SHUFFLE regime — force it and pin that the join's
    // exchange keys carry the salt column alongside the domain, i.e.
    // the hot domain's rows really spread over `salts` reducer groups.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = SparkEntry.queries("qx95_salted_domain_join")(spark, dir)
        .queryExecution.executedPlan
      val saltedExchanges = plan.collect {
        case e: ShuffleExchangeExec => e.outputPartitioning
      }.collect {
        case h: HashPartitioning
          if h.expressions.exists(_.references.exists(_.name == "__salt")) &&
             h.expressions.exists(_.references.exists(_.name == "domain")) => h
      }
      assert(saltedExchanges.size >= 2,
        s"both join sides must exchange on (domain, __salt); got $saltedExchanges")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("qx90: keeper election is aggregate-only — no Window, no cartesian") {
    val p = sparkPlan("qx90_chunk_reconcile").toString
    assert(!p.contains("Window"), "keeper election must be min(struct) aggregation")
    assert(!p.contains("CartesianProduct"), "reconciliation must never go all-pairs")
  }

  test("qx91: the weight table broadcasts and no corpus Window exists") {
    val p = sparkPlan("qx91_dsir_select").toString
    assert(p.contains("BroadcastHashJoin"),
      "the B-bounded weight table must broadcast into the scoring join")
    assert(!p.contains("Window"),
      "scoring and top-k must stay window-free (topk_by, not row_number)")
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"),
      "only broadcast-small totals may cross-join")
  }

  test("qx17: the boilerplate cap bounds BOTH self-join inputs") {
    // The frequency cap (keep: 2 <= cnt <= 64) must semi-join each side
    // of the window-hash self-join BEFORE the pair join executes —
    // cap-after-join is correct but fans skewed hashes into m²/2 rows.
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val plan = sparkPlan("qx17_substring_dup")
    val pairJoin = plan.collectFirst {
      case j: BaseJoinExec if j.joinType == Inner => j
    }.getOrElse(fail("qx17 plan has no inner pair join"))
    def capped(side: org.apache.spark.sql.execution.SparkPlan) =
      side.collectFirst {
        case j: BaseJoinExec if j.joinType == LeftSemi => j
      }.nonEmpty
    assert(capped(pairJoin.left), "left self-join input is not cap-bounded")
    assert(capped(pairJoin.right), "right self-join input is not cap-bounded")
  }

  test("qx22: the token-budget window sorts only the topk_by-pruned candidates") {
    // The admission prefix-sum must run AFTER the bounded per-stratum
    // prune: the Window's subtree has to contain the ObjectHashAggregate
    // (topk_by) — a window directly over the filtered corpus would sort
    // every stratum in full.
    val plan = sparkPlan("qx22_curation_pipeline")
    val win = plan.collectFirst {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.getOrElse(fail("qx22 plan has no window"))
    assert(win.child.collect {
      case a if a.nodeName.contains("ObjectHashAggregate") => a
    }.nonEmpty, "budget window input is not bounded by the topk_by prune")
  }

  test("qx32: the bloom prescreen filters below the exact-confirm join") {
    // The 8 KB bloom image must reject corpus windows BEFORE the exact
    // confirm join materializes anything — a confirm-then-bloom plan
    // would re-create exactly the broadcast-set cost the bloom exists to
    // avoid. The prescreen compiles to the one-row-bloom
    // BroadcastNestedLoopJoin whose CONDITION is the shiftright bit test
    // (evaluated streaming-side, inside the scan stage); assert it sits
    // below the exact-confirm BroadcastHashJoin.
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    import org.apache.spark.sql.catalyst.plans.Inner
    val plan = sparkPlan("qx32_bloom_decontaminate")
    val confirm = plan.collectFirst {
      case j: BroadcastHashJoinExec if j.joinType == Inner => j
    }.getOrElse(fail("qx32 plan has no broadcast confirm join"))
    val screened = confirm.children.exists(_.collectFirst {
      case j: BroadcastNestedLoopJoinExec
        if j.condition.exists(_.toString.contains("shiftright")) => j
    }.nonEmpty)
    assert(screened, "bloom bit-test prescreen is not below the confirm join")
  }

  test("qx33: the cell grid and probe set reuse one vocabulary exchange") {
    // Both CMS consumers must hang off the SAME (lang, wh) count
    // aggregate — two independent corpus explodes would double the
    // dominant cost. Physical proof: a ReusedExchange node (plan without
    // AQE, which hides the reuse inside stages).
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = SparkEntry.queries("qx33_cms_frequency")(spark, dir)
        .queryExecution.executedPlan
      assert(plan.collect {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
      }.nonEmpty, "qx33 recomputes the corpus word counts per consumer")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("qx3/qx13: candidate generation never shuffles array columns") {
    // The (band,sig)/(cid) candidate columns are narrow ids; the 64-long
    // iv arrays must not appear in any Exchange's output schema.
    // (sparkPlan predates EnsureRequirements and AQE hides the tree, so
    // plan without AQE for this assertion.)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      for (q <- Seq("qx3_ann_lsh", "qx13_ann_ivf")) {
        val exchanges = SparkEntry.queries(q)(spark, dir)
          .queryExecution.executedPlan.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
          }
        assert(exchanges.nonEmpty)
        val leaky = exchanges.filter(_.child.output.exists(a =>
          a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
        assert(leaky.isEmpty, s"$q shuffles array columns: ${leaky.map(_.child.output)}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("qx45: the composed chain keeps both parents' pinned shapes") {
    // Composition must not silently undo the component pins: the decon
    // stage's bloom bit-test prescreen (qx32's shape) and the budget
    // window sitting above the topk_by candidate prune (qx22's shape).
    // Round 18: qx45 overlaps its decon-screen leg with the CC labeling
    // (both eagerly checkpointed), so the prescreen pin moves to the
    // screen leg's OWN plan — the subtree qx45 executes for that leg —
    // while the budget-window pin stays on the composed plan.
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val legPlan = queries.ExtQueries.qx45DeconToks(spark, dir, 30L)
      .queryExecution.sparkPlan
    assert(legPlan.collectFirst {
      case j: BroadcastNestedLoopJoinExec
        if j.condition.exists(_.toString.contains("shiftright")) => j
    }.nonEmpty, "bloom bit-test prescreen missing from the decon-screen leg")
    val plan = sparkPlan("qx45_curation_decon")
    val win = plan.collectFirst {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.getOrElse(fail("qx45 plan has no budget window"))
    assert(win.child.collect {
      case a if a.nodeName.contains("ObjectHashAggregate") => a
    }.nonEmpty, "budget window input is not bounded by the topk_by prune")
  }

  test("qx42: the ADC scan feeds the partial top-k with no exchange between") {
    // The compressed-domain pass's whole point: since r10 the scan IS
    // the adcTopC kernel — ADC scores and the per-partition exact
    // top-C prune happen inside one mapPartitions pass (LUTs ride a
    // broadcast variable, not a join) — and pqRefine's partial topk_by
    // sits DIRECTLY on the kernel output: nothing between the raw
    // parquet scan and the partial top-k may exchange, so what crosses
    // the wire is q·tasks·C pruned buffers, never n·q scored rows.
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    val plan = sparkPlan("qx42_pq_adc")
    val partials = plan.collect {
      case a: ObjectHashAggregateExec
        if a.aggregateExpressions.exists(ae => ae.mode == Partial &&
          ae.aggregateFunction.isInstanceOf[graft.functions.TopKBy]) => a
    }
    assert(partials.nonEmpty, "no partial topk_by aggregate in the qx42 plan")
    assert(partials.exists(a =>
      a.child.collect { case e: ShuffleExchangeExec => e }.isEmpty),
      "the ADC partial top-k must sit on the kernel scan stage with no " +
        "exchange anywhere below it")
  }

  /** Round-6 verdict #7: qx43/qx44's composed search path must keep
    * qx42's discipline END TO END — from the partial topk_by down to
    * the broadcast candidate-generation join (probes/LUTs are the
    * build side, corpus cells/codes STREAM), no ShuffleExchange may
    * intervene: candidates are generated, ADC-scored and pruned inside
    * one stage. Exchanges BELOW the join (index builds) are the
    * amortizable part and stay legal. Physical plan without AQE (which
    * hides the tree inside query stages). */
  private def assertInStageSearchTail(name: String): Unit = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
      val partials = plan.collect {
        case a: ObjectHashAggregateExec
          if a.aggregateExpressions.exists(ae => ae.mode == Partial &&
            ae.aggregateFunction.isInstanceOf[graft.functions.TopKBy]) => a
      }
      assert(partials.nonEmpty, s"no partial topk_by aggregate in the $name plan")
      // True iff some root-to-cells-join path crosses no shuffle.
      def cleanPathToCellJoin(p: SparkPlan): Boolean = p match {
        case _: ShuffleExchangeExec => false
        case j: BroadcastHashJoinExec
          if (j.leftKeys ++ j.rightKeys).exists(_.toString.contains("cell")) => true
        case other => other.children.exists(cleanPathToCellJoin)
      }
      assert(partials.exists(a => cleanPathToCellJoin(a.child)),
        s"$name: an exchange intervenes between the broadcast cell join " +
          "and the ADC partial top-k — candidates left the stage")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("qx43: probed-cells candidates are scored and pruned in one stage") {
    assertInStageSearchTail("qx43_ivf_pq")
  }

  test("qx44: residual-ADC candidates are scored and pruned in one stage") {
    assertInStageSearchTail("qx44_ivfadc")
  }

  test("qx50: pair search is a cid equi-join, never an all-pairs product") {
    // SemDeDup's whole point is the n·√n bound: the only legal joins are
    // (a) the corpus × BROADCAST K-row codebook assignment scan and
    // (b) an equi-join on cid between the two assignment sides. A
    // CartesianProductExec (corpus × corpus, neither side broadcast)
    // would silently restore the all-pairs blowup the operator exists
    // to avoid.
    import org.apache.spark.sql.execution.joins._
    val plan = sparkPlan("qx50_semantic_dedup")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      "qx50 plan contains a non-broadcast cartesian product")
    val cidEqui = plan.collect {
      case j: SortMergeJoinExec
        if (j.leftKeys ++ j.rightKeys).exists(_.toString.contains("cid")) => j
      case j: ShuffledHashJoinExec
        if (j.leftKeys ++ j.rightKeys).exists(_.toString.contains("cid")) => j
      case j: BroadcastHashJoinExec
        if (j.leftKeys ++ j.rightKeys).exists(_.toString.contains("cid")) => j
    }
    assert(cidEqui.nonEmpty, "no cid equi-join found — pair scoping is gone")
  }

  test("qx54: per-term top-k is the partial aggregate, never a term window") {
    // Five query terms means five window partitions — a Window spelling
    // would cap parallelism at |terms| AND exchange every scored row.
    // topk_by reduces each map task's slice to <=10 per term before the
    // exchange; the term list joins as a broadcast so the corpus-sized
    // word table is pruned before any per-term aggregation.
    val plan = sparkPlan("qx54_bm25_search")
    val s = plan.toString
    assert(!s.contains("Window"), "qx54 must not rank through a window")
    assert(s.contains("topk_by"), "per-term top-k must be the topk_by aggregate")
    assert(s.contains("BroadcastHashJoin"), "term filter must broadcast")
  }

  test("qx79: both retrieval legs cut with topk_by; no rank window; lexical leg broadcasts") {
    // Each leg must prune map-side (topk_by partial) — a Window spelling
    // would exchange every scored row and cap parallelism at |queries|.
    // The lexical leg's term lexicon, df table, corpus stats and query
    // terms all ride broadcasts, so the only corpus-sized exchanges are
    // the word-table aggregations themselves.
    val plan = sparkPlan("qx79_hybrid_rrf")
    val s = plan.toString
    assert(!s.contains("Window"), "qx79 must not rank through a window")
    assert(s.contains("topk_by"), "per-query top-k must be the topk_by aggregate")
    assert(s.contains("BroadcastHashJoin"), "lexical-leg lookups must broadcast")
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "qx79 must not plan a non-broadcast cartesian product")
  }

  test("qx81: global weighted top-k is the partial aggregate; sample broadcasts back") {
    // The whole point is one k+1-bounded merge: every map task prunes to
    // k+1 rows via topk_by's partial pass, and the 64-row sample joins
    // back against the corpus as the BROADCAST side (a corpus-side
    // broadcast would ship the table).
    val plan = sparkPlan("qx81_priority_sample")
    val s = plan.toString
    assert(!s.contains("Window"), "qx81 must not rank through a window")
    assert(s.contains("topk_by"), "global top-k must be the topk_by aggregate")
    assert(s.contains("BroadcastHashJoin"), "the sample must join back as a broadcast")
  }

  test("qx62: the domain cap is a partial top-k, never a domain window") {
    // A hot domain (the SEO farm the cap exists for) must never funnel
    // its full row set to one partition: the cap has to be topk_by's
    // PARTIAL aggregate (<=5 rows per domain per map task cross the
    // exchange), not a row_number window over domain partitions.
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    val plan = sparkPlan("qx62_domain_cap")
    assert(!plan.toString.contains("Window"), "qx62 must not rank through a window")
    assert(plan.collect {
      case a: ObjectHashAggregateExec
        if a.aggregateExpressions.exists(ae => ae.mode == Partial &&
          ae.aggregateFunction.isInstanceOf[graft.functions.TopKBy]) => a
    }.nonEmpty, "the domain cap must be a partial topk_by aggregate")
  }

  test("qx67: line-keeper election partial-aggregates before the exchange") {
    // A hot boilerplate line (the C4 footer the op exists for) must
    // collapse to one row per map task BEFORE the exchange — the
    // row_number-over-line window spelling funnels every occurrence of
    // the hot line into a single partition (qx62's trap at line
    // granularity).
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Min, Partial}
    val plan = sparkPlan("qx67_line_dedup")
    assert(!plan.toString.contains("Window"),
      "qx67 must not rank lines through a window")
    assert(plan.collect {
      case a: BaseAggregateExec
        if a.aggregateExpressions.exists(ae => ae.mode == Partial &&
          ae.aggregateFunction.isInstanceOf[Min]) => a
    }.nonEmpty, "the keeper election must be a partial min aggregate")
  }

  test("qx63: the lexicon model joins the word stream as a broadcast") {
    // Below the measured LmBroadcastRows gate the class-count model must
    // ship to the workers (scoring stays map-side in the explode stage);
    // a sort-merge join here re-sorts the full word stream — the 100×
    // probe measured that spelling 3.4× slower on qx59's twin shape.
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    val plan = sparkPlan("qx63_quality_classifier")
    val wordJoins = plan.collect {
      case j: BroadcastHashJoinExec
        if (j.leftKeys ++ j.rightKeys).exists(_.toString.contains("word")) => j
    }
    assert(wordJoins.nonEmpty, "the model join must broadcast the class counts")
    assert(plan.collect {
      case j: SortMergeJoinExec
        if (j.leftKeys ++ j.rightKeys).exists(_.toString.contains("word")) => j
    }.isEmpty, "the word stream must not be sort-merge joined at gate scale")
  }

  test("qx69/qx68: the codec chain stays shuffle-free") {
    // WARC walk -> HTTP unwrap -> HTML extraction is one partition-
    // parallel pass; any Exchange here means a generation or decode
    // stage lost its scan-locality (the qx47 contract).
    import org.apache.spark.sql.execution.exchange.Exchange
    for (q <- Seq("qx69_warc_extract", "qx68_html_extract"))
      assert(sparkPlan(q).collect { case e: Exchange => e }.isEmpty,
        s"$q must not exchange")
  }

  test("qx70: gram-keeper election partial-aggregates; islands window per doc only") {
    // The hot license gram must collapse map-side (qx67's lesson at
    // span granularity); the only Window allowed is the per-doc
    // gaps-and-islands merge, partitioned by doc_id — a gram-keyed
    // window would funnel every boilerplate occurrence into one
    // partition.
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Min, Partial}
    val plan = sparkPlan("qx70_span_dedup")
    assert(plan.collect {
      case a: BaseAggregateExec
        if a.aggregateExpressions.exists(ae => ae.mode == Partial &&
          ae.aggregateFunction.isInstanceOf[Min]) => a
    }.nonEmpty, "the keeper election must be a partial min aggregate")
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    assert(windows.forall(
      _.partitionSpec.exists(_.toString.contains("doc_id"))),
      "every window must partition by doc_id (doc-bounded), never by gram")
  }

  test("qx72: robots content joins the URL stream as a broadcast") {
    // The domains-sized robots table must ship to the workers; a
    // sort-merge join would re-sort the full URL stream to pair it
    // with 40 rows of robots content.
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    val plan = sparkPlan("qx72_robots_filter")
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "the robots join must broadcast")
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      "the URL stream must not be sort-merge joined")
  }

  test("qx75: variable caps stay a bounded partial top-k, never a domain window") {
    // The qx62 lesson under VARIABLE caps: topk_by bounded by the max
    // cap partial-aggregates per map task; a rank window keyed on the
    // domain would funnel every doc of a hot domain to one partition.
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    val plan = sparkPlan("qx75_authority_cap")
    assert(plan.collect { case a: ObjectHashAggregateExec => a }.nonEmpty,
      "the cap selection must run through topk_by")
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.exists(_.toString.contains("domain")) => w
    }.isEmpty, "no domain-partitioned rank window")
  }

  test("qx76: the fingerprint scan reaches the class collapse with one exchange") {
    // Decode + fingerprint are partition-local; the only exchanges are
    // the fingerprint-class groupBy and its join-back — anything more
    // means a codec stage lost scan-locality.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val n = sparkPlan("qx76_audio_neardup")
      .collect { case e: ShuffleExchangeExec => e }.size
    assert(n <= 2, s"qx76 should shuffle only for the class collapse, saw $n")
  }

  test("qx78: the 3-dim weave partial-aggregates before its single exchange") {
    // zordern + bucket derivation are row-local (inside the scan's
    // codegen stage); the ONLY exchange is the bucket groupBy, with a
    // partial HashAggregate below it — at 100 TB the per-bucket
    // hyper-rectangle witnesses combine map-side.
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    assert(sparkPlan("qx78_zorder3").collect {
      case a: BaseAggregateExec
        if a.aggregateExpressions.exists(_.mode == Partial) => a
    }.nonEmpty, "the bucket rollup must partial-aggregate map-side")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val exchanges = SparkEntry.queries("qx78_zorder3")(spark, dir)
        .queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
      assert(exchanges.size == 1, s"qx78 should shuffle once, saw ${exchanges.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("qx98/qx100: the greedy epilogues run entirely off checkpointed inputs") {
    // The round-12 lineage lesson, pinned: after the localCheckpoint of
    // the bounded pool/pairs, the FINAL plan must contain NO file scan —
    // no greedy step can ever re-run the corpus-sized retrieval or
    // assignment scan that produced its inputs (the 100× probe caught
    // exactly that at 160 s before the cut).
    assert(scans("qx98_mmr_rerank").isEmpty,
      "qx98's greedy must reference only checkpointed data, not rescans")
    assert(scans("qx98b_mmr_indexed").isEmpty,
      "qx98b's greedy must reference only checkpointed data, not rescans")
    assert(scans("qx100_coreset_select").isEmpty,
      "qx100's greedy must reference only checkpointed data, not rescans")
  }

  test("qx99: the energy scan is pruned to the embedding column") {
    val read = scans("qx99_opq_layout").map(_.requiredSchema.fieldNames.toSet)
    assert(read.nonEmpty && read.forall(_ == Set("embedding")),
      s"the energy pass must read only the vectors, saw $read")
  }

  test("qx101: brute MaxSim broadcasts the query side and never shuffles the corpus") {
    val p = sparkPlan("qx101_maxsim")
    assert(p.toString.contains("BroadcastNestedLoopJoin") ||
      p.toString.contains("BroadcastHashJoin"),
      "the query set must ride a broadcast, not an exchange")
    // The only exchange is the bounded topk_by aggregation on qid — the
    // n·q scored pairs themselves must not cross the wire (the partial
    // topk_by prunes each map task to ≤ k rows per query first).
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    assert(p.collect {
      case a: BaseAggregateExec
        if a.aggregateExpressions.exists(_.mode == Partial) => a
    }.nonEmpty, "topk_by must partial-aggregate map-side")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val ex = SparkEntry.queries("qx101_maxsim")(spark, dir)
        .queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }
      assert(ex.size == 1, s"expected one (post-partial-topk) exchange, saw ${ex.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("qx102: the LPA output plan runs off the checkpointed labels, not rescans") {
    // Four voting rounds each end in localCheckpoint; the community-size
    // epilogue must reference only the final checkpointed labels — a file
    // scan here would mean a round's lineage re-runs the LSH candidate
    // join (the qx98/qx100 lesson applied to the iterative operator).
    assert(scans("qx102_label_prop").isEmpty,
      "qx102's epilogue must reference only checkpointed labels")
  }

  test("qx103: the feature scan is pruned to the feature inputs") {
    // Round 18: qx103/qx114 pin the feature frame with a localCheckpoint
    // (one corpus pass for train gate + serving), so the composed plan
    // has no file scan any more — the pruning pin moves to the feature
    // frame itself, which is the chain that actually reads parquet.
    val read = queries.ExtQueries.logisticFeatures(spark, dir)
      .queryExecution.sparkPlan
      .collect { case f: FileSourceScanExec => f }
      .map(_.requiredSchema.fieldNames.toSet)
    assert(read.nonEmpty && read.forall(s => s.subsetOf(Set("doc_id", "text", "source"))),
      s"the feature frame needs doc_id + text + source only, saw $read")
    assert(scans("qx103_logistic_distill").isEmpty,
      "qx103's serving plan must run off the checkpointed features")
  }
}
