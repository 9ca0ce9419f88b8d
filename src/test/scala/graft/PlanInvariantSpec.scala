package graft

/** Physical-plan regression gate — the engine-side analog of the
  * reference's `tests/unit/query_plan_checker.hpp` (which asserts operator
  * sequences for representative queries so a planner change that degrades
  * a plan fails a unit test, not a benchmark).
  *
  * Each test pins a plan FACT the 100 TB story depends on:
  *   - predicate pushdown reaches the parquet scan (PushedFilters),
  *   - column pruning reaches the scan (ReadSchema omits wide columns),
  *   - expansions are equi-joins (no CartesianProduct in a join path),
  *   - the disconnected-pattern cartesian broadcasts its small side,
  *   - aggregates are partial (map-side combine: two HashAggregate
  *     levels) and stay inside WholeStageCodegen,
  *   - knn_graph's self-join reads ONE persisted materialization of the
  *     coded corpus.
  * A planner change that drops any of these fails sbt, not the bench.
  */
class PlanInvariantSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  /** BroadcastNestedLoop/Cartesian nodes that merely attach a broadcast
    * 1-row aggregate (the `__N` keyspace constant) are fine; a real
    * cartesian between row sets is not. This mirrors ExplainCheck's
    * audit rule. */
  private def assertNoCartesian(name: String): Unit = {
    val p = plan(name)
    assert(
      !p.contains("CartesianProduct"),
      s"$name plans a CartesianProduct — an equi-join exists:\n$p")
  }

  test("label+property scan pushes the predicate into the parquet scan") {
    val p = plan("cy_scan_props")
    assert(
      p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"cy_scan_props scan has no pushed filters:\n$p")
  }

  test("events aggregate prunes the scan to the 3 touched columns") {
    val p = plan("events_by_type")
    // group-by event_type/month + sum(value) must not read event_id or
    // user_id from disk
    assert(
      !p.contains("user_id"),
      s"events_by_type reads pruned-away columns:\n$p")
  }

  test("2-column projection prunes the scan's read schema") {
    val p = plan("cy_filter_exprs")
    // the Part scan must not read p_comment/p_container for a
    // key+name+size projection
    assert(
      !p.contains("p_container"),
      s"cy_filter_exprs reads pruned-away columns:\n$p")
  }

  test("one-hop expansion is an equi-join, never a cartesian") {
    assertNoCartesian("cy_expand_one_hop")
  }

  test("5-hop chain with existing-node close stays cartesian-free") {
    assertNoCartesian("cy_expand_existing")
  }

  test("disconnected two-pattern match broadcasts its small side") {
    val p = plan("cy_two_pattern_disconnected")
    assert(
      p.contains("Broadcast"),
      s"cy_two_pattern_disconnected does not broadcast the small side:\n$p")
  }

  test("grouped aggregate is partial (map-side combine) and codegen'd") {
    // AQE prints `isFinalPlan=false` without codegen wrappers until THIS
    // dataframe's plan executes (a .count() builds a different plan) —
    // collect() it so the final adaptive plan with its WholeStageCodegen
    // spans is what the assertion reads
    val df = SparkEntry.queries("agg_pricing_summary")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val hashAggs = "HashAggregate".r.findAllIn(p).size
    assert(
      hashAggs >= 2,
      s"agg_pricing_summary lacks partial aggregation ($hashAggs " +
        s"HashAggregate nodes):\n$p")
    // the final adaptive plan prints codegen'd spans as `*(n) Operator`
    assert(
      p.contains("WholeStageCodegen") || p.contains("*("),
      s"agg_pricing_summary falls out of whole-stage codegen:\n$p")
  }

  test("knn_graph self-joins ONE persisted coded materialization") {
    val p = plan("knn_graph")
    assert(
      p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"knn_graph recomputes the coded frame instead of reading the " +
        s"persisted materialization:\n$p")
    assert(
      !p.contains("CartesianProduct"),
      s"knn_graph plans a cartesian — the code-bucket equi-join is gone:\n$p")
  }

  test("minhash LSH banding joins on band buckets, never cartesian") {
    assertNoCartesian("dedup_minhash")
  }

  test("pokec batched point-reads plan as a hash join on id") {
    val p = plan("pokec_expansion_1_batch")
    assert(
      !p.contains("CartesianProduct"),
      s"pokec_expansion_1_batch degenerates to a cartesian:\n$p")
    assert(
      p.contains("HashJoin") || p.contains("SortMergeJoin") ||
        p.contains("BroadcastHashJoin"),
      s"pokec_expansion_1_batch has no hash/merge join for the id " +
        s"lookup:\n$p")
  }

  test("pokec 2-hop expansion keeps every hop an equi-join") {
    assertNoCartesian("pokec_expansion_2")
  }

  test("cartesian workload's cross-pattern equality becomes an equi-join") {
    // cartesian.py:40-53 — MATCH (n1:Node), (n2:Node) WHERE n1.id = n2.id:
    // the disconnected-pattern crossJoin + equality filter must be
    // Catalyst-rewritten into a hash/merge join, or the workload goes
    // quadratic at scale
    for (n <- Seq("cartesian_join", "cartesian_different_props_join")) {
      val p = plan(n)
      assert(
        !p.contains("CartesianProduct"),
        s"$n plans a CartesianProduct — the equality predicate was not " +
          s"pulled into a join:\n$p")
      assert(
        p.contains("HashJoin") || p.contains("SortMergeJoin"),
        s"$n has no equi-join node:\n$p")
    }
  }

  test("supernode MERGE anti-joins on edge identity, no hub-key cartesian") {
    // supernode.py:37-49 — the 50k matched rows all share the hub dst
    // key; the merge's miss-branch must be an anti-join on the
    // per-row-unique (src,dst,type) identity, never a real cartesian or
    // a hub-key shuffle that concentrates one partition
    // (the anti-join itself runs inside Cypher.execute's statement
    // commit and is materialized as an ExistingRDD by the time the
    // post-state plan prints; the facts that survive to this plan are
    // the ones pinned: the 1-row hub side rides a BROADCAST nested-loop
    // — never a CartesianProduct, never a shuffle keyed on the hub)
    val p = plan("supernode_merge_edges")
    assert(
      !p.contains("CartesianProduct"),
      s"supernode_merge_edges plans a CartesianProduct:\n$p")
    assert(
      p.contains("Broadcast"),
      s"supernode_merge_edges does not broadcast the 1-row hub side:\n$p")
  }

  test("schema_info rides one job family, not one job per label") {
    // r16 weak item: one count-aggregate job PER label/type frame made
    // schema_info swing 0.5-3.5 s with scheduler load (N small
    // sequential jobs multiply scheduler latency). The collapsed shape
    // (tag-union -> ONE groupBy -> broadcast dim join) submits a small
    // CONSTANT number of jobs (AQE materializes its shuffle stages as
    // separate jobs) regardless of label count; the old per-frame shape
    // submits >= 2x the ~14 frames. The bound pins the collapse.
    val sc = spark.sparkContext
    // warm pass OUTSIDE the job group: first touch of the graph runs
    // label-discovery/load jobs that belong to the loader, not to
    // schema_info (suite ordering decides whether the graph is cold)
    SparkEntry.queries("schema_info")(spark, sfDir).collect()
    sc.setJobGroup("schema-info-invariant", "job-count pin")
    try SparkEntry.queries("schema_info")(spark, sfDir).collect()
    finally sc.clearJobGroup()
    def jobs: Int =
      sc.statusTracker.getJobIdsForGroup("schema-info-invariant").length
    // the status store updates asynchronously; wait for it to settle
    var last = -1
    var cur = jobs
    var spins = 0
    while (cur != last && spins < 50) {
      last = cur; Thread.sleep(100); cur = jobs; spins += 1
    }
    // AQE materializes each exchange as its own stage-job (the tag-union
    // shuffle, the broadcast dim, the final stage) and the gate's ORDER
    // BY adds a range-partitioner sampling job — ~9 jobs total, CONSTANT
    // in the label count. The per-frame shape this guards against runs
    // ~2 jobs per frame (>= 28 for the TPC-H graph's 18 frames).
    assert(
      cur >= 1 && cur <= 12,
      s"schema_info submitted $cur jobs — the one-job collapse regressed " +
        "to per-frame aggregates")
  }

  test("supernode UNWIND write collapses 50k same-node updates map-side") {
    // supernode.py:51-57 — SET s.prop = x over 50k UNWIND rows targeting
    // ONE node: dedupUpdates' groupBy(_id) must ride a partial
    // HashAggregate (map-side combine) so the hub key never concentrates
    // 50k rows in a shuffle partition
    val df = SparkEntry.queries("supernode_unwind_writes")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(
      !p.contains("CartesianProduct"),
      s"supernode_unwind_writes plans a CartesianProduct:\n$p")
    val hashAggs = "HashAggregate".r.findAllIn(p).size
    assert(
      hashAggs >= 2,
      s"supernode_unwind_writes lacks the partial-aggregate update " +
        s"collapse ($hashAggs HashAggregate nodes):\n$p")
  }

  /** Count the jobs one query run submits (jobGroup pattern above). */
  private def jobCount(group: String)(run: => Unit): Int = {
    val sc = spark.sparkContext
    sc.setJobGroup(group, "job-count pin")
    try run
    finally sc.clearJobGroup()
    def jobs: Int = sc.statusTracker.getJobIdsForGroup(group).length
    var last = -1
    var cur = jobs
    var spins = 0
    while (cur != last && spins < 50) {
      last = cur; Thread.sleep(100); cur = jobs; spins += 1
    }
    cur
  }

  test("allNodes on a mayOverlap state memoizes ONE deduped view") {
    // r17 Finding 6: without the memo, every unlabeled bind re-planned a
    // full union+dedup-by-id subtree (ldbc_ic5's plan carried TWO).
    // The memoized frame must be the SAME object on repeated access and
    // persisted, so every consumer shares one materialization.
    val g = graft.sources.TpchGraphLoader(spark, sfDir).withOverlap
    val a = g.allNodes
    val b = g.allNodes
    assert(a eq b, "allNodes rebuilt the dedup view on the second access")
    assert(
      a.storageLevel.useMemory || a.storageLevel.useDisk,
      "the memoized allNodes view is not persisted")
  }

  test("meta.stats rides one grouped scan, not two full edge passes") {
    // r17 Finding 8: one groupBy(type, src>>48, dst>>48) + driver-side
    // marginalization. The per-pass shape this guards against scans the
    // edge corpus twice and runs 2x the jobs.
    SparkEntry.queries("call_meta_stats")(spark, sfDir).collect() // warm
    val n = jobCount("meta-stats-invariant") {
      SparkEntry.queries("call_meta_stats")(spark, sfDir).collect()
    }
    assert(
      n >= 1 && n <= 14,
      s"call_meta_stats submitted $n jobs — the one-scan collapse regressed")
  }

  test("subcritical var-length expansion runs the driver DFS, not rounds") {
    // The general local cutover (Planner runLocalDfs): a typed-edge set
    // under spark.graft.local.edges walks on the driver in ONE pass —
    // edge collect + seed collect + result jobs, CONSTANT in hop depth.
    // The distributed fixpoint this replaces submits >= 2 jobs per round
    // (checkpoint + count; varexpand_unbounded runs 8 rounds, >= 16).
    SparkEntry.queries("varexpand_unbounded")(spark, sfDir).collect() // warm
    val n = jobCount("varexpand-local-invariant") {
      SparkEntry.queries("varexpand_unbounded")(spark, sfDir).collect()
    }
    assert(
      n >= 1 && n <= 12,
      s"varexpand_unbounded submitted $n jobs — the subcritical local " +
        "DFS cutover is not engaging")
  }

  test("distributed var-expand bind join stays broadcast-gated") {
    // With the local cutover disabled, the fixpoint's final node-bind
    // join must broadcast a COUNTED-small traversal side (never rely on
    // AQE stats, absent on checkpointed frames) — and the gate, not a
    // blind hint, is what keeps a supernode frontier off the driver.
    val conf = spark.conf
    conf.set("spark.graft.varexpand.localBudget", "0")
    try {
      val df = SparkEntry.queries("varexpand_unbounded")(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      assert(
        p.contains("BroadcastHashJoin"),
        s"distributed var-expand bind join is not broadcast for a " +
          s"counted-small traversal:\n$p")
    } finally conf.unset("spark.graft.varexpand.localBudget")
  }
}
