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
}
