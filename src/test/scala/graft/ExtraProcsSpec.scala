package graft

import graft.cypher.Cypher
import graft.procedures.{ExtraProcs, ProcContext}
import graft.sources.TpchGraphLoader

/** union_find / max_flow / graph_util: closed-form answers, subcritical
  * and distributed forms asserted to agree where both exist. */
class ExtraProcsSpec extends SparkTestBase {

  private val M = 281474976710656L

  private def bothWays[A](run: => A): (A, A) = {
    val local = run
    spark.conf.set("spark.graft.local.edges", "0")
    val dist =
      try run
      finally spark.conf.unset("spark.graft.local.edges")
    (local, dist)
  }

  private def ctx(g: graft.core.GraphState, opts: Map[String, Any]) =
    ProcContext(spark, g, Seq(opts))

  test("union_find: pairwise and cartesian modes, forced both ways") {
    val g = Cypher.execute(
      spark,
      TpchGraphLoader(spark, sfDir),
      """CREATE (u0:UsV)-[:UsE]->(u1:UsV)-[:UsE]->(u2:UsV),
        |       (u3:UsV)-[:UsE]->(u4:UsV)""".stripMargin).graph
    val ids = Cypher.run(spark, g, "MATCH (n:UsV) RETURN id(n) AS i ORDER BY i")
      .collect().map(_.getLong(0))
    def run(mode: String, n1: Seq[Long], n2: Seq[Long]) =
      ExtraProcs.unionFindConnected(ctx(g, Map(
        "nodes1" -> n1, "nodes2" -> n2, "mode" -> mode,
        "label" -> "UsV", "type" -> "UsE")))
        .collect().map(r => (r.getLong(0) % M, r.getLong(1) % M, r.getBoolean(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val (l, d) = bothWays(run("pairwise", Seq(ids(0), ids(3)), Seq(ids(2), ids(1))))
    assert(l == Seq((0L, 2L, true), (3L, 1L, false)) && d == l)
    val cart = run("cartesian", Seq(ids(0)), Seq(ids(1), ids(4)))
    assert(cart == Seq((0L, 1L, true), (0L, 4L, false)))
  }

  test("max_flow: residual (reverse) edges are used") {
    // s→a, s→b, a→b, a→t, b→t all capacity 1: a greedy first path
    // s→a→b→t forces the second augmentation through the residual of
    // a→b; max flow is 2 either way
    val g = Cypher.execute(
      spark,
      TpchGraphLoader(spark, sfDir),
      """CREATE (s:MfV)-[:MfE {w: 1}]->(a:MfV),
        |       (s)-[:MfE {w: 1}]->(b:MfV),
        |       (a)-[:MfE {w: 1}]->(b),
        |       (a)-[:MfE {w: 1}]->(t:MfV),
        |       (b)-[:MfE {w: 1}]->(t)""".stripMargin).graph
    val ids = Cypher.run(spark, g, "MATCH (n:MfV) RETURN id(n) AS i ORDER BY i")
      .collect().map(_.getLong(0))
    val out = ExtraProcs.maxFlowGetFlow(ctx(g, Map(
      "source" -> ids(0), "sink" -> ids(3), "weightProp" -> "w",
      "type" -> "MfE"))).collect()(0).getDouble(0)
    assert(out == 2.0)
  }

  test("max_flow: unreachable sink and missing weights") {
    val g = Cypher.execute(
      spark,
      TpchGraphLoader(spark, sfDir),
      """CREATE (s:MgV)-[:MgE {w: 4}]->(a:MgV), (z:MgV)""".stripMargin).graph
    val ids = Cypher.run(spark, g, "MATCH (n:MgV) RETURN id(n) AS i ORDER BY i")
      .collect().map(_.getLong(0))
    val out = ExtraProcs.maxFlowGetFlow(ctx(g, Map(
      "source" -> ids(0), "sink" -> ids(2), "weightProp" -> "w",
      "type" -> "MgE"))).collect()(0).getDouble(0)
    assert(out == 0.0)
  }

  test("topological_sort: unique order, both ways; cycle errors") {
    val g = Cypher.execute(
      spark,
      TpchGraphLoader(spark, sfDir),
      """CREATE (v0:TqV), (v1:TqV), (v2:TqV), (v3:TqV),
        |       (v2)-[:TqE]->(v0), (v0)-[:TqE]->(v3),
        |       (v3)-[:TqE]->(v1), (v2)-[:TqE]->(v3),
        |       (v0)-[:TqE]->(v1)""".stripMargin).graph
    def run() = ExtraProcs.topologicalSort(ctx(g, Map(
      "label" -> "TqV", "type" -> "TqE")))
      .collect()(0).getSeq[Long](0).map(_ % M)
    val (l, d) = bothWays(run())
    assert(l == Seq(2L, 0L, 3L, 1L) && d == l)

    val cyc = Cypher.execute(
      spark,
      TpchGraphLoader(spark, sfDir),
      "CREATE (a:TcV)-[:TcE]->(b:TcV)-[:TcE]->(a)").graph
    intercept[Exception] {
      ExtraProcs.topologicalSort(ctx(cyc, Map(
        "label" -> "TcV", "type" -> "TcE"))).collect()
    }
  }

  test("ancestors/descendants: reachability excludes start, both ways") {
    val g = Cypher.execute(
      spark,
      TpchGraphLoader(spark, sfDir),
      """CREATE (d0:GrV)-[:GrE]->(d1:GrV)-[:GrE]->(d2:GrV),
        |       (d0)-[:GrE]->(d3:GrV),
        |       (d4:GrV)-[:GrE]->(d0)""".stripMargin).graph
    val id0 = Cypher.run(spark, g, "MATCH (n:GrV) RETURN id(n) AS i ORDER BY i")
      .collect()(0).getLong(0)
    def desc() = ExtraProcs.registry("graph_util.descendants")(
      ctx(g, Map("node" -> id0, "type" -> "GrE")))
      .collect()(0).getSeq[Long](0).map(_ % M)
    def anc() = ExtraProcs.registry("graph_util.ancestors")(
      ctx(g, Map("node" -> id0, "type" -> "GrE")))
      .collect()(0).getSeq[Long](0).map(_ % M)
    val (ld, dd) = bothWays(desc())
    assert(ld == Seq(1L, 2L, 3L) && dd == ld)
    val (la, da) = bothWays(anc())
    assert(la == Seq(4L) && da == la)
  }

  test("bipartite matching: closed-form sizes, odd cycle -> 0") {
    // perfect matching on a 2x2 biclique minus nothing: K(2,2) -> 2
    assert(ExtraProcs.localBipartiteMatching(
      Array((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))) == 2L)
    // star: one center, three leaves -> 1
    assert(ExtraProcs.localBipartiteMatching(
      Array((1L, 10L), (1L, 11L), (1L, 12L))) == 1L)
    // path of 3 edges -> 2
    assert(ExtraProcs.localBipartiteMatching(
      Array((1L, 2L), (2L, 3L), (3L, 4L))) == 2L)
    // odd cycle (triangle): not bipartite -> 0
    assert(ExtraProcs.localBipartiteMatching(
      Array((1L, 2L), (2L, 3L), (3L, 1L))) == 0L)
    // self loop: not bipartite -> 0
    assert(ExtraProcs.localBipartiteMatching(Array((1L, 1L))) == 0L)
    // augmenting-path case: greedy 1-10, 2 stuck unless 1 re-routes
    assert(ExtraProcs.localBipartiteMatching(
      Array((1L, 10L), (1L, 11L), (2L, 10L))) == 2L)
  }

  test("periodic.iterate: batches run, a failing batch rolls back") {
    val g = Cypher.execute(
      spark,
      TpchGraphLoader(spark, sfDir),
      "CREATE (:PiV {v: 1}), (:PiV {v: 2}), (:PiV {v: 3})").graph
    val ok = Cypher.run(
      spark, g,
      """CALL periodic.iterate('MATCH (n:PiV) RETURN n',
        |  'SET n.w = n.v * 2', {batch_size: 2})
        |YIELD success, number_of_executed_batches
        |MATCH (m:PiV)
        |RETURN success, number_of_executed_batches,
        |       sum(m.w) AS total""".stripMargin).collect()
    assert(ok.length == 1)
    assert(ok(0).getBoolean(0) && ok(0).getLong(1) == 2L &&
      ok(0).getLong(2) == 12L)
    // a running query that raises per batch: success=false, 0 batches,
    // and NO writes stick (pre-batch snapshot restored)
    val bad = Cypher.run(
      spark, g,
      """CALL periodic.iterate('MATCH (n:PiV) RETURN n',
        |  'SET n.w = assert(false)', {batch_size: 2})
        |YIELD success, number_of_executed_batches
        |MATCH (m:PiV)
        |RETURN success, number_of_executed_batches,
        |       sum(CASE WHEN m.w IS NULL THEN 0 ELSE 1 END)
        |         AS written""".stripMargin).collect()
    assert(bad.length == 1)
    assert(!bad(0).getBoolean(0) && bad(0).getLong(1) == 0L &&
      bad(0).getLong(2) == 0L)
  }
}
