package graft

import org.apache.spark.sql.DataFrame

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** neighbors.* / path.* / refactor.* — the apoc-style modules: closed-form
  * graphs with direction- and label-sensitive answers, each read procedure
  * asserted on BOTH the subcritical driver-local pass (default at
  * sf0.001) and the distributed frontier form (spark.graft.local.edges=0).
  */
class ApocProcsSpec extends SparkTestBase {

  private val M = 281474976710656L // 2^48: id → creation offset

  private def bothWays(run: => Seq[Seq[Any]]): (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    val local = run
    spark.conf.set("spark.graft.local.edges", "0")
    val dist =
      try run
      finally spark.conf.unset("spark.graft.local.edges")
    (local, dist)
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  // n0..n5: A-chain n0→n1→n2→n3 with back-edge n2→n0; B: n0→n4, n5→n0
  private lazy val nbGraph = Cypher.execute(
    spark,
    TpchGraphLoader(spark, sfDir),
    """CREATE (n0:NbV)-[:NbA]->(n1:NbV)-[:NbA]->(n2:NbV)-[:NbA]->(n3:NbV),
      |       (n2)-[:NbA]->(n0),
      |       (n0)-[:NbB]->(n4:NbV), (n5:NbV)-[:NbB]->(n0)""".stripMargin).graph

  private lazy val nbIds: Map[Int, Long] = Cypher
    .run(spark, nbGraph, "MATCH (n:NbV) RETURN id(n) AS i ORDER BY i")
    .collect().map(_.getLong(0)).zipWithIndex.map(_.swap).toMap

  test("neighbors.at_hop: direction markers and exact-hop dedup") {
    def at(relTypes: Seq[String], dist: Int): Seq[Seq[Any]] = rows(
      Cypher.run(
        spark, nbGraph,
        s"""CALL neighbors.at_hop({node: ${nbIds(0)},
           |  rel_types: [${relTypes.map(t => s"'$t'").mkString(", ")}],
           |  distance: $dist})
           |YIELD node RETURN node % $M AS nk ORDER BY nk""".stripMargin))
    val (l1, d1) = bothWays(at(Seq("NbA>"), 2))
    assert(l1 == Seq(Seq(2L)) && d1 == Seq(Seq(2L)))
    // hop 3 via outgoing NbA: n3 only (n0 was seen at hop 0)
    val (l2, d2) = bothWays(at(Seq("NbA>"), 3))
    assert(l2 == Seq(Seq(3L)) && d2 == Seq(Seq(3L)))
    val (l3, d3) = bothWays(at(Seq("<NbB"), 1))
    assert(l3 == Seq(Seq(5L)) && d3 == Seq(Seq(5L)))
    // untyped both-direction: hop 1 = {n1, n2(in), n4, n5(in)}, so hop 2
    // reaches only n3
    val (l4, d4) = bothWays(at(Seq.empty, 2))
    assert(l4 == Seq(Seq(3L)) && d4 == Seq(Seq(3L)))
  }

  test("neighbors.by_hop: one row per hop, first-seen layering") {
    def by(dist: Int): Seq[Seq[Any]] = rows(
      Cypher.run(
        spark, nbGraph,
        s"""CALL neighbors.by_hop({node: ${nbIds(0)},
           |  rel_types: ['NbA>'], distance: $dist})
           |YIELD hop, nodes
           |UNWIND nodes AS n
           |RETURN hop, n % $M AS nk ORDER BY hop, nk""".stripMargin))
    val expect = Seq(Seq(1L, 1L), Seq(2L, 2L), Seq(3L, 3L))
    val (l, d) = bothWays(by(3))
    assert(l == expect && d == expect)
  }

  // s(0) → w1(1) → w2(2) → e(3);  s → b(4) → w2;  w1 → t(5)
  private lazy val pxGraph = Cypher.execute(
    spark,
    TpchGraphLoader(spark, sfDir),
    """CREATE (s:PxS)-[:PxR]->(w1:PxW)-[:PxR]->(w2:PxW)-[:PxR]->(e:PxE),
      |       (s)-[:PxR]->(b:PxB)-[:PxR]->(w2),
      |       (w1)-[:PxR]->(t:PxT)""".stripMargin).graph

  private lazy val pxStart: Long = Cypher
    .run(spark, pxGraph, "MATCH (n:PxS) RETURN id(n) AS i")
    .collect()(0).getLong(0)

  private def expand(labels: Seq[String], minHops: Int, maxHops: Int): Seq[Seq[Any]] =
    rows(Cypher.run(
      spark, pxGraph,
      s"""CALL path.expand({node: $pxStart, relationships: ['PxR>'],
         |  labels: [${labels.map(l => s"'$l'").mkString(", ")}],
         |  minHops: $minHops, maxHops: $maxHops})
         |YIELD last, hops
         |RETURN last % $M AS nk, hops ORDER BY nk, hops""".stripMargin))

  test("path.expand: whitelist + blacklist") {
    // only PxW nodes emit; PxB blocks its branch; start continues unfiltered
    val expect = Seq(Seq(1L, 1L), Seq(2L, 2L))
    val (l, d) = bothWays(expand(Seq("+PxW", "-PxB"), 0, 3))
    assert(l == expect && d == expect)
  }

  test("path.expand: end-node label emits only terminal hits, keeps expanding") {
    // two distinct paths reach e at hops 3 (via w1-w2 and via b-w2)
    val expect = Seq(Seq(3L, 3L), Seq(3L, 3L))
    val (l, d) = bothWays(expand(Seq(">PxE"), 0, 5))
    assert(l == expect && d == expect)
  }

  test("path.expand: termination label stops the walk") {
    val expect = Seq(Seq(5L, 2L))
    val (l, d) = bothWays(expand(Seq("/PxT"), 0, 5))
    assert(l == expect && d == expect)
  }

  test("path.expand: minHops floor") {
    // unlabeled: every node is whitelist-empty-valid; minHops=2 drops
    // the start and the two 1-hop paths
    val (l, d) = bothWays(expand(Seq.empty, 2, 2))
    // 2-hop paths: s-w1-w2, s-w1-t, s-b-w2
    val expect = Seq(Seq(2L, 2L), Seq(2L, 2L), Seq(5L, 2L))
    assert(l == expect && d == expect)
  }

  // x(0) ⇄ y(1), y → z(2): only the reciprocal pair is <K>-traversable
  private lazy val kbGraph = Cypher.execute(
    spark,
    TpchGraphLoader(spark, sfDir),
    """CREATE (x:KbV)-[:KbK]->(y:KbV), (y)-[:KbK]->(x),
      |       (y)-[:KbK]->(z:KbV)""".stripMargin).graph

  test("path.expand: <T> traverses only reciprocal edge pairs") {
    val start = Cypher.run(spark, kbGraph, "MATCH (n:KbV) RETURN id(n) AS i ORDER BY i")
      .collect()(0).getLong(0)
    def run(): Seq[Seq[Any]] = rows(Cypher.run(
      spark, kbGraph,
      s"""CALL path.expand({node: $start, relationships: ['<KbK>'],
         |  labels: [], minHops: 0, maxHops: 2})
         |YIELD last, hops
         |RETURN last % $M AS nk, hops ORDER BY hops, nk""".stripMargin))
    // x(h0), x→y(h1), x→y→x via the second edge instance (h2); never z
    val expect = Seq(Seq(0L, 0L), Seq(1L, 1L), Seq(0L, 2L))
    val (l, d) = bothWays(run())
    assert(l == expect && d == expect)
  }

  test("path.subgraph_nodes: first-discovery BFS under filters") {
    def run(): Seq[Seq[Any]] = rows(Cypher.run(
      spark, pxGraph,
      s"""CALL path.subgraph_nodes({node: $pxStart,
         |  relationshipFilter: ['PxR>'], labelFilter: ['-PxB'],
         |  maxHops: 2})
         |YIELD node, hop
         |RETURN node % $M AS nk, hop ORDER BY nk""".stripMargin))
    // s(0,h0) w1(1,h1) w2(2,h2) t(5,h2); b blacklisted (traversal stops
    // there AND it is not returned), e beyond maxHops
    val expect = Seq(Seq(0L, 0L), Seq(1L, 1L), Seq(2L, 2L), Seq(5L, 2L))
    val (l, d) = bothWays(run())
    assert(l == expect && d == expect)
  }

  test("path.subgraph_all: edges among returned nodes, any type") {
    val out = Cypher.run(
      spark, pxGraph,
      s"""CALL path.subgraph_all({node: $pxStart,
         |  relationshipFilter: ['PxR>'], maxHops: 1})
         |YIELD nodes, rels
         |RETURN size(nodes) AS nn, size(rels) AS nr""".stripMargin)
      .collect()(0)
    // nodes {s, w1, b}; rels among them: s→w1, s→b
    assert(out.get(0).toString.toLong == 3L)
    assert(out.get(1).toString.toLong == 2L)
  }

  test("refactor: rename_label / rename_type / invert / rename_node_property / normalize_as_boolean") {
    val base = Cypher.execute(
      spark,
      TpchGraphLoader(spark, sfDir),
      """CREATE (a:RfOld {p: 'yes'})-[:RfT {w: 1}]->(b:RfOld {p: 'no'}),
        |       (b)-[:RfT {w: 2}]->(c:RfKeep {p: 'maybe'})""".stripMargin).graph

    val r1 = Cypher.execute(
      spark, base,
      """CALL refactor.rename_label({old: 'RfOld', new: 'RfNew'})
        |YIELD nodes_changed RETURN nodes_changed""".stripMargin)
    assert(r1.result.collect()(0).getLong(0) == 2L)
    assert(Cypher.run(spark, r1.graph, "MATCH (n:RfNew) RETURN count(*) AS c")
      .collect()(0).getLong(0) == 2L)
    assert(Cypher.run(spark, r1.graph, "MATCH (n:RfOld) RETURN count(*) AS c")
      .collect()(0).getLong(0) == 0L)

    val r2 = Cypher.execute(
      spark, r1.graph,
      """CALL refactor.rename_type({old: 'RfT', new: 'RfS'})
        |YIELD relationships_changed RETURN relationships_changed""".stripMargin)
    assert(r2.result.collect()(0).getLong(0) == 2L)
    assert(Cypher.run(
      spark, r2.graph,
      "MATCH (:RfNew)-[r:RfS]->() RETURN count(*) AS c")
      .collect()(0).getLong(0) == 2L)

    // invert: a→b becomes b→a (RfNew-labeled a,b; c keeps its in-edge now out)
    val r3 = Cypher.execute(
      spark, r2.graph,
      """CALL refactor.invert({type: 'RfS'})
        |YIELD relationships_changed RETURN relationships_changed""".stripMargin)
    assert(r3.result.collect()(0).getLong(0) == 2L)
    assert(Cypher.run(
      spark, r3.graph,
      "MATCH (c:RfKeep)-[:RfS]->(b:RfNew) RETURN count(*) AS c")
      .collect()(0).getLong(0) == 1L)

    val r4 = Cypher.execute(
      spark, r3.graph,
      """CALL refactor.rename_node_property({old: 'p', new: 'q',
        |  label: 'RfNew'}) YIELD properties_changed
        |RETURN properties_changed""".stripMargin)
    assert(r4.result.collect()(0).getLong(0) == 2L)
    assert(Cypher.run(
      spark, r4.graph,
      "MATCH (n:RfNew) WHERE n.q = 'yes' RETURN count(*) AS c")
      .collect()(0).getLong(0) == 1L)

    val r5 = Cypher.execute(
      spark, r4.graph,
      """CALL refactor.normalize_as_boolean({prop: 'q',
        |  true_values: ['yes'], false_values: ['no'], label: 'RfNew'})
        |YIELD entities_changed RETURN entities_changed""".stripMargin)
    assert(r5.result.collect()(0).getLong(0) == 2L)
    val vals = Cypher.run(
      spark, r5.graph,
      "MATCH (n:RfNew) RETURN n.q AS q ORDER BY id(n)")
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(vals.toSeq == Seq(true, false))
  }
}
