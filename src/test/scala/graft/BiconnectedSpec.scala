package graft

import graft.operators.Biconnected

/** Biconnected components + bridges on arbitrary graphs: the shapes the
  * r7 contraction-event labeling got wrong or refused — a theta graph
  * whose one component resolved across several contraction events, dense
  * 2-cores (K4) that contraction cannot reduce, parallel edges inside an
  * enclosing cycle — plus bridge/articulation mixtures.
  */
class BiconnectedSpec extends SparkTestBase {

  import spark.implicits._

  /** edge_id -> (is_bridge, bcc label); every case runs BOTH the
    * subcritical driver-local Tarjan path and the distributed
    * forest-walk path (forced via spark.graft.local.edges=0) and asserts
    * they agree — the adaptive dispatch must be invisible. */
  private def run(edges: Seq[(Long, Long)]): Map[Long, (Boolean, Long)] = {
    val df = edges.zipWithIndex
      .map { case ((s, d), i) => (i.toLong, s, d) }
      .toDF("edge_id", "src", "dst")
    def go() = Biconnected(spark, df)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2))))
      .toMap
    val local = go()
    spark.conf.set("spark.graft.local.edges", "0")
    val dist =
      try go()
      finally spark.conf.unset("spark.graft.local.edges")
    assert(dist == local, s"local/distributed disagree: $local vs $dist")
    local
  }

  test("theta graph: one biconnected component across resolution events") {
    // u=0, v=1 joined by three vertex-disjoint paths of lengths 2, 2, 4
    // — the exact counterexample to per-event labeling (two short arms
    // collapse in one event, the long arm later)
    val res = run(Seq(
      (0L, 2L), (2L, 1L), // arm A
      (0L, 3L), (3L, 1L), // arm B
      (0L, 4L), (4L, 5L), (5L, 6L), (6L, 1L))) // arm C
    assert(res.values.forall(!_._1), "theta graph has no bridges")
    assert(res.values.map(_._2).toSet.size == 1,
      s"theta graph is ONE biconnected component, got $res")
  }

  test("K4: dense 2-core is handled, one component, no bridges") {
    val res = run(Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)))
    assert(res.values.forall(!_._1))
    assert(res.values.map(_._2).toSet == Set(0L))
  }

  test("two K4s joined by an edge: two components and one bridge") {
    val res = run(Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L), // K4 a
      (4L, 5L), (4L, 6L), (4L, 7L), (5L, 6L), (5L, 7L), (6L, 7L), // K4 b
      (3L, 4L))) // bridge
    assert(res.filter(_._2._1).keySet == Set(12L))
    assert(res.filterNot(_._2._1).values.map(_._2).toSet == Set(0L, 6L))
    assert(res(12L)._2 == 12L, "bridge is its own singleton component")
  }

  test("parallel edges join the component of an enclosing cycle") {
    // triangle 0-1-2 with a duplicated edge 0-1: all one component
    val res = run(Seq((0L, 1L), (0L, 1L), (1L, 2L), (2L, 0L)))
    assert(res.values.forall(!_._1))
    assert(res.values.map(_._2).toSet.size == 1)
  }

  test("parallel pair hanging off a cycle is its own component") {
    // triangle 0-1-2; vertex 2 doubly linked to 3: the double link is a
    // 2-cycle component, distinct from the triangle, nothing is a bridge
    val res = run(Seq(
      (0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (2L, 3L)))
    assert(res.values.forall(!_._1))
    assert(res.values.map(_._2).toSet == Set(0L, 3L))
    assert(res(3L)._2 == res(4L)._2)
  }

  test("self-loops are singleton components, never bridges") {
    val res = run(Seq((0L, 1L), (1L, 1L), (1L, 2L)))
    assert(res(1L) == ((false, 1L)))
    assert(res(0L)._1 && res(2L)._1, "path edges are bridges")
  }

  test("triangle with tail: tail edges are singleton bridges") {
    val res = run(Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L)))
    assert(res.filter(_._2._1).keySet == Set(3L, 4L))
    assert(res(0L)._2 == 0L && res(1L)._2 == 0L && res(2L)._2 == 0L)
    assert(res(3L)._2 == 3L && res(4L)._2 == 4L)
  }

  test("two rings sharing one articulation vertex stay two components") {
    // 0-1-2-0 and 2-3-4-2: articulation at 2, no shared EDGE
    val res = run(Seq(
      (0L, 1L), (1L, 2L), (2L, 0L),
      (2L, 3L), (3L, 4L), (4L, 2L)))
    assert(res.values.forall(!_._1))
    assert(res.values.map(_._2).toSet == Set(0L, 3L))
  }

  test("deep ancestor chord: one component along the whole cycle") {
    // path 0-1-2-3-4-5 closed by chord 0-5
    val path = (0L until 5L).map(i => (i, i + 1))
    val res = run(path :+ (0L, 5L))
    assert(res.values.forall(!_._1))
    assert(res.values.map(_._2).toSet == Set(0L))
  }

  test("forest: every edge is a singleton bridge") {
    val res = run(Seq((0L, 1L), (1L, 2L), (3L, 4L)))
    assert(res.values.forall(_._1))
    assert(res.map { case (k, v) => k == v._2 }.forall(identity))
  }
}
