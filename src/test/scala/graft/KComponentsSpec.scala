package graft.procedures

import org.scalatest.funsuite.AnyFunSuite

/** Pins NxLocal.kComponents (exact Moody–White) against expected values
  * generated with networkx 3.6's `nx.k_components` (the exact
  * connectivity-module implementation the reference's nxalg.py
  * dispatches to) on two fixtures. */
class KComponentsSpec extends AnyFunSuite {

  private def graph(n: Int, es: Seq[(Long, Long)]): NxLocal.G =
    NxLocal.G(
      (0L until n.toLong).toSeq,
      es.zipWithIndex.map { case ((u, v), i) => (i.toLong, u, v) },
      Map.empty)

  test("two K4s sharing an edge plus a pendant path (3 levels)") {
    // networkx: {1: [{0..7}], 2: [{0..5}], 3: [{0,1,2,3},{2,3,4,5}]}
    val quadEdges = for {
      quad <- Seq(Seq(0L, 1L, 2L, 3L), Seq(2L, 3L, 4L, 5L))
      i <- quad.indices; j <- (i + 1) until quad.length
    } yield (quad(i), quad(j))
    val g = graph(8, quadEdges ++ Seq((5L, 6L), (6L, 7L)))
    val kc = NxLocal.kComponents(g).toMap
    assert(kc.keySet == Set(1, 2, 3))
    assert(kc(1) == Seq(Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L)))
    assert(kc(2) == Seq(Seq(0L, 1L, 2L, 3L, 4L, 5L)))
    assert(kc(3).toSet == Set(
      Seq(0L, 1L, 2L, 3L), Seq(2L, 3L, 4L, 5L)))
  }

  test("triangle chained to a triangle through a bridge region") {
    // networkx on edges (0,1)(1,2)(2,0)(2,3)(3,4)(4,5)(5,3)(0,3):
    //   {1: [{0..5}], 2: [{3,4,5},{0,1,2,3}]}
    val g = graph(6, Seq(
      (0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 3L), (0L, 3L)))
    val kc = NxLocal.kComponents(g).toMap
    assert(kc.keySet == Set(1, 2))
    assert(kc(1) == Seq(Seq(0L, 1L, 2L, 3L, 4L, 5L)))
    assert(kc(2).toSet == Set(Seq(3L, 4L, 5L), Seq(0L, 1L, 2L, 3L)))
  }

  test("complete graph K5 reaches level 4 with no cuts") {
    val es = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    val kc = NxLocal.kComponents(graph(5, es)).toMap
    assert(kc.keySet == Set(1, 2, 3, 4))
    (1 to 4).foreach(k => assert(kc(k) == Seq(Seq(0L, 1L, 2L, 3L, 4L))))
  }

  test("disconnected graph: per-component levels") {
    // triangle {0,1,2} + edge {3,4} + isolate 5
    val kc = NxLocal.kComponents(graph(6, Seq(
      (0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L)))).toMap
    assert(kc(1).toSet == Set(Seq(0L, 1L, 2L), Seq(3L, 4L)))
    assert(kc(2) == Seq(Seq(0L, 1L, 2L)))
    assert(!kc.contains(3))
  }
}
