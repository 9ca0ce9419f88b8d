package graft

import org.apache.spark.sql.functions._

import graft.operators.Bridges

/** Bridge finding by cycle contraction + tree pruning: exactness on mixed
  * cyclic/acyclic shapes, logarithmic contraction of long paths and rings
  * (sequential ids — the hash-ordered independent set must not degrade to
  * one contraction per round), and the honest raise on irreducible cores.
  */
class BridgesSpec extends SparkTestBase {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Boolean] = {
    val df = edges.zipWithIndex
      .map { case ((s, d), i) => (i.toLong, s, d) }
      .toDF("edge_id", "src", "dst")
    Bridges(spark, df)
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(1))
      .toMap
  }

  test("triangle with a tail: tail edges are bridges, triangle is not") {
    // 0-1-2-0 triangle, tail 2-3-4
    val res = run(Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L)))
    assert(res == Map(0L -> false, 1L -> false, 2L -> false,
      3L -> true, 4L -> true))
  }

  test("two triangles joined by a path: only the path bridges") {
    // 0-1-2-0, 5-6-7-5, path 2-3-4-5
    val res = run(Seq(
      (0L, 1L), (1L, 2L), (2L, 0L),
      (5L, 6L), (6L, 7L), (7L, 5L),
      (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(res.filter(_._2).keySet == Set(6L, 7L, 8L))
  }

  test("ring with sequential ids contracts logarithmically (no bridges)") {
    val n = 64L
    val ring = (0L until n).map(i => (i, (i + 1) % n))
    val res = run(ring)
    assert(res.values.forall(!_), "ring edges must not be bridges")
    // hash-ordered independent set removes a constant fraction per clean
    // round; raw-id order would need ~n/2 rounds on sequential ids
    assert(
      Bridges.lastRounds <= 30,
      s"ring-64 took ${Bridges.lastRounds} rounds — contraction degraded")
  }

  test("path with sequential ids: every edge is a bridge") {
    val path = (0L until 48L).map(i => (i, i + 1))
    val res = run(path)
    assert(res.values.forall(identity), "path edges must all be bridges")
    assert(
      Bridges.lastRounds <= 30,
      s"path-48 took ${Bridges.lastRounds} rounds — contraction degraded")
  }

  test("parallel edges and self-loops are never bridges") {
    val res = run(Seq((0L, 1L), (0L, 1L), (1L, 1L), (1L, 2L)))
    assert(res == Map(0L -> false, 1L -> false, 2L -> false, 3L -> true))
  }

  test("theta graph (cycle with chord) has no bridges") {
    // 0-1-2-3-0 square plus chord 1-3
    val res = run(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (1L, 3L)))
    assert(res.values.forall(!_))
  }

  test("irreducible min-degree-3 core raises instead of guessing") {
    // K4: loop/parallel/leaf/series rules cannot reduce it
    val k4 = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
    val ex = intercept[UnsupportedOperationException] {
      run(k4)
    }
    assert(ex.getMessage.contains("minimum degree"))
  }
}
