package graft

import graft.operators.Cycles

/** Fundamental cycles: the driver-local subcritical path and the
  * distributed forest-walk path must produce IDENTICAL (cycle_id, node)
  * relations — same deterministic BFS forest, same chord ranking. */
class CyclesSpec extends SparkTestBase {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val df = edges.zipWithIndex
      .map { case ((s, d), i) => (i.toLong, s, d) }
      .toDF("edge_id", "src", "dst")
    val nodes = edges
      .flatMap(e => Seq(e._1, e._2))
      .distinct
      .toDF("node")
    def go() = Cycles
      .fundamental(spark, nodes, df)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val local = go()
    spark.conf.set("spark.graft.local.edges", "0")
    val dist =
      try go()
      finally spark.conf.unset("spark.graft.local.edges")
    assert(dist == local, s"local/distributed disagree: $local vs $dist")
    local
  }

  test("two disjoint rings plus a tail: one cycle per ring") {
    val res = run(Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), // ring A
      (4L, 5L), (5L, 6L), (6L, 4L), // ring B
      (0L, 7L), (7L, 8L))) // tail
    assert(res == Set(
      (0L, 0L), (0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 4L), (1L, 5L), (1L, 6L)))
  }

  test("theta graph: two fundamental cycles through shared spine") {
    // 0-1-2 and 0-3-2 and 0-4-5-2: 3 paths → 2 chords → 2 cycles
    val res = run(Seq(
      (0L, 1L), (1L, 2L),
      (0L, 3L), (3L, 2L),
      (0L, 4L), (4L, 5L), (5L, 2L)))
    assert(res.map(_._1).size >= 2 && res.map(_._1).max == 1L)
  }

  test("self-loop and parallel edge contribute 1- and 2-node cycles") {
    val res = run(Seq((0L, 1L), (0L, 1L), (1L, 1L), (1L, 2L)))
    val byId = res.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    assert(byId.values.toSet == Set(Set(0L, 1L), Set(1L)))
  }

  test("forest: no cycles at all") {
    assert(run(Seq((0L, 1L), (1L, 2L), (3L, 4L))).isEmpty)
  }

  test("K4: three fundamental cycles") {
    val res = run(Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)))
    assert(res.map(_._1).max == 2L)
  }
}
