package graft

import graft.core.GraphState
import graft.cypher.Cypher
import graft.streaming.GraphStream

/** Round-14 regression coverage: commit-time dangling-connection check,
  * aggregates over deleted variables, and the trigger predefined-variable
  * rewrite. Reference semantics anchors in each test. */
class DeleteSemanticsSpec extends SparkTestBase {

  private def empty = GraphState(Map.empty, Map.empty)

  private def seeded(): GraphState =
    Cypher.execute(
      spark, empty,
      "CREATE (a:P {x: 1})-[:R]->(b:P {x: 2})").graph

  test("DELETE n DELETE r across clauses of one statement succeeds " +
    "(connection check is deferred to statement end)") {
    val g = seeded()
    val ex = Cypher.execute(
      spark, g, "MATCH (n:P)-[r:R]->() DELETE n DELETE r")
    assert(ex.graph.allNodes.count() == 1) // b survives
    assert(ex.graph.allEdges.count() == 0)
  }

  test("plain DELETE of a still-connected node raises at statement end") {
    val g = seeded()
    val e = intercept[IllegalStateException] {
      Cypher.execute(spark, g, "MATCH (n:P {x: 1}) DELETE n")
    }
    assert(e.getMessage.contains("existing connections"))
  }

  test("count(n) over a deleted variable counts the bindings") {
    val g = seeded()
    val rows = Cypher.execute(
      spark, g, "MATCH (n:P) DETACH DELETE n RETURN count(n) AS c")
      .result.collect()
    assert(rows.head.getLong(0) == 2L)
  }

  test("non-count aggregate over a deleted variable's property raises") {
    val g = seeded()
    val e = intercept[Exception] {
      Cypher.execute(
        spark, g, "MATCH (n:P) DETACH DELETE n RETURN sum(n.x) AS s")
        .result.collect()
    }
    assert(e.getMessage != null)
  }

  test("rewritePredefined: bare names only — not after '.', '$', or " +
    "inside string literals") {
    val in = "UNWIND createdVertices AS v SET v.createdVertices = " +
      "'createdVertices' RETURN $createdVertices, v.deletedEdges, " +
      "deletedEdges"
    val out = GraphStream.rewritePredefined(in)
    assert(out == "UNWIND $createdVertices AS v SET v.createdVertices = " +
      "'createdVertices' RETURN $createdVertices, v.deletedEdges, " +
      "$deletedEdges")
  }
}
