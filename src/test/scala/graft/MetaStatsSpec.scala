package graft

import graft.cypher.Cypher

/** meta.stats fast path (id-namespace base → label-set composition, no
  * |E|×|V| join) vs the fallback (partial SET :Label breaks the
  * one-label-set-per-base invariant): both must produce the reference
  * tallies (meta.cpp:158-209). */
class MetaStatsSpec extends SparkTestBase {

  private def empty = graft.core.GraphState(Map.empty, Map.empty)

  private def stats(g: graft.core.GraphState): Map[String, Any] = {
    val row = Cypher.run(
      spark, g,
      """CALL meta.stats() YIELD nodeCount, relationshipCount, labelCount,
        |     labels, relationshipTypes, relationshipTypesCount
        |RETURN nodeCount, relationshipCount, labelCount, labels,
        |       relationshipTypes, relationshipTypesCount""".stripMargin)
      .collect().head
    Map(
      "nodeCount" -> row.getLong(0),
      "relationshipCount" -> row.getLong(1),
      "labelCount" -> row.getLong(2),
      "labels" -> row.getMap[String, Long](3).toMap,
      "relationshipTypes" -> row.getMap[String, Long](4).toMap,
      "relationshipTypesCount" -> row.getMap[String, Long](5).toMap)
  }

  test("fast path: uniform bases compose pattern tallies without a join") {
    val g = Cypher.execute(
      spark, empty,
      """CREATE (a:MsA)-[:MsT]->(b:MsB)-[:MsT]->(c:MsB),
        |       (a)-[:MsU]->(c)""".stripMargin).graph
    val s = stats(g)
    assert(s("nodeCount") == 3L)
    assert(s("relationshipCount") == 3L)
    assert(s("labels") == Map("MsA" -> 1L, "MsB" -> 2L))
    assert(s("relationshipTypesCount") == Map("MsT" -> 2L, "MsU" -> 1L))
    val pat = s("relationshipTypes").asInstanceOf[Map[String, Long]]
    assert(pat("(:MsA)-[:MsT]->()") == 1L)
    assert(pat("(:MsB)-[:MsT]->()") == 1L)
    assert(pat("()-[:MsT]->(:MsB)") == 2L)
    assert(pat("(:MsA)-[:MsU]->()") == 1L)
    assert(pat("()-[:MsU]->(:MsB)") == 1L)
    assert(pat("()-[:MsT]->()") == 2L)
  }

  test("fallback: a partial SET :Label breaks the base invariant, same tallies") {
    val g0 = Cypher.execute(
      spark, empty,
      """CREATE (a:MsC {k: 1})-[:MsV]->(b:MsC {k: 2}),
        |       (b)-[:MsV]->(c:MsC {k: 3})""".stripMargin).graph
    // only k=1 gains the extra label — its base now holds TWO distinct
    // label sets, so the uniform-base fast path must bail out
    val g = Cypher.execute(
      spark, g0, "MATCH (n:MsC {k: 1}) SET n:MsX").graph
    val s = stats(g)
    assert(s("nodeCount") == 3L)
    assert(s("relationshipCount") == 2L)
    assert(s("labels") == Map("MsC" -> 3L, "MsX" -> 1L))
    val pat = s("relationshipTypes").asInstanceOf[Map[String, Long]]
    assert(pat("(:MsC)-[:MsV]->()") == 2L)
    assert(pat("(:MsX)-[:MsV]->()") == 1L)
    assert(pat("()-[:MsV]->(:MsC)") == 2L)
    assert(pat("()-[:MsV]->()") == 2L)
  }
}
