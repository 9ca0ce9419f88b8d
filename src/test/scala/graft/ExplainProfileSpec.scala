package graft

import org.apache.spark.sql.functions._

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Self-check for the two no-oracle gates (cy_explain / cy_profile): no
  * DuckDB oracle can validate a plan dump, so this spec pins the plan
  * INVARIANTS instead — EXPLAIN must show the pushed predicate reaching
  * the scan, and PROFILE's row counts must agree with the executed
  * result (reference PROFILE semantics, interpreter.cpp:4312). */
class ExplainProfileSpec extends SparkTestBase {

  lazy val g = TpchGraphLoader(spark, sfDir)

  test("EXPLAIN surfaces the optimized plan with the filter pushed down") {
    val rows = Cypher.run(
      spark, g,
      "EXPLAIN MATCH (c:Customer) WHERE c.c_acctbal > 5000 " +
        "RETURN c.c_custkey AS k")
      .collect().map(_.getString(0))
    assert(rows.nonEmpty)
    val txt = rows.mkString("\n")
    // the predicate must reach the scan: either a pushed parquet filter
    // or a Catalyst Filter over the relation — NOT a post-shuffle filter
    assert(txt.contains("c_acctbal"), s"predicate missing from plan:\n$txt")
    assert(
      txt.contains("Relation") || txt.contains("LogicalRDD") ||
        txt.contains("Scan"),
      s"no scan leaf in plan:\n$txt")
    // column pruning: a 2-column projection must not mention unrelated
    // wide columns like c_comment in the scan's read schema
    assert(!txt.contains("c_comment"),
      s"scan reads pruned-away columns:\n$txt")
  }

  test("PROFILE executes and its root row count matches the result") {
    val direct = Cypher.run(
      spark, g,
      "MATCH (r:Region) RETURN r.r_name AS name ORDER BY name")
    val expected = direct.count()
    val prof = Cypher.run(
      spark, g,
      "PROFILE MATCH (r:Region) RETURN r.r_name AS name ORDER BY name")
      .collect()
    assert(prof.nonEmpty)
    val header = prof.head.schema.fieldNames.toSeq
    assert(header.contains("OPERATOR") || header.contains("QUERY PLAN") ||
      header.nonEmpty)
    // the topmost operator with a recorded ACTUAL HITS value (rendered as
    // a string; operators without a row metric render empty) must agree
    // with the executed row count
    val hitsIdx = prof.head.schema.fieldNames.indexWhere(
      n => n.toUpperCase.contains("HITS"))
    assert(hitsIdx >= 0, s"no hits column in ${header.mkString(",")}")
    val rootHits = prof.iterator
      .map(_.getString(hitsIdx))
      .collectFirst { case s if s.nonEmpty => s.toLong }
    assert(rootHits.contains(expected),
      s"PROFILE root hits $rootHits != executed rows $expected")
  }

  test("PROFILE of a mutating statement applies the mutation") {
    val e0 = Cypher.execute(
      spark, graft.core.GraphState(Map.empty, Map.empty),
      "CREATE (:Pf {k: 1})")
    val e1 = Cypher.execute(spark, e0.graph, "PROFILE CREATE (:Pf {k: 2})")
    val n = Cypher.run(spark, e1.graph, "MATCH (p:Pf) RETURN count(*) AS c")
      .collect()(0).getLong(0)
    assert(n == 2L, "PROFILE must execute the inner statement")
  }
}
