package graft.queries

import org.apache.spark.sql.SparkSession

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Round-3 surface: undirected var-length expansion (scale-shaped, no
  * nested-loop joins), SET += map, relationship MERGE, map projection, BFS
  * path values, WGS84 distance — each as Cypher text with a DuckDB oracle.
  */
object Round3Queries {

  private def g(s: SparkSession, dir: String) = TpchGraphLoader(s, dir)

  private def cq(name: String, cypher: String, oracle: String): QueryDef =
    QueryDef(name, (s, dir) => Cypher.run(s, g(s, dir), cypher), Some(oracle))

  val defs: Seq[QueryDef] = Seq(
    // Undirected ExpandVariable (operator.hpp:1172, Direction::BOTH): the
    // per-hop join runs over a pre-oriented edge frame (single equi-join,
    // never a nested-loop fallback). Oracle enumerates the same undirected
    // walks with edge-uniqueness over the reconstructable KNOWS ring+chord.
    cq(
      "cy_varlen_both",
      """MATCH (a:Customer)-[e:KNOWS*1..2]-(b:Customer)
        |WHERE a.c_custkey = 0
        |RETURN size(e) AS hops, b.c_custkey AS k, count(*) AS n
        |ORDER BY hops, k""".stripMargin,
      """WITH e AS (
        |    SELECT 'r' || c_custkey AS eid, c_custkey AS src,
        |           (c_custkey + 1) % (SELECT max(c_custkey)+1 FROM customer) AS dst
        |    FROM customer
        |    UNION ALL
        |    SELECT 'c' || c_custkey, c_custkey,
        |           (c_custkey + 7) % (SELECT max(c_custkey)+1 FROM customer)
        |    FROM customer),
        |  u AS (
        |    SELECT eid, src, dst FROM e
        |    UNION ALL
        |    SELECT eid, dst, src FROM e WHERE src <> dst),
        |  w1 AS (SELECT eid, dst AS node FROM u WHERE src = 0),
        |  w2 AS (
        |    SELECT u2.dst AS node FROM w1
        |    JOIN u u2 ON u2.src = w1.node AND u2.eid <> w1.eid)
        |SELECT hops, k, count(*) AS n FROM (
        |  SELECT CAST(1 AS BIGINT) AS hops, node AS k FROM w1
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), node FROM w2)
        |GROUP BY hops, k ORDER BY hops, k""".stripMargin)
  )
}
