package graft.queries

import org.apache.spark.sql.SparkSession

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Round-10 surface: cost-based MATCH start-point choice
  * (VariableStartPlanner analog) exercised on an asymmetric-label chain —
  * Customer (large) vs Nation (25 rows): the planner must let the small
  * side drive the expansion (scan Nation, expand FROM_NATION inward)
  * instead of scanning every customer. The oracle only checks the
  * answer; the plan shape is asserted by the start-choice spec. */
object Round10Queries {

  private def g(s: SparkSession, dir: String) = TpchGraphLoader(s, dir)

  private def cq(name: String, cypher: String, oracle: String): QueryDef =
    QueryDef(name, (s, dir) => Cypher.run(s, g(s, dir), cypher), Some(oracle))

  val defs: Seq[QueryDef] = Seq(

    // asymmetric chain, start side reversed by the cost chooser
    cq(
      "cy_start_choice",
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |WHERE n.n_name = 'FRANCE'
        |RETURN count(*) AS cnt""".stripMargin,
      """SELECT CAST(count(*) AS BIGINT) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name = 'FRANCE'""".stripMargin),

    // bound-endpoint chain: the second MATCH must expand from the bound
    // nation, never rescan customers
    cq(
      "cy_start_bound_end",
      """MATCH (n:Nation {n_name: 'GERMANY'})
        |MATCH (c:Customer)-[:FROM_NATION]->(n)
        |RETURN count(*) AS cnt""".stripMargin,
      """SELECT CAST(count(*) AS BIGINT) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name = 'GERMANY'""".stripMargin))
}
