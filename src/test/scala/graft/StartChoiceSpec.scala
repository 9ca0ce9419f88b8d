package graft

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Multi-pattern start-point choice (reference VariableStartPlanner,
  * `variable_start_planner.hpp:161-204`): with two comma patterns sharing
  * a variable, the planner must plan the CHEAP pattern first and drive
  * the expensive one from the bound shared side — the optimized plan's
  * leaf order shows the small frame scanned before the big one. */
class StartChoiceSpec extends SparkTestBase {

  lazy val g = TpchGraphLoader(spark, sfDir)

  test("two asymmetric patterns: small side drives both") {
    val df = Cypher.run(
      spark, g,
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation),
        |      (n)-[:IN_REGION]->(r:Region {r_name: 'ASIA'})
        |RETURN count(*) AS cnt""".stripMargin)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    def idx(colName: String): Int =
      leaves.indexWhere(_.output.exists(_.name == colName))
    val regionIdx = idx("r_regionkey")
    val custIdx = idx("c_custkey")
    assert(regionIdx >= 0 && custIdx >= 0, s"missing scans: $leaves")
    assert(
      regionIdx < custIdx,
      "the Region pattern (5 rows, props-filtered) must plan before the " +
        s"Customer scan; leaf order was region=$regionIdx customer=$custIdx")
    // and the answer is still right
    val expected = {
      import org.apache.spark.sql.functions.col
      val asia = g.nodes("Region").filter(col("r_name") === "ASIA")
        .select(col("r_regionkey"))
      g.nodes("Nation")
        .join(asia, col("n_regionkey") === col("r_regionkey"))
        .join(
          g.nodes("Customer"),
          col("c_nationkey") === col("n_nationkey"))
        .count()
    }
    assert(df.collect()(0).getLong(0) == expected)
  }

  test("disconnected patterns: the small label scan broadcasts into the " +
    "Cartesian") {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
    val df = Cypher.run(
      spark, g,
      "MATCH (l:Lineitem), (r:Region) RETURN count(*) AS cnt")
    val hinted = df.queryExecution.optimizedPlan.collect {
      case j: Join
          if j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) ||
            j.hint.rightHint.exists(_.strategy.contains(BROADCAST)) =>
        j
    }
    assert(hinted.nonEmpty,
      "the 5-row Region scan must carry a broadcast hint in the cross join")
    val expected = g.nodes("Lineitem").count() * g.nodes("Region").count()
    assert(df.collect()(0).getLong(0) == expected)
  }
}
