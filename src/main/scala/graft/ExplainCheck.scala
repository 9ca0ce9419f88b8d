package graft

import org.apache.spark.sql.SparkSession

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Dev tool: print the physical join operators of a Cypher query's plan —
  * `runMain graft.ExplainCheck "<cypher>" [sfDir]`. Used to audit that
  * expansion joins stay hash/broadcast joins (a BroadcastNestedLoopJoin in
  * an expansion path is a scale bug; the only acceptable BNLJ/Cross nodes
  * are 1-row-aggregate combiners, e.g. the KNOWS `__N` constant).
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse(
      "MATCH (a:Customer)-[k:KNOWS]-(b:Customer) RETURN count(*) AS n")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = TpchGraphLoader(spark, sfDir)
    val plan = Cypher.run(spark, g, query).queryExecution.executedPlan.toString
    plan.split("\n")
      .filter(l => l.contains("Join") || l.contains("Cartesian"))
      .foreach(println)
    spark.stop()
  }
}
