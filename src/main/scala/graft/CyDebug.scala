package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraphState
import graft.cypher.Cypher

/** Ad-hoc Cypher scratch main: every arg but the last executes as a setup
  * statement; the last one prints its result.
  * `runMain graft.CyDebug "CREATE (:A)" "MATCH (n) RETURN n"` */
object CyDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var g = GraphState(Map.empty, Map.empty)
    args.dropRight(1).foreach { q =>
      g = Cypher.execute(spark, g, q, Map.empty).graph
    }
    args.lastOption.foreach { q =>
      val res = Cypher.execute(spark, g, q, Map.empty)
      res.result.show(100, truncate = false)
    }
    spark.stop()
  }
}
