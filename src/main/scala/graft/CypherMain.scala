package graft

import org.apache.spark.sql.SparkSession

import graft.cypher.Cypher
import graft.sources.{LdbcGraphLoader, PokecGraphLoader, TpchGraphLoader}

/** Ad-hoc Cypher runner for debugging:
  * `runMain graft.CypherMain <sfDir> <tpch|pokec|ldbc> "<query>"` —
  * prints schema + up to 100 rows. */
object CypherMain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, loader, query) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = loader match {
      case "pokec" => PokecGraphLoader(spark, sfDir)
      case "ldbc" => LdbcGraphLoader(spark, sfDir)
      case _ => TpchGraphLoader(spark, sfDir)
    }
    val df = Cypher.run(spark, g, query)
    println(df.schema.simpleString)
    df.show(100, truncate = false)
    spark.stop()
  }
}
