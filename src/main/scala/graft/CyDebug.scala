package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraphState
import graft.cypher.Cypher

/** Ad-hoc Cypher scratch main: every arg but the last executes as a setup
  * statement; the last one prints its result.
  * `runMain graft.CyDebug "CREATE (:A)" "MATCH (n) RETURN n"` */
object CyDebug {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // GRAFT_PLANLOG=RuleName[,RuleName…] logs each named rule's plan
    // rewrites — the tool for "plan became unresolved" bugs
    sys.env.get("GRAFT_PLANLOG").foreach { rules =>
      builder
        .config("spark.sql.planChangeLog.level", "ERROR")
        .config("spark.sql.planChangeLog.rules", rules)
    }
    sys.env.get("GRAFT_PLANLOG_BATCHES").foreach { batches =>
      builder
        .config("spark.sql.planChangeLog.level", "ERROR")
        .config("spark.sql.planChangeLog.batches", batches)
    }
    sys.env.get("GRAFT_EXCLUDE_RULES").foreach { rules =>
      builder.config("spark.sql.optimizer.excludedRules", rules)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_GRAPH=ldbc:<dir> | pokec:<dir> | tpch:<dir> starts from a
    // loader graph instead of an empty one
    var g = sys.env.get("GRAFT_GRAPH") match {
      case Some(s"ldbc:$dir") => graft.sources.LdbcGraphLoader(spark, dir)
      case Some(s"pokec:$dir") => graft.sources.PokecGraphLoader(spark, dir)
      case Some(s"tpch:$dir") => graft.sources.TpchGraphLoader(spark, dir)
      case _ => GraphState(Map.empty, Map.empty)
    }
    args.dropRight(1).foreach { q =>
      g = Cypher.execute(spark, g, q, Map.empty).graph
    }
    args.lastOption.foreach { q =>
      val res = Cypher.execute(spark, g, q, Map.empty)
      if (sys.env.contains("GRAFT_DUMP_ANALYZED"))
        // verbose tree: data types + nullability per attribute
        println(res.result.queryExecution.analyzed.treeString(verbose = true))
      res.result.show(100, truncate = false)
    }
    spark.stop()
  }
}
