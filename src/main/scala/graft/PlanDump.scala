package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for named catalog queries —
  * `runMain graft.PlanDump <outDir> <suffix> <name1,name2,...> [sfDir]`.
  * Writes `<outDir>/<name>_<suffix>.txt` per query (the optimization-round
  * plan artifacts under plans/r17/). Driver-steered fixpoint operators
  * (BFS, var-expand) surface as the FINAL result plan over their
  * checkpointed round leaves — the per-round job structure is code, not
  * plan, and is documented in OPTIMIZATION_r17.md instead. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // queryExecution.explainString(FormattedMode) without executing
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        System.err.println(s"[plandump] wrote $name ($suffix)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
      graft.operators.Scratch.sweep()
    }
    spark.stop()
  }
}
