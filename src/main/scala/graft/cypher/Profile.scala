package graft.cypher

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** `EXPLAIN` / `PROFILE` statement surface — the reference's
  * `PrepareExplainQuery` / `PrepareProfileQuery`
  * (`src/query/interpreter.cpp:4206,4312`; per-operator stats in
  * `src/query/plan/profile.cpp`).
  *
  * The reference prints ITS operator tree; this engine's operators are
  * Catalyst plans, so EXPLAIN surfaces the optimized logical plan
  * (header `QUERY PLAN`, one row per line) and PROFILE executes the
  * statement and reports the EXECUTED physical plan with its real
  * `SQLMetrics` — output rows per operator (`ACTUAL HITS`) and measured
  * operator time where Spark collects one (`ABSOLUTE TIME` /
  * `RELATIVE TIME`), the same four columns the reference's PROFILE
  * table carries. Per-operator timing in a whole-stage-codegen engine
  * lives on the pipeline (WholeStageCodegen) and blocking (exchange,
  * aggregate, sort, scan) nodes — exactly the nodes whose cost matters
  * at scale; fused row-by-row operators deliberately have no timer (the
  * fusion IS the optimization).
  */
object Profile {

  /** `EXPLAIN <q>`: the inner statement's optimized Catalyst plan, one
    * row per line (reference header `interpreter.cpp:4206`). */
  def explainDf(spark: SparkSession, inner: DataFrame): DataFrame = {
    val lines = inner.queryExecution.optimizedPlan
      .treeString(verbose = false)
      .split("\n")
      .filter(_.nonEmpty)
      .map(l => Row(s" * $l"))
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(lines: _*)),
      StructType(Seq(StructField("QUERY PLAN", StringType, nullable = false))))
  }

  /** `PROFILE <q>`: execute the inner statement, then report each node
    * of the FINAL (post-AQE) physical plan with its collected metrics
    * (reference header `interpreter.cpp:4312`). */
  def profileDf(spark: SparkSession, inner: DataFrame): DataFrame = {
    // the reference's PROFILE pulls the query to completion and reports
    // afterwards — run the statement, then read the metrics it left
    val produced = inner.collect().length.toLong
    val root = finalPlan(inner.queryExecution.executedPlan)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
    // the reference's root operator (Produce, plan/operator.hpp) reports
    // the statement's emitted row count; fused Catalyst operators under
    // whole-stage codegen don't each carry numOutputRows, so the root row
    // is the one place the result cardinality is always visible
    rows += (("* Produce", produced, 0.0))
    def walk(p: SparkPlan, depth: Int): Unit = {
      val hits = p.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      val timeMs = p.metrics.collect {
        case (_, m) if m.metricType == "timing" => m.value.toDouble
        case (_, m) if m.metricType == "nsTiming" => m.value / 1e6
      }.sum
      rows += (("  " * depth + "* " + p.nodeName, hits, timeMs))
      p.children.foreach(c => walk(finalPlan(c), depth + 1))
      // subqueries / broadcast exchanges hang off innerChildren in some
      // nodes — covered by children for every plan shape we emit
    }
    walk(root, 1)
    val total = math.max(rows.map(_._3).sum, 1e-9)
    val out = rows.toSeq.map { case (op, hits, ms) =>
      Row(
        op,
        if (hits < 0) "" else hits.toString,
        f"${100.0 * ms / total}%.6f %%",
        f"$ms%.6f ms")
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(out: _*)),
      StructType(Seq(
        StructField("OPERATOR", StringType, nullable = false),
        StructField("ACTUAL HITS", StringType, nullable = false),
        StructField("RELATIVE TIME", StringType, nullable = false),
        StructField("ABSOLUTE TIME", StringType, nullable = false))))
  }

  /** Unwrap AQE wrappers to the executed physical plan — both the
    * adaptive root and the per-stage QueryStageExec shells (Result /
    * Shuffle / Broadcast query stages) that hold the real operator as
    * `plan`, not as a child. */
  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      finalPlan(q.plan)
    case other => other
  }
}
