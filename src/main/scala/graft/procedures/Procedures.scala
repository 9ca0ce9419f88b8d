package graft.procedures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraphState

/** `CALL name(args) YIELD …` procedure registry — the reference's query
  * modules (`CallProcedure`, `src/query/plan/operator.hpp:2891`; module
  * registry `src/query/procedure/module.cpp`) with the MAGE graph
  * algorithms (`src/mage/cpp/pagerank_module`, `connected_components`, …)
  * re-expressed as driver-steered iterative DataFrame programs.
  *
  * A procedure is `ProcContext => DataFrame` (table-valued, like mgp_proc).
  * Iterative algorithms follow the ShortestPath discipline: one shuffle per
  * round, `localCheckpoint` for lineage truncation, convergence probes for
  * early stop — the shape that scales to 1000 executors.
  */
final case class ProcContext(
    spark: SparkSession,
    g: GraphState,
    args: Seq[Any]) {

  /** First argument as an options map (Cypher `CALL p({k: v, …})`). */
  def opts: Map[String, Any] = args.headOption match {
    case Some(m: Map[_, _]) =>
      m.map { case (k, v) => k.toString -> v }
    case _ => Map.empty
  }
  def optString(k: String, dflt: String): String =
    opts.get(k).map(_.toString).getOrElse(dflt)
  def optInt(k: String, dflt: Int): Int =
    opts.get(k).map(_.toString.toInt).getOrElse(dflt)
  def optDouble(k: String): Option[Double] =
    opts.get(k).map(_.toString.toDouble)
}

object Procedures {

  type Proc = ProcContext => DataFrame

  val registry: Map[String, Proc] = Map(
    "algo.pagerank" -> pagerank,
    "algo.wcc" -> wcc,
    "algo.degree" -> degree)

  import GraphState.{DstCol, IdCol, SrcCol}

  /** Options: label, type, weightProp+minWeight (edge filter). */
  private def selectGraph(ctx: ProcContext): (DataFrame, DataFrame) = {
    val label = ctx.optString("label", "Customer")
    val tpe = ctx.optString("type", "KNOWS")
    val nodes = ctx.g.nodes(label).select(col(IdCol).as("node"))
    val e0 = ctx.g.edges(tpe)
    val edges = (ctx.opts.get("weightProp"), ctx.optDouble("minWeight")) match {
      case (Some(p), Some(w)) => e0.filter(col(p.toString) >= w)
      case _ => e0
    }
    (nodes, edges.select(col(SrcCol).as("src"), col(DstCol).as("dst")))
  }

  /** PageRank, simple variant (no dangling-mass redistribution — dangling
    * nodes leak rank; documented, and mirrored exactly by the oracle):
    * pr₀ = 1/N;  prᵢ₊₁(v) = (1-d)/N + d·Σ_{u→v} prᵢ(u)/outdeg(u).
    * Reference analog: `src/mage/cpp/pagerank_module`. Yields (node, rank).
    */
  def pagerank(ctx: ProcContext): DataFrame = {
    val iters = ctx.optInt("iterations", 15)
    val d = ctx.opts.get("damping").map(_.toString.toDouble).getOrElse(0.85)
    val (nodes, edges) = selectGraph(ctx)
    val n = nodes.count().toDouble
    val e = edges.persist()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    var pr = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = pr
        .join(outdeg, col("node") === col("src"))
        .join(e.select(col("src").as("c_src"), col("dst")), col("node") === col("c_src"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("in_rank"))
      pr = nodes
        .join(contrib, Seq("node"), "left_outer")
        .select(
          col("node"),
          (lit((1 - d) / n) + lit(d) * coalesce(col("in_rank"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(true)
    }
    e.unpersist(blocking = false)
    outdeg.unpersist(blocking = false)
    pr
  }

  /** Weakly-connected components by undirected min-label propagation to
    * fixpoint. Reference analog: `src/mage/cpp/connected_components` /
    * union-find module. Yields (node, comp) where comp = min node id of the
    * component. */
  def wcc(ctx: ProcContext): DataFrame = {
    val (nodes, edges) = selectGraph(ctx)
    val und = edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    var comp = nodes.withColumn("comp", col("node")).localCheckpoint(true)
    var converged = false
    var rounds = 0
    val maxRounds = 64
    while (!converged && rounds < maxRounds) {
      rounds += 1
      val prop = comp
        .unionByName(
          comp.join(und, col("node") === col("src"))
            .select(col("dst").as("node"), col("comp")))
        .groupBy("node")
        .agg(min("comp").as("comp"))
      // Pointer-jumping (path halving): comp(v) ← comp(comp(v)). Component
      // labels converge in O(log diameter) rounds instead of O(diameter),
      // so the 64-round cap covers any graph up to diameter ~2^64.
      val next = prop
        .join(
          prop.select(col("node").as("__c"), col("comp").as("__cc")),
          col("comp") === col("__c"))
        .select(col("node"), col("__cc").as("comp"))
        .localCheckpoint(true)
      val changed = next
        .join(comp.select(col("node"), col("comp").as("__old")), Seq("node"))
        .filter(col("comp") < col("__old"))
      converged = changed.isEmpty
      comp = next
    }
    und.unpersist(blocking = false)
    if (!converged)
      throw new IllegalStateException(
        s"algo.wcc did not converge within $maxRounds rounds")
    comp
  }

  /** In/out degree per node of a label over one edge type.
    * Yields (node, out_deg, in_deg). */
  def degree(ctx: ProcContext): DataFrame = {
    val (nodes, edges) = selectGraph(ctx)
    val out = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    nodes
      .join(out, Seq("node"), "left_outer")
      .join(in, Seq("node"), "left_outer")
      .select(
        col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
