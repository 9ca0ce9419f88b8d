package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraphState

/** Generated graphs for the reference's planner-stress workloads
  * (`/root/reference/tests/mgbench/workloads/supernode.py` and
  * `cartesian.py`) — both datasets are defined by their `dataset_generator`
  * as pure CREATE sequences over `range(0, CARDINALITY)`, so they
  * regenerate here as `spark.range` derivations: deterministic, no files,
  * and sized by a parameter so the bench can grow the hub to ~1M incident
  * edges while the oracle gates pin the reference's own cardinalities.
  *
  * Scale: `spark.range` partitions across the cluster like any scan; the
  * hub vertex's edge list is NEVER collected or grouped onto one task by
  * construction here — whether a downstream operator keeps that property
  * is exactly what the supernode workload stresses (and what
  * PlanInvariantSpec pins for the MERGE/UNWIND paths).
  */
object StressGraphLoader {

  private val Shift = 48
  val superBase = 21L
  val nodeBase = 22L
  val edgeBase = 23L
  val cartBase = 24L

  /** supernode.py:28-35: one `:Supernode {id: 1}`, `n` `:Node {id}`
    * vertices, and every node pointing at the hub —
    * `MATCH (s:Supernode), (n:Node) CREATE (s)<-[:EDGE]-(n)`. */
  def supernode(spark: SparkSession, n: Long): GraphState = {
    def hub(): DataFrame =
      spark.range(1).select(
        lit((superBase << Shift) + 1L).as(GraphState.IdCol),
        array(lit("Supernode")).as(GraphState.LabelsCol),
        lit(1L).as("id"))
    def nodes(): DataFrame =
      spark.range(n).select(
        (lit(nodeBase << Shift) + col("id")).as(GraphState.IdCol),
        array(lit("Node")).as(GraphState.LabelsCol),
        col("id"))
    def edges(): DataFrame =
      spark.range(n).select(
        (lit(edgeBase << Shift) + col("id")).as(GraphState.IdCol),
        (lit(nodeBase << Shift) + col("id")).as(GraphState.SrcCol),
        lit((superBase << Shift) + 1L).as(GraphState.DstCol),
        lit("EDGE").as(GraphState.TypeCol))
    GraphState(
      Map("Supernode" -> (() => hub()), "Node" -> (() => nodes())),
      Map("EDGE" -> (() => edges())))
  }

  /** cartesian.py:27-31: `n` `:Node {id, id2}` vertices (id2 == id), no
    * edges — the workload is the disconnected-pattern join planner. */
  def cartesian(spark: SparkSession, n: Long): GraphState =
    GraphState(
      Map("Node" -> (() =>
        spark.range(n).select(
          (lit(cartBase << Shift) + col("id")).as(GraphState.IdCol),
          array(lit("Node")).as(GraphState.LabelsCol),
          col("id"),
          col("id").as("id2")))),
      Map.empty)
}
