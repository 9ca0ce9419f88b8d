package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fundamental cycles — the reference's `cycles_module`
  * (`src/mage/cpp/cycles_module/algorithm/cycles.hpp`): a spanning tree
  * per component plus, for every non-tree ("chord") edge, the cycle it
  * closes through the tree. The reference walks parent pointers from a
  * recursive DFS; the Spark-first analog is fully level-synchronous:
  *
  *   1. spanning FOREST by multi-source BFS from each component's
  *      minimum-id node (parent = min-id neighbor one level up —
  *      deterministic, no DFS);
  *   2. chord detection: per undirected node pair, the first edge lying
  *      on a tree (child, parent) pair is the tree edge; every other
  *      edge (extra parallels and all non-tree pairs) is a chord;
  *   3. cycle reconstruction: all chords walk toward their LCA at once —
  *      one join against the parent table per level, stepping the deeper
  *      endpoint (both on ties), rounds = forest depth.
  *
  * Deterministic: min-id roots, min-parent tie-break, cycle ids ranked by
  * the closing chord's (min endpoint, max endpoint, edge id).
  */
object Cycles {

  /** @param nodes single column `node`
    * @param edges (edge_id, src, dst) — undirected interpretation
    * @return (cycle_id, node) — one row per node of each fundamental
    *         cycle; a self-loop contributes a 1-node cycle, a parallel
    *         duplicate a 2-node cycle
    */
  def fundamental(
      spark: SparkSession,
      nodes: DataFrame,
      edges: DataFrame): DataFrame = {
    val und = edges
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .unionByName(
        edges
          .filter(col("src") =!= col("dst"))
          .select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)

    // 1. BFS spanning forest from per-component min-id roots. Roots are
    // discovered inline: a node is a root iff nothing smaller reaches it
    // — equivalently, seed ALL nodes labeled by themselves and min-label
    // propagate (the components pass), then BFS from the labels. One
    // fixpoint gives labels; the second gives parents/depths.
    val comp = graft.procedures.Procedures
      .minLabelComponents(nodes.select(col("node")), und)
      .localCheckpoint(true)
    val roots = comp
      .filter(col("node") === col("comp"))
      .select(col("node"))
    var parents = roots
      .select(
        col("node"),
        lit(null).cast("long").as("parent"),
        lit(0L).as("depth"))
      .localCheckpoint(true)
    var frontier = parents
    var depth = 0L
    var done = frontier.isEmpty
    while (!done) {
      depth += 1
      val fresh = frontier
        .join(und, col("node") === col("src"))
        .select(col("dst").as("__n"), col("src").as("__p"))
        .join(
          parents.select(col("node").as("__n")),
          Seq("__n"),
          "left_anti")
        .groupBy("__n")
        .agg(min(col("__p")).as("parent"))
        .select(col("__n").as("node"), col("parent"), lit(depth).as("depth"))
        .localCheckpoint(true)
      done = fresh.isEmpty
      if (!done) {
        parents = parents.unionByName(fresh).localCheckpoint(true)
        frontier = fresh
      }
    }
    val maxDepth = Option(parents.agg(max("depth")).first().get(0))
      .map(_.asInstanceOf[Long])
      .getOrElse(0L)

    // 2. chords: one edge per tree (child, parent) pair is the tree edge
    // (min edge_id); everything else closes a cycle
    val treeP = parents
      .filter(col("parent").isNotNull)
      .select(
        least(col("node"), col("parent")).as("__a"),
        greatest(col("node"), col("parent")).as("__b"),
        lit(true).as("__tree"))
    val ranked = edges
      .select(
        col("edge_id"),
        col("src"),
        col("dst"),
        least(col("src"), col("dst")).as("__a"),
        greatest(col("src"), col("dst")).as("__b"))
      .withColumn(
        "__rn",
        row_number().over(
          Window.partitionBy("__a", "__b").orderBy("edge_id")))
    val chords = ranked
      .join(treeP, Seq("__a", "__b"), "left_outer")
      .filter(
        col("src") === col("dst") || // self-loop: 1-node cycle
          col("__tree").isNull || col("__rn") > 1)
      .select(col("edge_id"), col("src"), col("dst"), col("__a"), col("__b"))
      .localCheckpoint(true)

    // 3. every chord walks to its LCA simultaneously — the deeper side
    // steps up each round (both on equal depths), collecting node chains
    val dep = parents.select(
      col("node").as("__dn"), col("parent").as("__dp"), col("depth").as("__dd"))
    var walk = chords
      .join(dep.select(col("__dn").as("src"), col("__dd").as("__du")), Seq("src"))
      .join(dep.select(col("__dn").as("dst"), col("__dd").as("__dv")), Seq("dst"))
      .select(
        col("edge_id"),
        col("__a"),
        col("__b"),
        col("src").as("__u"),
        col("dst").as("__v"),
        col("__du"),
        col("__dv"),
        array(col("src")).as("__nu"),
        array(col("dst")).as("__nv"))
      .localCheckpoint(true)
    // finished rows accumulate LAZILY: each union leaf derives from a
    // checkpointed round frame, so the plan stays linear in maxDepth —
    // no per-round job for the accumulator, no per-round isEmpty probe
    // (the walk is bounded by the forest depth anyway)
    var doneW: Option[DataFrame] = None
    def finish(rows: DataFrame): Unit = {
      // cycle nodes = u-side chain + v-side chain reversed, LCA once
      val f = rows.select(
        col("edge_id"),
        col("__a"),
        col("__b"),
        concat(
          col("__nu"),
          reverse(slice(col("__nv"), lit(1), size(col("__nv")) - 1)))
          .as("__nodes"))
      doneW = Some(doneW.map(_.unionByName(f)).getOrElse(f))
    }
    finish(walk.filter(col("__u") === col("__v")))
    walk = walk.filter(col("__u") =!= col("__v"))
    var r = 0L
    while (r < maxDepth) {
      r += 1
      val stepU = col("__du") >= col("__dv")
      val stepV = col("__dv") >= col("__du")
      val stepped = walk
        .join(
          dep.select(
            col("__dn").as("__u"), col("__dp").as("__pu")),
          Seq("__u"))
        .join(
          dep.select(
            col("__dn").as("__v"), col("__dp").as("__pv")),
          Seq("__v"))
        .select(
          col("edge_id"),
          col("__a"),
          col("__b"),
          when(stepU, col("__pu")).otherwise(col("__u")).as("__u"),
          when(stepV, col("__pv")).otherwise(col("__v")).as("__v"),
          when(stepU, col("__du") - 1L).otherwise(col("__du")).as("__du"),
          when(stepV, col("__dv") - 1L).otherwise(col("__dv")).as("__dv"),
          when(stepU, concat(col("__nu"), array(col("__pu"))))
            .otherwise(col("__nu")).as("__nu"),
          when(stepV, concat(col("__nv"), array(col("__pv"))))
            .otherwise(col("__nv")).as("__nv"))
        .localCheckpoint(true)
      finish(stepped.filter(col("__u") === col("__v")))
      walk = stepped.filter(col("__u") =!= col("__v"))
      if (walk.isEmpty) r = maxDepth // cheap probe over the cached round
    }
    if (!walk.isEmpty)
      throw new IllegalStateException(
        "cycles: chord walk did not converge within the forest depth")

    doneW match {
      case None =>
        spark.range(0).select(
          col("id").as("cycle_id"), col("id").as("node"))
      case Some(d) =>
        d.withColumn(
          "cycle_id",
          dense_rank().over(
            Window.orderBy(col("__a"), col("__b"), col("edge_id")))
            .cast("long") - 1L)
          .select(col("cycle_id"), explode(col("__nodes")).as("node"))
    }
  }
}
