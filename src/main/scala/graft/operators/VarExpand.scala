package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Frames, GraphState}

/** Variable-length expansion `-[e:T*min..max]->` — the reference's
  * `ExpandVariable` in DEPTH_FIRST mode (`src/query/plan/operator.hpp:1172`,
  * cursor `operator.cpp:2199`), including inline cyphermorphism (an edge may
  * appear at most once per traversal,
  * reference `EdgeUniquenessFilter`, operator.hpp:1768).
  *
  * Spark-first lowering: bounded unrolling into a union of k-hop join chains.
  * Each hop is an equi-join on node id (shuffled or broadcast by Catalyst);
  * the traversed edge-id list is carried as an ARRAY column, and uniqueness
  * is `!array_contains(path, edge)`. Unbounded `*` is capped (the reference
  * has `USING HOPS LIMIT` for the same reason, ast.hpp:2086). The unrolled
  * plan is a DAG of joins — at 1000-executor scale each hop is one shuffle
  * stage and the union is evaluated in parallel, not sequentially.
  */
object VarExpand {

  /** Default cap for unbounded `*` (hops-limit analog). */
  val DefaultMaxHops = 8

  /** Internal column names used while stepping (dropped before return). */
  private val CUR = "__vx_cur"
  private val PATH = "__vx_path"

  /** Expand from `srcVar`, binding `edgeVar@_ids` (edge-id list, in
    * traversal order) and fresh node `dstVar`. `dir` is interpreted per-hop.
    */
  def apply(
      frame: DataFrame,
      g: GraphState,
      srcVar: String,
      edgeVar: String,
      types: Seq[String],
      dir: Expand.Direction,
      minHops: Int,
      maxHops: Int,
      dstVar: String,
      dstLabel: Option[String]): DataFrame = {
    require(minHops >= 0 && maxHops >= minHops, s"bad hop range $minHops..$maxHops")

    val edges = g.edgesOfTypes(types)
      .select(col(GraphState.IdCol), col(GraphState.SrcCol), col(GraphState.DstCol))

    var cur = frame
      .withColumn(CUR, Frames.id(srcVar))
      .withColumn(PATH, array().cast("array<long>"))

    var reached: Seq[DataFrame] = Nil
    if (minHops == 0) reached = reached :+ cur

    for (k <- 1 to maxHops) {
      val e = edges.select(
        col(GraphState.IdCol).as(s"__e_id"),
        col(GraphState.SrcCol).as(s"__e_src"),
        col(GraphState.DstCol).as(s"__e_dst"))
      val joined = dir match {
        case Expand.Out =>
          cur.join(e, col(CUR) === col("__e_src"))
            .withColumn("__next", col("__e_dst"))
        case Expand.In =>
          cur.join(e, col(CUR) === col("__e_dst"))
            .withColumn("__next", col("__e_src"))
        case Expand.Both =>
          cur.join(e, col(CUR) === col("__e_src") || col(CUR) === col("__e_dst"))
            .withColumn(
              "__next",
              when(col(CUR) === col("__e_src"), col("__e_dst"))
                .otherwise(col("__e_src")))
      }
      cur = joined
        .filter(!array_contains(col(PATH), col("__e_id")))
        .withColumn(PATH, concat(col(PATH), array(col("__e_id"))))
        .withColumn(CUR, col("__next"))
        .drop("__e_id", "__e_src", "__e_dst", "__next")
      if (k >= minHops) reached = reached :+ cur
    }

    val all = reached.reduce(_ unionByName _)
    val nodesDf = dstLabel.map(g.nodes).getOrElse(g.allNodes)
    all
      .join(Frames.bind(dstVar)(nodesDf), col(CUR) === Frames.id(dstVar))
      .withColumn(s"$edgeVar${Frames.Sep}_ids", col(PATH))
      .drop(CUR, PATH)
  }
}
