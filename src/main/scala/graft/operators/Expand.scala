package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Frames, GraphState}

/** One-hop expansion — the reference's `Expand` operator
  * (`src/query/plan/operator.hpp:1063`, cursor `operator.cpp:1904`): for each
  * frame row's bound node, iterate edges of the requested direction/types and
  * bind (edge, neighbor).
  *
  * Spark-first lowering: an equi-join frame⋈edges on the node id, then (if
  * the other endpoint is a fresh variable) a join to the target label's node
  * frame; if the endpoint is already bound (`existing_node`, operator.hpp's
  * `existing_node_` flag) we only add the equality predicate — Catalyst turns
  * the id-equality chain into shuffled hash joins (or broadcast joins when a
  * side is small, e.g. Nation/Region dimension labels).
  */
object Expand {

  sealed trait Direction
  case object Out extends Direction
  case object In extends Direction
  case object Both extends Direction

  /** Expand from bound `srcVar` over `types` edges, binding `edgeVar` and
    * fresh node `dstVar` with label `dstLabel` (None = any label). */
  def apply(
      frame: DataFrame,
      g: GraphState,
      srcVar: String,
      edgeVar: String,
      types: Seq[String],
      dir: Direction,
      dstVar: String,
      dstLabel: Option[String]): DataFrame = {
    val withEdge = joinEdge(frame, g, srcVar, edgeVar, types, dir)
    val nodesDf = dstLabel.map(g.nodesOrEmpty).getOrElse(g.allNodes)
    val far = farEnd(edgeVar, dir)
    withEdge.join(
      Frames.bind(dstVar)(nodesDf),
      far === Frames.id(dstVar))
  }

  /** Expand to an already-bound endpoint: only adds the join predicate.
    * For BOTH: an OR-of-equalities join condition cannot hash-partition
    * (Catalyst falls back to BroadcastNestedLoopJoin — O(frame × edges) at
    * scale), so each orientation is its own equi-join and the results are
    * unioned. A self-loop (src=dst=both nodes) matches exactly once: the
    * reversed branch excludes loops. */
  def toExisting(
      frame: DataFrame,
      g: GraphState,
      srcVar: String,
      edgeVar: String,
      types: Seq[String],
      dir: Direction,
      existingVar: String): DataFrame = dir match {
    case Both =>
      val edges = Frames.bind(edgeVar)(g.edgesOfTypes(types))
      val fwd = frame.join(
        edges,
        Frames.src(edgeVar) === Frames.id(srcVar) &&
          Frames.dst(edgeVar) === Frames.id(existingVar))
      val rev = frame.join(
        edges,
        Frames.dst(edgeVar) === Frames.id(srcVar) &&
          Frames.src(edgeVar) === Frames.id(existingVar) &&
          Frames.src(edgeVar) =!= Frames.dst(edgeVar))
      fwd.unionByName(rev)
    case d =>
      joinEdge(frame, g, srcVar, edgeVar, types, d)
        .filter(farEnd(edgeVar, d) === Frames.id(existingVar))
  }

  private def joinEdge(
      frame: DataFrame,
      g: GraphState,
      srcVar: String,
      edgeVar: String,
      types: Seq[String],
      dir: Direction): DataFrame = {
    val edges = Frames.bind(edgeVar)(g.edgesOfTypes(types))
    val cond = dir match {
      case Out => Frames.src(edgeVar) === Frames.id(srcVar)
      case In => Frames.dst(edgeVar) === Frames.id(srcVar)
      case Both =>
        // reachable only via [[apply]], which rejects Both in farEnd;
        // undirected one-hop goes through expandBoth / toExisting
        throw new UnsupportedOperationException(
          "undirected joinEdge: use expandBoth or toExisting")
    }
    frame.join(edges, cond)
  }

  /** The endpoint column on the far side of the traversal. */
  private def farEnd(edgeVar: String, dir: Direction) = dir match {
    case Out => Frames.dst(edgeVar)
    case In => Frames.src(edgeVar)
    case Both =>
      // note: for Both the far end is whichever endpoint isn't the source;
      // callers using Both must have come through joinEdge's || condition.
      // We pick the non-matching endpoint via a CASE at the call site if
      // needed; the simple form below is only valid for distinct endpoints.
      throw new UnsupportedOperationException(
        "undirected expand to fresh node: use expandBoth")
  }

  /** Undirected expand to a fresh node: union of both orientations —
    * mirrors the reference's EdgeAtom::Direction::BOTH handling. A self-loop
    * edge appears in both orientations with identical bindings; the reference
    * yields it once (`operator.cpp:1904` iterates in- and out-lists but a
    * loop is stored once per list), so the In side excludes loops. */
  def expandBoth(
      frame: DataFrame,
      g: GraphState,
      srcVar: String,
      edgeVar: String,
      types: Seq[String],
      dstVar: String,
      dstLabel: Option[String]): DataFrame =
    apply(frame, g, srcVar, edgeVar, types, Out, dstVar, dstLabel)
      .unionByName(
        apply(frame, g, srcVar, edgeVar, types, In, dstVar, dstLabel)
          .filter(Frames.src(edgeVar) =!= Frames.dst(edgeVar)))
}
