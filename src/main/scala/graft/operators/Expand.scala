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
      // orient the EDGE SET (each edge twice, loops once), not the frame:
      // unioning two copies of the accumulated frame doubled the whole
      // upstream plan per undirected hop (2^n subtree copies on an
      // n-undirected-hop chain — ldbc_bi11 executed its person/city base
      // EIGHT times). The doubled side here is the edge scan, which is a
      // base table read.
      frame
        .join(
          orientedBoth(g, edgeVar, types),
          col(nearCol(edgeVar)) === Frames.id(srcVar) &&
            col(farCol(edgeVar)) === Frames.id(existingVar))
        .drop(nearCol(edgeVar), farCol(edgeVar))
    case d =>
      joinEdge(frame, g, srcVar, edgeVar, types, d)
        .filter(farEnd(edgeVar, d) === Frames.id(existingVar))
  }

  private def nearCol(edgeVar: String) = s"$edgeVar${Frames.Sep}__near"
  private def farCol(edgeVar: String) = s"$edgeVar${Frames.Sep}__far"

  /** Edge frame oriented BOTH ways: every edge contributes (near=src,
    * far=dst) and — unless it is a self-loop, which the reference yields
    * once — (near=dst, far=src). The edge's own `_src`/`_dst` columns are
    * untouched, so edge bindings read identically downstream. */
  private def orientedBoth(
      g: GraphState, edgeVar: String, types: Seq[String]): DataFrame = {
    val e0 = Frames.bind(edgeVar)(g.edgesOfTypes(types))
    val fwd = e0
      .withColumn(nearCol(edgeVar), Frames.src(edgeVar))
      .withColumn(farCol(edgeVar), Frames.dst(edgeVar))
    val rev = e0
      .filter(Frames.src(edgeVar) =!= Frames.dst(edgeVar))
      .withColumn(nearCol(edgeVar), Frames.dst(edgeVar))
      .withColumn(farCol(edgeVar), Frames.src(edgeVar))
    fwd.unionByName(rev)
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
      dstLabel: Option[String]): DataFrame = {
    // see toExisting(Both): one join against a both-ways-oriented edge
    // set keeps the accumulated plan LINEAR in the number of undirected
    // hops (the old two-apply union copied the whole upstream subtree)
    val withEdge = frame.join(
      orientedBoth(g, edgeVar, types),
      col(nearCol(edgeVar)) === Frames.id(srcVar))
    val nodesDf = dstLabel.map(g.nodesOrEmpty).getOrElse(g.allNodes)
    withEdge
      .join(Frames.bind(dstVar)(nodesDf),
        col(farCol(edgeVar)) === Frames.id(dstVar))
      .drop(nearCol(edgeVar), farCol(edgeVar))
  }
}
