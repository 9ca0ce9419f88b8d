package graft.procedures

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.GraphState
import graft.core.GraphState.{DstCol, IdCol, SrcCol, TypeCol}

/** Read-side MAGE helper procedures — `map.from_nodes` (map_module.cpp:68)
  * and the `node`/`nodes` relationship introspection procedures
  * (node_module.cpp, nodes_module.cpp). Node arguments are accepted as
  * ids (the statement-level CALL form takes constant args; the reference's
  * Node-typed args arrive per row — same information).
  *
  * All shapes stay distributed: type sets come from per-type semi-joins
  * (partition pruning — only frames holding the probed ids are scanned),
  * and the single-row map yield of `from_nodes` is built by one
  * distributed aggregation, never a driver-side loop. */
object HelperProcs {

  private def ids(ctx: ProcContext, i: Int, what: String): Seq[Long] = {
    def one(v: Any): Long = v match {
      case l: Long => l
      case n: Int => n.toLong
      // a whole node value (the reference's Type::Node arg) — its id
      case m: Map[_, _] =>
        m.collectFirst { case (k, id: Long) if k.toString == IdCol => id }
          .getOrElse(throw new IllegalArgumentException(
            s"$what: node value lacks an id"))
      case other =>
        throw new IllegalArgumentException(s"$what: need node ids, got $other")
    }
    ctx.args.lift(i) match {
      case Some(xs: Seq[_]) => xs.map(one)
      case Some(v) => Seq(one(v))
      case None =>
        throw new IllegalArgumentException(s"$what: need node ids, got None")
    }
  }

  private def strings(v: Any): Seq[String] = v match {
    case null => Nil
    case s: String => Seq(s)
    case xs: Seq[_] => xs.map(_.toString)
    case other =>
      throw new IllegalArgumentException(s"need strings, got $other")
  }

  /** `map.from_nodes(label, property)` → one map row keyed by the
    * property value, valued by the node entity. Built as ONE distributed
    * aggregation over the label frame (the output map is a single yield
    * value — the same driver-sized object the reference materializes). */
  def fromNodes(ctx: ProcContext): DataFrame = {
    val label = ctx.args.head.toString
    val prop = ctx.args(1).toString
    val f = ctx.g.nodesOrEmpty(label)
    require(
      f.columns.contains(prop),
      s"map.from_nodes: no '$prop' property on :$label")
    val entity = struct(f.columns.map(col): _*)
    f.filter(col(prop).isNotNull)
      .agg(map_from_entries(collect_list(
        struct(col(prop).cast("string").as("key"), entity.as("value"))))
        .as("map"))
  }

  /** Incident-edge frame of a probed id set, both directions, optionally
    * type-filtered — each per-type scan is a pruned semi-join. */
  private def incident(
      g: GraphState, probe: Seq[Long], types: Seq[String]): DataFrame = {
    val ts = if (types.isEmpty) g.edgeTypes else types.filter(g.hasType)
    val boxed = probe.map(Long.box)
    if (ts.isEmpty) GraphState.emptyEdgeFrame
    else
      ts.map(g.edges)
        .map(_.select(col(IdCol), col(SrcCol), col(DstCol), col(TypeCol)))
        .reduce(_ unionByName _)
        .filter(col(SrcCol).isin(boxed: _*) || col(DstCol).isin(boxed: _*))
  }

  /** `node.relationship_types(node, types)` → sorted distinct incident
    * types (node_module.cpp:40). */
  def relationshipTypes(ctx: ProcContext): DataFrame = {
    val probe = ids(ctx, 0, "node.relationship_types")
    val types = strings(ctx.args.lift(1).orNull)
    incident(ctx.g, probe, types)
      .agg(array_sort(collect_set(col(TypeCol))).as("relationship_types"))
  }

  /** `node.relationship_exists(node, pattern)` → bool; pattern entries
    * may carry `<`/`>` direction prefixes/suffixes (node_module.cpp:29). */
  def relationshipExists(ctx: ProcContext): DataFrame = {
    val probe = ids(ctx, 0, "node.relationship_exists")
    val pats = strings(ctx.args.lift(1).orNull)
    val boxed = probe.map(Long.box)
    val conds: Seq[(Seq[String], Boolean, Boolean)] =
      if (pats.isEmpty) Seq((Nil, true, true))
      else pats.map { p =>
        val in = p.startsWith("<")
        val out = p.endsWith(">")
        val t = p.stripPrefix("<").stripSuffix(">")
        (if (t.isEmpty) Nil else Seq(t), in || !out, out || !in)
      }
    val hit = conds.exists { case (ts, allowIn, allowOut) =>
      val e = incident(ctx.g, probe, ts)
      val dirOk =
        (if (allowOut) col(SrcCol).isin(boxed: _*) else lit(false)) ||
          (if (allowIn) col(DstCol).isin(boxed: _*) else lit(false))
      !e.filter(dirOk).isEmpty
    }
    val spark = ctx.spark
    import spark.implicits._
    Seq(Tuple1(hit)).toDF("exists")
  }

  /** `nodes.relationship_types(nodes, types)` → one row per probed node
    * with its sorted distinct incident types (nodes_module.cpp:31). */
  def nodesRelationshipTypes(ctx: ProcContext): DataFrame = {
    val probe = ids(ctx, 0, "nodes.relationship_types")
    val types = strings(ctx.args.lift(1).orNull)
    val spark = ctx.spark
    import spark.implicits._
    val probeDf = probe.toDF("node_id")
    val e = incident(ctx.g, probe, types)
    val touched = e.select(col(SrcCol).as("node_id"), col(TypeCol))
      .unionByName(e.select(col(DstCol).as("node_id"), col(TypeCol)))
    probeDf
      .join(touched, Seq("node_id"), "left_outer")
      .groupBy(col("node_id"))
      .agg(array_sort(array_compact(collect_set(col(TypeCol))))
        .as("relationship_types"))
      .select(
        struct(col("node_id").as("id"), col("relationship_types").as("types"))
          .as("relationship_types"))
  }

  /** One (type-spec → exists?) map for a probed node over direction-
    * prefixed specs (`<T` incoming, `T>` outgoing, `T` either —
    * node_module.cpp RelationshipExist). */
  private def relExistMap(
      g: GraphState, id: Long, specs: Seq[String]): Map[String, Boolean] =
    specs.map { p =>
      if (p.startsWith("<") && p.endsWith(">"))
        throw new IllegalArgumentException(
          "Invalid relationship specification!")
      val in = !p.endsWith(">")
      val out = !p.startsWith("<")
      val t = p.stripPrefix("<").stripSuffix(">")
      val e = incident(g, Seq(id), if (t.isEmpty) Nil else Seq(t))
      val dirOk =
        (if (out) col(SrcCol) === id else lit(false)) ||
          (if (in) col(DstCol) === id else lit(false))
      p -> !e.filter(dirOk).isEmpty
    }.toMap

  /** `node.relationships_exist(node, relationships)` → one map row
    * (node_module.cpp:97; empty list raises). */
  def relationshipsExist(ctx: ProcContext): DataFrame = {
    val probe = ids(ctx, 0, "node.relationships_exist")
    val specs = strings(ctx.args.lift(1).orNull)
    require(specs.nonEmpty, "Input relationships list must not be empty!")
    val spark = ctx.spark
    import spark.implicits._
    Seq(Tuple1(relExistMap(ctx.g, probe.head, specs))).toDF("result")
  }

  /** `nodes.relationships_exist(nodes, relationships)` → one row per
    * probed node: {node_id, status: map} (nodes_module.cpp:41; the
    * reference packs the node itself — the id is this engine's stable
    * node reference). Empty input lists raise. */
  def nodesRelationshipsExist(ctx: ProcContext): DataFrame = {
    val probe = ids(ctx, 0, "nodes.relationships_exist")
    val specs = strings(ctx.args.lift(1).orNull)
    require(
      probe.nonEmpty && specs.nonEmpty,
      "Input lists must not be empty!")
    val spark = ctx.spark
    import spark.implicits._
    probe
      .map(id => (id, relExistMap(ctx.g, id, specs)))
      .toDF("node_id", "status")
      .select(
        struct(col("node_id"), col("status")).as("result"))
  }

  val registry: Map[String, ProcContext => DataFrame] = Map(
    "map.from_nodes" -> fromNodes,
    "node.relationship_types" -> relationshipTypes,
    "node.relationship_exists" -> relationshipExists,
    "node.relationships_exist" -> relationshipsExist,
    "nodes.relationship_types" -> nodesRelationshipTypes,
    "nodes.relationships_exist" -> nodesRelationshipsExist)
}
