package graft.procedures

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.GraphState
import graft.operators.{Mutations, Ranks}

/** The refactor module's structural write procedures
  * (`/root/reference/src/mage/cpp/refactor_module/algorithm/refactor.cpp`):
  * endpoint redirects, node cloning, node merging, collapse/extract.
  *
  * These are point-write procedures over an ARGUMENT list (a handful of
  * entities), so the orchestration is a bounded driver loop — but every
  * graph touch is a DataFrame mutation through the normal Mutations path
  * (tombstoned adjacency, label frames), so the underlying corpus never
  * collects. Ids allocate from a fresh id-base namespace exactly like the
  * python-module ports (PyTail2Procs).
  */
object RefactorProcs {

  import GraphState.{DstCol, IdCol, LabelsCol, SrcCol, TypeCol}

  private val Meta = Set(IdCol, LabelsCol, SrcCol, DstCol, TypeCol)

  private final case class EdgeArg(id: Long, src: Long, dst: Long, tpe: String)

  private def nodeIdOf(v: Any, what: String): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case m: Map[_, _] =>
      m.collectFirst { case (k, id: Long) if k.toString == IdCol => id }
        .getOrElse(throw new IllegalArgumentException(
          s"$what: node value lacks an id"))
    case other =>
      throw new IllegalArgumentException(s"$what: need a node, got $other")
  }

  private def edgeArgOf(v: Any, what: String): EdgeArg = v match {
    case m: Map[_, _] =>
      val mm = m.map { case (k, x) => k.toString -> x }
      (mm.get(IdCol), mm.get(SrcCol), mm.get(DstCol), mm.get(TypeCol)) match {
        case (Some(id: Long), Some(s: Long), Some(d: Long), Some(t)) =>
          EdgeArg(id, s, d, t.toString)
        case _ => throw new IllegalArgumentException(
          s"$what: need a relationship value, got $m")
      }
    case other => throw new IllegalArgumentException(
      s"$what: need a relationship, got $other")
  }

  private def listOf(v: Any): Seq[Any] = v match {
    case xs: Seq[_] => xs
    case other => Seq(other)
  }

  /** Edge-type + whole row of one edge id (the entity arg carries type,
    * so this is one pruned filter of that type's frame). */
  private def edgeRow(g: GraphState, e: EdgeArg): DataFrame =
    g.edges(e.tpe).filter(col(IdCol) === e.id)

  /** Relationship argument: an entity value (carries its type) or a bare
    * id (resolved with one per-type pruned probe). */
  private def resolveEdge(ctx: ProcContext, v: Any, what: String): EdgeArg =
    v match {
      case m: Map[_, _] => edgeArgOf(m, what)
      case idv @ (_: Long | _: Int) =>
        val id = nodeIdOf(idv, what)
        ctx.g.edgeTypes.iterator
          .flatMap { t =>
            ctx.g.edges(t).filter(col(IdCol) === id)
              .select(col(IdCol), col(SrcCol), col(DstCol)).collect()
              .map(r => EdgeArg(r.getLong(0), r.getLong(1), r.getLong(2), t))
          }
          .nextOption()
          .getOrElse(throw new IllegalArgumentException(
            s"$what: unknown relationship $id"))
      case other => throw new IllegalArgumentException(
        s"$what: need a relationship, got $other")
    }

  private def relStruct(rows: DataFrame): DataFrame =
    rows.select(struct(rows.columns.map(col).toSeq: _*).as("relationship"))

  /** `refactor.from(relationship, newFrom)` / `refactor.to(relationship,
    * newTo)` — redirect one endpoint (refactor.cpp:38/60: a NEW
    * relationship is created with the old one's type + properties and the
    * old one deleted, so the id changes). Yields the new relationship. */
  private def redirect(
      ctx: ProcContext, newFrom: Boolean): (GraphState, DataFrame) = {
    val what = if (newFrom) "refactor.from" else "refactor.to"
    val e = resolveEdge(ctx, ctx.args.head, what)
    val n = nodeIdOf(
      ctx.args.lift(1).getOrElse(throw new IllegalArgumentException(
        s"$what: need (relationship, node)")), what)
    var g = ctx.g
    val base = g.idBase + 2
    val newId = (base << 48) + (1L << 47)
    val rows = edgeRow(g, e)
      .withColumn(IdCol, lit(newId))
      .withColumn(SrcCol, if (newFrom) lit(n) else col(SrcCol))
      .withColumn(DstCol, if (newFrom) col(DstCol) else lit(n))
      .localCheckpoint(true)
    require(rows.count() == 1, s"$what: unknown relationship ${e.id}")
    import ctx.spark.implicits._
    g = Mutations.createEdges(g, e.tpe, rows)
    g = Mutations.deleteEdges(g, e.tpe, Seq(e.id).toDF(IdCol))
    (g.withIdBase(base), relStruct(rows))
  }

  /** `refactor.clone_nodes(nodes, withRelationships=false,
    * skipProperties=[])` (refactor.cpp:397): one clone per node — labels
    * and (non-skipped) properties copied; with `withRelationships` every
    * incident relationship is re-created against the clone WITHOUT
    * properties (the reference clones the topology only). Yields
    * (input, output, error). */
  def cloneNodes(ctx: ProcContext): (GraphState, DataFrame) = {
    val ids = listOf(ctx.args.headOption.getOrElse(Nil))
      .map(nodeIdOf(_, "refactor.clone_nodes"))
    val withRels = ctx.args.lift(1) match {
      case Some(b: Boolean) => b
      case _ => false
    }
    val skip = ctx.args.lift(2) match {
      case Some(xs: Seq[_]) => xs.map(_.toString)
      case _ => Nil
    }
    var g = ctx.g
    val base = g.idBase + 2
    var nodeCursor = 0L
    var edgeCursor = 0L
    val pairs = ids.map { oldId =>
      val newId = (base << 48) + nodeCursor
      nodeCursor += 1
      (oldId, newId)
    }
    pairs.foreach { case (oldId, newId) =>
      val labels = labelsOf(g, oldId)
      val targets = if (labels.isEmpty) Seq("_") else labels
      targets.foreach { l =>
        var row = g.nodes(l).filter(col(IdCol) === oldId)
          .withColumn(IdCol, lit(newId))
        skip.filter(row.columns.contains).foreach(p => row = row.drop(p))
        g = Mutations.createNodes(g, l, row.localCheckpoint(true))
      }
      if (targets.size > 1) g = g.withOverlap
      if (withRels) g.edgeTypes.foreach { t =>
        val e = ctx.g.edges(t)
        // topology-only clones: id/src/dst/type, no property copy
        val incoming = e.filter(col(DstCol) === oldId).select(
          col(IdCol), col(SrcCol), lit(newId).as(DstCol), col(TypeCol))
        val outgoing = e.filter(col(SrcCol) === oldId).select(
          col(IdCol), lit(newId).as(SrcCol), col(DstCol), col(TypeCol))
        val both = incoming.unionByName(outgoing)
        val n = both.count()
        if (n > 0) {
          val rows = Ranks.orderedIds(both, "__idx", IdCol)
            .withColumn(
              IdCol,
              lit((base << 48) + (1L << 47)) + lit(edgeCursor) + col("__idx"))
            .drop("__idx")
            .localCheckpoint(true)
          edgeCursor += n
          g = Mutations.createEdges(g, t, rows)
        }
      }
    }
    (g.withIdBase(base), entityYield(g, pairs))
  }

  /** The one-row frame of a node id, probed per label frame (never a
    * cross-frame union — frames may disagree on a property's type). */
  private def nodeFrameOf(g: GraphState, id: Long): DataFrame =
    g.nodeLabels.iterator
      .map(l => g.nodes(l).filter(col(IdCol) === id))
      .find(df => !df.isEmpty)
      .getOrElse(throw new IllegalArgumentException(
        s"refactor: unknown node $id"))

  /** Collected (non-meta, non-null) properties of one node id. */
  private def propsOf(g: GraphState, id: Long): Map[String, Any] = {
    val r = nodeFrameOf(g, id).collect()(0)
    r.schema.fieldNames.toSeq
      .filterNot(Meta)
      .flatMap(f => Option(r.getAs[Any](f)).map(f -> _))
      .toMap
  }

  private def labelsOf(g: GraphState, id: Long): Seq[String] = {
    val r = nodeFrameOf(g, id).select(col(LabelsCol)).collect()(0)
    Option(r.getSeq[String](0)).getOrElse(Seq.empty)
  }

  /** (input, output, error) yield rows: each output entity's struct comes
    * from its own frame (schemas across outputs union NULL-padded). */
  private def entityYield(
      g: GraphState, pairs: Seq[(Long, Long)]): DataFrame = {
    val frames = pairs.map { case (in, out) =>
      val f = nodeFrameOf(g, out)
      f.select(lit(in).as("input") +: f.columns.map(col).toSeq: _*)
    }
    val all = frames.reduce(_.unionByName(_, allowMissingColumns = true))
    val entCols = all.columns.filterNot(_ == "input")
    all.select(
      col("input"),
      struct(entCols.map(col).toSeq: _*).as("output"),
      lit("").as("error"))
  }

  /** Literal column for a driver-side value; heterogeneous lists (the
    * `combine` strategy makes them) variant-encode per element like the
    * engine's mixed-type representation. */
  private def litAny(ctx: ProcContext, v: Any): Column = v match {
    case null => lit(null)
    case s: Seq[_] =>
      val cols = s.map(litAny(ctx, _))
      val plain = array(cols: _*)
      try {
        ctx.spark.range(1).select(plain).schema // force analysis
        plain
      } catch {
        case _: Throwable =>
          array(cols.map(c =>
            try_variant_get(
              parse_json(to_json(struct(c.as("v")))), "$.v", "variant")): _*)
      }
    case m: Map[_, _] =>
      struct(m.toSeq.map { case (k, x) =>
        litAny(ctx, x).as(k.toString)
      }: _*)
    case r: org.apache.spark.sql.Row =>
      struct(r.schema.fieldNames.toSeq.map(f =>
        litAny(ctx, r.getAs[Any](f)).as(f)): _*)
    case other => lit(other)
  }

  /** `refactor.merge_nodes(nodes, config)` (refactor.cpp:923): merge every
    * node into the FIRST — properties per strategy (`combine` collects
    * colliding values into lists, `override`/`overwrite` takes the
    * source's, `discard` keeps the target's), labels unioned,
    * `mergeRels: true` re-creates the sources' relationships (with
    * properties) against the target, sources detach-deleted. Yields the
    * merged node. */
  def mergeNodes(ctx: ProcContext): (GraphState, DataFrame) = {
    val ids = listOf(ctx.args.headOption.getOrElse(Nil))
      .map(nodeIdOf(_, "refactor.merge_nodes"))
    require(ids.nonEmpty, "The nodes list cannot be empty")
    val cfg = ctx.args.lift(1) match {
      case Some(m: Map[_, _]) => m.map { case (k, x) => k.toString -> x }
      case _ => Map.empty[String, Any]
    }
    val mergeRels = cfg.get("mergeRels") match {
      case Some(b: Boolean) => b
      case None => false
      case _ => throw new IllegalArgumentException(
        "mergeRels parameter must either be true or false")
    }
    val strat = cfg.get("properties").orElse(cfg.get(".*"))
      .map(_.toString.toLowerCase).getOrElse("combine")
    require(
      Set("combine", "discard", "override", "overwrite")(strat),
      "Property strategy must be one of: combine, discard, " +
        "override/overwrite")
    var g = ctx.g
    val base = g.idBase + 2
    var edgeCursor = 0L
    val target = ids.head
    val targetProps0 = propsOf(g, target)
    var merged = targetProps0
    import ctx.spark.implicits._
    ids.tail.foreach { source =>
      val sourceProps = propsOf(g, source)
      strat match {
        case "combine" =>
          sourceProps.foreach { case (k, v) =>
            merged += (k -> (merged.get(k) match {
              case Some(xs: Seq[_]) => xs :+ v
              case Some(x) => Seq(x, v)
              case None => v
            }))
          }
        case "override" | "overwrite" => merged ++= sourceProps
        case _ => () // discard keeps the target's
      }
      val addLabels = labelsOf(g, source).diff(labelsOf(g, target))
      if (addLabels.nonEmpty)
        g = Mutations.updateLabelsByIds(
          g, Seq(target).toDF(IdCol), addLabels, add = true)
      if (mergeRels) ctx.g.edgeTypes.foreach { t =>
        val e = ctx.g.edges(t)
        val incoming = e.filter(col(DstCol) === source)
          .withColumn(DstCol, lit(target))
        val outgoing = e.filter(col(SrcCol) === source)
          .withColumn(SrcCol, lit(target))
        val both = incoming.unionByName(outgoing)
        val n = both.count()
        if (n > 0) {
          val rows = Ranks.orderedIds(both, "__idx", IdCol)
            .withColumn(
              IdCol,
              lit((base << 48) + (1L << 47)) + lit(edgeCursor) + col("__idx"))
            .drop("__idx")
            .localCheckpoint(true)
          edgeCursor += n
          g = Mutations.createEdges(g, t, rows)
        }
      }
      g = Mutations.deleteNodes(g, Seq(source).toDF(IdCol), detach = true)
    }
    (merged.toSet -- targetProps0.toSet).foreach { case (k, v) =>
      g = Mutations.setPropertyByIds(
        g,
        Seq(target).toDF(IdCol).withColumn("__nv", litAny(ctx, v)),
        k)
    }
    val node = nodeFrameOf(g, target)
    (
      g.withIdBase(base),
      node.select(struct(node.columns.map(col).toSeq: _*).as("node")))
  }

  /** `refactor.collapse_node(node|id|list, type)` (refactor.cpp:502): a
    * node with EXACTLY one incoming and one outgoing relationship is
    * replaced by one `type` relationship from its in-neighbour to its
    * out-neighbour, carrying the node's properties; self-loops refuse.
    * Yields (id_collapsed, new_relationship) per node. */
  def collapseNode(ctx: ProcContext): (GraphState, DataFrame) = {
    val ids = listOf(ctx.args.headOption.getOrElse(Nil))
      .map(nodeIdOf(_, "refactor.collapse_node"))
    val tpe = ctx.args.lift(1).map(_.toString).getOrElse(
      throw new IllegalArgumentException("refactor.collapse_node: need type"))
    var g = ctx.g
    val base = g.idBase + 2
    var cursor = 0L
    var yields = Vector.empty[(Long, Long)] // (collapsed id, new edge id)
    ids.foreach { id =>
      val incident = g.edgeTypes.map { t =>
        g.edges(t)
          .filter(col(SrcCol) === id || col(DstCol) === id)
          .select(col(IdCol), col(SrcCol), col(DstCol))
      }.reduceOption(_ unionByName _).getOrElse(GraphState.emptyEdgeFrame)
      val rows = incident.collect()
      val inRows = rows.filter(_.getLong(2) == id)
      val outRows = rows.filter(_.getLong(1) == id)
      if (inRows.length != 1 || outRows.length != 1)
        throw new IllegalArgumentException(
          "Out and in degree of the nodes both must be 1!")
      val from = inRows(0).getLong(1)
      val to = outRows(0).getLong(2)
      if (from == id && to == id)
        throw new IllegalArgumentException(
          "Nodes with self relationships are non collapsible!")
      val newId = (base << 48) + (1L << 47) + cursor
      cursor += 1
      val props = propsOf(g, id)
      var row = ctx.spark.range(1).select(
        lit(newId).as(IdCol), lit(from).as(SrcCol), lit(to).as(DstCol),
        lit(tpe).as(TypeCol))
      props.foreach { case (k, v) =>
        row = row.withColumn(k, litAny(ctx, v))
      }
      g = Mutations.createEdges(g, tpe, row.localCheckpoint(true))
      import ctx.spark.implicits._
      g = Mutations.deleteNodes(g, Seq(id).toDF(IdCol), detach = true)
      yields :+= ((id, newId))
    }
    import ctx.spark.implicits._
    val pairDf = yields.toDF("id_collapsed", "__eid")
    val edges = g.edges(tpe)
    val joined = pairDf.join(edges, pairDf("__eid") === edges(IdCol))
    (
      g.withIdBase(base),
      joined.select(
        col("id_collapsed"),
        struct(edges.columns.map(edges(_)).toSeq: _*)
          .as("new_relationship")))
  }

  /** `refactor.extract_node(rel|id|list, labels, outType, inType)`
    * (refactor.cpp:805): each relationship becomes a NODE carrying its
    * properties and labels, spliced in as
    * from -[inType]-> node -[outType]-> to; the relationship is deleted.
    * Yields (input, output, error). */
  def extractNode(ctx: ProcContext): (GraphState, DataFrame) = {
    val what = "refactor.extract_node"
    val relArgs = listOf(ctx.args.headOption.getOrElse(Nil))
    val labels = ctx.args.lift(1) match {
      case Some(xs: Seq[_]) => xs.map(_.toString)
      case Some(s: String) => Seq(s)
      case _ => Nil
    }
    val outType = ctx.args.lift(2).map(_.toString).getOrElse(
      throw new IllegalArgumentException(s"$what: need outType"))
    val inType = ctx.args.lift(3).map(_.toString).getOrElse(
      throw new IllegalArgumentException(s"$what: need inType"))
    val rels = relArgs.map(resolveEdge(ctx, _, what))
    var g = ctx.g
    val base = g.idBase + 2
    var nodeCursor = 0L
    var edgeCursor = 0L
    var yields = Vector.empty[(Long, Long)] // (old rel id, new node id)
    rels.foreach { e =>
      val newNode = (base << 48) + nodeCursor
      nodeCursor += 1
      // the node takes the relationship's properties
      var row = edgeRow(g, e)
        .withColumn(IdCol, lit(newNode))
        .withColumn(LabelsCol, array(labels.map(lit): _*).cast("array<string>"))
        .drop(SrcCol, DstCol, TypeCol)
        .localCheckpoint(true)
      require(row.count() == 1, s"$what: unknown relationship ${e.id}")
      val targets = if (labels.isEmpty) Seq("_") else labels
      targets.foreach(l => g = Mutations.createNodes(g, l, row))
      if (targets.size > 1) g = g.withOverlap
      val eIn = (base << 48) + (1L << 47) + edgeCursor
      val eOut = eIn + 1
      edgeCursor += 2
      g = Mutations.createEdges(
        g, inType,
        ctx.spark.range(1).select(
          lit(eIn).as(IdCol), lit(e.src).as(SrcCol),
          lit(newNode).as(DstCol), lit(inType).as(TypeCol)))
      g = Mutations.createEdges(
        g, outType,
        ctx.spark.range(1).select(
          lit(eOut).as(IdCol), lit(newNode).as(SrcCol),
          lit(e.dst).as(DstCol), lit(outType).as(TypeCol)))
      import ctx.spark.implicits._
      g = Mutations.deleteEdges(g, e.tpe, Seq(e.id).toDF(IdCol))
      yields :+= ((e.id, newNode))
    }
    (g.withIdBase(base), entityYield(g, yields))
  }

  val writeRegistry
      : Map[String, ProcContext => (GraphState, DataFrame)] = Map(
    "refactor.from" -> (redirect(_, newFrom = true)),
    "refactor.to" -> (redirect(_, newFrom = false)),
    "refactor.clone_nodes" -> cloneNodes,
    "refactor.merge_nodes" -> mergeNodes,
    "refactor.collapse_node" -> collapseNode,
    "refactor.extract_node" -> extractNode)
}
