package graft.procedures

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.GraphState

/** The remaining reference query_modules: the `schema` module
  * (`query_modules/schema.cpp` — Neo4j-compatible introspection +
  * `schema.assert`), `convert.to_tree` (`query_modules/convert.c`),
  * and the `mgps` / `wcc` compatibility shims (`mgps.py`,
  * `mgps_cpp.cpp`, `wcc.py`).
  *
  * `schema.node_type_properties` / `rel_type_properties` are FULLY
  * distributed: one groupBy over the label-set (plus two label joins
  * for the relationship form) and per-property count aggregates — the
  * reference walks every node in-process; at 100 TB this is the only
  * shape that survives. `sample` > 0 raises: the reference samples in
  * storage-iteration order, which a distributed scan cannot reproduce.
  */
object SchemaModuleProcs {

  import GraphState.{DstCol, IdCol, LabelsCol, SrcCol, TypeCol}

  private val Meta = Set(IdCol, LabelsCol, SrcCol, DstCol, TypeCol)

  /** Spark type → the reference's JDBC-friendly type name
    * (schema.cpp:60-118 TypeOf). */
  private def typeName(dt: DataType): String = dt match {
    case BooleanType => "Boolean"
    case ByteType | ShortType | IntegerType | LongType => "Integer"
    case FloatType | DoubleType | _: DecimalType => "Float"
    case StringType => "String"
    case _: ArrayType => "List"
    case _: MapType | _: StructType => "Map"
    case DateType => "Date"
    case TimestampType | TimestampNTZType => "LocalDateTime"
    case _: DayTimeIntervalType | _: YearMonthIntervalType => "Duration"
    case _ => "String"
  }

  private def cfg(ctx: ProcContext): Map[String, Any] =
    ctx.args.headOption match {
      case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v }
      case _ => Map.empty
    }

  private def strSet(m: Map[String, Any], k: String): Set[String] =
    m.get(k) match {
      case Some(xs: Seq[_]) => xs.map(_.toString).toSet
      case _ => Set.empty
    }

  private def existenceConstraints(g: GraphState): Set[(String, String)] =
    g.indexes.collect {
      case d if d.kind == "existence_constraint" =>
        (d.label.getOrElse(""), d.props.headOption.getOrElse(""))
    }.toSet

  private def guardSample(m: Map[String, Any], what: String): Unit =
    m.get("sample") match {
      case Some(n: java.lang.Number) if n.longValue() > 0 =>
        throw new UnsupportedOperationException(
          s"$what: sample > 0 observes properties in the reference's " +
            "storage-iteration order, which a distributed scan cannot " +
            "reproduce — run the full scan (sample -1)")
      case _ => ()
    }

  /** `schema.node_type_properties(config)` (schema.cpp:318): one row per
    * (label set, property) with the observed type names, counts, and
    * the existence-constraint-backed `mandatory` flag. */
  def nodeTypeProperties(ctx: ProcContext): DataFrame = {
    val what = "schema.node_type_properties"
    val config = cfg(ctx)
    guardSample(config, what)
    val include = strSet(config, "includeLabels")
    val exclude = strSet(config, "excludeLabels")
    val includeRels = strSet(config, "includeRels")
    val excludeRels = strSet(config, "excludeRels")
    val spark = ctx.spark
    val g = ctx.g
    var nodes = g.allNodes
    if (includeRels.nonEmpty || excludeRels.nonEmpty) {
      def srcsOf(ts: Set[String]) = g.edgeTypes.filter(ts)
        .map(t => g.edges(t).select(col(SrcCol).as(IdCol)))
        .reduceOption(_.unionByName(_))
      if (includeRels.nonEmpty)
        nodes = srcsOf(includeRels) match {
          case Some(s) => nodes.join(s.distinct(), Seq(IdCol), "left_semi")
          case None => nodes.filter(lit(false))
        }
      srcsOf(excludeRels).foreach(s =>
        nodes = nodes.join(s.distinct(), Seq(IdCol), "left_anti"))
    }
    val propCols =
      nodes.schema.fields.filterNot(f => Meta.contains(f.name))
    val aggs = count(lit(1)).as("__total") +:
      propCols.map(f => count(col(f.name)).as(s"__c_${f.name}"))
    val grouped = nodes
      .groupBy(sort_array(col(LabelsCol)).as("__labels"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // one row per distinct label SET — catalog-sized
    val mandatorySet = existenceConstraints(g)
    val rows = mutable.ArrayBuffer.empty[Row]
    grouped.foreach { r =>
      val labels =
        Option(r.getSeq[String](0)).getOrElse(Seq.empty[String])
      if ((include.isEmpty || labels.exists(include)) &&
        !(exclude.nonEmpty && labels.exists(exclude))) {
        val nodeType = labels.map(l => s":`$l`").mkString
        val total = r.getLong(1)
        var emitted = 0
        propCols.zipWithIndex.foreach { case (f, i) =>
          val obs = r.getLong(2 + i)
          if (obs > 0) {
            emitted += 1
            val mandatory =
              labels.exists(l => mandatorySet((l, f.name)))
            rows += Row(nodeType, labels, f.name,
              Seq(typeName(f.dataType)), mandatory, obs, total)
          }
        }
        if (emitted == 0)
          rows += Row(nodeType, labels, "", Seq.empty[String], false,
            0L, total)
      }
    }
    schemaFrame(spark, rows.toSeq, node = true)
  }

  /** `schema.rel_type_properties(config)` (schema.cpp:419): one row per
    * (type, source label set, target label set, property). */
  def relTypeProperties(ctx: ProcContext): DataFrame = {
    val what = "schema.rel_type_properties"
    val config = cfg(ctx)
    guardSample(config, what)
    val includeRels = strSet(config, "includeRels")
    val excludeRels = strSet(config, "excludeRels")
    val spark = ctx.spark
    val g = ctx.g
    val types = g.edgeTypes
      .filter(t => includeRels.isEmpty || includeRels(t))
      .filterNot(excludeRels)
    val labelsOf = g.allNodes
      .select(col(IdCol), sort_array(col(LabelsCol)).as("__l"))
    val rows = mutable.ArrayBuffer.empty[Row]
    types.foreach { t =>
      val e = g.edges(t)
      val propCols =
        e.schema.fields.filterNot(f => Meta.contains(f.name))
      val aggs = count(lit(1)).as("__total") +:
        propCols.map(f => count(col(f.name)).as(s"__c_${f.name}"))
      val grouped = e
        .join(labelsOf.withColumnRenamed("__l", "__src_l"),
          e(SrcCol) === labelsOf(IdCol))
        .drop(labelsOf(IdCol))
        .join(
          labelsOf.withColumnRenamed("__l", "__dst_l"),
          col(DstCol) === labelsOf(IdCol))
        .groupBy(col("__src_l"), col("__dst_l"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      grouped.foreach { r =>
        val src = Option(r.getSeq[String](0)).getOrElse(Seq.empty)
        val dst = Option(r.getSeq[String](1)).getOrElse(Seq.empty)
        val total = r.getLong(2)
        var emitted = 0
        propCols.zipWithIndex.foreach { case (f, i) =>
          val obs = r.getLong(3 + i)
          if (obs > 0) {
            emitted += 1
            rows += Row(s":`$t`", src, dst, f.name,
              Seq(typeName(f.dataType)), false, obs, total)
          }
        }
        if (emitted == 0)
          rows += Row(s":`$t`", src, dst, "", Seq.empty[String], false,
            0L, total)
      }
    }
    schemaFrame(spark, rows.toSeq, node = false)
  }

  private def schemaFrame(
      spark: SparkSession, rows: Seq[Row], node: Boolean): DataFrame = {
    val fields =
      if (node)
        Seq(
          StructField("nodeType", StringType),
          StructField("nodeLabels", ArrayType(StringType)))
      else
        Seq(
          StructField("relType", StringType),
          StructField("sourceNodeLabels", ArrayType(StringType)),
          StructField("targetNodeLabels", ArrayType(StringType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
      StructType(fields ++ Seq(
        StructField("propertyName", StringType),
        StructField("propertyTypes", ArrayType(StringType)),
        StructField("mandatory", BooleanType),
        StructField("propertyObservations", LongType),
        StructField("totalObservations", LongType))))
  }

  /** `schema.assert(indices, unique_constraints, existence_constraints,
    * drop_existing)` (schema.cpp:932): reconcile the registries against
    * the asserted maps; yields (label, key, keys, unique, action) with
    * Created / Kept / Dropped. Indices land in the REAL index registry
    * (SHOW INDEX INFO reflects them); constraints persist as
    * `existence_constraint` / `unique_constraint` registry entries (the
    * engine's constraint store). */
  def schemaAssert(ctx: ProcContext): (GraphState, DataFrame) = {
    def mapArg(i: Int): Map[String, Seq[Any]] = ctx.args.lift(i) match {
      case Some(m: Map[_, _]) => m.map {
        case (k, xs: Seq[_]) => k.toString -> xs
        case (k, other) => k.toString -> Seq(other)
      }
      case _ => Map.empty
    }
    val indices = mapArg(0)
    val unique = mapArg(1)
    val existence = mapArg(2)
    val dropExisting = ctx.args.lift(3) match {
      case Some(b: Boolean) => b
      case _ => true
    }
    var g = ctx.g
    val rows = mutable.ArrayBuffer.empty[Row]
    def emit(label: String, key: String, keys: Seq[String],
        uniq: Boolean, action: String): Unit =
      rows += Row(label, key, keys, uniq, action)

    // ---- indices (kinds label / label+property) ----
    val assertedIdx = mutable.HashSet.empty[(String, String)]
    indices.foreach { case (label, props0) =>
      val props = props0.map(_.toString)
      val keys = if (props.isEmpty) Seq("") else props
      keys.foreach { p =>
        val kind = if (p.isEmpty) "label" else "label+property"
        val pr = if (p.isEmpty) Nil else Seq(p)
        assertedIdx += ((label, p))
        val exists = g.indexes.exists(d =>
          d.kind == kind && d.label.contains(label) && d.props == pr)
        if (exists) emit(label, p, Seq(p), uniq = false, "Kept")
        else {
          g = g.withIndex(GraphState.IndexDef(kind, Some(label), pr))
          emit(label, p, Seq(p), uniq = false, "Created")
        }
      }
    }
    if (dropExisting) {
      val doomed = g.indexes.filter(d =>
        (d.kind == "label" || d.kind == "label+property") &&
          !assertedIdx(
            (d.label.getOrElse(""), d.props.headOption.getOrElse(""))))
      doomed.foreach(d =>
        emit(d.label.getOrElse(""), d.props.headOption.getOrElse(""),
          d.props, uniq = false, "Dropped"))
      g = g.dropIndexes(doomed.contains)
    }

    // ---- existence + unique constraints ----
    def reconcile(
        asserted: Map[String, Seq[Any]], kind: String,
        uniq: Boolean): Unit = {
      val wanted = mutable.HashSet.empty[(String, Seq[String])]
      asserted.foreach { case (label, entries) =>
        val groups: Seq[Seq[String]] =
          if (uniq)
            entries.map {
              case xs: Seq[_] => xs.map(_.toString)
              case other => Seq(other.toString)
            }
          else entries.map(e => Seq(e.toString))
        groups.foreach { props =>
          wanted += ((label, props))
          val exists = g.indexes.exists(d =>
            d.kind == kind && d.label.contains(label) && d.props == props)
          if (exists)
            emit(label, props.headOption.getOrElse(""), props, uniq, "Kept")
          else {
            g = g.withIndex(GraphState.IndexDef(kind, Some(label), props))
            emit(label, props.headOption.getOrElse(""), props, uniq,
              "Created")
          }
        }
      }
      if (dropExisting) {
        val doomed = g.indexes.filter(d =>
          d.kind == kind &&
            !wanted((d.label.getOrElse(""), d.props)))
        doomed.foreach(d =>
          emit(d.label.getOrElse(""), d.props.headOption.getOrElse(""),
            d.props, uniq, "Dropped"))
        g = g.dropIndexes(doomed.contains)
      }
    }
    reconcile(existence, "existence_constraint", uniq = false)
    reconcile(unique, "unique_constraint", uniq = true)

    val spark = ctx.spark
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows.toSeq: _*)),
      StructType(Seq(
        StructField("label", StringType),
        StructField("key", StringType),
        StructField("keys", ArrayType(StringType)),
        StructField("unique", BooleanType),
        StructField("action", StringType))))
    (g, df)
  }

  // ------------------------------------------------------------------
  // convert.to_tree (query_modules/convert.c:1449)

  private final class TNode(
      val id: Long,
      val tpe: String,
      val props: mutable.LinkedHashMap[String, Any]) {
    val children:
        mutable.LinkedHashMap[String, mutable.LinkedHashMap[Long, TNode]] =
      mutable.LinkedHashMap.empty
  }

  /** `convert.to_tree(paths, lowerCaseRels, config)` → value: nested
    * tree maps merged across paths by node id, children grouped under
    * the (optionally lowercased) relationship type, the connecting
    * edge's id/properties prefixed `<rel>.` onto the child
    * (convert.c:927-1030). The result renders as a VARIANT value (the
    * engine's runtime-typed representation). A non-empty filter config
    * raises — property filtering is not implemented. */
  def convertToTree(ctx: ProcContext): DataFrame = {
    val what = "convert.to_tree"
    val lower = ctx.args.lift(1) match {
      case Some(b: Boolean) => b
      case _ => true
    }
    ctx.args.lift(2) match {
      case Some(m: Map[_, _]) if m.nonEmpty =>
        throw new UnsupportedOperationException(
          s"$what: property filter config is not implemented — pass {}")
      case _ => ()
    }
    val paths: Seq[Map[String, Any]] = ctx.args.headOption match {
      case Some(xs: Seq[_]) => xs.collect { case m: Map[_, _] =>
        m.map { case (k, v) => k.toString -> v }
      }
      case Some(m: Map[_, _]) =>
        Seq(m.map { case (k, v) => k.toString -> v })
      case _ => Nil
    }
    val roots = mutable.LinkedHashMap.empty[Long, TNode]
    def entOf(m: Map[String, Any]): (Long, String, Seq[(String, Any)]) = {
      val id = m.get(IdCol) match {
        case Some(l: Long) => l
        case other => throw new IllegalArgumentException(
          s"$what: entity lacks an id ($other)")
      }
      val tpe = m.get(LabelsCol) match {
        case Some(ls: Seq[_]) if ls.nonEmpty => ls.head.toString
        case _ => m.get(TypeCol).map(_.toString).getOrElse("")
      }
      val props = m.toSeq
        .filterNot { case (k, v) => Meta.contains(k) || v == null }
        .sortBy(_._1)
      (id, tpe, props)
    }
    paths.foreach { p =>
      val nodes = p.get("nodes") match {
        case Some(ns: Seq[_]) => ns.collect { case m: Map[_, _] =>
          m.map { case (k, v) => k.toString -> v }
        }
        case _ => Nil
      }
      val edges = p.get("edges") match {
        case Some(es: Seq[_]) => es.collect { case m: Map[_, _] =>
          m.map { case (k, v) => k.toString -> v }
        }
        case _ => Nil
      }
      if (nodes.nonEmpty) {
        val (rid, rtpe, rprops) = entOf(nodes.head)
        var cur = roots.getOrElseUpdate(rid,
          new TNode(rid, rtpe, mutable.LinkedHashMap(rprops: _*)))
        edges.zip(nodes.drop(1)).foreach { case (em, nm) =>
          val (cid, ctpe, cprops) = entOf(nm)
          val (eid, etpe, eprops) = entOf(em)
          val relKey = if (lower) etpe.toLowerCase else etpe
          val bucket = cur.children
            .getOrElseUpdate(relKey, mutable.LinkedHashMap.empty)
          val child = bucket.getOrElseUpdate(cid,
            new TNode(cid, ctpe, mutable.LinkedHashMap(cprops: _*)))
          child.props(s"$relKey.$IdCol") = eid
          eprops.foreach { case (k, v) =>
            child.props(s"$relKey.$k") = v
          }
          cur = child
        }
      }
    }
    def jsonOf(n: TNode): String = {
      val sb = new StringBuilder("{")
      def esc(s: String) = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c => c.toString
      }
      def jv(v: Any): String = v match {
        case null => "null"
        case b: Boolean => b.toString
        case num: Long => num.toString
        case num: Int => num.toString
        case d: Double => d.toString
        case s: Seq[_] => s.map(jv).mkString("[", ",", "]")
        case m: Map[_, _] => m.map { case (k, x) =>
          "\"" + esc(k.toString) + "\":" + jv(x)
        }.mkString("{", ",", "}")
        case other => "\"" + esc(other.toString) + "\""
      }
      sb.append("\"_type\":").append(jv(n.tpe))
      sb.append(",\"_id\":").append(n.id)
      n.props.foreach { case (k, v) =>
        sb.append(",\"").append(esc(k)).append("\":").append(jv(v))
      }
      n.children.foreach { case (rel, kids) =>
        sb.append(",\"").append(esc(rel)).append("\":")
        sb.append(kids.values.map(jsonOf).mkString("[", ",", "]"))
      }
      sb.append("}").toString
    }
    val spark = ctx.spark
    import spark.implicits._
    val trees =
      if (roots.isEmpty) Seq("{}") else roots.values.map(jsonOf).toSeq
    trees.toDF("__json")
      .select(parse_json(col("__json")).as("value"))
  }

  // ------------------------------------------------------------------
  // mgps / wcc compatibility shims

  /** `mgps.components()` (mgps.py:4) — Neo4j-connector compatibility. */
  def mgpsComponents(ctx: ProcContext): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._
    Seq(
      (Seq("5.9.0"), "community", "Memgraph"),
      (Seq("5.9.0"), "community", "Neo4j Kernel"))
      .toDF("versions", "edition", "name")
  }

  /** `mgps.await_indexes(seconds)` — no-op (indexes are synchronous). */
  def mgpsAwaitIndexes(ctx: ProcContext): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._
    Seq.empty[Int].toDF("__void").select(lit(true).as("__done"))
      .filter(lit(false))
  }

  /** `mgps.validate(predicate, message, params)` (mgps.py:36,
    * mgps_cpp.cpp:75): raise message % params when predicate holds. */
  def mgpsValidate(ctx: ProcContext): DataFrame = {
    val predicate = ctx.args.headOption.contains(true)
    if (predicate) {
      val msg = ctx.args.lift(1).map(_.toString).getOrElse("")
      val params = ctx.args.lift(2) match {
        case Some(xs: Seq[_]) => xs
        case _ => Nil
      }
      throw new IllegalArgumentException(
        params.foldLeft(msg)((m, p) =>
          m.replaceFirst("%[sd]", String.valueOf(p))))
    }
    val spark = ctx.spark
    import spark.implicits._
    Seq.empty[Int].toDF("__void").select(lit(true).as("__ok"))
      .filter(lit(false))
  }

  val registry: Map[String, ProcContext => DataFrame] =
    Map[String, ProcContext => DataFrame](
      "schema.node_type_properties" -> nodeTypeProperties,
      "schema.rel_type_properties" -> relTypeProperties,
      "convert.to_tree" -> convertToTree,
      "mgps.components" -> mgpsComponents,
      "mgps.await_indexes" -> mgpsAwaitIndexes,
      "mgps.validate" -> mgpsValidate,
      "mgps_cpp.validate" -> mgpsValidate,
      // wcc.py:15 is an explicit compatibility shim over the nxalg form
      "wcc.get_components" ->
        ((ctx: ProcContext) => {
          val df = NxAlgProcs.weaklyConnectedComponentsSubgraph(ctx)
          df // identical (n_components, components) yield shape
        }))

  val writeRegistry: Map[String, ProcContext => (GraphState, DataFrame)] =
    Map("schema.assert" -> schemaAssert)
}
