package graft.procedures

import scala.util.Try

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.GraphState
import graft.core.GraphState.IndexDef

/** The registry-backed index surface — `SHOW INDEX INFO` / `SHOW VECTOR
  * INDEX INFO` statements and the reference's `text_search.*` /
  * `vector_search.*` procedures (`src/query/procedure/`, tantivy text
  * index `src/storage/v2/indices/text_index.cpp`, usearch vector index
  * `vector_index.cpp`; gql_behave text_search / vector_search features).
  *
  * The reference maintains physical tantivy/usearch indexes; here the
  * registry routes each named index to its label/property frame and the
  * "index scan" is a predicate over the columnar frame — Catalyst
  * pushdown plays the access-path role, so these procedures cost one
  * filtered scan (or one top-k sort for vector search) per call.
  */
object IndexProcs {

  // ---------- ANALYZE GRAPH ----------

  /** `ANALYZE GRAPH [ON LABELS :L …]` (interpreter.cpp:4413
    * AnalyzeGraphCreateStatistics): for every label index, (count, avg
    * degree); for every label+property index and EVERY non-empty prefix of
    * its composite key, group the label's vertices by the prefix's value
    * tuple (vertices with ALL prefix values null are not counted) and
    * report (n, groups, avg group size, chi², avg degree). The chi²
    * statistic Σ(c−avg)²/avg folds to k·Σc²/n − n, one distributed
    * aggregate — no per-group driver pass. Stats are stamped into
    * `IndexDef.config` so DELETE STATISTICS (and DROP INDEX) can clear
    * them. Yields the reference's 7-column table. */
  def analyzeGraph(
      spark: SparkSession,
      g: GraphState,
      labels: Option[Seq[String]]): (GraphState, DataFrame) = {
    def selected(l: Option[String]): Boolean =
      labels.isEmpty || l.exists(labels.get.contains)

    // per-node total degree (in + out) over every edge frame
    lazy val degrees: DataFrame = {
      val e = g.allEdges.select(
        col(GraphState.SrcCol), col(GraphState.DstCol))
      e.select(col(GraphState.SrcCol).as("__n"))
        .unionAll(e.select(col(GraphState.DstCol).as("__n")))
        .groupBy("__n").agg(count(lit(1)).as("__deg"))
    }
    def avgDegreeOf(ids: DataFrame): Double = {
      val r = ids
        .join(degrees, ids(ids.columns.head) === degrees("__n"), "left_outer")
        .agg(
          count(lit(1)).as("n"),
          coalesce(sum(col("__deg")), lit(0L)).as("d"))
        .collect()(0)
      if (r.getLong(0) == 0) 0.0 else r.getLong(1).toDouble / r.getLong(0)
    }

    val labelRows = g.indexes
      .filter(d => d.kind == "label" && selected(d.label))
      .map(_.label.get).distinct
      .map { l =>
        val frame = g.nodesOrEmpty(l)
        val n = frame.count()
        val deg = if (n == 0) 0.0
        else avgDegreeOf(frame.select(col(GraphState.IdCol).as("__id")))
        Row(l, null, n, null, null, null, deg)
      }

    val lpKeys = g.indexes
      .filter(d => d.kind == "label+property" && selected(d.label))
      .map(d => (d.label.get, d.props))
      .distinct
    // all prefixes across all composite keys, deduped
    val prefixes = lpKeys
      .flatMap { case (l, ps) => (1 to ps.size).map(k => (l, ps.take(k))) }
      .distinct
    val lpRows = prefixes.map { case (l, ps) =>
      val frame = g.nodesOrEmpty(l)
      val cols = ps.map(p =>
        if (frame.columns.contains(p)) col(p) else lit(null))
      // counted unless EVERY prefix property is null; group key through
      // canonical JSON so variant-typed (mixed) property columns group
      val counted = frame
        .filter(cols.map(_.isNotNull).reduce(_ || _))
        .withColumn(
          "__gk",
          to_json(struct(cols.zipWithIndex.map { case (c, i) =>
            c.as(s"p$i")
          }: _*)))
      val grouped = counted.groupBy("__gk").agg(count(lit(1)).as("__c"))
      val agg = grouped.agg(
        coalesce(sum(col("__c")), lit(0L)).as("n"),
        count(lit(1)).as("k"),
        coalesce(sum(col("__c") * col("__c")), lit(0L)).as("s2"))
        .collect()(0)
      val (n, k, s2) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
      val avgGroup = if (k == 0) 0.0 else n.toDouble / k
      val chi = if (n == 0) 0.0 else k.toDouble * s2 / n - n
      val deg =
        if (n == 0) 0.0
        else avgDegreeOf(
          counted.select(col(GraphState.IdCol).as("__id")))
      Row(l, ps, n, k, avgGroup, chi, deg)
    }

    val out = spark.createDataFrame(
      new java.util.ArrayList[Row](
        java.util.Arrays.asList((labelRows ++ lpRows): _*)),
      StructType(Seq(
        StructField("label", StringType),
        StructField("property", ArrayType(StringType)),
        StructField("num estimation nodes", LongType),
        StructField("num groups", LongType),
        StructField("avg group size", DoubleType),
        StructField("chi-squared value", DoubleType),
        StructField("avg degree", DoubleType))))
    val stamped = g.mapIndexes { d =>
      if ((d.kind == "label" || d.kind == "label+property") &&
        selected(d.label))
        d.copy(config = d.config + ("__stats" -> true))
      else d
    }
    (stamped, out)
  }

  /** `ANALYZE GRAPH [ON LABELS …] DELETE STATISTICS`: clears the stamps
    * and yields one (label, property) row per index whose stats existed —
    * stats on a dropped index are already gone (indices.feature). */
  def analyzeDeleteStats(
      spark: SparkSession,
      g: GraphState,
      labels: Option[Seq[String]]): (GraphState, DataFrame) = {
    def selected(l: Option[String]): Boolean =
      labels.isEmpty || l.exists(labels.get.contains)
    val hit = g.indexes.filter(d =>
      d.config.contains("__stats") && selected(d.label))
    val rows = hit.map(d =>
      Row(d.label.orNull, if (d.kind == "label") null else d.props))
    val out = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
      StructType(Seq(
        StructField("label", StringType),
        StructField("property", ArrayType(StringType)))))
    val cleared = g.mapIndexes(d =>
      if (d.config.contains("__stats") && selected(d.label))
        d.copy(config = d.config - "__stats")
      else d)
    (cleared, out)
  }

  // ---------- SHOW INDEX INFO ----------

  private def typeString(d: IndexDef): String = d.kind match {
    case "label" => "label"
    case "label+property" =>
      if (d.config.get("order").exists(_.toString.toUpperCase == "DESC"))
        "label+property (DESC)"
      else "label+property"
    case "point" => "point"
    case "text" => s"label_text (name: ${d.name.getOrElse("")})"
    case "text-edge" => s"edge-type_text (name: ${d.name.getOrElse("")})"
    case "edge" => "edge-type+property"
    case "edge-property" => "edge-property"
    case "vector" => "label+property_vector"
    case "vector-edge" => "edge-type+property_vector"
    case other => other
  }

  private def isEdgeKind(k: String): Boolean =
    k == "edge" || k == "edge-property" || k == "vector-edge" ||
      k == "text-edge"

  private def frameOf(g: GraphState, d: IndexDef): DataFrame =
    if (isEdgeKind(d.kind))
      d.label match {
        case Some(spec) if GraphState.LabelSpec.isWildcard(spec) => g.allEdges
        case Some(spec) if GraphState.LabelSpec.parts(spec).size > 1 =>
          g.edgesOfTypes(GraphState.LabelSpec.parts(spec))
        case Some(l) => g.edgesOfTypes(Seq(l))
        case None => g.allEdges
      }
    else
      d.label match {
        case Some(spec) if GraphState.LabelSpec.isWildcard(spec) => g.allNodes
        case Some(spec) if GraphState.LabelSpec.parts(spec).size > 1 =>
          // composite spec: row-level label predicate over the full node
          // union (AND needs every label; OR dedups a multi-label row)
          g.allNodes.filter(GraphState.LabelSpec.rowPredicate(
            spec, col(GraphState.LabelsCol)))
        case Some(l) => g.nodesOrEmpty(l)
        case None => GraphState.emptyNodeFrame
      }

  /** Nested-path column (`a.b.c`); None when the top column is absent. */
  private def pathCol(f: DataFrame, p: String): Option[Column] = {
    val segs = p.split("\\.")
    if (!f.columns.contains(segs.head)) None
    else Try(segs.tail.foldLeft(col(segs.head))(_.getField(_))).toOption
  }

  /** Indexed-entry count: rows of the frame carrying every indexed
    * property (the registry's count column / vector `size`). */
  private def countOf(g: GraphState, d: IndexDef): Long = {
    val f = frameOf(g, d)
    if (d.props.isEmpty) f.count()
    else {
      val conds = d.props.map(p => pathCol(f, p).map(_.isNotNull))
      if (conds.exists(_.isEmpty)) 0L
      else f.filter(conds.flatten.reduce(_ && _)).count()
    }
  }

  /** `SHOW INDEX INFO` (interpreter.cpp SHOW INDEX): one row per
    * registered index — index type, label, property, count. The property
    * column is a single string when every listed index has exactly one
    * key, a list otherwise (composite / empty — matching the reference's
    * dynamically-typed cell). */
  /** Kinds whose property cell is a LIST in the reference's SHOW output
    * (composite/empty forms); the others print the single prop as a
    * plain string. */
  private def listPropCell(kind: String): Boolean =
    kind == "label+property" || kind == "text" || kind == "text-edge"

  def showIndexInfo(spark: SparkSession, g: GraphState): DataFrame = {
    val asString =
      g.indexes.nonEmpty && g.indexes.forall(d =>
        !listPropCell(d.kind) && d.props.size == 1)
    val rows = g.indexes.map { d =>
      val labelCell = d.label match {
        case Some("*") => "*"
        case Some(l) if d.kind.startsWith("vector") => s":$l"
        case Some(l) => l
        case None => null
      }
      val propCell: Any =
        if (asString) d.props.head else d.props
      Row(typeString(d), labelCell, propCell, countOf(g, d))
    }
    val propType: DataType =
      if (asString) StringType else ArrayType(StringType)
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
      StructType(Seq(
        StructField("index type", StringType),
        StructField("label", StringType),
        StructField("property", propType),
        StructField("count", LongType))))
  }

  /** `SHOW DESCRIPTIONS` (descriptions.feature): one row per registered
    * schema description. The label cell is the label combo (list) for
    * label-keyed kinds and the type/database name (string) otherwise —
    * rendered per call like the reference's dynamically-typed cell. */
  def showDescriptions(spark: SparkSession, g: GraphState): DataFrame = {
    val ds = g.descriptions
    val anyList = ds.exists(_.kind.startsWith("label"))
    val rows = ds.map { d =>
      val labelCell: Any = d.kind match {
        case k if k.startsWith("label") => d.labels
        case k if k.startsWith("edge type") => d.edgeType.orNull
        case "database" => d.db.orNull
        case _ => null
      }
      Row(
        d.kind,
        labelCell,
        d.startLabels.orNull,
        d.endLabels.orNull,
        d.prop.orNull,
        d.description)
    }
    val labelType: DataType =
      if (anyList) ArrayType(StringType) else StringType
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
      StructType(Seq(
        StructField("type", StringType),
        StructField("label", labelType),
        StructField("start_node_labels", ArrayType(StringType)),
        StructField("end_node_labels", ArrayType(StringType)),
        StructField("property", StringType),
        StructField("description", StringType))))
  }

  /** Minimal JSON rendering for SHOW PARAMETERS value cells (the
    * reference prints stored values as JSON). */
  private def jsonOf(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.replace("\"", "\\\"") + "\""
    case b: Boolean => b.toString
    case n: Long => n.toString
    case n: Int => n.toString
    case n: Double =>
      if (n == n.floor && !n.isInfinite) n.toLong.toString else n.toString
    case xs: Seq[_] => xs.map(jsonOf).mkString("[", ",", "]")
    case m: Map[_, _] =>
      m.map { case (k, x) => s""""$k":${jsonOf(x)}""" }
        .mkString("{", ",", "}")
    case other => "\"" + other.toString + "\""
  }

  /** `SHOW PARAMETERS` (server_side_parameters.feature). */
  def showParameters(spark: SparkSession, g: GraphState): DataFrame = {
    val rows = g.serverParams.toSeq.sortBy(_._1).map {
      case (name, (value, scope)) => Row(name, jsonOf(value), scope)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
      StructType(Seq(
        StructField("name", StringType),
        StructField("value", StringType),
        StructField("scope", StringType))))
  }

  private def roundCapacity(c: Long): Long = math.max(64L, ((c + 63) / 64) * 64)

  /** `SHOW VECTOR INDEX INFO` / `CALL vector_search.show_index_info()`. */
  def showVectorIndexInfo(spark: SparkSession, g: GraphState): DataFrame = {
    val rows = g.indexes.filter(_.kind.startsWith("vector")).map { d =>
      val cfg = d.config
      def num(k: String, dflt: Long) =
        cfg.get(k).map(_.toString.toDouble.toLong).getOrElse(dflt)
      Row(
        roundCapacity(num("capacity", 64)),
        num("dimension", 0),
        d.name.getOrElse(""),
        d.label.map(l => if (l == "*") "*" else ":" + l).orNull,
        d.props.headOption.orNull,
        cfg.get("metric").map(_.toString).getOrElse("l2sq"),
        countOf(g, d),
        cfg.get("scalar_kind").map(_.toString).getOrElse("f32"),
        typeString(d))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
      StructType(Seq(
        StructField("capacity", LongType),
        StructField("dimension", LongType),
        StructField("index_name", StringType),
        StructField("label", StringType),
        StructField("property", StringType),
        StructField("metric", StringType),
        StructField("size", LongType),
        StructField("scalar_kind", StringType),
        StructField("index_type", StringType))))
  }

  // ---------- text search query language ----------

  /** tantivy-style query subset: `data.<prop>:<term>` atoms, parentheses,
    * AND / OR (text_search.feature). */
  private sealed trait Q
  private final case class Atom(prop: String, term: String) extends Q
  private final case class AndQ(l: Q, r: Q) extends Q
  private final case class OrQ(l: Q, r: Q) extends Q

  private def parseQuery(s: String): Q = {
    val toks = s
      .replace("(", " ( ")
      .replace(")", " ) ")
      .trim
      .split("\\s+")
      .toList
    def expr(ts: List[String]): (Q, List[String]) = {
      var (l, rest) = term(ts)
      while (rest.nonEmpty && (rest.head == "AND" || rest.head == "OR")) {
        val op = rest.head
        val (r, rest2) = term(rest.tail)
        l = if (op == "AND") AndQ(l, r) else OrQ(l, r)
        rest = rest2
      }
      (l, rest)
    }
    def term(ts: List[String]): (Q, List[String]) = ts match {
      case "(" :: tail =>
        val (q, rest) = expr(tail)
        require(rest.headOption.contains(")"), s"unbalanced parens in '$s'")
        (q, rest.tail)
      case t :: tail if t.contains(":") =>
        val Array(f, v) = t.split(":", 2)
        require(
          f.startsWith("data."),
          s"text query fields are data.<property>, got '$f'")
        (Atom(f.stripPrefix("data."), v), tail)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported text query token: ${other.headOption.getOrElse("")}")
    }
    val (q, rest) = expr(toks)
    require(rest.isEmpty, s"trailing tokens in text query '$s'")
    q
  }

  /** Search options (third procedure argument, text_search.feature fuzzy
    * scenarios): limit, fuzzy_distance (0-2), fuzzy_transpositions,
    * fuzzy_prefix — unknown keys raise like the reference. */
  private final case class TextOpts(
      limit: Option[Int],
      fuzzy: Int,
      prefix: Boolean)

  private def textOpts(arg: Option[Any]): TextOpts = arg match {
    case None => TextOpts(None, 0, prefix = false)
    case Some(m: Map[_, _]) =>
      val opts = m.map { case (k, v) => k.toString -> v }
      val known =
        Set("limit", "fuzzy_distance", "fuzzy_transpositions", "fuzzy_prefix")
      val unknown = opts.keySet -- known
      require(unknown.isEmpty, s"unknown search config: ${unknown.mkString(",")}")
      val fuzzy = opts.get("fuzzy_distance").map(_.toString.toInt).getOrElse(0)
      require(fuzzy >= 0 && fuzzy <= 2, s"fuzzy_distance must be 0-2: $fuzzy")
      TextOpts(
        opts.get("limit").map(_.toString.toInt),
        fuzzy,
        opts.get("fuzzy_prefix").exists(_.toString.toBoolean))
    case Some(other) =>
      throw new IllegalArgumentException(s"search config must be a map: $other")
  }

  private def tokens(c: Column): Column =
    split(lower(c.cast("string")), "[^a-z0-9]+")

  /** Token-match predicate — tantivy's default tokenizer semantics
    * (lowercase, split on non-alphanumerics), with optional fuzzy edit
    * distance and prefix matching over the token stream. */
  private def tokenMatch(c: Column, term: String, o: TextOpts): Column = {
    val t = term.toLowerCase
    if (o.fuzzy == 0 && !o.prefix) array_contains(tokens(c), t)
    else
      exists(
        tokens(c),
        tok =>
          if (o.prefix)
            levenshtein(substring(tok, 1, t.length), lit(t)) <= o.fuzzy
          else levenshtein(tok, lit(t)) <= o.fuzzy)
  }

  /** Atom predicate honors a property-restricted index: a field outside
    * the index's declared property set matches nothing. */
  private def queryPred(f: DataFrame, d: IndexDef, q: Q, o: TextOpts): Column =
    q match {
      case Atom(p, t) =>
        if (d.props.nonEmpty && !d.props.contains(p)) lit(false)
        else pathCol(f, p).map(tokenMatch(_, t, o)).getOrElse(lit(false))
      case AndQ(l, r) => queryPred(f, d, l, o) && queryPred(f, d, r, o)
      case OrQ(l, r) => queryPred(f, d, l, o) || queryPred(f, d, r, o)
    }

  private def atoms(q: Q): Seq[Atom] = q match {
    case a: Atom => Seq(a)
    case AndQ(l, r) => atoms(l) ++ atoms(r)
    case OrQ(l, r) => atoms(l) ++ atoms(r)
  }

  private def textIndex(g: GraphState, name: String, edge: Boolean): IndexDef =
    g.indexes
      .find(d =>
        d.name.contains(name) &&
          (if (edge) d.kind == "text-edge" else d.kind == "text"))
      .getOrElse(throw new IllegalArgumentException(
        s"no ${if (edge) "edge " else ""}text index named '$name'"))

  /** Full-entity struct column over a frame (the yielded node/edge). */
  private def entityStruct(f: DataFrame): Column =
    struct(f.columns.map(col).toSeq: _*)

  private def textSearchDf(
      ctx: ProcContext, edge: Boolean, mode: String): DataFrame = {
    val name = ctx.args.head.toString
    val q = ctx.args(1).toString
    val o = textOpts(ctx.args.lift(2))
    require(
      mode != "regex" || (o.fuzzy == 0 && !o.prefix),
      "regex_search does not take fuzzy options")
    val d = textIndex(ctx.g, name, edge)
    val f = frameOf(ctx.g, d)
    // a property-restricted index covers only its declared props; an
    // unrestricted one covers every string-typed property column
    def searchCols: Seq[String] =
      if (d.props.nonEmpty) d.props.filter(f.columns.contains)
      else
        f.schema.fields.collect {
          case sf if sf.dataType == StringType &&
            !GraphState.nodeMeta.contains(sf.name) &&
            !GraphState.edgeMeta.contains(sf.name) => sf.name
        }.toSeq
    val (pred: Column, scoreCol: Column) = mode match {
      case "query" =>
        val parsed = parseQuery(q)
        // relevance: BM25's idf per matched atom (term frequency and
        // field norms omitted — one aggregate per atom, constant per
        // call; matches the reference's rounding at corpus scale)
        val n = math.max(f.count(), 1L)
        val score = atoms(parsed)
          .map { a =>
            val m = queryPred(f, d, a, o)
            val df = f.filter(m).count()
            when(m, math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
              .otherwise(0.0)
          }
          .reduce(_ + _)
        (queryPred(f, d, parsed, o), score)
      case "all" =>
        val cands = searchCols.map(c => tokenMatch(col(c), q, o))
        (if (cands.isEmpty) lit(false) else cands.reduce(_ || _), lit(1.0))
      case "regex" =>
        // case-insensitive full-token regex (tantivy regex over the
        // lowercased token stream; the pattern is lowercased to match)
        val pat = "^" + q.toLowerCase + "$"
        val cands = searchCols.map(c =>
          exists(tokens(col(c)), t => t.rlike(pat)))
        (if (cands.isEmpty) lit(false) else cands.reduce(_ || _), lit(1.0))
    }
    val out = f
      .filter(pred)
      .select(
        entityStruct(f).as(if (edge) "edge" else "node"),
        scoreCol.as("score"))
    o.limit.map(out.limit).getOrElse(out)
  }

  /** `text_search.fuzzy_phrase_search(index, 'data.prop:w1 … wk'[, cfg])`
    * (reference text_index.cpp fuzzy phrase queries): an ordered run of
    * ADJACENT tokens where each token matches its query word within a
    * SHARED Damerau(OSA) edit budget (`fuzzy_distance` 0-2, default 0);
    * the trailing word always matches as a PREFIX (the reference rejects
    * `fuzzy_prefix: false`); `fuzzy_transpositions: false` degrades to
    * plain Levenshtein. Lowered to ONE higher-order filter over the token
    * stream — query-word transposition variants are driver-enumerated, so
    * each slot's cost is codegen'd `least(levenshtein(...) + penalty)`,
    * no UDF, no index shuffle: the scan parallelizes like any predicate. */
  private def fuzzyPhraseSearch(ctx: ProcContext, edge: Boolean): DataFrame = {
    val name = ctx.args.head.toString
    val q = ctx.args(1).toString
    val opts: Map[String, Any] = ctx.args.lift(2) match {
      case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v }
      case Some(null) | None => Map.empty
      case Some(other) =>
        throw new IllegalArgumentException(s"search config must be a map: $other")
    }
    val known =
      Set("limit", "fuzzy_distance", "fuzzy_transpositions", "fuzzy_prefix")
    val unknown = opts.keySet -- known
    require(unknown.isEmpty, s"unknown search config: ${unknown.mkString(",")}")
    val budget = opts.get("fuzzy_distance").map(_.toString.toInt).getOrElse(0)
    require(budget >= 0 && budget <= 2, s"fuzzy_distance must be 0-2: $budget")
    require(
      !opts.get("fuzzy_prefix").exists(_.toString == "false"),
      "fuzzy_phrase_search: the trailing word always matches as a prefix " +
        "(fuzzy_prefix: false is rejected, like the reference)")
    val transpositions =
      !opts.get("fuzzy_transpositions").exists(_.toString == "false")
    require(
      q.startsWith("data.") && q.contains(":"),
      s"fuzzy_phrase_search needs a single-property query " +
        s"(data.<prop>:<phrase>), got '$q'")
    val Array(fieldRaw, phrase) = q.split(":", 2)
    val prop = fieldRaw.stripPrefix("data.")
    require(
      !phrase.contains(":"),
      s"fuzzy_phrase_search takes exactly one property query, got '$q'")
    val words = phrase.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    require(words.nonEmpty, "fuzzy_phrase_search: empty phrase")
    val d = textIndex(ctx.g, name, edge)
    val f = frameOf(ctx.g, d)
    val covered =
      (d.props.isEmpty || d.props.contains(prop)) && f.columns.contains(prop)
    if (!covered)
      return f.filter(lit(false)).select(
        entityStruct(f).as(if (edge) "edge" else "node"),
        lit(1.0).as("score"))
    // adjacent-swap variants of a QUERY word: OSA distance = min over
    // ≤budget swap generations of plain levenshtein + one edit per swap
    def swaps(w: String): Seq[String] =
      (0 until w.length - 1).map(i =>
        w.substring(0, i) + w.charAt(i + 1) + w.charAt(i) +
          w.substring(i + 2))
    def variants(w: String): Seq[(String, Int)] =
      if (!transpositions || budget == 0) Seq(w -> 0)
      else {
        val v1 = swaps(w).map(_ -> 1)
        val v2 =
          if (budget >= 2) v1.flatMap { case (x, _) => swaps(x).map(_ -> 2) }
          else Nil
        ((w -> 0) +: (v1 ++ v2))
          .groupBy(_._1).map { case (x, ps) => x -> ps.map(_._2).min }.toSeq
      }
    def slotCost(i: Int, tok: Column): Column = {
      val isLast = i == words.length - 1
      val costs = variants(words(i)).map { case (v, pen) =>
        val c =
          if (isLast)
            // prefix edit distance, approximated over the exact-length
            // prefix ± 1 (covers boundary insert/delete within budget)
            least(
              levenshtein(
                substring(tok, 1, math.max(v.length - 1, 1)), lit(v)),
              levenshtein(substring(tok, 1, v.length), lit(v)),
              levenshtein(substring(tok, 1, v.length + 1), lit(v)))
          else levenshtein(tok, lit(v))
        c + lit(pen)
      }
      if (costs.size == 1) costs.head else least(costs: _*)
    }
    val k = words.length
    val toks = tokens(col(prop))
    val matched =
      size(toks) >= k && exists(
        sequence(lit(0), size(toks) - k),
        s =>
          words.indices
            .map(i => slotCost(i, element_at(toks, s + i + 1)))
            .reduce(_ + _) <= budget)
    val out = f
      .filter(matched)
      .select(
        entityStruct(f).as(if (edge) "edge" else "node"),
        lit(1.0).as("score"))
    opts.get("limit").map(l => out.limit(l.toString.toInt)).getOrElse(out)
  }

  private val AggR =
    """\{\s*"([^"]+)"\s*:\s*\{\s*"value_count"\s*:\s*\{\s*"field"\s*:\s*"(?:data\.)?([^"]+)"\s*\}\s*\}\s*\}""".r

  /** `text_search.aggregate(index, query, aggJson)` — the value_count
    * aggregation the corpus uses (tantivy aggregation DSL subset). */
  private def textAggregate(ctx: ProcContext, edge: Boolean): DataFrame = {
    val d = textIndex(ctx.g, ctx.args.head.toString, edge)
    val f = frameOf(ctx.g, d)
    val matched = f.filter(
      queryPred(f, d, parseQuery(ctx.args(1).toString),
        TextOpts(None, 0, prefix = false)))
    ctx.args(2).toString match {
      case AggR(aggName, field) =>
        val n = pathCol(matched, field)
          .map(c => matched.filter(c.isNotNull).count())
          .getOrElse(0L)
        val json = s"""{"$aggName":{"value":$n.0}}"""
        val spark = ctx.spark
        spark.createDataFrame(
          new java.util.ArrayList[Row](
            java.util.Arrays.asList(Row(json))),
          StructType(Seq(StructField("aggregation", StringType))))
      case other =>
        throw new UnsupportedOperationException(
          s"unsupported text aggregation: $other (value_count supported)")
    }
  }

  // ---------- vector search ----------

  private def vectorIndex(g: GraphState, name: String): IndexDef =
    g.indexes
      .find(d => d.kind.startsWith("vector") && d.name.contains(name))
      .getOrElse(throw new IllegalArgumentException(
        s"no vector index named '$name'"))

  /** `vector_search.search(index, k, query)` →
    * (distance, node|edge, similarity): brute-force top-k over the
    * label's frame — the subcritical exact form; the scale path is the
    * sign-code IVF in [[Procedures.vectorSearch]] (`vector.search`). */
  private def vectorSearchProc(ctx: ProcContext): DataFrame = {
    val d = vectorIndex(ctx.g, ctx.args.head.toString)
    val k = ctx.args(1).toString.toInt
    val qRaw = ctx.args(2) match {
      case xs: Seq[_] => xs
      case other =>
        throw new IllegalArgumentException(
          s"vector_search.search query must be a list, got $other")
    }
    val q = qRaw.map {
      case n: Long => n.toDouble
      case n: Int => n.toDouble
      case n: Double => n
      case n: Float => n.toDouble
      case other =>
        throw new IllegalArgumentException(
          s"vector_search.search query values must be numeric, got $other")
    }
    val f = frameOf(ctx.g, d)
    val p = d.props.head
    val outName = if (d.kind == "vector-edge") "edge" else "node"
    if (!f.columns.contains(p))
      return f.limit(0).select(
        lit(0.0).as("distance"),
        entityStruct(f).as(outName),
        lit(0.0).as("similarity"))
    val qArr = array(q.map(lit): _*)
    val vec = col(p).cast("array<double>")
    val metric = d.config.get("metric").map(_.toString).getOrElse("l2sq")
    val dist = metric match {
      case "cos" =>
        val dot = aggregate(
          zip_with(vec, qArr, (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
        val n1 = sqrt(aggregate(
          transform(vec, a => a * a), lit(0.0), (acc, x) => acc + x))
        val n2 = math.sqrt(q.map(x => x * x).sum)
        lit(1.0) - dot / (n1 * lit(n2))
      case _ => // l2sq
        aggregate(
          zip_with(vec, qArr, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)
    }
    val sim = metric match {
      case "cos" => lit(1.0) - col("distance")
      case _ => lit(1.0) / (lit(1.0) + col("distance"))
    }
    f.filter(col(p).isNotNull)
      .select(dist.as("distance"), entityStruct(f).as(outName))
      .orderBy(col("distance").asc)
      .limit(k)
      .withColumn("similarity", sim)
  }

  /** Procedure registry additions (reference procedure names). */
  val registry: Map[String, ProcContext => DataFrame] = Map(
    "vector_search.search" -> vectorSearchProc,
    "vector_search.search_edges" -> vectorSearchProc,
    "vector_search.show_index_info" -> (ctx =>
      showVectorIndexInfo(ctx.spark, ctx.g)),
    "text_search.search" -> (textSearchDf(_, edge = false, "query")),
    "text_search.fuzzy_phrase_search" -> (fuzzyPhraseSearch(_, edge = false)),
    "text_search.fuzzy_phrase_search_edges" ->
      (fuzzyPhraseSearch(_, edge = true)),
    "text_search.search_all" -> (textSearchDf(_, edge = false, "all")),
    "text_search.regex_search" -> (textSearchDf(_, edge = false, "regex")),
    "text_search.aggregate" -> (textAggregate(_, edge = false)),
    "text_search.search_edges" -> (textSearchDf(_, edge = true, "query")),
    "text_search.search_all_edges" -> (textSearchDf(_, edge = true, "all")),
    "text_search.regex_search_edges" -> (textSearchDf(_, edge = true, "regex")),
    "text_search.aggregate_edges" -> (textAggregate(_, edge = true)))
}
