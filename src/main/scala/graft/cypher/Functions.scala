package graft.cypher

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Frames, GraphState}
import Ast._

/** Cypher builtin function registry — our analog of the reference's
  * `builtin_functions` map
  * (`src/query/interpret/awesome_memgraph_functions.cpp:2058-2170`). Every
  * function lowers to `org.apache.spark.sql.functions` (codegen'd); no UDFs.
  */
object Functions {

  /** Cypher value conversion (toBoolean/toInteger/toFloat/toString and
    * their list forms — awesome_memgraph_functions.cpp:638-725):
    * unconvertible VALUES on an accepted TYPE yield NULL (never a cast
    * error, ANSI or not), numeric strings parse through double ('2.9' →
    * toInteger 2), and heterogeneous (VARIANT) elements convert by their
    * runtime kind. REJECTED types split the two surfaces exactly like the
    * reference: the strict functions raise (`strictName` = the function
    * name for the error, FType throw) — toBoolean rejects floats
    * (ToBooleanTypes is Integer, not Number) and everything rejects
    * lists/maps/entities — while the `*OrNull` variants and the list
    * forms return NULL. */
  private def cyConvert(
      c: Column,
      t: Option[DataType],
      target: String,
      strictName: Option[String] = None): Column = {
    val numericKinds =
      "^(TINYINT|SMALLINT|INT|BIGINT|FLOAT|DOUBLE|DECIMAL.*)$"
    // rejected-type branch: raise for the strict fn, NULL for *OrNull
    def rejected(tt: String): Column = strictName match {
      case Some(fn) =>
        raise_error(lit(
          s"'$fn' argument must be a ${
            if (target == "boolean") "null, boolean, integer or string"
            else if (target == "string") "convertible scalar"
            else "null, boolean, number or string"
          } value")).cast(tt)
      case None => lit(null).cast(tt)
    }
    t match {
      case Some(VariantType) =>
        val s = schema_of_variant(c)
        val num = s.rlike(numericKinds)
        // guard NULL values first — the rejected `otherwise` must never
        // swallow them (null converts to null in every mode)
        def guarded(chain: Column, tt: String): Column =
          when(c.isNull || s.isNull || s === "VOID", lit(null).cast(tt))
            .otherwise(chain)
        target match {
          case "long" =>
            guarded(
              when(num, try_variant_get(c, "$", "double").cast("long"))
                .when(
                  s === "STRING", {
                    // direct int64 parse first — exact above 2^53; double
                    // round-trip only for '2.9'-style fractional strings
                    val sv = try_variant_get(c, "$", "string")
                    when(sv.try_cast("long").isNotNull, sv.try_cast("long"))
                      .otherwise(sv.try_cast("double").cast("long"))
                  })
                .when(
                  s === "BOOLEAN",
                  try_variant_get(c, "$", "boolean").cast("long"))
                .when(
                  s.rlike("^(ARRAY|OBJECT|STRUCT|MAP)"),
                  rejected("long")),
              "long")
          case "double" =>
            guarded(
              when(num, try_variant_get(c, "$", "double"))
                .when(
                  s === "STRING",
                  try_variant_get(c, "$", "string").try_cast("double"))
                .when(
                  s === "BOOLEAN",
                  try_variant_get(c, "$", "boolean").cast("double"))
                .when(
                  s.rlike("^(ARRAY|OBJECT|STRUCT|MAP)"),
                  rejected("double")),
              "double")
          case "boolean" =>
            // bool, string, and INTEGER kinds convert; floats are a
            // REJECTED type (strict raises), not a null-parse
            guarded(
              when(s === "BOOLEAN", try_variant_get(c, "$", "boolean"))
                .when(
                  s === "STRING",
                  try_variant_get(c, "$", "string").try_cast("boolean"))
                .when(
                  s.rlike("^(TINYINT|SMALLINT|INT|BIGINT)$"),
                  try_variant_get(c, "$", "double") =!= 0.0)
                .when(
                  s.rlike("^(FLOAT|DOUBLE|DECIMAL|ARRAY|OBJECT|STRUCT|MAP)"),
                  rejected("boolean")),
              "boolean")
          case _ =>
            guarded(
              when(
                !s.rlike("^(ARRAY|OBJECT|STRUCT|MAP)"),
                try_variant_get(c, "$", "string"))
                .when(lit(true), rejected("string")),
              "string")
        }
      case Some(_: ArrayType) | Some(_: MapType) | Some(_: StructType)
          if target != "string" =>
        when(c.isNull, lit(null).cast(target)).otherwise(rejected(target))
      case Some(_: ArrayType) | Some(_: MapType) if target == "string" =>
        // toString accepts scalars/temporals/points, never lists or maps
        when(c.isNull, lit(null).cast(target)).otherwise(rejected(target))
      case Some(StringType) if target == "long" =>
        // exact int64 strings parse directly (no double round-trip — values
        // above 2^53 would lose precision); '2.9'-style strings fall back
        // through double (reference truncates toward zero)
        when(c.try_cast("long").isNotNull, c.try_cast("long"))
          .otherwise(c.try_cast("double").cast("long"))
      case Some(StringType) => c.try_cast(target)
      case Some(t2: NumericType) if target == "boolean" =>
        t2 match {
          case ByteType | ShortType | IntegerType | LongType =>
            c.cast("double") =!= 0.0
          case _ =>
            // floats are a rejected TYPE for toBoolean
            when(c.isNull, lit(null).cast("boolean"))
              .otherwise(rejected("boolean"))
        }
      case _ => c.try_cast(target)
    }
  }

  private val aggregates =
    Set("count", "sum", "avg", "min", "max", "collect", "stdev", "stdevp",
      "percentilecont", "percentiledisc", "project", "derive")

  def isAggregate(name: String): Boolean = aggregates(name.toLowerCase)

  /** collect() observing the previous clause's ORDER BY (memgraph's
    * Aggregate cursor pulls the sorted stream, so `WITH … ORDER BY` +
    * `collect(…)` is ordered there — interactive workloads lean on it for
    * `head(collect(…))` top-1 idioms). Elements pack the sort keys into a
    * struct, sort per group AFTER the (partial+final) aggregation with an
    * asc/desc comparator matching the engine's NULL-GREATEST ORDER BY
    * discipline, then unwrap — group-local work, no extra shuffle. */
  private def orderedCollect(ctx: ExprLowering, v: Column): Column = {
    val keys = ctx.collectOrder
    val fields = keys.zipWithIndex.map { case ((k, _), i) =>
      k.as(s"_k$i")
    } :+ v.as("_v")
    // collect skips NULL values; the struct wrapper is never null, so
    // gate it on the value itself
    val packed = collect_list(when(v.isNotNull, struct(fields: _*)))
    val cmp = (l: Column, r: Column) => {
      val keyCmps = keys.zipWithIndex.map { case ((_, asc), i) =>
        val lk = l.getField(s"_k$i")
        val rk = r.getField(s"_k$i")
        val base =
          when(lk.isNull && rk.isNull, 0)
            .when(lk.isNull, 1) // NULL-greatest
            .when(rk.isNull, -1)
            .when(lk < rk, -1)
            .when(lk > rk, 1)
            .otherwise(0)
        if (asc) base else base * -1
      }
      keyCmps.foldRight(lit(0)) { (kc, acc) =>
        when(kc =!= 0, kc).otherwise(acc)
      }
    }
    transform(array_sort(packed, cmp), s => s.getField("_v"))
  }

  def lower(
      ctx: ExprLowering,
      name: String,
      distinct: Boolean,
      args: Seq[Expr]): Column = {

    def a(i: Int): Column = ctx.lower(args(i))
    def argType(i: Int): Option[DataType] =
      ctx.typeOf(a(i))
        .orElse(args.lift(i).flatMap(ctx.hintOf))

    // graph-aware functions on node/edge variables
    def nodeEdgeVar(i: Int): Option[String] = args.lift(i) match {
      case Some(Var(n)) if ctx.isNodeOrEdgeVar(n) => Some(n)
      case _ => None
    }

    def isFloating(i: Int): Boolean =
      argType(i).exists(t => t == DoubleType || t == FloatType)

    name.toLowerCase match {
      // ---- aggregations (aggregation.hpp:27) ----
      case "count" =>
        // count(n) of a node/edge counts bound ids — after OPTIONAL MATCH the
        // unmatched row's property struct is non-null even though the binding
        // is, so counting the struct would be wrong.
        val c = nodeEdgeVar(0).map(Frames.id).getOrElse(a(0))
        // DISTINCT hashes its argument; VARIANT-bearing values (mixed-type
        // list elements variant-encode) and maps are not hashable in Spark
        // — compare through canonical JSON instead. One expression builds
        // every row's value with the same field order, so JSON equality IS
        // value equality here.
        def unhashable(t: DataType): Boolean = t match {
          case VariantType => true
          case _: MapType => true
          case ArrayType(e, _) => unhashable(e)
          case s: StructType => s.fields.exists(f => unhashable(f.dataType))
          case _ => false
        }
        if (distinct && ctx.typeOf(c).exists(unhashable))
          count_distinct(to_json(c))
        else if (distinct) count_distinct(c)
        else count(c)
      // Distributed double sums are not reproducible across partitionings
      // (float addition is non-associative), so sum/avg over floating input
      // accumulate in DECIMAL(38,4) and surface as DOUBLE — bit-stable for
      // any cluster size, and matching our DuckDB oracle discipline.
      // sum of no rows (or all-NULL input) is 0, not NULL — openCypher
      // semantics (reference aggregation.cpp sum init), unlike SQL.
      case "sum" =>
        if (isFloating(0)) {
          val d = a(0).cast(DecimalType(38, 4))
          coalesce((if (distinct) sum_distinct(d) else sum(d)).cast("double"),
            lit(0.0))
        } else if (distinct) coalesce(sum_distinct(a(0)), lit(0L))
        else coalesce(sum(a(0)), lit(0L))
      case "avg" =>
        if (isFloating(0)) {
          val d = a(0).cast(DecimalType(38, 4))
          if (distinct)
            sum_distinct(d).cast("double") / count_distinct(a(0))
          else sum(d).cast("double") / count(a(0))
        } else if (distinct)
          sum_distinct(a(0)).cast("double") / count_distinct(a(0))
        else avg(a(0))
      // NOTE: the reference REJECTS min/max over durations while
      // accepting LocalTime — both lower to DayTimeIntervalType here, so
      // the type error is not statically expressible (2 lenient corpus
      // rows, never a wrong answer: the ordering is well-defined)
      case "min" | "max" if argType(0).exists(
          _.isInstanceOf[org.apache.spark.sql.types.VariantType]) =>
        // min/max over a VARIANT (mixed-type) column: the reference's
        // TypedValue comparison RAISES for values of different base kinds
        // (aggregations.feature "Min test 01" expects an error for an
        // int/string mix), so genuinely mixed inputs raise here too; a
        // column that is variant-typed but single-kind at runtime (all
        // numbers, all strings, …) aggregates normally. (The vendored
        // openCypher TCK table instead pins Neo4j's type-orderability —
        // documented divergence in OpenCypherTckSpec.excluded.)
        val v = a(0)
        // schema_of_variant gives the VALUE's own type — try_variant_get
        // would silently COERCE (a number casts to string/boolean)
        val sch = schema_of_variant(v)
        val rank = when(sch.startsWith("ARRAY"), lit(3))
          .when(sch.startsWith("OBJECT"), lit(0))
          .when(sch === "STRING", lit(11))
          .when(sch === "BOOLEAN", lit(12))
          .otherwise(lit(13)) // numeric kinds
        val numV = when(rank === 13, try_variant_get(v, "$", "double"))
        val strV = when(rank === 11, try_variant_get(v, "$", "string"))
        val boolV = when(rank === 12, try_variant_get(v, "$", "boolean"))
        val key = when(v.isNull || is_variant_null(v), lit(null))
          .otherwise(struct(
            rank.as("r"), numV.as("n"), strV.as("s"),
            boolV.cast("int").as("b"), to_json(v).as("j")))
        val kinds = count_distinct(
          when(v.isNotNull && !is_variant_null(v), rank))
        val best =
          if (name.equalsIgnoreCase("min")) min_by(a(0), key)
          else max_by(a(0), key)
        when(
          kinds > 1,
          raise_error(lit(
            s"Can't ${name.toLowerCase} mixed types — values of " +
              "different kinds are not comparable.")))
          .otherwise(best)
      case "min" => min(a(0))
      case "max" => max(a(0))
      case "collect" if args.size == 2 =>
        // COLLECT_MAP (aggregation.hpp:27 Op::COLLECT_MAP): collect(k, v).
        map_from_entries(array_distinct(collect_list(struct(a(0), a(1)))))
      case "collect" =>
        if (distinct) collect_set(a(0))
        else if (ctx.collectOrder.nonEmpty) orderedCollect(ctx, a(0))
        else collect_list(a(0))
      case "stdev" => stddev_samp(a(0))
      case "stdevp" => stddev_pop(a(0))
      // Exact percentiles (the reference computes exact nth-element,
      // awesome_memgraph_functions.cpp `percentileCont`/`percentileDisc`):
      // cont = linear interpolation (Spark's exact `percentile`); disc =
      // smallest element at cumulative position >= p, via sorted collect.
      case "percentilecont" => percentile(a(0), a(1))
      case "percentiledisc" =>
        element_at(
          sort_array(collect_list(a(0))),
          greatest(ceil(a(1) * count(a(0))), lit(1)).cast("int"))

      // ---- graph-valued aggregates (aggregation.hpp Op::PROJECT_PATH /
      // PROJECT_LISTS / DERIVE): {nodes, edges} subgraph values ----
      case "project" =>
        if (args.size == 1) {
          val pVar = args(0) match {
            case Var(n) if ctx.isPathVar(n) => n
            case _ =>
              throw new IllegalArgumentException(
                "project(p): argument must be a path")
          }
          val ns = s"$pVar${Frames.Sep}_nodestructs"
          val es = s"$pVar${Frames.Sep}_edgestructs"
          require(
            ctx.varCols(pVar).contains(ns) && ctx.varCols(pVar).contains(es),
            "project(p): entity values unavailable for this path shape")
          struct(
            array_distinct(flatten(collect_list(col(ns)))).as("nodes"),
            array_distinct(flatten(collect_list(col(es)))).as("edges"))
        } else {
          def entityList(e: Expr): Column = e match {
            case ListLit(items)
                if items.nonEmpty && items.forall {
                  case Var(n) => ctx.isNodeOrEdgeVar(n)
                  case _ => false
                } =>
              ctx.entityValuesArray(items.collect { case Var(n) => n })
            case other => ctx.lower(other)
          }
          // the FIRST list must hold nodes, the second relationships
          // (reference graph_projection: "project() argument must be a
          // list of nodes" — mage graph projection signature)
          args(0) match {
            case ListLit(items) if items.exists {
                  case Var(n) => ctx.isEdgeVar(n)
                  case _ => false
                } =>
              throw new IllegalArgumentException(
                "project(nodes, relationships): the first argument must " +
                  "be a list of nodes")
            case _ => ()
          }
          // OPTIONAL-MATCH misses are NULL elements — ignored
          val nodesRow = filter(entityList(args(0)), x => x.isNotNull)
          val edgesRow = filter(entityList(args(1)), x => x.isNotNull)
          val nodes =
            array_distinct(flatten(collect_list(nodesRow)))
          val edges =
            array_distinct(flatten(collect_list(edgesRow)))
          // every projected edge must have both endpoints projected
          // (reference raises); assert_true surfaces it at materialization
          val valid = forall(
            edges,
            e =>
              exists(nodes, n =>
                n.getField(GraphState.IdCol) ===
                  e.getField(GraphState.SrcCol)) &&
                exists(nodes, n =>
                  n.getField(GraphState.IdCol) ===
                    e.getField(GraphState.DstCol)))
          struct(
            nodes.as("nodes"),
            edges.as("edges"),
            assert_true(
              valid,
              lit("project: an edge's endpoint is not in the node list"))
              .as("_chk"))
        }

      case "derive" =>
        val pVar = args(0) match {
          case Var(n) if ctx.isPathVar(n) => n
          case _ =>
            throw new IllegalArgumentException(
              "derive: first argument must be a path")
        }
        val epCol = s"$pVar${Frames.Sep}_endpoints"
        require(
          ctx.varCols(pVar).contains(epCol),
          "derive: path endpoint values unavailable for this path shape")
        val om: Map[String, Expr] = args.lift(1) match {
          case Some(MapLit(kvs)) => kvs.toMap
          case _ =>
            throw new IllegalArgumentException(
              "derive: second argument must be an options map")
        }
        val vtypeC = ctx
          .lower(om.getOrElse(
            "virtualEdgeType",
            throw new IllegalArgumentException(
              "derive: virtualEdgeType option is required")))
          .cast("string")
        val undirected: Option[Seq[String]] =
          om.get("undirectedEdgeTypes").map {
            case ListLit(items) =>
              items.map {
                case Lit(s2: String) => s2
                case _ =>
                  throw new IllegalArgumentException(
                    "derive: undirectedEdgeTypes entries must be strings")
              }
            case _ =>
              throw new IllegalArgumentException(
                "derive: undirectedEdgeTypes must be a list of strings")
          }
        val isUnd = undirected
          .map(l =>
            if (l.contains("*")) lit(true)
            else if (l.isEmpty) lit(false)
            else vtypeC.isin(l: _*))
          .getOrElse(lit(false))
        def propEntries(key: String): Seq[(String, Column)] =
          om.get(key) match {
            case Some(MapLit(kvs)) =>
              kvs.map { case (k, e) => k -> ctx.lower(e) }
            case Some(_) =>
              throw new IllegalArgumentException(
                s"derive: $key must be a map literal")
            case None => Nil
          }
        val srcProps = propEntries("sourceNodeProperties")
        val dstProps = propEntries("targetNodeProperties")
        val relProps = propEntries("relationshipProperties")
        // one unified node schema: endpoint fields + the union of the two
        // override-prop sets (NULL where the override doesn't apply)
        val epFields: Seq[String] = ctx.typeOf(col(epCol)) match {
          case Some(ArrayType(s: StructType, _)) => s.fieldNames.toSeq
          case other =>
            throw new IllegalArgumentException(
              s"derive: unexpected endpoints type $other")
        }
        val extraNames =
          (srcProps.map(_._1) ++ dstProps.map(_._1)).distinct
        def nodeOf(
            idx: Int,
            lblKey: String,
            props: Seq[(String, Column)]): Column = {
          val base = element_at(col(epCol), idx)
          val lblOverride = om.get(lblKey).map(e =>
            ctx.lower(e).cast("array<string>"))
          val pm = props.toMap
          val kept = epFields.filterNot(extraNames.contains).map { f =>
            if (f == GraphState.LabelsCol && lblOverride.isDefined)
              lblOverride.get.as(f)
            else base.getField(f).as(f)
          }
          val extras = extraNames.map { k =>
            pm.get(k)
              .orElse(
                if (epFields.contains(k)) Some(base.getField(k)) else None)
              .getOrElse(lit(null))
              .as(k)
          }
          struct(kept ++ extras: _*)
        }
        val srcNode = nodeOf(1, "sourceNodeLabels", srcProps)
        val dstNode = nodeOf(2, "targetNodeLabels", dstProps)
        def edgeOf(s2: Column, d: Column): Column = struct(
          Seq(
            xxhash64(
              s2.getField(GraphState.IdCol),
              d.getField(GraphState.IdCol),
              vtypeC).as(GraphState.IdCol),
            s2.getField(GraphState.IdCol).as(GraphState.SrcCol),
            d.getField(GraphState.IdCol).as(GraphState.DstCol),
            vtypeC.as(GraphState.TypeCol)) ++
            relProps.map { case (k, c) => c.as(k) } ++
            Seq(s2.as("_startNode"), d.as("_endNode")): _*)
        // undirected types double the virtual edge; a self-loop's two
        // orientations are identical, so array_distinct keeps one
        val perRow = when(
          isUnd,
          array(edgeOf(srcNode, dstNode), edgeOf(dstNode, srcNode)))
          .otherwise(array(edgeOf(srcNode, dstNode)))
        struct(
          array_distinct(
            flatten(collect_list(array(srcNode, dstNode)))).as("nodes"),
          array_distinct(flatten(collect_list(perRow))).as("edges"))

      // ---- graph scalars (awesome_memgraph_functions.cpp:2063-2099) ----
      case "id" | "elementid" =>
        nodeEdgeVar(0)
          .map(Frames.id)
          .getOrElse(a(0).getField(GraphState.IdCol))
      case "labels" =>
        nodeEdgeVar(0)
          .map(n => Frames.f(n, GraphState.LabelsCol))
          .getOrElse(a(0).getField(GraphState.LabelsCol))
      case "type" =>
        nodeEdgeVar(0)
          .map(n => Frames.f(n, GraphState.TypeCol))
          .getOrElse(a(0).getField(GraphState.TypeCol))
      // virtual edges (derive()) embed their endpoint node VALUES —
      // prefer those over an id field
      case "startnode" =>
        nodeEdgeVar(0).map(Frames.src).getOrElse {
          argType(0) match {
            case Some(s: StructType) if s.fieldNames.contains("_startNode") =>
              a(0).getField("_startNode")
            case _ => a(0).getField(GraphState.SrcCol)
          }
        }
      case "endnode" =>
        nodeEdgeVar(0).map(Frames.dst).getOrElse {
          argType(0) match {
            case Some(s: StructType) if s.fieldNames.contains("_endNode") =>
              a(0).getField("_endNode")
            case _ => a(0).getField(GraphState.DstCol)
          }
        }
      case "properties" =>
        nodeEdgeVar(0).map(ctx.varPropsStruct).getOrElse(a(0))
      case "keys" =>
        // a NULL property is no property (REMOVE nulls the column), so
        // keys() lists only per-row NON-NULL properties
        def presentKeys(names: Seq[String], value: String => Column): Column =
          filter(
            array(names.map(p => when(value(p).isNotNull, lit(p))): _*),
            x => x.isNotNull)
        nodeEdgeVar(0) match {
          case Some(n) =>
            val props = ctx
              .varCols(n)
              .map(_.split(Frames.Sep, 2)(1))
              .filterNot(_.startsWith("_"))
            presentKeys(props, p => Frames.f(n, p))
          case None =>
            argType(0) match {
              case Some(s: StructType) =>
                presentKeys(s.fieldNames.toSeq, f => a(0).getField(f))
              case _ => map_keys(a(0))
            }
        }
      // values(map) — awesome_memgraph_functions.cpp:2099; record-typed
      // maps yield values in field order (string-normalized when the
      // field types are mixed — arrays are monomorphic).
      case "values" =>
        argType(0) match {
          case Some(s: StructType) =>
            val fields = s.fieldNames.toSeq.map(f => a(0).getField(f))
            val types = s.fields.map(_.dataType).distinct
            if (types.length <= 1) array(fields: _*)
            else array(fields.map(_.cast("string")): _*)
          case _ => map_values(a(0))
        }

      // ---- paths (ConstructNamedPath, operator.hpp:1255) ----
      // Entity-struct arrays when the path carries them (fixed-length
      // named paths); id arrays otherwise (BFS-family paths).
      case "nodes" =>
        args.lift(0) match {
          case Some(Var(n)) if ctx.isPathVar(n) =>
            if (ctx.varCols(n).contains(s"$n${Frames.Sep}_nodestructs"))
              Frames.f(n, "_nodestructs")
            else Frames.f(n, "_nodes")
          case _ =>
            // a path VALUE (collect(p) element, subquery output) is a
            // {nodes, edges} struct; the id-array form keeps _nodes
            argType(0) match {
              case Some(s: org.apache.spark.sql.types.StructType)
                  if s.fieldNames.contains("nodes") =>
                a(0).getField("nodes")
              case _ => a(0).getField("_nodes")
            }
        }
      case "relationships" =>
        args.lift(0) match {
          case Some(Var(n)) if ctx.isPathVar(n) =>
            if (ctx.varCols(n).contains(s"$n${Frames.Sep}_edgestructs"))
              Frames.f(n, "_edgestructs")
            else Frames.f(n, "_edges")
          case _ =>
            argType(0) match {
              case Some(s: org.apache.spark.sql.types.StructType)
                  if s.fieldNames.contains("edges") =>
                a(0).getField("edges")
              case _ => a(0).getField("_edges")
            }
        }

      // ---- spatial (point/distance/withinbbox,
      // awesome_memgraph_functions.cpp:2160-2162; Point2d
      // src/storage/v2/point.hpp) ----
      case "point" =>
        args(0) match {
          case MapLit(kvs) =>
            val m = kvs.toMap
            val keys = m.keySet
            // spatial.feature: an unknown key yields a NULL point (not an
            // error); mixing cartesian and geographic coordinate keys, or
            // a crs/srid contradicting the keys or the dimensionality,
            // raises (point.hpp CRS inference; spatial.feature failures
            // 1-13)
            val known = Set(
              "x", "y", "z", "height", "longitude", "latitude", "crs",
              "srid")
            // unknown keys short-circuit to the NULL point BEFORE any
            // crs/srid consistency check (the reference returns NULL for
            // unknown keys even alongside a contradicting crs)
            if ((keys -- known).nonEmpty) return lit(null).cast(PointType)
            val hasGeoKeys =
              keys.contains("longitude") || keys.contains("latitude")
            val hasCartKeys = keys.contains("x") || keys.contains("y")
            if (hasGeoKeys && hasCartKeys)
              throw new IllegalArgumentException(
                "point(): cartesian (x/y) and geographic " +
                  "(longitude/latitude) keys cannot mix")
            val third = keys.contains("z") || keys.contains("height")
            val explicit: Option[Int] = m
              .get("srid")
              .map {
                case Lit(n: Long) => n.toInt
                case _ =>
                  throw new IllegalArgumentException(
                    "point(): srid must be a literal integer")
              }
              .orElse(m.get("crs").map {
                case Lit(s: String) =>
                  s match {
                    case "cartesian" => 7203
                    case "cartesian-3d" => 9157
                    case "wgs-84" => 4326
                    case "wgs-84-3d" => 4979
                    case o =>
                      throw new IllegalArgumentException(
                        s"point(): unknown crs '$o'")
                  }
                case _ =>
                  throw new IllegalArgumentException(
                    "point(): crs must be a literal string")
              })
            val srid: Int = explicit match {
              case Some(s) =>
                if (!Set(7203, 9157, 4326, 4979)(s))
                  throw new IllegalArgumentException(
                    s"point(): unknown srid $s")
                val geoS = s == 4326 || s == 4979
                val threeS = s == 9157 || s == 4979
                if (hasGeoKeys && !geoS)
                  throw new IllegalArgumentException(
                    "point(): geographic keys with a cartesian crs")
                if (threeS != third)
                  throw new IllegalArgumentException(
                    "point(): crs dimensionality does not match the " +
                      "coordinate keys")
                s
              case None =>
                if (hasGeoKeys) { if (third) 4979 else 4326 }
                else { if (third) 9157 else 7203 }
            }
            val geo = srid == 4326 || srid == 4979
            def f(k: String) =
              m.get(k).map(e => ctx.lower(e).cast("double")).getOrElse(lit(null).cast("double"))
            val fx = if (hasGeoKeys) f("longitude") else f("x")
            val fy = if (hasGeoKeys) f("latitude") else f("y")
            val fz = if (keys.contains("z")) f("z") else f("height")
            if ((keys -- known).nonEmpty) lit(null).cast(PointType)
            else {
              val anyNull = fx.isNull || fy.isNull ||
                (if (third) fz.isNull else lit(false))
              // geographic range violations RAISE per row
              // (spatial.feature failures 3-6); null coords → null point
              val rangeBad =
                if (!geo) lit(false)
                else !(fx.between(-180, 180) && fy.between(-90, 90))
              val built = struct(
                fx.as("x"),
                fy.as("y"),
                (if (third) fz else lit(null).cast("double")).as("z"),
                lit(srid.toLong).as("srid"))
              when(anyNull, lit(null).cast(PointType))
                .when(rangeBad, raise_error(lit(
                  "point(): longitude must be in [-180, 180] and " +
                    "latitude in [-90, 90]")).cast(PointType))
                .otherwise(built)
          }
          case _ =>
            throw new IllegalArgumentException("point() takes a map literal")
        }
      case "point.distance" | "distance" =>
        // CRS dispatch like the reference (point_functions.cpp:54-73):
        // same-srid required (cross-CRS → NULL), cartesian → euclidean,
        // wgs-84 → Lambert's ellipsoidal formula on WGS-84 (reduced
        // latitudes + first-order flattening correction; the reference
        // uses boost's geographic strategy — both agree to ≪0.1 m at the
        // scales the corpus pins), 3D height folded in by Pythagoras
        // exactly as point_functions.cpp:33-52 does.
        if ((0 to 1).exists(i => argType(i).contains(NullType)))
          return lit(null).cast("double")
        val (p1, p2) = (a(0), a(1))
        def d(k: String) = p1.getField(k) - p2.getField(k)
        val zSq = coalesce(d("z") * d("z"), lit(0.0))
        val eucl = sqrt(d("x") * d("x") + d("y") * d("y") + zSq)
        val gc = lambertMeters(
          p1.getField("y"), p1.getField("x"),
          p2.getField("y"), p2.getField("x"))
        val wgs = sqrt(gc * gc + zSq)
        when(
          p1.getField("srid") === p2.getField("srid"),
          when(p1.getField("srid").isin(4326L, 4979L), wgs).otherwise(eucl))
          .otherwise(lit(null).cast("double"))
      case "point.bucket" =>
        // Grid-cell id for spatial bucketing — the shuffle key of the
        // point-index analog (reference: ScanAllByPointDistance's R-tree,
        // operator.hpp:973; here buckets co-locate nearby points so
        // distance joins stay within ±1 cell). Cell width = args(1).
        val (p, w) = (a(0), a(1).cast("double"))
        concat(
          floor(p.getField("x") / w).cast("long").cast("string"),
          lit(","),
          floor(p.getField("y") / w).cast("long").cast("string"))
      case "point.withinbbox" =>
        // same-srid required (mixed → NULL); WGS longitude wraps when
        // lower-left > upper-right (crossing the antimeridian,
        // spatial.feature wrap-around scenarios); latitude and height/z
        // are plain ranges (an inverted latitude box is empty)
        if ((0 to 2).exists(i => argType(i).contains(NullType)))
          return lit(null).cast("boolean")
        val (p, ll, ur) = (a(0), a(1), a(2))
        val srid = p.getField("srid")
        val geoB = srid.isin(4326L, 4979L)
        val threeB = srid.isin(9157L, 4979L)
        val xPlain = p.getField("x").between(
          ll.getField("x"), ur.getField("x"))
        val xWrap = when(
          ll.getField("x") <= ur.getField("x"), xPlain)
          .otherwise(
            p.getField("x") >= ll.getField("x") ||
              p.getField("x") <= ur.getField("x"))
        val xOk = when(geoB, xWrap).otherwise(xPlain)
        val yOk = p.getField("y").between(
          ll.getField("y"), ur.getField("y"))
        val zOk = when(
          threeB,
          p.getField("z").between(ll.getField("z"), ur.getField("z")))
          .otherwise(lit(true))
        when(
          srid === ll.getField("srid") && srid === ur.getField("srid"),
          xOk && yOk && zOk)
          .otherwise(lit(null).cast("boolean"))

      // ---- predicates / casts ----
      case "isempty" => size(a(0)) === 0
      case "exists" => a(0).isNotNull
      case "coalesce" => coalesce(args.map(ctx.lower): _*)
      case "toboolean" =>
        cyConvert(a(0), argType(0), "boolean", Some("toBoolean"))
      case "tobooleanornull" =>
        cyConvert(a(0), argType(0), "boolean")
      case "tointeger" =>
        cyConvert(a(0), argType(0), "long", Some("toInteger"))
      case "tointegerornull" =>
        cyConvert(a(0), argType(0), "long")
      case "tofloat" =>
        cyConvert(a(0), argType(0), "double", Some("toFloat"))
      case "tofloatornull" =>
        cyConvert(a(0), argType(0), "double")
      case "tostring" =>
        cyConvert(a(0), argType(0), "string", Some("toString"))
      case "tostringornull" =>
        cyConvert(a(0), argType(0), "string")
      case "tointegerlist" | "tofloatlist" | "tostringlist" |
          "tobooleanlist" =>
        val target = name.toLowerCase match {
          case "tointegerlist" => "long"
          case "tofloatlist" => "double"
          case "tobooleanlist" => "boolean"
          case _ => "string"
        }
        val elemT = argType(0).collect { case ArrayType(et, _) => et }
        transform(a(0), x => cyConvert(x, elemT, target))
      case "valuetype" => typeof(a(0))

      // ---- list ----
      case "size" | "length" =>
        args.lift(0) match {
          // length(p) of a shortest-path binding = its hop count
          case Some(Var(n)) if ctx.isPathVar(n) => Frames.f(n, "_len")
          case _ =>
            argType(0) match {
              case Some(StringType) => length(a(0)).cast("long")
              case Some(s: StructType) => lit(s.size.toLong)
              case _ => size(a(0)).cast("long")
            }
        }
      case "propertysize" =>
        // Byte size of the property in the reference's PropertyStore
        // (awesome_memgraph_functions.cpp:547 PropertySize,
        // property_store.cpp DecodePropertyValueSize): 1 metadata byte +
        // 1 property-id byte + the typed payload. A property covered by K
        // vector indexes is externalized — the store keeps only the
        // index-id list: 1 + 1 + count(1) + 8*K bytes.
        val entity = args.headOption.getOrElse(
          throw new IllegalArgumentException("propertySize(entity, name)"))
        val propName = args.lift(1) match {
          case Some(Lit(s: String)) => s
          case _ => throw new IllegalArgumentException(
            "propertySize: property name must be a string literal")
        }
        val v = ctx.lower(Prop(entity, propName))
        val vt = ctx.typeOf(v)
        def intBytes(c: Column): Column =
          when(c.between(-128L, 127L), 1L)
            .when(c.between(-32768L, 32767L), 2L)
            .when(c.between(Int.MinValue.toLong, Int.MaxValue.toLong), 4L)
            .otherwise(8L)
        val encoded: Column = vt match {
          case Some(ArrayType(DoubleType | FloatType, _)) =>
            // ListType::DOUBLE — list_type(1) + count(1) + 8 per element
            lit(4L) + lit(8L) * size(v.cast("array<double>"))
          case Some(ArrayType(LongType | IntegerType | ShortType, _)) =>
            // ListType::INT — each int stored as int32
            lit(4L) + lit(4L) * size(v)
          case Some(LongType | IntegerType | ShortType | ByteType) =>
            lit(2L) + intBytes(v.cast("long"))
          case Some(DoubleType | FloatType) => lit(10L)
          case Some(BooleanType) => lit(2L)
          case Some(StringType) =>
            lit(2L) +
              when(length(v) < 256, 1L)
                .when(length(v) < 65536, 2L).otherwise(4L) +
              length(v).cast("long")
          case Some(st: StructType) if st.fieldNames.contains("srid") =>
            // POINT: 2 or 3 int64 members
            lit(2L) + when(v.getField("z").isNull, 16L).otherwise(24L)
          case Some(NullType) | None => lit(0L)
          case Some(other) =>
            throw new UnsupportedOperationException(
              s"propertySize over $other is not supported")
        }
        // vector-index coverage: one externalized id per covering index
        val vecCovering = ctx.indexes.filter(d =>
          d.props.headOption.contains(propName) &&
            (d.kind == "vector" || d.kind == "vector-edge"))
        val kCol: Column = {
          val terms = vecCovering.flatMap { d =>
            val spec = d.label.getOrElse("*")
            args.headOption match {
              case Some(Var(n)) if ctx.isEdgeVar(n) && d.kind == "vector-edge" =>
                Some(when(GraphState.LabelSpec.edgePredicate(
                  spec, Frames.f(n, GraphState.TypeCol)), 1L).otherwise(0L))
              case Some(Var(n))
                  if ctx.isNodeOrEdgeVar(n) && !ctx.isEdgeVar(n) &&
                    d.kind == "vector" =>
                Some(when(GraphState.LabelSpec.rowPredicate(
                  spec, Frames.f(n, GraphState.LabelsCol)), 1L).otherwise(0L))
              case _ => None
            }
          }
          if (terms.isEmpty) lit(0L) else terms.reduce(_ + _)
        }
        when(v.isNull, lit(0L))
          .when(kCol > 0L, lit(3L) + lit(8L) * kCol)
          .otherwise(encoded)

      case "head" =>
        argType(0) match {
          case Some(NullType) => lit(null)
          // empty list → NULL, not INVALID_ARRAY_INDEX under ANSI mode
          case _ => try_element_at(a(0), lit(1))
        }
      case "last" =>
        argType(0) match {
          case Some(NullType) => lit(null)
          case _ =>
            // empty list → NULL, not an index error
            when(size(a(0)) === 0, lit(null))
              .otherwise(try_element_at(a(0), lit(-1)))
        }
      case "tail" => slice(a(0), lit(2), greatest(size(a(0)) - 1, lit(0)))
      // ---- MAGE collections module (src/mage/cpp/collections_module/
      // algorithm/collections.hpp) — pure Column expressions, so they
      // vectorize over any column, not just literals ----
      case "collections.sum_longs" =>
        aggregate(a(0).cast("array<long>"), lit(0L), (acc, x) => acc + x)
      case "collections.sum" =>
        aggregate(a(0).cast("array<double>"), lit(0.0), (acc, x) => acc + x)
      case "collections.avg" =>
        // avg([]) is NULL, not DIVIDE_BY_ZERO (ANSI mode is on repo-wide)
        when(size(a(0)) === 0, lit(null)).otherwise(
          aggregate(a(0).cast("array<double>"), lit(0.0), (acc, x) => acc + x) /
            size(a(0)))
      case "collections.max" => array_max(a(0))
      case "collections.min" => array_min(a(0))
      case "collections.contains" | "collections.contains_sorted" =>
        array_contains(a(0), a(1))
      case "collections.contains_all" =>
        forall(a(1), v => array_contains(a(0), v))
      case "collections.intersection" => array_intersect(a(0), a(1))
      case "collections.union" => array_union(a(0), a(1))
      case "collections.union_all" => concat(a(0), a(1))
      case "collections.remove_all" | "collections.subtract" =>
        array_except(a(0), a(1))
      case "collections.disjunction" =>
        array_union(array_except(a(0), a(1)), array_except(a(1), a(0)))
      case "collections.sort" => array_sort(a(0))
      case "collections.reverse" => reverse(a(0))
      case "collections.to_set" | "collections.toset" => array_distinct(a(0))
      case "collections.flatten" => flatten(a(0))
      case "collections.duplicates" =>
        filter(array_distinct(a(0)),
          x => size(filter(a(0), y => y === x)) > 1)
      case "collections.pairs" =>
        // consecutive pairs [[a,b],[b,c],…]; singleton/empty slices are
        // empty, so the zip is [] without a guard
        zip_with(
          slice(a(0), lit(1), greatest(size(a(0)) - 1, lit(0))),
          slice(a(0), lit(2), greatest(size(a(0)) - 1, lit(0))),
          (x, y) => array(x, y))
      case "collections.frequencies_as_map" =>
        map_from_entries(transform(array_distinct(a(0)),
          x => struct(
            x.cast("string").as("key"),
            size(filter(a(0), y => y === x)).cast("long").as("value"))))

      // ---- legacy query_modules: the convert module
      // (query_modules/convert.cpp) and date module functions
      // (query_modules/date.py) — pure Column expressions ----
      case "convert.str2object" =>
        // JSON text → engine value; variant IS the engine's runtime-typed
        // value representation (convert.cpp:84 ParseJsonToMgpValue)
        parse_json(a(0).cast("string"))
      case "convert.to_json" | "convert.tojson" =>
        // to_json needs a container — wrap in a one-field struct and
        // strip the {"v": … } frame, which serializes ANY value kind
        val wrapped = to_json(struct(a(0).as("v")))
        when(a(0).isNull, lit("null"))
          .otherwise(wrapped.substr(lit(6), length(wrapped) - 6))
      case "convert.from_json_map" | "convert.from_json_list" =>
        // optional dotted path selects a nested part first
        // (convert.cpp:206 ResolveJsonPath); null string / unresolved
        // path / JSON null → null. Shape validation is lenient here: the
        // selected value returns as variant whatever its kind.
        val path = args.lift(1) match {
          case Some(Lit(s: String)) if s.nonEmpty => "$." + s
          case _ => "$"
        }
        try_variant_get(parse_json(a(0).cast("string")), path, "variant")
      case "convert.to_map" | "convert.tomap" =>
        import GraphState.{DstCol, IdCol, LabelsCol, SrcCol, TypeCol}
        def asVariant(c: Column): Column = try_variant_get(
          parse_json(to_json(struct(c.as("v")))), "$.v", "variant")
        argType(0) match {
          case Some(_: MapType) => a(0)
          case Some(st: StructType) =>
            // node/relationship value → its property map (convert.cpp:273)
            val fields = st.fieldNames.filterNot(
              Set(IdCol, LabelsCol, SrcCol, DstCol, TypeCol))
            if (fields.isEmpty)
              lit(null).cast(MapType(StringType, VariantType))
            else
              map_from_arrays(
                array(fields.map(lit(_)): _*),
                array(fields.map(f => asVariant(a(0).getField(f))): _*))
          case _ => lit(null).cast(MapType(StringType, VariantType))
        }
      case "date.add" =>
        // date.py:122 add(time, unit, add_value, add_unit) → total in
        // `unit` (mage/date/unit_conversion.py alias sets)
        def unitMs(u: Column): Column =
          when(u.isin("ms", "milli", "millis", "milliseconds"), 1L)
            .when(u.isin("s", "second", "seconds"), 1000L)
            .when(u.isin("m", "minute", "minutes"), 60000L)
            .when(u.isin("h", "hour", "hours"), 3600000L)
            .when(u.isin("d", "day", "days"), 86400000L)
            .otherwise(raise_error(
              concat(lit("The unit "), u, lit(" is not correct.")))
              .cast("long"))
        ((a(0).cast("long") * unitMs(a(1)) +
          a(2).cast("long") * unitMs(a(3))) / unitMs(a(1))).cast("long")
      case "date.convert_format" =>
        DateConvert.convertFormat(a(0), args.lift(1), args.lift(2))
      case "mgps.version" => lit("5.9.0") // mgps.py:23 connector shim
      case "mgps.validate_predicate" =>
        // mgps.py:28: raise message % params when predicate holds;
        // literal message/params interpolate at plan time, otherwise the
        // raw message raises
        val msg = (args.lift(1), args.lift(2)) match {
          case (Some(Lit(m: String)), Some(ListLit(ps)))
              if ps.forall(_.isInstanceOf[Lit]) =>
            lit(ps.collect { case Lit(v) => v }
              .foldLeft(m)((acc, p) =>
                acc.replaceFirst("%[sd]", String.valueOf(p))))
          case _ => a(1).cast("string")
        }
        when(a(0), raise_error(msg).cast("boolean")).otherwise(lit(true))

      // ---- MAGE map module (src/mage/cpp/map_module/algorithm/map.hpp);
      // second map / explicit entry wins on key conflicts (apoc heritage)
      case "map.from_pairs" | "map.frompairs" =>
        map_from_entries(transform(a(0),
          p => struct(
            element_at(p, 1).cast("string").as("key"),
            element_at(p, 2).as("value"))))
      case "map.from_lists" | "map.fromlists" => map_from_arrays(a(0), a(1))
      // Cypher map LITERALS lower to structs (static field names), while
      // from_pairs/from_lists produce real MAP columns — the map.*
      // helpers dispatch on the argument's static type and handle both
      case "map.merge" =>
        (argType(0), argType(1)) match {
          case (Some(s1: StructType), Some(s2: StructType)) =>
            val keep = s1.fieldNames.filterNot(s2.fieldNames.contains)
            struct(
              keep.map(f => a(0).getField(f).as(f)) ++
                s2.fieldNames.map(f => a(1).getField(f).as(f)): _*)
          case _ =>
            map_concat(
              map_filter(a(0), (k, _) => !map_contains_key(a(1), k)), a(1))
        }
      case "map.merge_list" | "map.mergelist" =>
        // fold the maps left-to-right seeded by the head, later maps win;
        // try_element_at so merge_list([]) is NULL instead of an ANSI error
        aggregate(
          slice(a(0), lit(2), greatest(size(a(0)) - 1, lit(0))),
          try_element_at(a(0), lit(1)),
          (acc, m) =>
            map_concat(map_filter(acc, (k, _) => !map_contains_key(m, k)), m))
      case "map.remove_key" | "map.removekey" | "map.remove_keys" |
          "map.removekeys" =>
        val single = Set("map.remove_key", "map.removekey")
          .contains(name.toLowerCase)
        val dropKeys: Seq[String] = args.lift(1) match {
          case Some(Lit(s: String)) => Seq(s)
          case Some(ListLit(items)) => items.collect { case Lit(s: String) => s }
          case _ => Nil
        }
        argType(0) match {
          case Some(s: StructType) =>
            require(
              dropKeys.nonEmpty,
              s"$name over a map literal needs literal key(s)")
            struct(s.fieldNames.filterNot(dropKeys.contains)
              .map(f => a(0).getField(f).as(f)): _*)
          case _ if single =>
            map_filter(a(0), (k, _) => k =!= a(1))
          case _ =>
            map_filter(a(0), (k, _) => !array_contains(a(1), k))
        }
      case "map.set_key" | "map.setkey" =>
        (argType(0), args.lift(1)) match {
          case (Some(s: StructType), Some(Lit(key: String))) =>
            struct(s.fieldNames.filterNot(_ == key)
              .map(f => a(0).getField(f).as(f)) :+ a(2).as(key): _*)
          case _ =>
            map_concat(
              map_filter(a(0), (k, _) => k =!= a(1)),
              map_from_arrays(array(a(1)), array(a(2))))
        }
      case "map.from_values" | "map.fromvalues" =>
        // [k1, v1, k2, v2, …] → map; guard the pair-index stream so
        // from_values([]) is an empty map (sequence(1,0) would DESCEND)
        val pairsN = (size(a(0)) / 2).cast("int")
        map_from_entries(transform(
          when(pairsN >= 1, sequence(lit(1), pairsN))
            .otherwise(array().cast("array<int>")),
          i => struct(
            element_at(a(0), i * 2 - 1).cast("string").as("key"),
            element_at(a(0), i * 2).as("value"))))
      case "map.get" =>
        val base = (argType(0), args.lift(1)) match {
          case (Some(s: StructType), Some(Lit(key: String))) =>
            if (s.fieldNames.contains(key)) a(0).getField(key) else lit(null)
          case _ => element_at(a(0), a(1))
        }
        if (args.size >= 3) coalesce(base, a(2)) else base

      // ---- MAGE label module ----
      case "label.exists" =>
        val labelsC = nodeEdgeVar(0)
          .map(n => Frames.f(n, GraphState.LabelsCol))
          .getOrElse(a(0).getField(GraphState.LabelsCol))
        coalesce(array_contains(labelsC, a(1)), lit(false))

      case "range" =>
        // Cypher range(a,b[,step]) is EMPTY when the step's sign can't reach
        // b from a (range(1,-1) = []); Spark's `sequence` instead auto-picks
        // a descending step — guard it (awesome_memgraph_functions.cpp Range).
        val (lo, hi) = (a(0).cast("long"), a(1).cast("long"))
        val empty = array().cast("array<long>")
        if (args.size >= 3) {
          val st = a(2).cast("long")
          when((st > 0 && lo <= hi) || (st < 0 && lo >= hi),
            sequence(lo, hi, st)).otherwise(empty)
        } else when(lo <= hi, sequence(lo, hi)).otherwise(empty)
      case "toset" => array_distinct(a(0))
      case "uniformsample" =>
        // n draws WITH replacement (awesome_memgraph_functions.cpp:1085).
        // The reference uses a thread-local mt19937 (impure); a batch
        // engine needs deterministic output, so the index stream is a
        // fixed Weyl sequence — uniform over positions, reproducible for
        // the oracle.
        val list = a(0)
        val n = a(1).cast("long")
        val full = transform(
          sequence(lit(0L), greatest(n - 1, lit(0L))),
          i =>
            element_at(
              list,
              ((i * lit(2654435761L) + lit(40503L)) % size(list) + 1)
                .cast("int")))
        when(list.isNull || a(1).isNull || size(list) === 0, lit(null))
          .otherwise(slice(full, lit(1), n.cast("int")))
      case "reverse" =>
        argType(0) match {
          case Some(_: ArrayType) => reverse(a(0))
          case _ => reverse(a(0))
        }

      // ---- MAGE util / math modules (util.cpp:15, math.cpp:33) ----
      case "util.md5" =>
        argType(0) match {
          case Some(_: ArrayType) =>
            // list input concatenates element string forms (util.cpp:16)
            md5(aggregate(
              a(0), lit(""), (acc, x) => concat(acc, x.cast("string"))))
          case _ => md5(a(0).cast("string"))
        }
      case "math.round" =>
        // math.round(value, precision=0, mode='HALF_UP'); the eight Java
        // RoundingMode variants (math.cpp ApplyRounding:33-95)
        val value = a(0).cast("double")
        val precision =
          if (args.size > 1) a(1).cast("int") else lit(0)
        val mode = args.lift(2) match {
          case None => "HALF_UP"
          case Some(Lit(s: String)) => s.toUpperCase
          case Some(other) =>
            throw new IllegalArgumentException(
              s"math.round: mode must be a literal string, got $other")
        }
        val p = pow(lit(10.0), precision)
        val scaled = value * p
        val fl = floor(scaled)
        val ce = ceil(scaled)
        val frac = scaled - fl
        val rounded: Column = mode match {
          case "CEILING" => ce
          case "FLOOR" => fl
          case "UP" => when(value >= 0, ce).otherwise(fl)
          case "DOWN" => when(value >= 0, fl).otherwise(ce)
          case "HALF_UP" => // std::round — half away from zero
            when(scaled >= 0, floor(scaled + 0.5))
              .otherwise(ceil(scaled - 0.5))
          case "HALF_DOWN" => when(frac > 0.5, ce).otherwise(fl)
          case "HALF_EVEN" =>
            when(frac < 0.5, fl)
              .when(frac > 0.5, ce)
              .otherwise(when(fl.cast("long") % 2 === 0, fl).otherwise(ce))
          case "UNNECESSARY" =>
            when(scaled === fl, fl).otherwise(
              raise_error(lit("Rounding necessary for UNNECESSARY mode")))
          case other =>
            throw new IllegalArgumentException(
              s"math.round: unknown rounding mode $other")
        }
        rounded.cast("double") / p

      // ---- math (:2102-2124) ----
      case "abs" =>
        // the reference's ABS takes Null|Number only
        // (awesome_memgraph_functions.cpp Abs FType) — a string/boolean
        // property raises instead of silently coercing
        argType(0) match {
          case Some(StringType) | Some(BooleanType) =>
            when(a(0).isNull, lit(null).cast("double"))
              .otherwise(raise_error(lit(
                "'abs' argument must be a number.")).cast("double"))
          case _ => abs(a(0))
        }
      case "ceil" => ceil(a(0)).cast("double")
      case "floor" => floor(a(0)).cast("double")
      case "round" =>
        if (args.size > 1) args(1) match {
          case Lit(n: Long) => round(a(0), n.toInt)
          case _ =>
            // Spark's Round needs a foldable scale; for a dynamic scale use
            // the HALF_UP formula directly (portable — oracle mirrors it)
            val p = pow(lit(10.0), a(1).cast("int"))
            signum(a(0)) * floor(abs(a(0)) * p + 0.5) / p
        }
        else round(a(0))
      case "sign" => signum(a(0)).cast("long")
      case "sqrt" => sqrt(a(0))
      // assert(bool[, message]) (awesome_memgraph_functions.cpp:1235):
      // passes through true, raises on anything else
      case "assert" =>
        val msg =
          if (args.size > 1) a(1).cast("string")
          else lit("Assertion failed")
        when(a(0) <=> lit(true), lit(true))
          .otherwise(raise_error(concat(lit("assert: "), msg)))
      case "exp" => exp(a(0))
      // C++ std::log semantics (awesome_memgraph_functions LOG): negative
      // → NaN, zero → -Inf; Spark's log NULLs both
      case "log" =>
        when(a(0) < 0, lit(Double.NaN))
          .when(a(0) === 0, lit(Double.NegativeInfinity))
          .otherwise(log(a(0)))
      case "log10" =>
        when(a(0) < 0, lit(Double.NaN))
          .when(a(0) === 0, lit(Double.NegativeInfinity))
          .otherwise(log10(a(0)))
      case "e" => lit(math.E)
      case "pi" => lit(math.Pi)
      case "rand" => rand()
      case "sin" => sin(a(0))
      case "cos" => cos(a(0))
      case "tan" => tan(a(0))
      case "asin" => asin(a(0))
      case "acos" => acos(a(0))
      case "atan" => atan(a(0))
      case "atan2" => atan2(a(0), a(1))

      // ---- string (:2127-2143) ----
      case "tolower" => lower_(a(0))
      case "toupper" => upper(a(0))
      case "trim" => trim(a(0))
      case "ltrim" => ltrim(a(0))
      case "rtrim" => rtrim(a(0))
      case "replace" => replace_(a(0), a(1), a(2))
      case "split" => args(1) match {
        case Lit(s: String) => split(a(0), java.util.regex.Pattern.quote(s))
        // dynamic delimiter: \Q…\E-quote it as a regex at runtime
        case _ => split(a(0), concat(lit("\\Q"), a(1), lit("\\E")), lit(-1))
      }
      case "substring" =>
        // Cypher substring(s, start[, len]) is 0-based
        if (args.size > 2) a(0).substr(a(1).cast("int") + 1, a(2).cast("int"))
        else a(0).substr(a(1).cast("int") + 1, length(a(0)))
      case "left" => a(0).substr(lit(1), a(1).cast("int"))
      case "right" => a(0).substr(length(a(0)) - a(1).cast("int") + 1, a(1).cast("int"))
      case "contains" => a(0).contains(a(1))
      case "startswith" => a(0).startsWith(a(1))
      case "endswith" => a(0).endsWith(a(1))

      // ---- temporal (:2150-2154) ----
      case "date" => if (args.isEmpty) current_date() else to_date(a(0))
      case "datetime" | "localdatetime" =>
        // string forms accept an ISO offset/zone suffix (the reference's
        // ZonedDateTime parse, utils/temporal.hpp) — Cast normalizes the
        // instant to the session zone (UTC), which is the value model
        // here (one absolute instant, no carried zone field); the map
        // ctor takes an explicit `timezone` key via make_timestamp
        args.headOption match {
          case None => current_timestamp()
          case Some(MapLit(kvs)) =>
            val m = kvs.toMap
            def f(k: String, dflt: Int): Column =
              m.get(k).map(e => ctx.lower(e).cast("int"))
                .getOrElse(lit(dflt))
            val sec = m.get("second").map(e => ctx.lower(e).cast("decimal(16,6)"))
              .getOrElse(lit(0).cast("decimal(16,6)"))
            m.get("timezone") match {
              case Some(tz) =>
                make_timestamp(
                  f("year", 1970), f("month", 1), f("day", 1),
                  f("hour", 0), f("minute", 0), sec, ctx.lower(tz))
              case None =>
                make_timestamp(
                  f("year", 1970), f("month", 1), f("day", 1),
                  f("hour", 0), f("minute", 0), sec)
            }
          case Some(_) =>
            // ISO strings may carry a trailing [Zone] id (the reference's
            // ZonedDateTime prints '…T08:11:31[Etc/UTC]'): convert in that
            // zone; a numeric offset (or none) casts directly
            val s0 = a(0)
            val zone = regexp_extract(s0, "\\[([^\\]]+)\\]$", 1)
            val base = regexp_replace(s0, "\\[[^\\]]+\\]$", "")
            val hasOffset = base.rlike("([+-]\\d{2}:?\\d{2}|Z)$")
            when(zone === "", s0.try_cast("timestamp"))
              .when(hasOffset, base.try_cast("timestamp"))
              .otherwise(
                to_utc_timestamp(base.try_cast("timestamp_ntz"), zone))
        }
      case "timestamp" => unix_micros(current_timestamp())

      // ---- byte strings (:2148-2149; ToByteString/FromByteString) ----
      case "tobytestring" =>
        // '0x…' hex → BINARY; odd length gets a leading zero; '' → empty
        val h0 = a(0)
        val hexPart = h0.substr(lit(3), length(h0))
        val padded =
          when(length(hexPart) % 2 === 1, concat(lit("0"), hexPart))
            .otherwise(hexPart)
        when(h0 === "", lit(Array.empty[Byte]))
          .when(
            h0.startsWith("0x") || h0.startsWith("0X"),
            unhex(padded))
          .otherwise(raise_error(
            concat(lit("'toByteString' argument must start with '0x': "), h0)))
      case "frombytestring" =>
        // BINARY → '0x' + lowercase hex, zero-padded to a minimum byte
        // length; empty input → ''
        val hexs = org.apache.spark.sql.functions.lower(hex(a(0)))
        val padded =
          if (args.size >= 2)
            lpad(
              hexs,
              greatest(length(hexs), a(1).cast("int") * 2),
              lit("0"))
          else hexs
        when(length(a(0)) === 0, lit("")).otherwise(concat(lit("0x"), padded))

      // ---- counters (:1249) ----
      case "counter" =>
        // counter(name, initial[, step]): the reference keeps one mutable
        // cell per name, incremented per evaluation in row order
        // (awesome_memgraph_functions.cpp:1249). Batch analog: initial +
        // step × row-rank in the frame's current order — per call site
        // (cross-statement shared state has no batch meaning).
        val init = a(1).cast("long")
        val step = if (args.size >= 3) a(2).cast("long") else lit(1L)
        val rn = row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(monotonically_increasing_id()))
        init + step * (rn.cast("long") - 1L)
      // duration(): reference `utils/temporal.cpp` (DurationParameters map
      // ctor / ParseDurationParameters ISO-8601) → DayTimeIntervalType.
      // Map keys are singular like the reference; plural accepted. All
      // components fold to seconds so fractional values work uniformly.
      case "duration" =>
        args(0) match {
          case MapLit(kvs) =>
            val m = kvs.toMap
            def f(ks: String*): Column =
              ks.collectFirst { case k if m.contains(k) => m(k) }
                .map(e => ctx.lower(e).cast("double"))
                .getOrElse(lit(0.0))
            val total = f("day", "days") * 86400 + f("hour", "hours") * 3600 +
              f("minute", "minutes") * 60 + f("second", "seconds")
            make_dt_interval(lit(0), lit(0), lit(0), total.cast("decimal(18,6)"))
          case Lit(s: String) if s.startsWith("P") =>
            val Iso =
              """P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?""".r
            s match {
              case Iso(d, h, mi, se) =>
                def p(x: String) = Option(x).map(_.toDouble).getOrElse(0.0)
                val total = p(d) * 86400 + p(h) * 3600 + p(mi) * 60 + p(se)
                make_dt_interval(
                  lit(0), lit(0), lit(0),
                  lit(total).cast("decimal(18,6)"))
              case _ =>
                throw new IllegalArgumentException(
                  s"unparseable ISO-8601 duration: $s (Y/M components are " +
                    "calendar-dependent and unsupported)")
            }
          case _ => a(0).cast("interval day to second")
        }
      // duration.between(a, b) = b - a as a day-time interval (reference
      // temporal difference operator, utils/temporal.cpp operator-).
      case "duration.between" =>
        a(1).cast("timestamp") - a(0).cast("timestamp")

      // localTime("HH:MM[:SS[.ffffff]]") — the reference's LocalTime
      // (utils/temporal.cpp ParseLocalTimeParameters) is a time-of-day;
      // Spark has no TIME type, so it lowers to the interval since
      // midnight (DayTimeIntervalType) — subtraction/comparison then work
      // natively and a stored value prints as a duration.
      case "localtime" =>
        args(0) match {
          case Lit(s: String) =>
            val T = """(\d{1,2}):(\d{2})(?::(\d{2})(?:\.(\d{1,9}))?)?""".r
            s match {
              case T(h, mi, se, fr) =>
                // component range check (ParseLocalTimeParameters — the
                // reference rejects '25:99')
                if (h.toLong >= 24 || mi.toLong >= 60 ||
                  Option(se).exists(_.toLong >= 60))
                  throw new IllegalArgumentException(
                    s"local time components out of range: $s")
                val frac = Option(fr)
                  .map(f => f.padTo(6, '0').take(6).toLong / 1e6)
                  .getOrElse(0.0)
                val total = h.toLong * 3600 + mi.toLong * 60 +
                  Option(se).map(_.toLong).getOrElse(0L) + frac
                make_dt_interval(
                  lit(0), lit(0), lit(0),
                  lit(total).cast("decimal(18,6)"))
              case _ =>
                throw new IllegalArgumentException(
                  s"unparseable local time: $s")
            }
          case _ => a(0).cast("interval day to second")
        }

      // ---- enums (awesome_memgraph_functions.cpp:1816 ToEnum;
      // enum_store.hpp) ----
      // getHopsCounter() (reference hops_limit.hpp): exact only when the
      // statement planned no expansion (0); otherwise it reports the
      // reference's LAZY pull count, which batch execution can't
      // reproduce — raise, never a wrong number.
      case "gethopscounter" =>
        ctx.hopsCounter
          .map(n => lit(n).cast("long"))
          .getOrElse(throw new UnsupportedOperationException(
            "getHopsCounter() after a traversal reports the reference's " +
              "lazy pull count — unsupported in batch"))

      // vector_search.cosine_similarity(v1, v2) — scalar function form
      // (reference vector_search module): errors on empty / mismatched /
      // zero-norm / non-numeric vectors, else dot/(|a||b|).
      case "vector_search.cosine_similarity" =>
        val v1 = a(0).cast("array<double>")
        val v2 = a(1).cast("array<double>")
        def dot(x: Column, y: Column) = aggregate(
          zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, t) => acc + t)
        val n1 = sqrt(dot(v1, v1))
        val n2 = sqrt(dot(v2, v2))
        val bad = size(v1) === 0 || size(v2) === 0 ||
          size(v1) =!= size(v2) || n1 === 0.0 || n2 === 0.0 ||
          n1.isNull || n2.isNull
        when(
          bad,
          raise_error(lit(
            "cosine_similarity needs two equal-dimension, non-zero " +
              "numeric vectors")).cast("double"))
          .otherwise(dot(v1, v2) / (n1 * n2))

      case "toenum" =>
        if (ctx.enums.isEmpty)
          throw new IllegalArgumentException("no enums defined (CREATE ENUM)")
        if (args.size >= 2) {
          // toEnum('Name', valueExpr): name must be a literal; the value
          // validates per row against the member list (broadcast literal
          // array — enum domains are tiny by definition)
          val name = args(0) match {
            case Lit(s: String) => s
            case _ =>
              throw new IllegalArgumentException(
                "toEnum(name, value): name must be a string literal")
          }
          val members = ctx.enums.getOrElse(
            name,
            throw new IllegalArgumentException(s"unknown enum '$name'"))
          val v = a(1)
          when(v.isin(members: _*), concat(lit(s"$name::"), v))
            .otherwise(raise_error(concat(
              lit(s"invalid member for enum '$name': "), v.cast("string"))))
        } else {
          // toEnum('Name::Value') — validate against the full store
          val all = ctx.enums.toSeq.flatMap { case (n, vs) =>
            vs.map(v => s"$n::$v")
          }
          val v = a(0)
          when(v.isin(all: _*), v)
            .otherwise(raise_error(concat(
              lit("invalid enum value: "), v.cast("string"))))
        }

      // ---- misc ----
      case "randomuuid" => uuid()

      case "llm.complete" =>
        // llm.complete(text, config) (reference llm.py:31 — litellm
        // remote completion). No provider exists in this environment
        // (zero egress, same reason the reference raises without
        // litellm), so this is a clearly-marked DETERMINISTIC STUB: an
        // extractive prefix "completion" (first 25 whitespace tokens) so
        // pipelines chaining llm.complete stay testable end-to-end; the
        // Spark-side plumbing (per-row codegen'd expression, config arg
        // accepted) is real.
        val t = trim(a(0))
        when(t.isNull, lit(null))
          .otherwise(concat_ws(" ", slice(split(t, "\\s+"), 1, 25)))

      case "text.join" =>
        args(1) match {
          case Lit(s: String) => array_join(a(0), s)
          case _ =>
            // dynamic separator: left fold with a (started, text) state so
            // empty-string elements join correctly (array_join needs a
            // literal separator)
            val sep = a(1)
            aggregate(
              a(0),
              struct(lit(false).as("has"), lit("").as("s")),
              (acc, x) =>
                struct(
                  lit(true).as("has"),
                  when(
                    acc.getField("has"),
                    concat(acc.getField("s"), sep, x.cast("string")))
                    .otherwise(x.cast("string")).as("s")),
              acc => acc.getField("s"))
        }
      case "text.format" =>
        // fmt-style template substitution (reference Text::Format,
        // text_module/algorithm/text.cpp:85: fmt::vformat with every arg
        // stringified): `{}` auto-indexes, `{i}` selects positionally.
        // Template must be a literal (it drives compile-time splitting);
        // the argument list's ELEMENTS are arbitrary expressions.
        val tmpl = args(0) match {
          case Lit(s: String) => s
          case _ =>
            throw new IllegalArgumentException(
              "text.format template must be a string literal")
        }
        val fmtArgs: Seq[Column] = args(1) match {
          case ListLit(items) => items.map(e => ctx.lower(e).cast("string"))
          case _ =>
            throw new IllegalArgumentException(
              "text.format arguments must be a list literal")
        }
        val token = "\\{(\\d*)\\}".r
        val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
        var pos = 0
        var auto = 0
        for (m <- token.findAllMatchIn(tmpl)) {
          if (m.start > pos) pieces += lit(tmpl.substring(pos, m.start))
          val idx =
            if (m.group(1).isEmpty) { val i = auto; auto += 1; i }
            else m.group(1).toInt
          if (idx >= fmtArgs.length)
            throw new IllegalArgumentException(
              s"text.format: placeholder {$idx} out of range")
          pieces += fmtArgs(idx)
          pos = m.end
        }
        if (pos < tmpl.length) pieces += lit(tmpl.substring(pos))
        if (pieces.isEmpty) lit("") else concat(pieces.toSeq: _*)

      case "text.replace" =>
        // literal (non-regex) global replace (Text::Replace,
        // text_module/algorithm/text.cpp:150 — a plain find loop); an
        // empty search string returns the input unchanged
        when(a(1) === lit(""), a(0))
          .otherwise(replace_(a(0), a(1), a(2)))
      case "text.regreplace" =>
        // regex replace (Text::RegReplace, text.cpp:178 std::regex_replace
        // — $1-style group references); empty pattern returns the input
        when(a(1) === lit(""), a(0))
          .otherwise(regexp_replace(a(0), a(1), a(2)))
      case "text.distance" =>
        // Levenshtein edit distance over code points (Text::Distance,
        // text.cpp:218 — the same DP, codegen'd here)
        levenshtein(a(0), a(1)).cast("long")
      case "text.indexof" =>
        // text.indexOf(text, lookup, from=0, to=-1) → first 0-based index
        // of `lookup` within [from, to), or -1 (Text::IndexOf,
        // text.cpp:258; null text/lookup → null, empty lookup → -1)
        val text = a(0)
        val lookup = a(1)
        val from0 =
          if (args.size > 2) coalesce(a(2).cast("int"), lit(0)) else lit(0)
        val to0 =
          if (args.size > 3) coalesce(a(3).cast("int"), lit(-1)) else lit(-1)
        val len = length(text)
        val to1 = when(to0 === -1 || to0 > len, len).otherwise(to0)
        val from1 = least(greatest(from0, lit(0)), to1)
        // locate is 1-based and searches from the given position
        val found =
          call_function("locate", lookup, text, (from1 + 1)) - lit(1)
        when(text.isNull || lookup.isNull, lit(null).cast("long"))
          .when(lookup === lit(""), lit(-1L))
          .when(
            from1 < to1 && found >= from1 && found < to1,
            found.cast("long"))
          .otherwise(lit(-1L))
      case "text.compare_cleaned" =>
        // ASCII-only normalization: keep [A-Za-z0-9], lowercase, compare
        // (Text::CompareCleaned + CleanForCompare, text.cpp:299 — the
        // reference intentionally drops non-ASCII; NULL inputs compare
        // false, never null)
        def cleaned(c: Column): Column =
          lower_(regexp_replace(c, "[^A-Za-z0-9]", ""))
        when(a(0).isNull || a(1).isNull, lit(false))
          .otherwise(cleaned(a(0)) === cleaned(a(1)))

      case other =>
        throw new UnsupportedOperationException(s"unknown function: $other")
    }
  }

  // avoid shadowing by sql.functions.{lower,replace}
  private def lower_(c: Column): Column =
    org.apache.spark.sql.functions.lower(c)
  private def replace_(c: Column, find: Column, repl: Column): Column =
    org.apache.spark.sql.functions.replace(c, find, repl)

  // ---- spatial point value (src/storage/v2/point.hpp) ----

  /** Point value layout: coordinates + the srid that fixes CRS and
    * dimensionality (7203/9157 cartesian 2d/3d, 4326/4979 WGS-84 2d/3d;
    * z is NULL for 2d points). */
  val PointType: StructType = StructType(Seq(
    StructField("x", DoubleType),
    StructField("y", DoubleType),
    StructField("z", DoubleType),
    StructField("srid", LongType)))

  /** Whether a struct value IS a point (schema marker). */
  def isPointStruct(s: StructType): Boolean =
    s.fieldNames.sameElements(Array("x", "y", "z", "srid"))

  private val PointAccessors =
    Set("x", "y", "z", "longitude", "latitude", "height", "crs", "srid")

  def isPointAccessor(key: String): Boolean = PointAccessors(key)

  /** Point property accessor (`p.longitude`, `p.srid`, …): CRS- and
    * dimensionality-checked like the reference — `longitude`/`latitude`
    * only on WGS-84, `z` only on 3d, `height` only on WGS-84 3d
    * (spatial.feature lookup scenarios raise on the rest). */
  def pointField(c: Column, key: String): Column = {
    val srid = c.getField("srid")
    val geo = srid.isin(4326L, 4979L)
    def guarded(cond: Column, value: Column, msg: String): Column =
      when(!coalesce(cond, lit(true)),
        raise_error(lit(msg)).cast("double")).otherwise(value)
    key match {
      case "x" => c.getField("x")
      case "y" => c.getField("y")
      case "longitude" =>
        guarded(geo, c.getField("x"),
          "longitude is only defined on WGS-84 points")
      case "latitude" =>
        guarded(geo, c.getField("y"),
          "latitude is only defined on WGS-84 points")
      case "z" =>
        guarded(srid.isin(9157L, 4979L), c.getField("z"),
          "z is only defined on 3d points")
      case "height" =>
        guarded(srid === 4979L, c.getField("z"),
          "height is only defined on WGS-84 3d points")
      case "crs" =>
        when(c.isNull, lit(null).cast("string"))
          .when(geo, lit("wgs-84")).otherwise(lit("cartesian"))
      case "srid" => srid
      case other =>
        throw new IllegalArgumentException(s"unknown point field: $other")
    }
  }

  /** Geodesic distance in meters on the WGS-84 ellipsoid — Lambert's
    * formula (reduced latitudes, first-order flattening correction):
    * within ≪0.1 m of the reference's boost geographic strategy at the
    * scales the conformance corpus pins, closed-form (codegen-friendly,
    * no iteration). Inputs in degrees. */
  def lambertMeters(
      lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val fEll = 1.0 / 298.257223563
    val aEll = 6378137.0
    def reduced(lat: Column) = atan(lit(1.0 - fEll) * tan(radians(lat)))
    val b1 = reduced(lat1)
    val b2 = reduced(lat2)
    val dl = radians(lon2 - lon1)
    val hav = {
      val sB = sin((b2 - b1) / 2)
      val sL = sin(dl / 2)
      sB * sB + cos(b1) * cos(b2) * sL * sL
    }
    val sig = lit(2.0) * asin(least(lit(1.0), sqrt(hav)))
    val p = (b1 + b2) / 2
    val q = (b2 - b1) / 2
    val c2 = {
      val ch = cos(sig / 2); ch * ch
    }
    val s2 = {
      val sh = sin(sig / 2); sh * sh
    }
    val x = when(c2 < 1e-12, lit(0.0)).otherwise(
      (sig - sin(sig)) * sin(p) * sin(p) * cos(q) * cos(q) / c2)
    val y = when(s2 < 1e-12, lit(0.0)).otherwise(
      (sig + sin(sig)) * cos(p) * cos(p) * sin(q) * sin(q) / s2)
    lit(aEll) * (sig - lit(fEll / 2.0) * (x + y))
  }
}
