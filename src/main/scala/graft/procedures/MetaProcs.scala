package graft.procedures

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.GraphState

/** `uuid` / `util` / `meta` MAGE modules (reference
  * `src/mage/cpp/uuid_module/uuid_module.cpp:37`,
  * `util_module/algorithm/util.cpp:15`,
  * `meta_module/algorithm/meta.cpp:158`), re-expressed as distributed
  * aggregations over the label/type frames — the reference walks every
  * node and relationship single-threaded; here each tally is one
  * column-pruned scan + map-side-combined aggregation, so the same
  * answers hold at cluster scale. `meta.stats_online` ==
  * `meta.stats_offline` here: states are immutable snapshots, so the
  * "online" delta-maintained counters and a fresh scan cannot disagree
  * (the reference needs the distinction only because its counters are
  * mutated mid-transaction). */
object MetaProcs {

  import GraphState.{DstCol, IdCol, LabelsCol, SrcCol, TypeCol}

  /** `CALL uuid.get() YIELD uuid` — one random v4 UUID. */
  def uuidGet(ctx: ProcContext): DataFrame =
    ctx.spark.range(1).select(expr("uuid()").as("uuid"))

  /** The reference's `Value::ToString` flattening for md5 input: a list
    * argument concatenates its elements' string forms (util.cpp:16-22). */
  private def md5Input(v: Any): String = v match {
    case null => ""
    case xs: Seq[_] => xs.map(md5Input).mkString("")
    case other => other.toString
  }

  /** `CALL util.md5(values) YIELD result`. */
  def utilMd5(ctx: ProcContext): DataFrame =
    ctx.spark.range(1).select(
      md5(lit(md5Input(ctx.args.headOption.orNull))).as("result"))

  /** Property keys PRESENT on at least one entity of ANY frame (a column
    * that exists but is all-NULL carries no key — matches the reference's
    * per-entity key walk, meta.cpp:102). Every frame's non-null-count
    * aggregate packs into a prop→count MAP (one shared schema), the maps
    * union into ONE plan, and a single action collects them — all frame
    * scans ride one job whose independent stages the scheduler runs
    * concurrently, instead of one job per frame multiplying scheduler
    * latency by the label count (VERDICT r16 schema_info/meta_stats
    * watch item). */
  private def presentKeysAll(
      frames: Seq[(DataFrame, Seq[String])]): Set[String] = {
    val per = frames.flatMap { case (df, meta) =>
      val props = df.columns.filterNot(meta.contains).toSeq
      if (props.isEmpty) None
      else Some(
        df.agg(
            count(col(props.head)).as("c0"),
            props.tail.zipWithIndex.map { case (p, i) =>
              count(col(p)).as(s"c${i + 1}")
            }: _*)
          .select(map_from_arrays(
            array(props.map(lit): _*),
            array(props.indices.map(i => col(s"c$i")): _*)).as("m")))
    }
    if (per.isEmpty) Set.empty
    else per
      .reduce(_ unionByName _)
      .collect()
      .iterator
      .flatMap(r =>
        r.getMap[String, Long](0).filter(_._2 > 0).keys)
      .toSet
  }

  /** `CALL meta.stats[_online|_offline]()` (meta.cpp:158-209).
    *
    * Every tally is an independent read-only action over an immutable
    * snapshot, so they run CONCURRENTLY (one Future per job) — the
    * sequential form pays ~20 job latencies back-to-back (one per label
    * frame's key walk alone), which at cluster scale leaves the whole
    * cluster idle between tiny jobs. */
  def metaStats(ctx: ProcContext): DataFrame = {
    val g = ctx.g
    val spark = ctx.spark
    val nodes = g.allNodes
    val edges = g.allEdges
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global

    // FAST PATH (one 2-column node scan + two 2-column edge scans, all
    // map-side-combined to tiny results — shuffled bytes ≈ zero): node
    // ids are `base << 48 + offset` (one id-namespace base per loader
    // label frame / per CREATE statement), so when every base carries ONE
    // distinct label set, an endpoint's labels are a function of
    // `id >> 48`. One grouped count over (base, labels) yields the
    // base→labels map, nodeCount AND the per-label tallies; grouped
    // counts over (type, endpoint-base) yield typeCounts AND the
    // "(:A)-[:T]->()" / "()-[:T]->(:B)" pattern tallies (meta.cpp:113-127)
    // by driver-side composition. The r12 plan sort-merge-joined the
    // 60 M-edge corpus against 27 M node labels TWICE plus three more
    // full-corpus jobs — tens of seconds at sf3, a wall at 100 TB.
    //
    // FALLBACK: a base whose rows carry ≠1 distinct label set (partial
    // SET :Label) breaks the invariant — re-plan as the explicit
    // explode / join+explode jobs (correct on any state).
    val baseGroupsF = Future(
      nodes
        .groupBy(shiftright(col(IdCol), 48).as("__b"), col(LabelsCol))
        .agg(count(lit(1)).as("__n"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[String](1), r.getLong(2))))
    // ONE edge scan for both endpoint tallies: group by (type, src-base,
    // dst-base) — cardinality ≤ types × bases² (a few hundred rows) — and
    // marginalize driver-side. The previous shape ran two full edge-corpus
    // scans for aggregates that differ only in which endpoint they shift.
    val edgeTallyF = Future(
      edges
        .groupBy(
          col(TypeCol),
          shiftright(col(SrcCol), 48).as("__sb"),
          shiftright(col(DstCol), 48).as("__db"))
        .agg(count(lit(1)).as("__n"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))))
    val propKeysF = Future(presentKeysAll(
      g.nodeLabels.map(l => (g.nodes(l), GraphState.nodeMeta)) ++
        g.edgeTypes.map(t => (g.edges(t), GraphState.edgeMeta))))

    val baseGroups = Await.result(baseGroupsF, Duration.Inf)
    val edgeTally = Await.result(edgeTallyF, Duration.Inf)
    val srcTally = edgeTally
      .groupBy(x => (x._1, x._2)).toSeq
      .map { case ((t, b), xs) => (t, b, xs.map(_._4).sum) }
    val dstTally = edgeTally
      .groupBy(x => (x._1, x._3)).toSeq
      .map { case ((t, b), xs) => (t, b, xs.map(_._4).sum) }
    val uniform = baseGroups.groupBy(_._1).valuesIterator.forall(_.size == 1)

    val nodeCount = baseGroups.map(_._3).sum
    val typeCounts: Map[String, Long] =
      srcTally.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._3).sum }
    val relationshipCount = typeCounts.values.sum

    val (labelCounts, relPatterns0): (Map[String, Long], Map[String, Long]) =
      if (uniform) {
        val labelsOf: Map[Long, Seq[String]] =
          baseGroups.map(x => x._1 -> x._2).toMap
        val lc = scala.collection.mutable.Map.empty[String, Long]
        baseGroups.foreach { case (_, ls, n) =>
          ls.foreach(l => lc(l) = lc.getOrElse(l, 0L) + n)
        }
        val acc = scala.collection.mutable.Map.empty[String, Long]
        srcTally.foreach { case (t, b, n) =>
          labelsOf.getOrElse(b, Nil).foreach { l =>
            val k = s"(:$l)-[:$t]->()"
            acc(k) = acc.getOrElse(k, 0L) + n
          }
        }
        dstTally.foreach { case (t, b, n) =>
          labelsOf.getOrElse(b, Nil).foreach { l =>
            val k = s"()-[:$t]->(:$l)"
            acc(k) = acc.getOrElse(k, 0L) + n
          }
        }
        (lc.toMap, acc.toMap)
      } else {
        val lcF = Future(nodes
          .select(explode(col(LabelsCol)).as("l"))
          .groupBy("l").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
        val nodeLabels = nodes.select(col(IdCol), col(LabelsCol))
        val srcSide = edges.select(col(TypeCol), col(SrcCol).as(IdCol))
          .join(nodeLabels, Seq(IdCol))
          .select(col(TypeCol), explode(col(LabelsCol)).as("__l"))
          .select(
            concat(
              lit("(:"), col("__l"),
              lit(")-[:"), col(TypeCol), lit("]->()")).as("k"))
        val dstSide = edges.select(col(TypeCol), col(DstCol).as(IdCol))
          .join(nodeLabels, Seq(IdCol))
          .select(col(TypeCol), explode(col(LabelsCol)).as("__l"))
          .select(
            concat(
              lit("()-[:"), col(TypeCol),
              lit("]->(:"), col("__l"), lit(")")).as("k"))
        val patF = Future(
          srcSide.unionByName(dstSide)
            .groupBy("k").count()
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
        (Await.result(lcF, Duration.Inf), Await.result(patF, Duration.Inf))
      }

    val relPatterns: Map[String, Long] =
      relPatterns0 ++ typeCounts.map { case (t, n) => s"()-[:$t]->()" -> n }
    val propKeys: Set[String] = Await.result(propKeysF, Duration.Inf)

    import spark.implicits._
    val mapT = "map<string,bigint>"
    Seq((
      labelCounts.size.toLong,
      typeCounts.size.toLong,
      propKeys.size.toLong,
      nodeCount,
      relationshipCount,
      labelCounts,
      relPatterns,
      typeCounts))
      .toDF(
        "labelCount", "relationshipTypeCount", "propertyKeyCount",
        "nodeCount", "relationshipCount", "labels", "relationshipTypes",
        "relationshipTypesCount")
      .withColumn(
        "stats",
        struct(
          col("labelCount"), col("relationshipTypeCount"),
          col("propertyKeyCount"), col("nodeCount"),
          col("relationshipCount"), col("labels").cast(mapT),
          col("relationshipTypes").cast(mapT),
          col("relationshipTypesCount").cast(mapT)))
  }

  /** `search.node` / `search.node_all` (search_module/algorithm/
    * search.cpp:143): label→property disjunction search with a STRING
    * operand — the reference compares `n.p <op> $value` with a string
    * parameter, so non-string properties never match (Cypher mixed-type
    * comparison is NULL); string-only operators are type-guarded. `node`
    * dedups by id across every (label, property) pair, `node_all` emits
    * one row per matching pair. One pushed-down filter per label frame. */
  private def searchRun(dedup: Boolean)(ctx: ProcContext): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val pairs: Seq[(String, Seq[String])] = ctx.args.headOption match {
      case Some(m: Map[_, _]) =>
        m.toSeq.map { case (k, v) =>
          k.toString -> (v match {
            case s: String => Seq(s)
            case xs: Seq[_] => xs.map(_.toString)
            case other =>
              throw new IllegalArgumentException(
                s"label_property_map values must be string(s), got $other")
          })
        }
      case other =>
        throw new IllegalArgumentException(
          s"label_property_map must be a map, got $other")
    }
    val op = ctx.args.lift(1).map(_.toString.trim.toLowerCase).getOrElse("=")
    val value = ctx.args.lift(2) match {
      case Some(null) | None => null
      case Some(v) => v.toString
    }
    val g = ctx.g
    def matchedRows(label: String, prop: String): Option[DataFrame] = {
      val frame = g.nodesOrEmpty(label)
      if (value == null || !frame.columns.contains(prop)) return None
      if (frame.schema(prop).dataType != StringType) return None
      val c = col(prop)
      val v = lit(value)
      val pred = op match {
        case "=" | "exact" => c === v
        case "<>" => c =!= v
        case "<" => c < v
        case "<=" => c <= v
        case ">" => c > v
        case ">=" => c >= v
        case "starts with" => c.startsWith(value)
        case "ends with" => c.endsWith(value)
        case "contains" => c.contains(value)
        case "=~" =>
          // Cypher =~ is a FULL match (std::regex_match)
          c.rlike("^(?:" + value + ")$")
        case other =>
          throw new IllegalArgumentException(
            s"operator `$other` invalid, it must be one of (case " +
              "insensitive): [<=, =~, contains, <>, ends with, " +
              "starts with, exact, <, =, >, >=].")
      }
      Some(frame.filter(pred))
    }
    val hits = pairs.flatMap { case (l, props) =>
      props.flatMap(matchedRows(l, _))
    }
    val combined = hits
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
      .map(d => if (dedup) d.dropDuplicates(IdCol) else d)
      .getOrElse(ctx.spark.range(0).select(lit(0L).as(IdCol)))
    combined.select(
      struct(combined.columns.map(col).toSeq: _*).as("node"))
  }

  /** `meta.update(created, deleted, removedVProps, removedEProps,
    * setVLabels, removedVLabels)` — the reference's trigger-driven online
    * stat-cache maintenance (meta_module.cpp:20, no yields). This engine
    * recomputes meta.stats from the live frames on every call, so the
    * cache the reference updates does not exist — the call validates its
    * arity and returns no rows (cache-consistency is trivially held). */
  def metaUpdate(ctx: ProcContext): DataFrame = {
    require(
      ctx.args.size >= 6,
      "meta.update expects 6 arguments (createdObjects, deletedObjects, " +
        "removedVertexProperties, removedEdgeProperties, setVertexLabels, " +
        "removedVertexLabels)")
    ctx.spark.range(0).select(lit(true).as("ok")).filter(lit(false))
  }

  /** `meta.reset()` — drops the reference's cached online stats
    * (meta.cpp Reset). Same trivially-held contract as [[metaUpdate]]:
    * nothing is cached here, the next stats call recomputes. */
  def metaReset(ctx: ProcContext): DataFrame =
    ctx.spark.range(0).select(lit(true).as("ok")).filter(lit(false))

  val registry: Map[String, ProcContext => DataFrame] = Map(
    "uuid.get" -> uuidGet,
    "util.md5" -> utilMd5,
    "meta.stats" -> metaStats,
    "meta.stats_online" -> metaStats,
    "meta.stats_offline" -> metaStats,
    "meta.update" -> metaUpdate,
    "meta.reset" -> metaReset,
    "search.node" -> searchRun(dedup = true),
    "search.node_all" -> searchRun(dedup = false))
}
