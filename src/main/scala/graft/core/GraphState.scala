package graft.core

import org.apache.spark.sql.DataFrame

/** Property-graph state, Spark-native.
  *
  * The reference (memgraph/memgraph) stores one record per vertex/edge in
  * concurrent skip lists with a packed row-oriented `PropertyStore`
  * (`src/storage/v2/inmemory/storage.hpp:892,924`,
  * `src/storage/v2/property_store.hpp:38-181`). We deliberately invert that:
  * nodes are **label-partitioned columnar DataFrames** and edges are
  * **type-partitioned DataFrames**, so that
  *   - `ScanAllByLabel` (`src/query/plan/operator.hpp:607`) is partition
  *     pruning — only the frames for the requested label are touched;
  *   - property access is column access (Parquet column pruning + min/max
  *     skipping stands in for the reference's label+property indexes,
  *     `src/storage/v2/indices/`);
  *   - every scan is parallel by partition, which makes the reference's
  *     enterprise `ScanParallel` family (`operator.hpp:2055-2323`) a no-op.
  *
  * Frames are lazily constructed (and memoized) per label/type: a query that
  * never touches label L never reads L's parquet footers — the DataFrame
  * analog of partition pruning at the catalog level.
  *
  * Schema conventions:
  *   - node frame:  `_id: LONG`, `_labels: ARRAY<STRING>`, then one typed
  *     column per property ("promoted columns"; dynamic/schemaless properties
  *     observed at load time, per-label — mirrors the reference's observed,
  *     not declared, schema, `SHOW SCHEMA INFO`, ast.hpp:4302).
  *   - edge frame:  `_id: LONG`, `_src: LONG`, `_dst: LONG`, `_type: STRING`,
  *     then property columns.
  *
  * At 100 TB these maps are backed by label/type-partitioned Parquet
  * directories; a mutation batch produces a new immutable `GraphState`
  * (snapshot semantics instead of MVCC delta chains,
  * `src/storage/v2/delta_action.hpp:27-41`).
  */
final class GraphState(
    nodeThunks: Map[String, () => DataFrame],
    edgeThunks: Map[String, () => DataFrame],
    /** High-water mark of the id-namespace bases consumed by statements run
      * against (ancestors of) this version. Each statement's Planner starts
      * allocating above it, so chained `Cypher.execute` calls never reuse an
      * id base (ids are `base<<48 + sequential offset` — nodes from 0,
      * edges from 2^47, zipWithIndex-assigned so creation order gives
      * consecutive ids like the reference's allocators). Loader bases live
      * in 1..899. */
    val idBase: Long = 900L,
    /** True once a node row may live in MORE than one label frame
      * (multi-label CREATE or SET :Label across frames): frames act as a
      * label index — scans re-filter on `_labels`, and [[allNodes]] dedups
      * by id. False for loader graphs, so the flag costs nothing on the
      * hot analytical paths. */
    val mayOverlap: Boolean = false,
    /** Enum registry (`CREATE ENUM`, reference enum_store.hpp): name →
      * ordered member list. Values are represented as `Name::Member`
      * strings — orderable, oracle-friendly, validated at plan time. */
    val enums: Map[String, Seq[String]] = Map.empty,
    /** Content-version tag for PERSISTED index keys (`spark.graft.index
      * .dir`). Loader graphs carry the stable `"base"` tag, so a fresh
      * session over the same corpus reuses persisted indexes; every
      * frame-replacing mutation ([[withNodes]]/[[withEdges]]) mints a
      * session-unique tag, so a post-mutation CALL can never be served a
      * stale persisted table (it re-persists under the new tag —
      * invalidation by key, the reference's index-rebuild-on-write
      * analog). */
    val indexTag: String = "base") {

  private val nodeCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val edgeCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  val nodeLabels: Seq[String] = nodeThunks.keys.toSeq.sorted
  val edgeTypes: Seq[String] = edgeThunks.keys.toSeq.sorted

  def nodes(label: String): DataFrame =
    nodeCache.getOrElseUpdate(
      label,
      nodeThunks
        .getOrElse(
          label,
          throw new IllegalArgumentException(
            s"unknown node label '$label' (have: ${nodeLabels.mkString(", ")})"))
        .apply())

  def edges(tpe: String): DataFrame =
    edgeCache.getOrElseUpdate(
      tpe,
      edgeThunks
        .getOrElse(
          tpe,
          throw new IllegalArgumentException(
            s"unknown edge type '$tpe' (have: ${edgeTypes.mkString(", ")})"))
        .apply())

  def hasLabel(label: String): Boolean = nodeThunks.contains(label)
  def hasType(tpe: String): Boolean = edgeThunks.contains(tpe)

  /** All nodes; schema is the union of per-label schemas (missing → NULL).
    * This is the `ScanAll` path (`operator.hpp:569`) — unavoidable full scan.
    */
  def allNodes: DataFrame =
    if (nodeLabels.isEmpty) GraphState.emptyNodeFrame
    else {
      val u = nodeLabels
        .map(nodes)
        .reduce(_.unionByName(_, allowMissingColumns = true))
      if (mayOverlap) u.dropDuplicates(GraphState.IdCol) else u
    }

  def allEdges: DataFrame =
    if (edgeTypes.isEmpty) GraphState.emptyEdgeFrame
    else
      edgeTypes.map(edges).reduce(_.unionByName(_, allowMissingColumns = true))

  /** Scan by label, Cypher-style: a label nothing carries matches nothing
    * (no error) — the planner's `ScanAllByLabel` entry point. */
  def nodesOrEmpty(label: String): DataFrame =
    if (hasLabel(label)) nodes(label) else GraphState.emptyNodeFrame

  /** Edge frames for a (possibly empty = all) set of requested types —
    * the `ScanAllByEdgeType` access path (`operator.hpp:667`). */
  def edgesOfTypes(types: Seq[String]): DataFrame =
    if (types.isEmpty) allEdges
    else {
      val present = types.filter(hasType)
      if (present.isEmpty) GraphState.emptyEdgeFrame
      else
        present.map(edges).reduce(_.unionByName(_, allowMissingColumns = true))
    }

  /** New graph version with one node frame replaced/added — the snapshot
    * step every mutation funnels through (our Accumulate barrier analog,
    * `operator.hpp:1870`: writes become visible as a whole new state, never
    * mid-read). */
  def withNodes(label: String, mk: () => DataFrame): GraphState =
    new GraphState(
      nodeThunks + (label -> mk), edgeThunks, idBase, mayOverlap, enums,
      GraphState.freshTag())

  def withEdges(tpe: String, mk: () => DataFrame): GraphState =
    new GraphState(
      nodeThunks, edgeThunks + (tpe -> mk), idBase, mayOverlap, enums,
      GraphState.freshTag())

  /** New version with the id high-water mark advanced (never lowered) —
    * no frame content changes, so the index tag carries over. */
  def withIdBase(base: Long): GraphState =
    new GraphState(
      nodeThunks, edgeThunks, math.max(base, idBase), mayOverlap, enums,
      indexTag)

  /** Mark that node rows may now live in more than one label frame. */
  def withOverlap: GraphState =
    new GraphState(
      nodeThunks, edgeThunks, idBase, mayOverlap = true, enums, indexTag)

  /** Register (or replace) an enum type (`CREATE ENUM`). */
  def withEnum(name: String, values: Seq[String]): GraphState =
    new GraphState(
      nodeThunks, edgeThunks, idBase, mayOverlap,
      enums + (name -> values), indexTag)
}

object GraphState {

  def apply(
      nodeThunks: Map[String, () => DataFrame],
      edgeThunks: Map[String, () => DataFrame]): GraphState =
    new GraphState(nodeThunks, edgeThunks)

  /** Session-unique version tags for mutated states: a JVM nonce keeps two
    * sessions sharing one `spark.graft.index.dir` from colliding on the
    * counter (their mutation histories may differ), the counter orders
    * versions within the session. */
  private val tagCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  private val tagNonce =
    java.lang.Long.toHexString(new java.security.SecureRandom().nextLong())
  private[graft] def freshTag(): String =
    s"v${tagCounter.incrementAndGet()}-$tagNonce"

  /** Reserved column names on node frames. */
  val IdCol = "_id"
  val LabelsCol = "_labels"

  /** Reserved column names on edge frames. */
  val SrcCol = "_src"
  val DstCol = "_dst"
  val TypeCol = "_type"

  val nodeMeta: Seq[String] = Seq(IdCol, LabelsCol)
  val edgeMeta: Seq[String] = Seq(IdCol, SrcCol, DstCol, TypeCol)

  import org.apache.spark.sql.{Row, SparkSession}
  import org.apache.spark.sql.types._

  /** Zero-row node frame (meta columns only) — the scan result for an
    * empty graph or an unused label. */
  def emptyNodeFrame: DataFrame = {
    val s = SparkSession.active
    s.createDataFrame(
      s.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField(IdCol, LongType),
        StructField(LabelsCol, ArrayType(StringType)))))
  }

  def emptyEdgeFrame: DataFrame = {
    val s = SparkSession.active
    s.createDataFrame(
      s.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField(IdCol, LongType),
        StructField(SrcCol, LongType),
        StructField(DstCol, LongType),
        StructField(TypeCol, StringType))))
  }
}
