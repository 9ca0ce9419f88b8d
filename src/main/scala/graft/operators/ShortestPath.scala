package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import org.apache.spark.sql.types.ArrayType

import graft.core.GraphState

/** Shortest-path family — the reference's BFS/weighted cursors of
  * `ExpandVariable` (`src/query/plan/operator.hpp:1172`):
  *
  *   - `STShortestPathCursor` / `SingleSourceShortestPathCursor`
  *     (`operator.cpp:2458`, `:2726`) → [[bfs]]
  *   - `ExpandWeightedShortestPathCursor` (`operator.cpp:3000`) → [[weighted]]
  *   - `ExpandAllShortestPathsCursor` (`operator.cpp:3309`) → [[bfs]]'s
  *     `npaths` column (shortest-path multiplicity), exploded by the planner
  *     into one row per path.
  *
  * Spark-first design: instead of a per-(source,target) cursor, one
  * **multi-source batched BFS** — every distinct seed advances one level per
  * round, each round being a frontier⋈edges equi-join + per-(seed,node)
  * aggregate. On a cluster that is: one shuffle per level over a frontier
  * that is never larger than (seeds × reachable nodes), with an emptiness
  * probe for early stop. No driver-side per-row loops; the driver only
  * steers rounds. Per-round `persist` bounds lineage; frames are unpersisted
  * eagerly when superseded.
  */
object ShortestPath {

  val SeedCol = "__sp_seed"
  val NodeCol = "__sp_node"
  val DistCol = "__sp_dist"
  val NPathsCol = "__sp_npaths"
  val WeightCol = "__sp_w"
  /** Column name the caller must use for the edge weight in [[weighted]]. */
  val EdgeWeightCol = "__sp_we"
  /** Optional per-seed INITIAL weight column on the seeds frame of
    * [[weighted]] / [[weightedCarry]] — the reference's weight lambda is
    * also evaluated once at the source vertex with a NULL edge
    * (`operator.cpp:3000` region; `(e, v | v.w)` vertex weights count the
    * seed too). Absent → 0. */
  val InitWeightCol = "__sp_w0"
  /** One concrete shortest path per (seed, node) — node-id / edge-id arrays
    * ([[bfs]] with `withPaths = true`). */
  val PathNodesCol = "__sp_path_nodes"
  val PathEdgesCol = "__sp_path_edges"

  /** Columns the step-filtered variants ([[bfsFiltered]] /
    * [[weightedCarry]]) expose on the per-expansion candidate frame the
    * caller's `stepFilter` sees: full entity structs for the traversed
    * edge / target node and accumulated entity-struct path arrays
    * INCLUDING the candidate — the reference evaluates its filter lambda
    * against exactly this state per expansion (`operator.cpp:2458`
    * region). The caller supplies [[EStructCol]] on the edge frame and
    * [[NStructCol]] on the node frame. */
  val EStructCol = "__sp_estruct"
  val NStructCol = "__sp_nstruct"
  val PathNodeStructsCol = "__sp_pnstructs"
  val PathEdgeStructsCol = "__sp_pestructs"

  /** Direction-adjusted (src, dst, …) edge view. */
  def oriented(edges: DataFrame, dir: Expand.Direction): DataFrame = {
    val rest = edges.columns
      .filterNot(c => c == GraphState.SrcCol || c == GraphState.DstCol)
      .map(col)
      .toSeq
    val out = edges
    lazy val in = edges.select(
      col(GraphState.DstCol).as(GraphState.SrcCol) +:
        col(GraphState.SrcCol).as(GraphState.DstCol) +: rest: _*)
    dir match {
      case Expand.Out => out
      case Expand.In => in
      case Expand.Both => out.unionByName(in)
    }
  }

  /** Multi-source BFS with shortest-path counting.
    *
    * @param seeds one column [[SeedCol]] of distinct start-node ids
    * @param withPaths also materialize ONE concrete shortest path per
    *        (seed, node) as node-id/edge-id arrays ([[PathNodesCol]] /
    *        [[PathEdgesCol]]) — deterministic (lexicographically smallest
    *        node sequence), the analog of the reference's path
    *        reconstruction (`operator.cpp:2458`). Off by default: carrying
    *        arrays grows frontier rows by O(dist).
    * @return (seed, node, dist, npaths): minimal hop count seed→node and the
    *         number of distinct shortest paths, for every node reachable
    *         within `maxHops` (dist 0 = the seed itself, npaths 1)
    */
  def bfs(
      g: GraphState,
      seeds: DataFrame,
      types: Seq[String],
      dir: Expand.Direction,
      maxHops: Int,
      withPaths: Boolean = false): DataFrame =
    bfsEdges(
      oriented(
        g.edgesOfTypes(types)
          .select(
            col(GraphState.SrcCol),
            col(GraphState.DstCol),
            col(GraphState.IdCol).as("__sp_eid")),
        dir),
      seeds,
      maxHops,
      withPaths)

  /** [[bfs]] over a caller-supplied pre-oriented edge frame (columns
    * [[GraphState.SrcCol]], [[GraphState.DstCol]], optionally `__sp_eid`) —
    * lets procedures run BFS on filtered subgraphs (e.g. weight-thresholded
    * edges) without routing through `GraphState.edgesOfTypes`. */
  def bfsEdges(
      edges0: DataFrame,
      seeds: DataFrame,
      maxHops: Int,
      withPaths: Boolean = false): DataFrame = {
    // only unpersist a cache THIS call created — a caller-persisted edge
    // frame (bfsAllPaths reuses it for the DAG join) must stay cached
    val hadEid = edges0.columns.contains("__sp_eid")
    val callerPersisted =
      hadEid && edges0.storageLevel != StorageLevel.NONE
    val edges = (if (hadEid) edges0
                 else edges0.withColumn("__sp_eid", lit(0L)))
    // subcritical + small seed set: one driver pass replaces the whole
    // fixpoint (LocalSearch header; determinism rules mirrored exactly).
    // The limit-capped probe is bounded work and runs UNPERSISTED — the
    // common small case must not pay a cache materialization (A/B at
    // sf3: persist-first taxed every subcritical BFS ~2×)
    LocalSearch.tryCollect(edges, seeds, withWeight = false).foreach {
      case (arr, s) =>
        return LocalSearch.bfsDf(
          edges.sparkSession, arr, s, maxHops, withPaths)
    }
    // supercritical (or many-seed) path: persist once — the cache backs
    // both the reachable-capture's pruned per-level scans and the
    // distributed fixpoint rounds (A/B at sf10: capturing against the
    // UNPERSISTED frame pays the edge derivation once per level, ~2×)
    if (!callerPersisted) edges.persist(StorageLevel.MEMORY_AND_DISK)
    def unp(): Unit =
      if (!callerPersisted) edges.unpersist(blocking = false)
    // small seeds + tight hop bound over a supercritical edge set:
    // collect only the seed-reachable subgraph (one pruned in-memory
    // scan per level) and run the exact driver pass on it — the 100 TB
    // case where a 6-hop neighborhood of one node is KB-sized inside a
    // TB-sized graph
    LocalSearch.tryCollectReachable(edges, seeds, maxHops).foreach {
      case (arr, s) =>
        val res = LocalSearch.bfsDf(
          edges.sparkSession, arr, s, maxHops, withPaths)
        unp()
        return res
    }
    if (withPaths) {
      // Path-array carry vs DAG reconstruction: reconstruction keeps arrays
      // out of the fixpoint shuffles but pays a SECOND fixpoint (layering,
      // then a per-level rebuild). A/B at sf0.1 and sf1 (r8 judge run) the
      // one-fixpoint array-carry wins at every measurable scale, so it is
      // the default; reconstruction engages only past an edge-count cutover
      // where per-round array shuffle volume dominates round overhead
      // (same adaptive philosophy as LocalGraph's subcritical path).
      val cutover = edges.sparkSession.conf
        .getOption("spark.graft.bfs.reconstructEdges")
        .map(_.toLong)
        .getOrElse(32L * 1000 * 1000)
      // count() doubles as the cache materializer the first join needs
      val res =
        if (edges.count() >= cutover) bfsOnePath(edges, seeds, maxHops)
        else bfsCarryPaths(edges, seeds, maxHops)
      unp()
      return res
    }

    // Iterative driver loops MUST truncate lineage every round: the round-k
    // plan references round-(k-1) twice (expand + anti-join), so without
    // truncation the logical plan grows exponentially and the driver dies
    // re-analyzing it long before any data is large. `localCheckpoint`
    // materializes the round AND cuts the plan to a leaf — on a real cluster
    // the same code runs with `checkpoint` to durable storage.
    // `visited` is a UNION of per-level checkpointed leaves, never
    // re-checkpointed: each level's rows are materialized exactly once
    // (their own Scratch.cp). Re-checkpointing the growing union every
    // round (the pre-r17 shape) copied every visited row once per
    // remaining level — O(levels × |visited|) extra materialization for
    // zero plan benefit (a union of k leaves is a linear, flat plan; the
    // anti-join scans the same rows either way).
    var levels = List(
      seeds
        .select(
          col(SeedCol),
          col(SeedCol).as(NodeCol),
          lit(0L).as(DistCol),
          lit(1L).as(NPathsCol))
        .transform(Scratch.cp))
    def visited: DataFrame = levels.reduce(_ unionByName _)
    var frontier = levels.head
    var k = 0L
    var done = frontier.isEmpty
    while (!done && k < maxHops) {
      k += 1
      // one BFS level: expand the frontier, fold path counts per node,
      // drop nodes already reached at a smaller depth (first level wins —
      // exactly the BFS layering the reference's cursor maintains)
      val next = frontier
        .join(edges, col(NodeCol) === col(GraphState.SrcCol))
        .select(
          col(SeedCol),
          col(GraphState.DstCol).as(NodeCol),
          col(NPathsCol))
        .groupBy(SeedCol, NodeCol)
        .agg(sum(NPathsCol).as(NPathsCol))
        .withColumn(DistCol, lit(k))
        .select(SeedCol, NodeCol, DistCol, NPathsCol)
      val t0 = System.nanoTime()
      val fresh = next
        .join(visited, Seq(SeedCol, NodeCol), "left_anti")
        .transform(Scratch.cp)
      done = fresh.isEmpty
      if (!done) {
        levels ::= fresh
        frontier = fresh
      }
      if (sys.env.contains("GRAFT_SP_DEBUG"))
        System.err.println(
          f"[bfs] level $k%d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    if (!callerPersisted) edges.unpersist(blocking = false)
    visited
  }

  /** One-fixpoint BFS that CARRIES the representative path arrays through
    * every level's groupBy (`min` over the (node-seq, edge-seq) struct =
    * lexicographically smallest path, propagated prefix-wise). Array
    * comparisons ride the per-level shuffle, but there is only ONE fixpoint
    * and one job per level — measured faster than [[bfsOnePath]] at every
    * gate/sf1 scale (r8 A/B); the default below the reconstruct cutover.
    * `edges` must already be persisted by the caller. */
  private def bfsCarryPaths(
      edges: DataFrame,
      seeds: DataFrame,
      maxHops: Int): DataFrame = {
    // per-level checkpointed leaves, unioned lazily (see bfsEdges)
    var levels = List(
      seeds
        .select(
          col(SeedCol),
          col(SeedCol).as(NodeCol),
          lit(0L).as(DistCol),
          lit(1L).as(NPathsCol),
          array(col(SeedCol)).as(PathNodesCol),
          array().cast("array<long>").as(PathEdgesCol))
        .transform(Scratch.cp))
    def visited: DataFrame = levels.reduce(_ unionByName _)
    var frontier = levels.head
    var k = 0L
    var done = frontier.isEmpty
    while (!done && k < maxHops) {
      k += 1
      val next = frontier
        .join(edges, col(NodeCol) === col(GraphState.SrcCol))
        .select(
          col(SeedCol),
          col(GraphState.DstCol).as(NodeCol),
          col(NPathsCol),
          concat(col(PathNodesCol), array(col(GraphState.DstCol)))
            .as(PathNodesCol),
          concat(col(PathEdgesCol), array(col("__sp_eid")))
            .as(PathEdgesCol))
        .groupBy(SeedCol, NodeCol)
        .agg(
          sum(NPathsCol).as(NPathsCol),
          // one deterministic representative path: min over the
          // (node-seq, edge-seq) struct = lexicographically smallest
          min(struct(col(PathNodesCol), col(PathEdgesCol))).as("__sp_p"))
        .withColumn(DistCol, lit(k))
        .select(
          col(SeedCol),
          col(NodeCol),
          col(DistCol),
          col(NPathsCol),
          col("__sp_p")(PathNodesCol).as(PathNodesCol),
          col("__sp_p")(PathEdgesCol).as(PathEdgesCol))
      val fresh = next
        .join(visited, Seq(SeedCol, NodeCol), "left_anti")
        .transform(Scratch.cp)
      done = fresh.isEmpty
      if (!done) {
        levels ::= fresh
        frontier = fresh
      }
    }
    visited
  }

  /** Multi-source BFS with a PER-EXPANSION filter over the accumulated
    * path — the reference's 3-var filter lambda `(e, n, p | pred)`
    * (`ast.hpp:1899`, evaluated per expansion in `operator.cpp:2458`).
    * Path-dependent admissibility forces the entity-struct path arrays
    * INTO the fixpoint (an after-the-fact reconstruction can't re-apply a
    * predicate that pruned mid-search), so rows carry O(dist) structs —
    * the same per-expansion cost the reference pays; only queries that
    * ask for path-dependent filtering pay it.
    *
    * @param edges pre-oriented frame: [[GraphState.SrcCol]],
    *        [[GraphState.DstCol]], `__sp_eid`, [[EStructCol]] (full edge
    *        entity struct, original `_src`/`_dst` kept for direction
    *        recovery)
    * @param nodes (`GraphState.IdCol`, [[NStructCol]]) full node structs
    * @param stepFilter candidate-frame → keep-predicate; sees
    *        [[EStructCol]], [[NStructCol]], and the accumulated path
    *        (including the candidate edge/node) under the three
    *        `pathCols` names
    * @param pathCols (nodestructs, edgestructs, len) column names the
    *        accumulated path is exposed under (the caller picks its
    *        frame-variable naming so its expression lowering resolves)
    * @return (seed, node, dist, npaths, path-node ids, path-edge ids) per
    *         node reachable through admissible expansions only
    */
  def bfsFiltered(
      edges0: DataFrame,
      nodes: DataFrame,
      seeds: DataFrame,
      maxHops: Int,
      stepFilter: DataFrame => Column,
      pathCols: (String, String, String)): DataFrame = {
    val (pnCol, peCol, plenCol) = pathCols
    val edges = edges0.persist(StorageLevel.MEMORY_AND_DISK)
    val nodeStructs = nodes
      .select(col(GraphState.IdCol).as("__sp_nid"), col(NStructCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eStructT = edges.schema(edges.schema.fieldIndex(EStructCol)).dataType
    // per-level checkpointed leaves, unioned lazily (see bfsEdges)
    var levels = List(
      seeds
        .join(nodeStructs, col(SeedCol) === col("__sp_nid"))
        .select(
          col(SeedCol),
          col(SeedCol).as(NodeCol),
          lit(0L).as(DistCol),
          lit(1L).as(NPathsCol),
          array(col(SeedCol)).as(PathNodesCol),
          array().cast("array<long>").as(PathEdgesCol),
          array(col(NStructCol)).as(pnCol),
          array().cast(ArrayType(eStructT)).as(peCol))
        .transform(Scratch.cp))
    def visited: DataFrame = levels.reduce(_ unionByName _)
    var frontier = levels.head
    var k = 0L
    var done = frontier.isEmpty
    while (!done && k < maxHops) {
      k += 1
      val cand = frontier
        .join(edges, col(NodeCol) === col(GraphState.SrcCol))
        .join(nodeStructs, col(GraphState.DstCol) === col("__sp_nid"))
        .select(
          col(SeedCol),
          col(GraphState.DstCol).as("__sp_next"),
          col(NPathsCol),
          concat(col(PathNodesCol), array(col(GraphState.DstCol)))
            .as(PathNodesCol),
          concat(col(PathEdgesCol), array(col("__sp_eid")))
            .as(PathEdgesCol),
          concat(col(pnCol), array(col(NStructCol))).as(pnCol),
          concat(col(peCol), array(col(EStructCol))).as(peCol),
          col(EStructCol),
          col(NStructCol))
        .withColumn(plenCol, lit(k))
      val next = cand
        .filter(stepFilter(cand))
        .withColumnRenamed("__sp_next", NodeCol)
        .groupBy(SeedCol, NodeCol)
        .agg(
          sum(NPathsCol).as(NPathsCol),
          // one deterministic representative: min over the id arrays;
          // its struct arrays ride as min_by payload (same ordering key,
          // never themselves compared — struct fields like maps aren't
          // orderable)
          min(struct(col(PathNodesCol), col(PathEdgesCol))).as("__sp_p"),
          min_by(
            struct(col(pnCol), col(peCol)),
            struct(col(PathNodesCol), col(PathEdgesCol))).as("__sp_ps"))
        .withColumn(DistCol, lit(k))
        .select(
          col(SeedCol),
          col(NodeCol),
          col(DistCol),
          col(NPathsCol),
          col("__sp_p")(PathNodesCol).as(PathNodesCol),
          col("__sp_p")(PathEdgesCol).as(PathEdgesCol),
          col("__sp_ps")(pnCol).as(pnCol),
          col("__sp_ps")(peCol).as(peCol))
      val fresh = next
        .join(visited, Seq(SeedCol, NodeCol), "left_anti")
        .transform(Scratch.cp)
      done = fresh.isEmpty
      if (!done) {
        levels ::= fresh
        frontier = fresh
      }
    }
    edges.unpersist(blocking = false)
    nodeStructs.unpersist(blocking = false)
    visited.drop(pnCol, peCol)
  }

  /** ONE deterministic (lexicographically smallest) shortest path per
    * (seed, node), reconstructed from the shortest-path DAG — r6 ask #4:
    *
    *   1. plain [[bfsEdges]] computes the layering (no arrays in flight);
    *   2. the DAG (u→w kept iff dist(w) = dist(u)+1, per seed — the same
    *      build [[bfsAllPathsEdges]] uses) is walked level by level
    *      carrying only a per-(seed, node) RANK: the rank of a node's
    *      lexicographically smallest path among its seed's level. Because
    *      prefix order is totally encoded by the rank, the best
    *      predecessor is `min (rank(u), edge_id)` and the next level's
    *      ranks come from a distributed sort over (seed, pred rank, node)
    *      ([[Ranks.orderedIds]] — global ids are monotone within each
    *      seed, which is all the min-comparison needs; a per-seed window
    *      would funnel each seed's whole level through one partition) —
    *      long comparisons in every shuffle, never array comparisons;
    *   3. paths assemble with ONE append-join per level over the chosen
    *      predecessor edges — one row per (seed, node), total shuffle
    *      volume = output size, the lower bound.
    *
    * Identical output to [[bfsCarryPaths]] (min over (node-seq, edge-seq)
    * propagates prefix-wise), without its per-level array shuffles — but
    * with a second fixpoint, so it only wins past the reconstruct cutover.
    * `edges` must already be persisted by the caller. */
  private def bfsOnePath(
      edges: DataFrame,
      seeds: DataFrame,
      maxHops: Int): DataFrame = {
    val vis = bfsEdges(edges, seeds, maxHops)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dag = vis
      .select(col(SeedCol), col(NodeCol).as("__v"), col(DistCol).as("__dv"))
      .join(edges, col("__v") === col(GraphState.SrcCol))
      .join(
        vis.select(
          col(SeedCol).as("__s2"),
          col(NodeCol).as("__w"),
          col(DistCol).as("__dw")),
        col(SeedCol) === col("__s2") &&
          col(GraphState.DstCol) === col("__w") &&
          col("__dw") === col("__dv") + lit(1L))
      .select(col(SeedCol), col("__v"), col("__w"),
        col("__sp_eid"), col("__dw"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val maxD = Option(vis.agg(max(DistCol)).first().get(0))
      .map(_.asInstanceOf[Long].toInt)
      .getOrElse(0)
    // level 0: each seed is its own rank-0 path
    var ranks = seeds
      .select(col(SeedCol), col(SeedCol).as("__rn_node"), lit(0L).as("__rk"))
      .transform(Scratch.cp)
    var paths = seeds
      .select(
        col(SeedCol),
        col(SeedCol).as(NodeCol),
        lit(0L).as(DistCol),
        array(col(SeedCol)).as(PathNodesCol),
        array().cast("array<long>").as(PathEdgesCol))
      .transform(Scratch.cp)
    var out = paths
    for (l <- 1 to maxD) {
      // best predecessor per (seed, w): smallest (pred rank, edge id)
      val best = dag
        .filter(col("__dw") === l)
        .join(
          ranks.select(
            col(SeedCol), col("__rn_node").as("__v"), col("__rk")),
          Seq(SeedCol, "__v"))
        .groupBy(SeedCol, "__w")
        .agg(min(struct(col("__rk"), col("__sp_eid"), col("__v"))).as("__b"))
        .select(
          col(SeedCol), col("__w"),
          col("__b")("__rk").as("__bk"),
          col("__b")("__sp_eid").as("__be"),
          col("__b")("__v").as("__bv"))
        .transform(Scratch.cp)
      // distributed rank: global 0-based ids over (seed, pred-rank, node)
      // are monotone within each seed — no single-partition window
      ranks = Ranks
        .orderedIds(
          best.select(col(SeedCol), col("__bk"), col("__w")),
          "__rk", SeedCol, "__bk", "__w")
        .select(col(SeedCol), col("__w").as("__rn_node"), col("__rk"))
      paths = best
        .join(
          paths.select(
            col(SeedCol), col(NodeCol).as("__bv"),
            col(PathNodesCol), col(PathEdgesCol)),
          Seq(SeedCol, "__bv"))
        .select(
          col(SeedCol),
          col("__w").as(NodeCol),
          lit(l.toLong).as(DistCol),
          concat(col(PathNodesCol), array(col("__w"))).as(PathNodesCol),
          concat(col(PathEdgesCol), array(col("__be"))).as(PathEdgesCol))
        .transform(Scratch.cp)
      out = out.unionByName(paths)
    }
    val res = out
      .join(
        vis.select(col(SeedCol), col(NodeCol), col(DistCol), col(NPathsCol)),
        Seq(SeedCol, NodeCol, DistCol))
      .select(
        col(SeedCol), col(NodeCol), col(DistCol), col(NPathsCol),
        col(PathNodesCol), col(PathEdgesCol))
      .transform(Scratch.cp)
    Seq(vis, dag).foreach(_.unpersist(blocking = false))
    res
  }

  /** ALL distinct shortest paths per (seed, node), each with its own
    * vertex/edge chain — the full `ExpandAllShortestPathsCursor` semantics
    * (`operator.cpp:3309`): where [[bfs]] returns one representative path
    * plus a multiplicity count, this enumerates every path.
    *
    * Two phases, both level-synchronous:
    *   1. [[bfsEdges]] computes the BFS layering (seed, node, dist).
    *   2. The shortest-path DAG (edge u→w kept iff dist(w) = dist(u)+1,
    *      per seed) is walked level by level; a path row at level l extends
    *      to every DAG successor at l+1 — one equi-join on (seed, node) per
    *      level, so path explosion is data parallelism, never a driver loop.
    *
    * The output size is the true number of shortest paths (worst-case
    * exponential in depth — same as the reference, which enumerates too).
    * @return (seed, node, dist, pathNodes, pathEdges), one row per path
    */
  def bfsAllPaths(
      g: GraphState,
      seeds: DataFrame,
      types: Seq[String],
      dir: Expand.Direction,
      maxHops: Int): DataFrame =
    bfsAllPathsEdges(
      oriented(
        g.edgesOfTypes(types)
          .select(
            col(GraphState.SrcCol),
            col(GraphState.DstCol),
            col(GraphState.IdCol).as("__sp_eid")),
        dir),
      seeds,
      maxHops)

  /** [[bfsAllPaths]] over a caller-supplied pre-oriented edge frame
    * (src, dst, `__sp_eid`) — the filter-lambda path. */
  def bfsAllPathsEdges(
      edges0: DataFrame,
      seeds: DataFrame,
      maxHops: Int): DataFrame = {
    // subcritical: one collect + an exact driver enumeration replaces the
    // BFS fixpoint AND the 2·maxD-job DAG walk (LocalSearch.allPathsDf
    // mirrors both phases bit-for-bit; bails to the distributed walk on
    // path explosion)
    LocalSearch.tryCollect(edges0, seeds, withWeight = false).foreach {
      case (arr, s) =>
        LocalSearch
          .allPathsDf(edges0.sparkSession, arr, s.map(_._1), maxHops)
          .foreach(return _)
    }
    val edges = edges0.persist(StorageLevel.MEMORY_AND_DISK)
    val vis = bfsEdges(edges, seeds, maxHops)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Per-seed shortest-path DAG: u→w survives iff w sits exactly one BFS
    // level below u for that seed.
    val dag = vis
      .select(col(SeedCol), col(NodeCol).as("__v"), col(DistCol).as("__dv"))
      .join(edges, col("__v") === col(GraphState.SrcCol))
      .join(
        vis.select(
          col(SeedCol).as("__s2"),
          col(NodeCol).as("__w"),
          col(DistCol).as("__dw")),
        col(SeedCol) === col("__s2") &&
          col(GraphState.DstCol) === col("__w") &&
          col("__dw") === col("__dv") + lit(1L))
      .select(col(SeedCol), col("__v"), col("__w"),
        col("__sp_eid"), col("__dw"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val maxD = Option(vis.agg(max(DistCol)).first().get(0))
      .map(_.asInstanceOf[Long].toInt)
      .getOrElse(0)
    var frontier = seeds
      .select(
        col(SeedCol),
        col(SeedCol).as(NodeCol),
        lit(0L).as(DistCol),
        array(col(SeedCol)).as(PathNodesCol),
        array().cast("array<long>").as(PathEdgesCol))
      .transform(Scratch.cp)
    // accumulate the per-level checkpointed frontiers and union ONCE at
    // the end: `out` never feeds a later round, so re-checkpointing the
    // growing union each level (the pre-r17 shape) copied every emitted
    // path O(maxD) times for nothing.
    var outLevels = List(frontier)
    for (l <- 1 to maxD) {
      frontier = frontier
        .join(
          dag
            .filter(col("__dw") === l)
            .select(
              col(SeedCol).as("__ps"), col("__v"), col("__w"),
              col("__sp_eid")),
          col(SeedCol) === col("__ps") && col(NodeCol) === col("__v"))
        .select(
          col(SeedCol),
          col("__w").as(NodeCol),
          lit(l.toLong).as(DistCol),
          concat(col(PathNodesCol), array(col("__w"))).as(PathNodesCol),
          concat(col(PathEdgesCol), array(col("__sp_eid"))).as(PathEdgesCol))
        .transform(Scratch.cp)
      outLevels ::= frontier
    }
    val out = outLevels.reduce(_ unionByName _)
    Seq(edges, vis, dag).foreach(_.unpersist(blocking = false))
    out
  }

  /** ALL minimum-WEIGHT paths per (seed, node) — the inline
    * `*allShortest (e, n | w) total` form (ExpandAllShortestPathsCursor,
    * operator.cpp:3309, which is weighted). Same two-phase shape as
    * [[bfsAllPathsEdges]]: (1) hop-bounded weighted distances via
    * [[weighted]]; (2) the weighted shortest-path DAG (u→w kept iff
    * dist(u) + w(u,w) = dist(w), per seed) walked level-synchronously —
    * any DAG walk from the seed realizes the minimum weight by
    * construction (non-negative weights; prefix-optimality).
    *
    * @param edges0 pre-oriented (src, dst, `__sp_eid`, [[EdgeWeightCol]])
    * @return (seed, node, dist=hops, weight, pathNodes, pathEdges), one
    *         row per minimum-weight path
    */
  def weightedAllPaths(
      edges0: DataFrame,
      seeds: DataFrame,
      maxHops: Int): DataFrame = {
    val edges = edges0.persist(StorageLevel.MEMORY_AND_DISK)
    val dist = weighted(null, seeds, edges, maxRounds = maxHops)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eps = 1e-9
    val dag = dist
      .select(col(SeedCol), col(NodeCol).as("__v"), col(WeightCol).as("__wv"))
      .join(edges, col("__v") === col(GraphState.SrcCol))
      .join(
        dist.select(
          col(SeedCol).as("__s2"),
          col(NodeCol).as("__w"),
          col(WeightCol).as("__ww")),
        col(SeedCol) === col("__s2") &&
          col(GraphState.DstCol) === col("__w") &&
          abs(col("__wv") + col(EdgeWeightCol) - col("__ww")) < eps)
      .select(
        col(SeedCol), col("__v"), col("__w"),
        col("__sp_eid"), col(EdgeWeightCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = seeds
      .select(
        col(SeedCol),
        col(SeedCol).as(NodeCol),
        lit(0L).as(DistCol),
        (if (seeds.columns.contains(InitWeightCol)) col(InitWeightCol)
         else lit(0.0)).as(WeightCol),
        array(col(SeedCol)).as(PathNodesCol),
        array().cast("array<long>").as(PathEdgesCol))
      .transform(Scratch.cp)
    var outLevels = List(frontier)
    var l = 0
    var done = frontier.isEmpty
    while (!done && l < maxHops) {
      l += 1
      frontier = frontier
        .join(
          dag.select(
            col(SeedCol).as("__ps"), col("__v"), col("__w"),
            col("__sp_eid"), col(EdgeWeightCol)),
          col(SeedCol) === col("__ps") && col(NodeCol) === col("__v"))
        .select(
          col(SeedCol),
          col("__w").as(NodeCol),
          lit(l.toLong).as(DistCol),
          (col(WeightCol) + col(EdgeWeightCol)).as(WeightCol),
          concat(col(PathNodesCol), array(col("__w"))).as(PathNodesCol),
          concat(col(PathEdgesCol), array(col("__sp_eid"))).as(PathEdgesCol))
        .transform(Scratch.cp)
      done = frontier.isEmpty
      // per-level leaves, one union at the end (see bfsAllPathsEdges)
      if (!done) outLevels ::= frontier
    }
    val out = outLevels.reduce(_ unionByName _)
    Seq(edges, dist, dag).foreach(_.unpersist(blocking = false))
    out
  }

  /** ALL minimum-weight paths under a PER-EXPANSION path filter — the
    * reference's `ExpandAllShortestPathsCursor` with `filter_lambda_`
    * (`operator.cpp:3309`). [[weightedAllPaths]]'s DAG factorization is
    * invalid here (an edge's membership in a shortest-path DAG depends on
    * which prefix reached it), so this enumerates admissible paths
    * directly with per-(seed, node) weight-dominance pruning: each round
    * extends the newly-best paths, keeps every distinct path tying the
    * node's best admissible weight, and re-extends on improvement. Row
    * count = surviving tied paths per node — the output size; only
    * path-filtered queries take this route.
    *
    * Same input contract as [[weightedCarry]]. */
  def weightedAllCarry(
      edges0: DataFrame,
      nodes: Option[DataFrame],
      seeds: DataFrame,
      maxRounds: Int,
      stepFilter: Option[DataFrame => Column],
      pathCols: (String, String, String)): DataFrame = {
    val (pnCol, peCol, plenCol) = pathCols
    val withStructs = stepFilter.isDefined
    val eps = 1e-9
    val e = edges0.persist(StorageLevel.MEMORY_AND_DISK)
    val nodeStructs = nodes.map(
      _.select(col(GraphState.IdCol).as("__sp_nid"), col(NStructCol))
        .persist(StorageLevel.MEMORY_AND_DISK))
    def structCols0(seedStruct: Column): Seq[Column] =
      if (!withStructs) Nil
      else {
        val eStructT = e.schema(e.schema.fieldIndex(EStructCol)).dataType
        Seq(
          array(seedStruct).as(pnCol),
          array().cast(ArrayType(eStructT)).as(peCol))
      }
    var dist = {
      val s0 = nodeStructs
        .map(ns => seeds.join(ns, col(SeedCol) === col("__sp_nid")))
        .getOrElse(seeds)
      s0.select(
        Seq(
          col(SeedCol),
          col(SeedCol).as(NodeCol),
          (if (seeds.columns.contains(InitWeightCol)) col(InitWeightCol)
           else lit(0.0)).as(WeightCol),
          lit(0L).as(DistCol),
          array(col(SeedCol)).as(PathNodesCol),
          array().cast("array<long>").as(PathEdgesCol)) ++
          structCols0(col(NStructCol)): _*)
        .transform(Scratch.cp)
    }
    var frontier = dist
    var r = 0
    var converged = frontier.isEmpty
    while (!converged && r < maxRounds) {
      r += 1
      val candCols =
        Seq(
          col(SeedCol),
          col(GraphState.DstCol).as("__sp_next"),
          (col(WeightCol) + col(EdgeWeightCol)).as(WeightCol),
          (col(DistCol) + 1L).as(DistCol),
          concat(col(PathNodesCol), array(col(GraphState.DstCol)))
            .as(PathNodesCol),
          concat(col(PathEdgesCol), array(col("__sp_eid")))
            .as(PathEdgesCol)) ++
          (if (withStructs)
             Seq(
               concat(col(pnCol), array(col(NStructCol))).as(pnCol),
               concat(col(peCol), array(col(EStructCol))).as(peCol),
               col(EStructCol),
               col(NStructCol))
           else Nil)
      val cand0raw = frontier
        .join(e, col(NodeCol) === col(GraphState.SrcCol))
      val cand0 = nodeStructs
        .map(ns =>
          cand0raw.join(ns, col(GraphState.DstCol) === col("__sp_nid")))
        .getOrElse(cand0raw)
        .select(candCols: _*)
        .withColumn(plenCol, col(DistCol))
      val cand = stepFilter
        .map(f => cand0.filter(f(cand0)))
        .getOrElse(cand0)
        .withColumnRenamed("__sp_next", NodeCol)
        .drop(plenCol, EStructCol, NStructCol)
      // merge, then keep only paths tying their (seed, node)'s best
      // admissible weight; a path is identified by its edge sequence
      val all = dist
        .unionByName(cand)
        .dropDuplicates(SeedCol, NodeCol, PathEdgesCol)
      val best = all
        .groupBy(SeedCol, NodeCol)
        .agg(min(WeightCol).as("__sp_bw"))
      val keep = all
        .join(best, Seq(SeedCol, NodeCol))
        .filter(col(WeightCol) <= col("__sp_bw") + eps)
        .drop("__sp_bw")
        .transform(Scratch.cp)
      val fresh = keep
        .join(
          dist.select(SeedCol, NodeCol, PathEdgesCol),
          Seq(SeedCol, NodeCol, PathEdgesCol),
          "left_anti")
        .transform(Scratch.cp)
      converged = fresh.isEmpty
      dist = keep
      frontier = fresh
    }
    e.unpersist(blocking = false)
    nodeStructs.foreach(_.unpersist(blocking = false))
    if (withStructs) dist.drop(pnCol, peCol) else dist
  }

  /** K shortest paths by hop count — the reference's lazily-evaluated Yen
    * (`KShortestPathsCursor`, operator.cpp:3716). Yen's loop is inherently
    * per-(source,target) sequential (each spur iteration re-runs a BFS on a
    * pair-specific blocked subgraph), so the distributed analog is a
    * **k-truncated level-synchronous BFS**: every round extends simple
    * paths one hop, then keeps at most the k best (by hop count, then
    * lexicographic edge list — deterministic) per (seed, node), counting
    * paths already finished in earlier rounds against the k budget. The
    * frontier is therefore bounded by k × |reached nodes| — the property
    * Yen's k-bounded work gives on one pair, delivered for every pair at
    * once; the old exhaustive-enumeration plan blew up exponentially on
    * hub graphs (see KShortestSpec).
    *
    * Exactness: for walks the k-prefix property makes per-node truncation
    * exact (the i-th shortest walk to w extends a ≤i-th shortest walk to
    * its predecessor). Node-simple paths (Yen's) can in principle need a
    * (k+j)-th prefix when all k best prefixes already visit the target —
    * the spur edge case. The hedge is TARGETED: pairs whose candidate set
    * contains a target-visiting prefix (the only pairs the spur case can
    * hit, and only when `targets` names the endpoints of interest) keep
    * `factor × k` candidates in flight, everyone else exactly k; the final
    * per-pair rank cut restores k. The factor is
    * `spark.graft.kshortest.overprovision` (default 2) so a suspected
    * spur miss is diagnosable by widening it;
    * `spark.graft.kshortest.overprovision.all=true` applies the factor to
    * every pair (the pre-r9 global behavior — the only hedge available
    * when no target set exists).
    *
    * @param edges0 pre-oriented (src, dst, `__sp_eid`) traversal edges
    * @param targets optional (SeedCol, NodeCol) pairs of interest: once
    *        every pair has k paths the loop stops early (future paths are
    *        strictly longer, so they cannot enter any top-k)
    * @return (seed, node, dist, pathNodes, pathEdges) — at most k rows per
    *         (seed, node) with dist in [minHops, maxHops]
    */
  def kShortest(
      edges0: DataFrame,
      seeds: DataFrame,
      k: Int,
      minHops: Int,
      maxHops: Int,
      targets: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // subcritical + small seed set: one driver pass enumerates the simple
    // paths and cuts the same (hops, edge-list lex) top-k per pair that
    // the distributed final window produces — replaces ~4 jobs x maxHops
    // rounds (LocalSearch header; budget-bailed on path explosion)
    LocalSearch
      .tryCollect(edges0, seeds, withWeight = false)
      .foreach { case (arr, s) =>
        LocalSearch
          .kShortestDf(
            edges0.sparkSession, arr, s.map(_._1), k, minHops, maxHops)
          .foreach(df => return df)
      }
    // r13 A/B (sf0.1, cold selective runs): overprovision=2 4.1 s vs
    // overprovision=1 5.1 s — the contended-flag window + outCounts join
    // are NOT the drift; cold runs are dominated by ~2·maxHops driver
    // round jobs (same per-round job floor as the varexpand fixpoint,
    // VarExpand.scala:35). The warm sweep sits at ~1.8 s. Both windows
    // below share one (seed, node) shuffle; the flag only exists when
    // targets are present AND factor > 1.
    val conf = edges0.sparkSession.conf
    val factor = math.max(
      1L,
      conf.get("spark.graft.kshortest.overprovision", "2").toLong)
    val widenAll =
      conf.get("spark.graft.kshortest.overprovision.all", "false").toBoolean
    // spur-case hedge: contended pairs carry `factor*k` candidates through
    // the rounds, everyone else exactly k; the final cut keeps exactly k
    val baseBudget = if (widenAll) factor * k else k.toLong
    val wideBudget = factor * k
    val edges = edges0.persist(StorageLevel.MEMORY_AND_DISK)
    // per-seed target sets drive both the contention flag and early-stop;
    // target lists are per-query small — broadcast
    val targetSets = targets.map(t =>
      broadcast(
        t.groupBy(SeedCol).agg(collect_set(col(NodeCol)).as("__k_tset"))))
    var frontier = seeds
      .select(
        col(SeedCol),
        col(SeedCol).as(NodeCol),
        lit(0L).as(DistCol),
        array(col(SeedCol)).as(PathNodesCol),
        array().cast("array<long>").as(PathEdgesCol))
      .transform(Scratch.cp)
    // `out` = lazy union of the per-round checkpointed frontiers (each
    // round's rows are materialized once by their own Scratch.cp;
    // re-checkpointing the growing union per round copied every kept path
    // O(rounds) times — see bfsEdges). UNLIKE the write-only BFS
    // accumulators, kShortest READS its accumulator every round (budget
    // filter + saturation probe), so aggregating the leaf union per round
    // re-scanned and re-shuffled every prior round's paths each round —
    // the r17 kshortest regression (~2×). The per-(seed,node) path counts
    // are therefore maintained INCREMENTALLY: each round's (already
    // checkpointed) leaf aggregates once and merges into a small
    // checkpointed count frame — O(|reached pairs|) rows, not O(paths),
    // and the full path union is only scanned once by the final cut.
    var outRounds: List[DataFrame] = Nil
    def out: Option[DataFrame] =
      if (outRounds.isEmpty) None else Some(outRounds.reduce(_ unionByName _))
    var counts: Option[DataFrame] = None
    def outCounts: DataFrame = counts.getOrElse(
      seeds.limit(0).select(
        col(SeedCol), col(SeedCol).as(NodeCol), lit(0L).as("__k_cnt")))
    var round = 0
    var done = frontier.isEmpty
    while (!done && round < maxHops) {
      round += 1
      val expanded = frontier
        .join(edges, col(NodeCol) === col(GraphState.SrcCol))
        .filter(!array_contains(col(PathNodesCol), col(GraphState.DstCol)))
        .select(
          col(SeedCol),
          col(GraphState.DstCol).as(NodeCol),
          (col(DistCol) + 1L).as(DistCol),
          concat(col(PathNodesCol), array(col(GraphState.DstCol)))
            .as(PathNodesCol),
          concat(col(PathEdgesCol), array(col("__sp_eid"))).as(PathEdgesCol))
      // keep only rows still inside their pair's budget: rank within the
      // round (shorter rounds ran earlier, so prior finds always outrank).
      // A pair is spur-contended when any of its candidates already visits
      // one of its seed's targets; only those pairs get the wide budget.
      // Both windows share the (seed, node) partitioning — one shuffle.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(SeedCol, NodeCol)
        .orderBy(col(PathEdgesCol).asc)
      val wPair = org.apache.spark.sql.expressions.Window
        .partitionBy(SeedCol, NodeCol)
      val flagged = targetSets match {
        case Some(ts) if baseBudget < wideBudget =>
          expanded
            .join(ts, Seq(SeedCol), "left_outer")
            .withColumn(
              "__k_contended",
              max(
                when(
                  coalesce(
                    arrays_overlap(col(PathNodesCol), col("__k_tset")),
                    lit(false)),
                  1).otherwise(0)).over(wPair) === 1)
            .drop("__k_tset")
        case _ =>
          expanded.withColumn("__k_contended", lit(false))
      }
      frontier = flagged
        .withColumn("__k_rn", row_number().over(w))
        .join(outCounts, Seq(SeedCol, NodeCol), "left_outer")
        .filter(
          col("__k_rn") + coalesce(col("__k_cnt"), lit(0L)) <=
            when(col("__k_contended"), lit(wideBudget))
              .otherwise(lit(baseBudget)))
        .drop("__k_rn", "__k_cnt", "__k_contended")
        .transform(Scratch.cp)
      done = frontier.isEmpty
      if (round >= minHops && !done) {
        outRounds ::= frontier
        val delta = frontier
          .groupBy(SeedCol, NodeCol).agg(count(lit(1)).as("__k_cnt"))
        counts = Some(Scratch.cp(counts match {
          case Some(c) => c.unionByName(delta)
            .groupBy(SeedCol, NodeCol)
            .agg(sum("__k_cnt").as("__k_cnt"))
          case None => delta
        }))
      }
      if (!done) targets.foreach { t =>
        // saturated when no target pair still needs paths
        val needy = t.join(
          outCounts.filter(col("__k_cnt") >= k),
          Seq(SeedCol, NodeCol),
          "left_anti")
        done = needy.isEmpty
      }
    }
    edges.unpersist(blocking = false)
    // final exact cut: k best per pair by (hops, lexicographic edge list)
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(SeedCol, NodeCol)
      .orderBy(col(DistCol).asc, col(PathEdgesCol).asc)
    out
      .getOrElse(frontier.limit(0))
      .withColumn("__k_rn", row_number().over(wf))
      .filter(col("__k_rn") <= k)
      .drop("__k_rn")
  }

  /** Weighted shortest path (Dijkstra-by-rounds ≈ Bellman–Ford with early
    * stop): each round relaxes every edge once; converges when no distance
    * improves or after `maxRounds` (the hops-limit analog). Weights must be
    * non-negative for shortest-walk = shortest-path semantics (the reference
    * raises on negative weights too, `operator.cpp:3000` region).
    *
    * @param edges pre-oriented (src, dst, weight) frame
    * @return (seed, node, weight-dist, hop count) per reachable node
    */
  def weighted(
      g: GraphState,
      seeds: DataFrame,
      edges: DataFrame,
      maxRounds: Int): DataFrame = {
    // subcritical + small seed set: a driver Bellman–Ford pass replaces
    // the whole relaxation fixpoint (LocalSearch header; identical strict
    // (weight, dist)-lexicographic improvement)
    LocalSearch
      .tryCollect(
        (if (edges.columns.contains("__sp_eid")) edges
         else edges.withColumn("__sp_eid", lit(0L))),
        seeds, withWeight = true)
      .foreach { case (arr, s) =>
        return LocalSearch.weightedDf(edges.sparkSession, arr, s, maxRounds)
      }
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    // DELTA relaxation: only rows improved last round join the edge frame
    // (classic frontier Bellman–Ford), so per-round relax work scales with
    // the frontier, not |visited| — at 100× data the steady-state frontier
    // is a small fraction of the reached set. One action per round (the
    // improved-delta checkpoint doubles as the convergence probe); the
    // union+min merge only runs on non-final rounds.
    // Same lineage discipline as [[bfs]]: localCheckpoint per round.
    var dist = seeds
      .select(
        col(SeedCol),
        col(SeedCol).as(NodeCol),
        (if (seeds.columns.contains(InitWeightCol)) col(InitWeightCol)
         else lit(0.0)).as(WeightCol),
        lit(0L).as(DistCol))
      .transform(Scratch.cp)
    var frontier = dist
    var r = 0
    var converged = frontier.isEmpty
    while (!converged && r < maxRounds) {
      r += 1
      val t0 = System.nanoTime()
      val cand = frontier
        .join(e, col(NodeCol) === col(GraphState.SrcCol))
        .select(
          col(SeedCol),
          col(GraphState.DstCol).as(NodeCol),
          (col(WeightCol) + col(EdgeWeightCol)).as(WeightCol),
          (col(DistCol) + 1L).as(DistCol))
        .groupBy(SeedCol, NodeCol)
        .agg(min(struct(col(WeightCol), col(DistCol))).as("__m"))
        .select(
          col(SeedCol),
          col(NodeCol),
          col("__m")(WeightCol).as(WeightCol),
          col("__m")(DistCol).as(DistCol))
      // strict improvements only — (weight, dist) lexicographic, matching
      // the reference's total_weight-then-depth ordering
      val improved = cand
        .join(
          dist.select(
            col(SeedCol),
            col(NodeCol),
            col(WeightCol).as("__old_w"),
            col(DistCol).as("__old_d")),
          Seq(SeedCol, NodeCol),
          "left_outer")
        .filter(
          col("__old_w").isNull || col(WeightCol) < col("__old_w") ||
            (col(WeightCol) === col("__old_w") &&
              col(DistCol) < col("__old_d")))
        .drop("__old_w", "__old_d")
        .transform(Scratch.cp)
      converged = improved.isEmpty
      if (!converged) {
        // `improved` holds only strict winners, so the merge is exact as
        // (dist minus improved keys) ∪ improved — an anti-join on the
        // (seed, node) key instead of re-aggregating the WHOLE visited
        // set each round. Both sides leave a (seed, node) shuffle
        // (improved from its groupBy, dist from last round's merge), so
        // the join is co-partitioned; at 100× the per-round merge cost
        // follows the frontier, not |visited|.
        dist = dist
          .join(
            improved.select(SeedCol, NodeCol),
            Seq(SeedCol, NodeCol),
            "left_anti")
          .unionByName(improved)
          .transform(Scratch.cp)
        frontier = improved
      }
      if (sys.env.contains("GRAFT_SP_DEBUG"))
        System.err.println(
          f"[wsp] round $r%d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    e.unpersist(blocking = false)
    dist
  }

  /** [[weighted]] with representative-path carry and an optional
    * per-expansion filter — the reference's
    * `ExpandWeightedShortestPathCursor` with `filter_lambda_`
    * (`operator.cpp:3000` region) binds the traversed edge list / path and
    * may filter each expansion against the accumulated path and weight.
    * The same delta-relaxation rounds as [[weighted]], but rows carry the
    * representative path's id arrays (and, when filtering, entity-struct
    * arrays — path-dependent admissibility can't be replayed after the
    * fact). Weight-tie determinism: within a round the lexicographically
    * smallest (node-seq, edge-seq) wins; across rounds an equal
    * (weight, dist) candidate never displaces the incumbent.
    *
    * @param edges pre-oriented: [[GraphState.SrcCol]],
    *        [[GraphState.DstCol]], [[EdgeWeightCol]], `__sp_eid`, and —
    *        when `stepFilter` is set — [[EStructCol]]
    * @param nodes (`GraphState.IdCol`, [[NStructCol]]); required with
    *        `stepFilter`
    * @param stepFilter sees [[EStructCol]], [[NStructCol]], the
    *        accumulated path under `pathCols` names, and the accumulated
    *        weight (incl. the candidate edge) under [[WeightCol]] — the
    *        caller aliases its lambda's weight variable to that
    * @return (seed, node, weight, dist, path-node ids, path-edge ids)
    */
  def weightedCarry(
      edges0: DataFrame,
      nodes: Option[DataFrame],
      seeds: DataFrame,
      maxRounds: Int,
      stepFilter: Option[DataFrame => Column],
      pathCols: (String, String, String)): DataFrame = {
    val (pnCol, peCol, plenCol) = pathCols
    val withStructs = stepFilter.isDefined
    val e = edges0.persist(StorageLevel.MEMORY_AND_DISK)
    val nodeStructs = nodes.map(
      _.select(col(GraphState.IdCol).as("__sp_nid"), col(NStructCol))
        .persist(StorageLevel.MEMORY_AND_DISK))
    def structCols0(seedStruct: Column): Seq[Column] =
      if (!withStructs) Nil
      else {
        val eStructT = e.schema(e.schema.fieldIndex(EStructCol)).dataType
        Seq(
          array(seedStruct).as(pnCol),
          array().cast(ArrayType(eStructT)).as(peCol))
      }
    var dist = {
      val s0 = nodeStructs
        .map(ns => seeds.join(ns, col(SeedCol) === col("__sp_nid")))
        .getOrElse(seeds)
      s0.select(
        Seq(
          col(SeedCol),
          col(SeedCol).as(NodeCol),
          (if (seeds.columns.contains(InitWeightCol)) col(InitWeightCol)
           else lit(0.0)).as(WeightCol),
          lit(0L).as(DistCol),
          array(col(SeedCol)).as(PathNodesCol),
          array().cast("array<long>").as(PathEdgesCol)) ++
          structCols0(col(NStructCol)): _*)
        .transform(Scratch.cp)
    }
    var frontier = dist
    var r = 0
    var converged = frontier.isEmpty
    while (!converged && r < maxRounds) {
      r += 1
      val candCols =
        Seq(
          col(SeedCol),
          col(GraphState.DstCol).as("__sp_next"),
          (col(WeightCol) + col(EdgeWeightCol)).as(WeightCol),
          (col(DistCol) + 1L).as(DistCol),
          concat(col(PathNodesCol), array(col(GraphState.DstCol)))
            .as(PathNodesCol),
          concat(col(PathEdgesCol), array(col("__sp_eid")))
            .as(PathEdgesCol)) ++
          (if (withStructs)
             Seq(
               concat(col(pnCol), array(col(NStructCol))).as(pnCol),
               concat(col(peCol), array(col(EStructCol))).as(peCol),
               col(EStructCol),
               col(NStructCol))
           else Nil)
      val cand0raw = frontier
        .join(e, col(NodeCol) === col(GraphState.SrcCol))
      val cand0 = nodeStructs
        .map(ns => cand0raw.join(ns, col(GraphState.DstCol) === col("__sp_nid")))
        .getOrElse(cand0raw)
        .select(candCols: _*)
        .withColumn(plenCol, col(DistCol))
      val cand1 = stepFilter
        .map(f => cand0.filter(f(cand0)))
        .getOrElse(cand0)
        .withColumnRenamed("__sp_next", NodeCol)
      val ordKey = struct(
        col(WeightCol), col(DistCol), col(PathNodesCol), col(PathEdgesCol))
      val aggs =
        Seq(min(ordKey).as("__m")) ++
          (if (withStructs)
             Seq(min_by(struct(col(pnCol), col(peCol)), ordKey).as("__ms"))
           else Nil)
      val cand = cand1
        .groupBy(SeedCol, NodeCol)
        .agg(aggs.head, aggs.tail: _*)
        .select(
          Seq(
            col(SeedCol),
            col(NodeCol),
            col("__m")(WeightCol).as(WeightCol),
            col("__m")(DistCol).as(DistCol),
            col("__m")(PathNodesCol).as(PathNodesCol),
            col("__m")(PathEdgesCol).as(PathEdgesCol)) ++
            (if (withStructs)
               Seq(
                 col("__ms")(pnCol).as(pnCol),
                 col("__ms")(peCol).as(peCol))
             else Nil): _*)
      val improved = cand
        .join(
          dist.select(
            col(SeedCol),
            col(NodeCol),
            col(WeightCol).as("__old_w"),
            col(DistCol).as("__old_d")),
          Seq(SeedCol, NodeCol),
          "left_outer")
        .filter(
          col("__old_w").isNull || col(WeightCol) < col("__old_w") ||
            (col(WeightCol) === col("__old_w") &&
              col(DistCol) < col("__old_d")))
        .drop("__old_w", "__old_d")
        .transform(Scratch.cp)
      converged = improved.isEmpty
      if (!converged) {
        dist = dist
          .join(
            improved.select(SeedCol, NodeCol),
            Seq(SeedCol, NodeCol),
            "left_anti")
          .unionByName(improved)
          .transform(Scratch.cp)
        frontier = improved
      }
    }
    e.unpersist(blocking = false)
    nodeStructs.foreach(_.unpersist(blocking = false))
    (if (withStructs) dist.drop(pnCol, peCol) else dist)
      .drop(plenCol)
  }
}
