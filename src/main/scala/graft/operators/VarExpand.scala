package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Frames, GraphState}

/** Variable-length expansion `-[e:T*min..max]->` — the reference's
  * `ExpandVariable` in DEPTH_FIRST mode (`src/query/plan/operator.hpp:1172`,
  * cursor `operator.cpp:2199`), including inline cyphermorphism (an edge may
  * appear at most once per traversal,
  * reference `EdgeUniquenessFilter`, operator.hpp:1768).
  *
  * Two lowerings:
  *   - **bounded** (`*lo..hi`): unrolled into a union of k-hop join chains —
  *     one declarative plan, each hop an equi-join Catalyst can broadcast or
  *     shuffle; the union's branches evaluate in parallel across the
  *     cluster.
  *   - **unbounded** (`*`): driver-steered fixpoint — expand a frontier one
  *     hop per round with per-round `localCheckpoint` (lineage truncation,
  *     see [[ShortestPath]]) until the frontier is empty. Terminates on any
  *     graph because a path cannot repeat an edge; a safety valve raises
  *     after [[HardHopLimit]] rounds instead of silently truncating (the
  *     reference's opt-in `USING HOPS LIMIT`, ast.hpp:2086 — but wrong
  *     answers are never returned silently).
  *
  * The traversed edge-id list is carried as an ARRAY column (`e@_ids`);
  * uniqueness is `!array_contains(path, edge)`.
  */
object VarExpand {

  /** Safety valve for unbounded `*`: raise, never truncate. */
  val HardHopLimit = 64

  // Round-12 A/B (varexpand_unbounded, sf0.1, warm, local[8]): prune ON
  // 2.7-3.6 s vs OFF 2.7-2.9 s — the sweep-visible cost is NOT the edge
  // scan but the fixpoint's per-round driver overhead (~10 jobs: one
  // step join + localCheckpoint + count per level across 4 levels),
  // which is inherent to level-synchronous execution on a ~0.2 s/job
  // local floor. The id-prune + lazy persist stay because they change
  // the SCALE shape: a point-seeded traversal reads only the frontier's
  // row groups instead of materializing the full edge corpus.

  /** Internal column names used while stepping (dropped before return). */
  private val CUR = "__vx_cur"
  private val PATH = "__vx_path"
  private val RID = "__vx_rid"

  /** Expand from `srcVar`, binding `edgeVar@_ids` (edge-id list, in
    * traversal order) and fresh node `dstVar`. `dir` is interpreted per-hop.
    * `maxHops = None` means unbounded (fixpoint iteration).
    */
  def apply(
      frame: DataFrame,
      g: GraphState,
      srcVar: String,
      edgeVar: String,
      types: Seq[String],
      dir: Expand.Direction,
      minHops: Int,
      maxHops: Option[Int],
      dstVar: String,
      dstLabel: Option[String],
      /** `USING HOPS LIMIT n` (ast.hpp:2086): cap on TOTAL edge traversals
        * in the fixpoint loop. The reference returns partial results in its
        * DFS order; a distributed batch engine has no such order, so we
        * RAISE on breach instead of returning nondeterministic partials —
        * documented deviation, wrong/partial answers are never silent. */
      hopsLimit: Option[Long] = None,
      /** Pre-oriented (id, src, dst) edge frame override — the planner's
        * filter-lambda path supplies traversal-ready edges; stepping is
        * always Out against it. */
      edgesOverride: Option[DataFrame] = None): DataFrame = {
    require(minHops >= 0, s"bad hop range $minHops..$maxHops")
    // an EMPTY interval (*2..1, *1..0) matches nothing — zero rows, not an
    // error (VarLengthAcceptance "empty interval" scenarios; the
    // reference's ExpandVariable yields no pulls for an empty range)
    val emptyInterval = maxHops.exists(_ < minHops)

    // Pre-orient once for undirected patterns (the [[ShortestPath.oriented]]
    // pattern): the per-round frontier⋈edges join must stay a single
    // equi-join — an OR-of-equalities condition would fall back to
    // BroadcastNestedLoopJoin on every round. The reversed copy excludes
    // self-loops so a loop edge traverses once, matching the reference's
    // BOTH iteration. After orienting, every hop steps Out.
    val edges = edgesOverride.getOrElse {
      val edges0 = g.edgesOfTypes(types)
        .select(col(GraphState.IdCol), col(GraphState.SrcCol), col(GraphState.DstCol))
      dir match {
        case Expand.Both =>
          edges0.unionByName(
            edges0
              .filter(col(GraphState.SrcCol) =!= col(GraphState.DstCol))
              .select(
                col(GraphState.IdCol),
                col(GraphState.DstCol).as(GraphState.SrcCol),
                col(GraphState.SrcCol).as(GraphState.DstCol)))
        case _ => edges0
      }
    }
    val stepDir =
      if (edgesOverride.isDefined || dir == Expand.Both) Expand.Out else dir

    val base = frame
      .withColumn(CUR, Frames.id(srcVar))
      .withColumn(PATH, array().cast("array<long>"))

    // Known total row count of the union the fixpoint branch returns
    // (every reached frontier is counted for the emptiness probe anyway).
    // -1 = unknown (unrolled branch / minHops==0 includes the uncounted
    // base frame). Drives the FINAL node-bind join's broadcast gate below:
    // checkpointed frontiers carry no catalyst size stats, so without it a
    // point-seeded traversal's last join shuffles the whole node union to
    // meet a handful of rows.
    var reachedN = -1L
    // Slim-carry's wide keyed base (set by the fixpoint branch): the
    // node-bind join runs on the SLIM traversal rows first, and the wide
    // columns re-attach by rowid LAST — so the broadcast candidates are
    // always narrow rows and the wide row moves at most once (r17 ADVICE:
    // the old order force-broadcast up to 100k re-widened rows).
    var keyedWide: Option[DataFrame] = None

    val all = maxHops match {
      case _ if emptyInterval => base.limit(0)
      case Some(h) if h <= 12 => // unrolled declarative plan
        var cur = base
        var reached: Seq[DataFrame] = Nil
        if (minHops == 0) reached = reached :+ cur
        for (k <- 1 to h) {
          cur = step(cur, edges, stepDir)
          if (k >= minHops) reached = reached :+ cur
        }
        reached.reduce(_ unionByName _)
      case bound => // fixpoint loop (unbounded or large bound)
        val limit = bound.getOrElse(HardHopLimit)
        // The (possibly multi-type union) edge frame is re-joined every
        // round. Persist it LAZILY — only the first round whose frontier
        // is too large for id-pruning pays the materialization: a tiny
        // frontier instead collects its node ids and pushes an `isin`
        // into the edge scan (parquet row-group / cache-batch pruning —
        // the single-node reference's O(deg) adjacency fetch analog), so
        // a point-seeded traversal never scans the full edge corpus.
        var ePersisted: Option[DataFrame] = None
        // the frontier matches the edge's SRC for Out steps but its DST
        // for In steps — prune the column the join actually probes
        val pruneCol =
          if (stepDir == Expand.In) GraphState.DstCol else GraphState.SrcCol
        def edgesFor(frontierIds: Option[Seq[Long]]): DataFrame =
          frontierIds match {
            case Some(ids) =>
              edges.filter(col(pruneCol).isin(ids.map(Long.box): _*))
            case None =>
              ePersisted.getOrElse {
                val p = edges.persist(
                  org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
                ePersisted = Some(p)
                p
              }
          }
        val pruneMax = frame.sparkSession.conf
          .get("spark.graft.varexpand.pruneFrontier", "1000").toLong
        // SLIM CARRY (opt guide §8 "move heavy bytes once"): the fixpoint
        // localCheckpoints AND (for large frontiers) shuffles the frontier
        // EVERY round, so a wide input frame (LDBC bi3/bi9/bi12 arrive
        // here with whole person+message rows bound) pays rounds×width in
        // materialization and shuffle bytes. Above `slimCarry` non-
        // traversal columns, carry only (rowid, cur, path) through the
        // rounds and re-attach the wide row by rowid once at the end —
        // identical rows, the heavy columns move once. The rowid is
        // monotonically_increasing_id FROZEN by the eager checkpoint (its
        // values are computed exactly once, inside the cp materialization,
        // and every later read serves the stored blocks).
        val slimMin = frame.sparkSession.conf
          .get("spark.graft.varexpand.slimCarry", "10").toInt
        val wideCols = base.columns.filterNot(c => c == CUR || c == PATH)
        val keyed: Option[DataFrame] =
          if (wideCols.length < slimMin) None
          else Some(
            base
              .withColumn(RID, monotonically_increasing_id())
              .transform(Scratch.cp))
        var cur = keyed
          .map(_.select(col(RID), col(CUR), col(PATH)))
          .getOrElse(base)
          .transform(Scratch.cp)
        var reached: Seq[DataFrame] = Nil
        if (minHops == 0) reached = reached :+ cur
        // a localCheckpointed frontier has no catalyst size stats, so AQE
        // never converts the per-round frontier⋈edges join to a broadcast
        // join by itself — every round would shuffle the full persisted
        // edge frame. The count the loop needs anyway (emptiness probe /
        // hops cap) doubles as the broadcast decision: a known-small
        // frontier is sent to the edge scan, no shuffle at all.
        val bcastMax = frame.sparkSession.conf
          .get("spark.graft.varexpand.broadcastFrontier", "100000").toLong
        var k = 0
        var traversed = 0L
        var curN = cur.count()
        var empty = curN == 0L
        if (minHops == 0) reachedN = curN else reachedN = 0L
        while (!empty && k < limit) {
          k += 1
          val tRound = System.nanoTime()
          // a ≤pruneMax-row CHECKPOINTED frontier re-reads for the id
          // collect, not recomputes — two cheap actions beat one full
          // edge-corpus scan
          val frontierIds: Option[Seq[Long]] =
            if (curN <= pruneMax)
              Some(cur.select(col(CUR)).filter(col(CUR).isNotNull)
                .distinct().collect().map(_.getLong(0)).toSeq)
            else None
          cur = step(
            cur, edgesFor(frontierIds), stepDir,
            bcastFrontier = curN <= bcastMax)
            .transform(Scratch.cp)
          // one action per round: the frontier count serves the emptiness
          // probe, the hops cap check, and the next broadcast decision
          curN = cur.count()
          hopsLimit.foreach { cap =>
            traversed += curN
            if (traversed > cap)
              throw new IllegalStateException(
                s"hops limit exceeded: $traversed edge traversals > $cap " +
                  "(USING HOPS LIMIT; partial traversal order is " +
                  "engine-specific, so this engine raises instead of " +
                  "returning nondeterministic partial results)")
          }
          empty = curN == 0L
          if (!empty && k >= minHops) {
            reached = reached :+ cur
            reachedN += curN
          }
          if (sys.env.contains("GRAFT_VX_DEBUG"))
            System.err.println(
              f"[varexpand] round $k%d rows=$curN%d " +
                f"${(System.nanoTime() - tRound) / 1e9}%.2fs")
        }
        ePersisted.foreach(_.unpersist(blocking = false))
        if (!empty && bound.isEmpty)
          throw new IllegalStateException(
            s"unbounded variable expansion exceeded $HardHopLimit hops — " +
              "add an explicit upper bound (USING HOPS LIMIT analog)")
        if (reached.isEmpty) reached = Seq(cur.limit(0))
        keyedWide = keyed
        reached.reduce(_ unionByName _)
    }

    val nodesDf = dstLabel.map(g.nodesOrEmpty).getOrElse(g.allNodes)
    // gatedBroadcast: no-op when reachedN is unknown (-1) or above the
    // frontier-broadcast threshold — a huge traversal result must never be
    // force-broadcast
    val bound = Scratch.gatedBroadcast(all, reachedN)
      .join(Frames.bind(dstVar)(nodesDf), col(CUR) === Frames.id(dstVar))
      .withColumn(s"$edgeVar${Frames.Sep}_ids", col(PATH))
      .drop(CUR, PATH)
    // slim-carry: re-attach the wide input columns by rowid ONCE, after
    // the node bind. When the traversal stayed small the bound slim rows
    // broadcast (gate: counted rows, never a supernode blow-up) and the
    // wide checkpointed base is never shuffled at all; above the gate the
    // rowid equi-join shuffles the wide row exactly once — either way the
    // guide-§8 invariant holds: heavy bytes move at most once.
    keyedWide match {
      case Some(kd) =>
        kd.drop(CUR, PATH)
          .join(Scratch.gatedBroadcast(bound, reachedN), Seq(RID))
          .drop(RID)
      case None => bound
    }
  }

  /** One hop: join the frontier to the edge frame, enforce edge
    * uniqueness, extend the path. */
  private def step(
      cur0: DataFrame,
      edges: DataFrame,
      dir: Expand.Direction,
      bcastFrontier: Boolean = false): DataFrame = {
    val cur = if (bcastFrontier) broadcast(cur0) else cur0
    val e = edges.select(
      col(GraphState.IdCol).as("__e_id"),
      col(GraphState.SrcCol).as("__e_src"),
      col(GraphState.DstCol).as("__e_dst"))
    val joined = dir match {
      case Expand.Out =>
        cur.join(e, col(CUR) === col("__e_src"))
          .withColumn("__next", col("__e_dst"))
      case Expand.In =>
        cur.join(e, col(CUR) === col("__e_dst"))
          .withColumn("__next", col("__e_src"))
      case Expand.Both =>
        // never reached: apply() pre-orients the edge frame and steps Out
        throw new UnsupportedOperationException(
          "undirected step: pre-orient the edge frame and step Out")
    }
    joined
      .filter(!array_contains(col(PATH), col("__e_id")))
      .withColumn(PATH, concat(col(PATH), array(col("__e_id"))))
      .withColumn(CUR, col("__next"))
      .drop("__e_id", "__e_src", "__e_dst", "__next")
  }
}
