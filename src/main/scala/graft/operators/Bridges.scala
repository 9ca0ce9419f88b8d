package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact bridge finding — the reference's `bridges_module`
  * (`src/mage/cpp/bridges_module`, Tarjan low-link DFS). A DFS is
  * inherently sequential, so this re-derives the answer with the classic
  * parallel CYCLE-CONTRACTION + TREE-PRUNING scheme, O(log n)
  * level-synchronous rounds on ANY graph shape (long paths and rings
  * contract geometrically — no diameter dependence):
  *
  * Each round, on the contracted multigraph (super-edges carry the set of
  * original edge ids they absorbed), after normalizing endpoints through
  * the vertex-contraction map:
  *   - if any SELF-LOOP or PARALLEL pair exists, resolve those and end
  *     the round: a self-loop closed a cycle → constituents are cyclic
  *     (non-bridges); parallel super-edges witness a cycle → constituents
  *     cyclic and the endpoints contract (they are 2-edge-connected).
  *     Degree decisions NEVER run in a round that contracts vertices —
  *     they would read pre-contraction degrees and could mislabel cycle
  *     edges as bridges.
  *   - otherwise (simple graph this round): a DEGREE-1 vertex's edge is
  *     a finished tree edge → constituents are BRIDGES (series-merged
  *     edges share bridge-ness); then DEGREE-2 vertices with two distinct
  *     neighbors SERIES-merge their edges. Only a hash-local-maximum
  *     independent set contracts per round (ids are often sequential
  *     along paths, so raw-id order would contract one vertex per
  *     monotone run; Murmur3-hash order removes a constant fraction).
  *
  * Every original edge ends either cyclic (absorbed into a collapsed
  * cycle) or a bridge (popped as a leaf edge). Deterministic: fixed hash,
  * min-label contraction, no randomness.
  *
  * SUPPORTED CLASS: graphs fully reducible by {loop, parallel, leaf,
  * series} — all forests, rings, tree fringes, series-parallel cores, and
  * their compositions. A residual 2-core of minimum degree ≥ 3 (e.g. K4)
  * is irreducible under these rules; the operator RAISES there instead of
  * answering wrongly — callers fall back to [[Biconnected]] (BFS forest +
  * chord-to-LCA aux components, exact on every graph, O(forest depth)
  * rounds — shallow exactly where contraction gives up). Component
  * labeling lives ONLY in [[Biconnected]]: one true biconnected component
  * can resolve across several contraction events here, so no bcc output.
  */
object Bridges {

  /** Rounds used by the most recent [[apply]] — test introspection for
    * the O(log n) contraction bound (not part of the result contract). */
  @volatile var lastRounds: Int = 0

  /** @param edges (edge_id, src, dst) — undirected interpretation.
    * @param maxRounds safety valve (contraction is O(log n); a breach
    *        indicates a bug, so raise rather than answer wrongly)
    * @return (edge_id, is_bridge) for every input edge
    */
  def apply(
      spark: SparkSession,
      edges: DataFrame,
      maxRounds: Int = 96): DataFrame = {

    var cur = edges
      .select(
        col("src").cast("long").as("u"),
        col("dst").cast("long").as("v"),
        array(col("edge_id").cast("long")).as("members"))
      .transform(Scratch.cp)
    // cumulative vertex-contraction map (node -> representative),
    // kept fully path-compressed
    var rep = spark.range(0).select(
      col("id").as("node"), col("id").as("rep"))
    // append-only accumulator: per-round checkpointed leaves, one lazy
    // union at the end (re-checkpointing the growing union each round
    // copied every found bridge O(rounds) times — see ShortestPath)
    var bridgeRounds: List[DataFrame] = Nil
    def bridges: Option[DataFrame] =
      if (bridgeRounds.isEmpty) None
      else Some(bridgeRounds.reduce(_ unionByName _))
    def addIds(rows: DataFrame): Unit =
      bridgeRounds ::=
        rows.select(explode(col("members")).as("edge_id")).transform(Scratch.cp)
    var round = 0
    var done = cur.isEmpty
    while (!done && round < maxRounds) {
      round += 1
      // normalize endpoints; canonical (min, max) orientation
      val norm = cur
        .join(
          rep.select(col("node").as("__nu"), col("rep").as("__ru")),
          col("u") === col("__nu"), "left_outer")
        .join(
          rep.select(col("node").as("__nv"), col("rep").as("__rv")),
          col("v") === col("__nv"), "left_outer")
        .select(
          coalesce(col("__ru"), col("u")).as("u0"),
          coalesce(col("__rv"), col("v")).as("v0"),
          col("members"))
        .select(
          least(col("u0"), col("v0")).as("u"),
          greatest(col("u0"), col("v0")).as("v"),
          col("members"))
      val loops = norm.filter(col("u") === col("v"))
      val noLoops = norm.filter(col("u") =!= col("v"))
      val grouped = noLoops
        .groupBy("u", "v")
        .agg(
          count(lit(1)).as("__n"),
          flatten(collect_list("members")).as("members"))
        .transform(Scratch.cp)
      val hadLoops = !loops.isEmpty
      val par = grouped.filter(col("__n") >= 2)
      val hadPar = Option(grouped.agg(max("__n")).first().get(0))
        .exists(_.asInstanceOf[Long] >= 2L)

      if (hadLoops || hadPar) {
        // cycle-resolution round: drop loops (cyclic by construction —
        // we simply do not record them as bridges), collapse parallels,
        // union endpoints; degree logic waits for a clean round
        val unions = par.select(col("v").as("node"), col("u").as("rep"))
        if (hadPar) rep = compress(rep, unions)
        cur = grouped.filter(col("__n") === 1).drop("__n").transform(Scratch.cp)
      } else {
        val live = grouped.drop("__n")
        // leaf prune: degree-1 vertices finish their edge as a bridge
        val leaves = live
          .select(explode(array(col("u"), col("v"))).as("n"))
          .groupBy("n")
          .agg(count(lit(1)).as("d"))
          .filter(col("d") === 1)
          .select(col("n"))
        val flagged = live
          .join(
            leaves.select(col("n").as("__lu")),
            col("u") === col("__lu"), "left_outer")
          .join(
            leaves.select(col("n").as("__lv")),
            col("v") === col("__lv"), "left_outer")
          .withColumn(
            "__isleaf", col("__lu").isNotNull || col("__lv").isNotNull)
        addIds(flagged.filter(col("__isleaf")))
        val afterLeaf = flagged
          .filter(!col("__isleaf"))
          .select("u", "v", "members")
          .transform(Scratch.cp)
        // series contraction: hash-local-max independent set of degree-2
        // vertices with two distinct neighbors
        val deg2 = afterLeaf
          .select(explode(array(
            struct(col("u").as("n"), col("v").as("o")),
            struct(col("v").as("n"), col("u").as("o")))).as("x"))
          .select(col("x.n").as("n"), col("x.o").as("o"))
          .groupBy("n")
          .agg(count(lit(1)).as("d"), min("o").as("a"), max("o").as("b"))
          .filter(col("d") === 2 && col("a") =!= col("b"))
          .select(col("n"), col("a"), col("b"))
        val cand = deg2.select(col("n"), hash(col("n")).as("h"))
        val beaten = deg2
          .select(col("n"), explode(array(col("a"), col("b"))).as("nb"))
          .join(cand.select(col("n").as("nb"), col("h").as("__nh")), Seq("nb"))
          .join(cand, Seq("n"))
          .filter(
            col("__nh") > col("h") ||
              (col("__nh") === col("h") && col("nb") > col("n")))
          .select(col("n"))
          .distinct()
        val winners = deg2.join(beaten, Seq("n"), "left_anti")
          .select(col("n").as("__mid"))
          .transform(Scratch.cp)
        // stall = clean round with nothing to prune or contract: the
        // residual 2-core has min degree ≥ 3 — outside the reduction
        // class, so raise rather than loop or guess
        if (leaves.isEmpty && winners.isEmpty && !afterLeaf.isEmpty)
          throw new UnsupportedOperationException(
            "bridges: residual 2-core with minimum degree >= 3 is not " +
              "reducible by loop/parallel/leaf/series rules (Tarjan-" +
              "Vishkin extension required); raising instead of answering " +
              "wrongly")
        val eid = afterLeaf.withColumn("__eid", monotonically_increasing_id())
          .transform(Scratch.cp)
        val touched = eid
          .select(col("__eid"), explode(array(col("u"), col("v"))).as("__mid"))
          .join(winners, Seq("__mid"))
        val tagged = eid.join(touched, Seq("__eid"), "left_outer")
        val untouched = tagged
          .filter(col("__mid").isNull)
          .select("u", "v", "members")
        val merged = tagged
          .filter(col("__mid").isNotNull)
          .select(
            col("__mid"),
            when(col("u") === col("__mid"), col("v"))
              .otherwise(col("u")).as("other"),
            col("members"))
          .groupBy("__mid")
          .agg(
            min("other").as("u"),
            max("other").as("v"),
            flatten(collect_list("members")).as("members"))
          .select("u", "v", "members")
        cur = untouched.unionByName(merged).transform(Scratch.cp)
      }
      done = cur.isEmpty
    }
    lastRounds = round
    if (!done)
      throw new IllegalStateException(
        s"bridges: contraction did not converge in $maxRounds rounds")

    val b = bridges
      .map(_.select(col("edge_id"), lit(true).as("is_bridge")))
      .getOrElse(spark.range(0).select(
        col("id").as("edge_id"), lit(true).as("is_bridge")))
    edges
      .select(col("edge_id"))
      .join(b, Seq("edge_id"), "left_outer")
      .select(
        col("edge_id"),
        coalesce(col("is_bridge"), lit(false)).as("is_bridge"))
  }

  /** Fold `unions` (node→rep, rep < node) into the cumulative map and
    * re-compress to a fixpoint (union chains are short). */
  private def compress(rep: DataFrame, unions: DataFrame): DataFrame = {
    var r2 = rep
      .unionByName(unions)
      .groupBy("node")
      .agg(min("rep").as("rep"))
      .transform(Scratch.cp)
    var doneC = false
    while (!doneC) {
      val step = r2
        .select(col("node"), col("rep"))
        .join(
          r2.select(col("node").as("__n2"), col("rep").as("__r2")),
          col("rep") === col("__n2"),
          "left_outer")
        .select(
          col("node"),
          least(coalesce(col("__r2"), col("rep")), col("rep")).as("rep"))
        .transform(Scratch.cp)
      doneC = step
        .select(col("node"), col("rep").as("__new"))
        .join(r2.select(col("node"), col("rep").as("__old")), Seq("node"))
        .filter(col("__new") =!= col("__old"))
        .isEmpty
      r2 = step
    }
    r2
  }
}
