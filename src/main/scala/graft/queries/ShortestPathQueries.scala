package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Oracle-checked shortest-path queries over the reconstructable KNOWS
  * ring+chord graph (every customer c knows (c+1) mod N and (c+7) mod N,
  * edge weight = (c*7+offset) mod 10 + 1 — pure functions of c_custkey, see
  * [[graft.sources.TpchGraphLoader]]).
  *
  * The engine side enters as Cypher (`shortestPath`, `allShortestPaths`,
  * `*WSHORTEST`) and runs the batched BFS / weighted-rounds operators
  * ([[graft.operators.ShortestPath]], reference cursors
  * `operator.cpp:2458,2726,3000,3309`). The DuckDB oracle is a *generated*
  * chained-CTE dynamic program — one CTE pair per BFS level / relaxation
  * round — which sidesteps the exponential walk enumeration a naive
  * recursive CTE would do on a cyclic graph.
  */
object ShortestPathQueries {

  private def g(s: SparkSession, dir: String) = TpchGraphLoader(s, dir)

  private def cq(name: String, cypher: String, oracle: String): QueryDef =
    QueryDef(name, (s, dir) => Cypher.run(s, g(s, dir), cypher), Some(oracle))

  /** Shared oracle prelude: node count + reconstructed KNOWS edges. */
  private val knowsPrelude =
    """n AS MATERIALIZED (SELECT max(c_custkey) + 1 AS nn FROM customer),
      |e AS MATERIALIZED (
      |  SELECT c_custkey AS src, (c_custkey + 1) % nn AS dst,
      |         CAST((c_custkey * 7 + 1) % 10 + 1 AS DOUBLE) AS w
      |  FROM customer, n
      |  UNION ALL
      |  SELECT c_custkey, (c_custkey + 7) % nn,
      |         CAST((c_custkey * 7 + 7) % 10 + 1 AS DOUBLE)
      |  FROM customer, n)""".stripMargin

  /** Level-by-level BFS DP from node 0: frontier f_i = newly reached nodes
    * at dist i (with shortest-path counts), visited d_i = union so far. */
  private def bfsOracle(maxHops: Int, allPaths: Boolean): String = {
    // MATERIALIZED: each level is referenced twice; inlining would recompute
    // the whole chain per level (exponential blowup — the SQL analog of the
    // lineage problem the engine solves with localCheckpoint).
    val levels = (1 to maxHops).map { i =>
      s"""f$i AS MATERIALIZED (
         |  SELECT e.dst AS node, $i AS dist, CAST(sum(f.np) AS BIGINT) AS np
         |  FROM f${i - 1} f JOIN e ON e.src = f.node
         |  WHERE e.dst NOT IN (SELECT node FROM d${i - 1})
         |  GROUP BY e.dst),
         |d$i AS MATERIALIZED (SELECT * FROM d${i - 1} UNION ALL SELECT * FROM f$i)""".stripMargin
    }
    val select =
      if (allPaths)
        s"""SELECT node AS k, CAST(dist AS BIGINT) AS d
           |FROM (SELECT node, dist, unnest(range(np)) FROM d$maxHops WHERE dist >= 1)
           |ORDER BY k, d""".stripMargin
      else
        s"""SELECT node AS k, CAST(dist AS BIGINT) AS d
           |FROM d$maxHops WHERE dist >= 1 ORDER BY k""".stripMargin
    s"""WITH $knowsPrelude,
       |f0 AS (SELECT CAST(0 AS BIGINT) AS node, 0 AS dist, CAST(1 AS BIGINT) AS np),
       |d0 AS (SELECT * FROM f0),
       |${levels.mkString(",\n")}
       |$select""".stripMargin
  }

  /** Bellman–Ford DP from node 0: w_i = min weight over walks of ≤ i edges —
    * exactly the engine's relaxation rounds. */
  private def wshortestOracle(rounds: Int): String = {
    val levels = (1 to rounds).map { i =>
      s"""w$i AS MATERIALIZED (
         |  SELECT node, min(wt) AS wt FROM (
         |    SELECT node, wt FROM w${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, p.wt + e.w AS wt
         |    FROM w${i - 1} p JOIN e ON e.src = p.node)
         |  GROUP BY node)""".stripMargin
    }
    s"""WITH $knowsPrelude,
       |w0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS DOUBLE) AS wt),
       |${levels.mkString(",\n")}
       |SELECT node AS k, wt AS w FROM w$rounds WHERE node <> 0 ORDER BY k""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    // ST/SS BFS (STShortestPathCursor operator.cpp:2458,
    // SingleSourceShortestPathCursor :2726): one row per reachable node with
    // minimal hop count, depth-capped at 16.
    cq(
      "bfs_shortest",
      """MATCH (a:Customer {c_custkey: 0}),
        |      p = shortestPath((a)-[:KNOWS*..16]->(b:Customer))
        |RETURN b.c_custkey AS k, length(p) AS d ORDER BY k""".stripMargin,
      bfsOracle(16, allPaths = false)),

    // All shortest paths (ExpandAllShortestPathsCursor operator.cpp:3309):
    // one row PER shortest path (path-count multiplicity), depth ≤ 12.
    cq(
      "bfs_allshortest",
      """MATCH (a:Customer {c_custkey: 0}),
        |      p = allShortestPaths((a)-[:KNOWS*..12]->(b:Customer))
        |RETURN b.c_custkey AS k, length(p) AS d ORDER BY k, d""".stripMargin,
      bfsOracle(12, allPaths = true)),

    // Full per-path enumeration (operator.cpp:3309): every distinct
    // shortest path carries its OWN vertex chain. On the ring(+1)+chord(+7)
    // KNOWS graph the paths are closed-form: target 8 = one +1 and one +7
    // in either order (2 paths), target 9 = two +1s and one +7 (3
    // orderings), target 14 = two +7s (1 path). Node ids recover their
    // keys mod 2^48.
    cq(
      "cy_allshortest_paths",
      """MATCH (a:Customer {c_custkey: 0}),
        |      p = allShortestPaths((a)-[:KNOWS*..6]->(b:Customer))
        |WHERE b.c_custkey IN [8, 9, 14]
        |RETURN b.c_custkey AS k, length(p) AS len,
        |       text.join([x IN nodes(p) | toString(id(x) % 281474976710656)],
        |                 '-') AS seq
        |ORDER BY k, seq""".stripMargin,
      """SELECT * FROM (VALUES
        |  (CAST(8 AS BIGINT), CAST(2 AS BIGINT), '0-1-8'),
        |  (8, 2, '0-7-8'),
        |  (9, 3, '0-1-2-9'),
        |  (9, 3, '0-1-8-9'),
        |  (9, 3, '0-7-8-9'),
        |  (14, 2, '0-7-14')) AS t(k, len, seq)
        |ORDER BY k, seq""".stripMargin),

    // K shortest paths by hop count (KShortestPathsCursor operator.cpp:3716):
    // bounded enumeration + per-(source,target) rank-k. The oracle
    // enumerates the same walks recursively and ranks per target.
    cq(
      "kshortest",
      """MATCH (a:Customer {c_custkey: 0})
        |      -[e:KNOWS *KSHORTEST ..6 {k: 3}]->(b:Customer)
        |RETURN b.c_custkey AS kb, size(e) AS hops ORDER BY kb, hops""".stripMargin,
      """WITH RECURSIVE
        |  n AS (SELECT max(c_custkey) + 1 AS nn FROM customer),
        |  e AS (
        |    SELECT c_custkey AS src,
        |           (c_custkey + 1) % (SELECT nn FROM n) AS dst FROM customer
        |    UNION ALL
        |    SELECT c_custkey, (c_custkey + 7) % (SELECT nn FROM n) FROM customer),
        |  walk(node, hops) AS (
        |    SELECT dst, 1 FROM e WHERE src = 0
        |    UNION ALL
        |    SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
        |    WHERE w.hops < 6)
        |SELECT node AS kb, CAST(hops AS BIGINT) AS hops FROM (
        |  SELECT node, hops,
        |         row_number() OVER (PARTITION BY node ORDER BY hops) AS rn
        |  FROM walk)
        |WHERE rn <= 3 ORDER BY kb, hops""".stripMargin),

    // Weighted shortest path (ExpandWeightedShortestPathCursor
    // operator.cpp:3000): reference syntax `*WSHORTEST (e, n | weight) total`,
    // k_weight edge property, 12 relaxation rounds.
    cq(
      "wshortest",
      """MATCH (a:Customer {c_custkey: 0})
        |      -[:KNOWS *WSHORTEST ..12 (e, n | e.k_weight) total]->(b:Customer)
        |RETURN b.c_custkey AS k, total AS w ORDER BY k""".stripMargin,
      wshortestOracle(12))
  )
}
