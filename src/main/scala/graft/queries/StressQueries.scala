package graft.queries

import org.apache.spark.sql.SparkSession

import graft.cypher.Cypher
import graft.sources.{PokecGraphLoader, StressGraphLoader}

/** The reference's planner-stress mgbench workloads as oracle gates —
  * round 17, VERDICT r16 asks #3 and #7.
  *
  *  - **supernode** (`tests/mgbench/workloads/supernode.py:37-57`): a hub
  *    vertex with one incident edge per other vertex (CARDINALITY 50,000
  *    — the reference's own size). The skewed-key shape that kills naive
  *    shuffles at 100×: the MERGE match side is 50k rows that all carry
  *    the SAME dst key, and the UNWIND write is 50k updates to ONE node.
  *    The engine's MERGE plans an anti-join on the EDGE-IDENTITY key
  *    (src,dst,type) — unique per row, so no skewed shuffle key — and SET
  *    collapses the 50k updates map-side (`Planner.dedupUpdates` groupBy
  *    before the 1-row join). PlanInvariantSpec pins both facts.
  *  - **cartesian** (`cartesian.py:33-53`): disconnected patterns with
  *    cross-pattern predicates. The engine plans a crossJoin and lets
  *    Catalyst rewrite filter-over-cross into an equi-join for the two
  *    join-shaped variants (PlanInvariantSpec: no CartesianProduct);
  *    the filtering variant's 100×100 product IS the workload.
  *  - **pokec_traversals** (`pokec_traversals.py`): the 20-query traversal
  *    tail. 15 shapes are byte-identical to pokec.py queries already gated
  *    in [[PokecQueries]] (expansion_1..4 ±filter = pokec_expansion_*,
  *    neighbours_2 family = pokec_neighbours_2*, pattern_cycle/long/short
  *    = pokec_pattern_*); the 5 NEW shapes (expansion_5 ±filter at :261,
  *    :284, neighbours_3/4/5_with_data_and_filter at :501,:535,:569) are
  *    gated here over the same derived :User/FRIEND graph. Var-length
  *    DISTINCT-target oracles replay as bounded-depth recursive CTEs —
  *    exact, because any edge-repeating walk ≤k cuts to an edge-distinct
  *    one ≤k (cycle removal), so reachability sets coincide.
  *  - **pokec_planner_optimizations** (`pokec_planner_optimizations.py:
  *    76-126`): the 5 planner-stress shapes — indexed ORDER BY, parallel
  *    count, source-anchored unbounded undirected BFS, STARTS WITH
  *    (adapted: the derived graph's properties are integers, so the
  *    string-prefix predicate runs over `toString(u.id)` — same filter
  *    shape, documented adaptation), and the label-qualified OR filter.
  *
  * Determinism adaptations as in [[PokecQueries]]: random $id pinned to
  * 17 (the degree-12 hub), `RETURN n1, n2` whole-vertex rows project the
  * property tuple.
  */
object StressQueries {

  private def pg(s: SparkSession, dir: String) = PokecGraphLoader(s, dir)

  private def pq(name: String, cypher: String, oracle: String): QueryDef =
    QueryDef(name, (s, dir) => Cypher.run(s, pg(s, dir), cypher), Some(oracle))

  /** DuckDB replay of PokecGraphLoader.derived (see PokecQueries). */
  private val prelude =
    """u AS (SELECT CAST(c_custkey AS BIGINT) AS id,
      |            CAST((c_custkey*37)%80 AS BIGINT) AS age,
      |            CAST(c_custkey%2 AS BIGINT) AS gender,
      |            CAST(c_custkey*13%100 AS BIGINT) AS cp
      |      FROM customer),
      |fr AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
      |              CAST(o_orderkey % (SELECT max(c_custkey)+1 FROM customer) AS BIGINT) AS dst
      |       FROM orders
      |       WHERE o_custkey != o_orderkey % (SELECT max(c_custkey)+1 FROM customer))""".stripMargin

  /** Walks of length exactly 5 from 17 (expansion) and 1..k (neighbours)
    * as a bounded recursive CTE over fr. */
  private def walks(maxDepth: Int): String =
    s"""w(dst, d) AS (
       |  SELECT dst, 1 FROM fr WHERE src = 17
       |  UNION ALL
       |  SELECT f.dst, w.d + 1 FROM fr f JOIN w ON f.src = w.dst
       |  WHERE w.d < $maxDepth)""".stripMargin

  // ---- supernode (reference CARDINALITY = 50,000) --------------------
  private val SuperN = 50000L

  private def sg(s: SparkSession) = StressGraphLoader.supernode(s, SuperN)

  // ---- cartesian (reference CARDINALITY = 1,000) ---------------------
  private val CartN = 1000L

  private def cg(s: SparkSession) = StressGraphLoader.cartesian(s, CartN)

  val defs: Seq[QueryDef] = Seq(

    // supernode.py:37-42 — MERGE over the pre-created hub edges: every
    // (s, n) pair already has its edge, so the merge matches 50k rows
    // and creates nothing; the post-state edge AND node counts prove it
    QueryDef(
      "supernode_merge_edges",
      (s, _) => {
        val r = Cypher.execute(
          s, sg(s),
          "MATCH (s:Supernode), (n:Node) MERGE (s)<-[:EDGE]-(n)")
        Cypher.run(
          s, r.graph,
          """MATCH (n:Node)-[e:EDGE]->(m:Supernode)
            |RETURN count(*) AS n_edges""".stripMargin)
      },
      Some(s"SELECT CAST($SuperN AS BIGINT) AS n_edges")),

    // supernode.py:44-49 — same merge written from the node side
    QueryDef(
      "supernode_merge_edges_other_way",
      (s, _) => {
        val r = Cypher.execute(
          s, sg(s),
          "MATCH (s:Supernode), (n:Node) MERGE (n)-[:EDGE]->(s)")
        Cypher.run(
          s, r.graph,
          """MATCH (:Node)-[e:EDGE]->(:Supernode)
            |RETURN count(*) AS n_edges""".stripMargin)
      },
      Some(s"SELECT CAST($SuperN AS BIGINT) AS n_edges")),

    // supernode.py:51-57 — 50k UNWIND rows all updating the ONE hub node;
    // per-row last-write-wins leaves prop = 50000 (ascending range), which
    // the engine's dedupUpdates max() reproduces exactly
    QueryDef(
      "supernode_unwind_writes",
      (s, _) => {
        val r = Cypher.execute(
          s, sg(s),
          s"UNWIND range(1, $SuperN) AS x MATCH (s:Supernode) SET s.prop = x")
        Cypher.run(
          s, r.graph,
          "MATCH (s:Supernode) RETURN count(*) AS n, min(s.prop) AS prop")
      },
      Some(s"SELECT CAST(1 AS BIGINT) AS n, CAST($SuperN AS BIGINT) AS prop")),

    // cartesian.py:33-38 — the product of two 100-row filtered scans
    // (10,000 rows): filters push into each side, the product itself IS
    // the measured workload
    QueryDef(
      "cartesian_filtering",
      (s, _) => Cypher.run(
        s, cg(s),
        """MATCH (n1:Node), (n2:Node)
          |WHERE n1.id < 100 AND n2.id < 100
          |RETURN n1.id AS id1, n2.id AS id2
          |ORDER BY id1, id2""".stripMargin),
      Some("""SELECT a.range AS id1, b.range AS id2
             |FROM range(0, 100) a, range(0, 100) b
             |ORDER BY id1, id2""".stripMargin)),

    // cartesian.py:40-45 — disconnected patterns + cross-pattern equality:
    // Catalyst rewrites filter-over-crossJoin into an equi-join
    // (PlanInvariantSpec: no CartesianProduct in this plan)
    QueryDef(
      "cartesian_join",
      (s, _) => Cypher.run(
        s, cg(s),
        """MATCH (n1:Node), (n2:Node) WHERE n1.id = n2.id
          |RETURN n1.id AS id1, n2.id2 AS id2 ORDER BY id1""".stripMargin),
      Some("""SELECT a.range AS id1, a.range AS id2
             |FROM range(0, 1000) a ORDER BY id1""".stripMargin)),

    // cartesian.py:47-53 — equality across DIFFERENT properties
    QueryDef(
      "cartesian_different_props_join",
      (s, _) => Cypher.run(
        s, cg(s),
        """MATCH (n1:Node), (n2:Node) WHERE n1.id = n2.id2
          |RETURN n1.id AS id1, n2.id AS id2 ORDER BY id1""".stripMargin),
      Some("""SELECT a.range AS id1, a.range AS id2
             |FROM range(0, 1000) a ORDER BY id1""".stripMargin)),

    // ---- pokec_traversals.py new shapes ------------------------------
    pq(
      "pokec_expansion_5",
      """MATCH (s:User {id: 17})-->()-->()-->()-->()-->(n:User)
        |RETURN DISTINCT n.id AS id ORDER BY id""".stripMargin,
      s"""WITH RECURSIVE $prelude, ${walks(5)}
         |SELECT DISTINCT dst AS id FROM w WHERE d = 5 ORDER BY id"""
        .stripMargin),

    pq(
      "pokec_expansion_5_filter",
      """MATCH (s:User {id: 17})-->()-->()-->()-->()-->(n:User)
        |WHERE n.age >= 18
        |RETURN DISTINCT n.id AS id ORDER BY id""".stripMargin,
      s"""WITH RECURSIVE $prelude, ${walks(5)}
         |SELECT DISTINCT w.dst AS id FROM w JOIN u ON u.id = w.dst
         |WHERE w.d = 5 AND u.age >= 18 ORDER BY id""".stripMargin),

    pq(
      "pokec_neighbours_3_data_filter",
      """MATCH (s:User {id: 17})-[*1..3]->(n:User)
        |WHERE n.age >= 18
        |RETURN DISTINCT n.id AS id, n.age AS age, n.gender AS gender,
        |       n.completion_percentage AS cp
        |ORDER BY id""".stripMargin,
      s"""WITH RECURSIVE $prelude, ${walks(3)}
         |SELECT DISTINCT u.id, u.age, u.gender, u.cp
         |FROM w JOIN u ON u.id = w.dst WHERE u.age >= 18
         |ORDER BY u.id""".stripMargin),

    pq(
      "pokec_neighbours_4_data_filter",
      """MATCH (s:User {id: 17})-[*1..4]->(n:User)
        |WHERE n.age >= 18
        |RETURN DISTINCT n.id AS id, n.age AS age, n.gender AS gender,
        |       n.completion_percentage AS cp
        |ORDER BY id""".stripMargin,
      s"""WITH RECURSIVE $prelude, ${walks(4)}
         |SELECT DISTINCT u.id, u.age, u.gender, u.cp
         |FROM w JOIN u ON u.id = w.dst WHERE u.age >= 18
         |ORDER BY u.id""".stripMargin),

    pq(
      "pokec_neighbours_5_data_filter",
      """MATCH (s:User {id: 17})-[*1..5]->(n:User)
        |WHERE n.age >= 18
        |RETURN DISTINCT n.id AS id, n.age AS age, n.gender AS gender,
        |       n.completion_percentage AS cp
        |ORDER BY id""".stripMargin,
      s"""WITH RECURSIVE $prelude, ${walks(5)}
         |SELECT DISTINCT u.id, u.age, u.gender, u.cp
         |FROM w JOIN u ON u.id = w.dst WHERE u.age >= 18
         |ORDER BY u.id""".stripMargin),

    // ---- pokec_planner_optimizations.py ------------------------------
    pq(
      "pokec_planopt_order_by",
      "MATCH (u:User) RETURN u.id AS id ORDER BY id",
      s"WITH $prelude SELECT id FROM u ORDER BY id"),

    pq(
      "pokec_planopt_count",
      "MATCH (u) RETURN count(u) AS n",
      s"WITH $prelude SELECT count(*) AS n FROM u"),

    // unbounded UNDIRECTED bfs from a source: one shortest path per
    // reachable target -> count(p) = undirected-reachable users (self
    // excluded, memgraph's default lower bound 1)
    pq(
      "pokec_planopt_bfs_source",
      "MATCH p=(u:User {id: 1})-[*bfs]-(:User) RETURN count(p) AS n",
      s"""WITH RECURSIVE $prelude,
         |und AS (SELECT src, dst FROM fr UNION SELECT dst, src FROM fr),
         |reach(id) AS (
         |  SELECT dst FROM und WHERE src = 1
         |  UNION
         |  SELECT u2.dst FROM und u2 JOIN reach r ON u2.src = r.id)
         |SELECT count(*) AS n FROM (SELECT DISTINCT id FROM reach
         |                           WHERE id != 1)""".stripMargin),

    // reference: u.gender STARTS WITH 'm' — the derived graph's props are
    // integers, so the same string-prefix shape runs over toString(u.id)
    pq(
      "pokec_planopt_starts_with",
      """MATCH (u:User) WHERE toString(u.id) STARTS WITH '1'
        |RETURN count(*) AS n""".stripMargin,
      s"""WITH $prelude SELECT count(*) AS n FROM u
         |WHERE CAST(id AS VARCHAR) LIKE '1%'""".stripMargin),

    pq(
      "pokec_planopt_or_filter",
      """MATCH (u) WHERE (u:User AND u.id = 1) OR (u:User AND u.id = 2)
        |RETURN count(*) AS n""".stripMargin,
      s"WITH $prelude SELECT count(*) AS n FROM u WHERE id IN (1, 2)")
  )
}
