package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cypher.Cypher
import graft.sources.{FileLoaders, TpchGraphLoader}

/** CALL-procedure algorithms (pagerank / WCC / degree via the Cypher
  * `CALL … YIELD` surface), LOAD CSV/JSONL roundtrips, COLLECT_MAP, and
  * unbounded variable-length expansion — each with a DuckDB oracle.
  * Iterative-algorithm oracles are generated chained-CTE dynamic programs
  * (same technique as [[ShortestPathQueries]]).
  */
object ProcedureQueries {

  private def g(s: SparkSession, dir: String) = TpchGraphLoader(s, dir)

  private def cq(name: String, cypher: String, oracle: String): QueryDef =
    QueryDef(name, (s, dir) => Cypher.run(s, g(s, dir), cypher), Some(oracle))

  private val CustBase = TpchGraphLoader.nodeId("Customer", 0L)

  /** Reconstructed KNOWS edges with weights, filtered at `minW`. */
  private def knowsEdges(minW: Int): String =
    s"""nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n,
       |                           max(c_custkey) + 1 AS m FROM customer),
       |e AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT c_custkey AS src, (c_custkey + 1) % (SELECT m FROM nn) AS dst,
       |           (c_custkey * 7 + 1) % 10 + 1 AS w FROM customer
       |    UNION ALL
       |    SELECT c_custkey, (c_custkey + 7) % (SELECT m FROM nn),
       |           (c_custkey * 7 + 7) % 10 + 1 FROM customer)
       |  WHERE w >= $minW)""".stripMargin

  /** PageRank DP: simple variant, mirrors Procedures.pagerank exactly
    * (including the (1-0.85) float expression). */
  private def pagerankOracle(iters: Int): String = {
    val levels = (1 to iters).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT a.node,
         |    (1 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(sum(t.c), 0) AS rank
         |  FROM allp a LEFT JOIN (
         |    SELECT e.dst, p.rank / od.deg AS c
         |    FROM e JOIN p${i - 1} p ON p.node = e.src
         |           JOIN od ON od.src = e.src) t
         |  ON t.dst = a.node
         |  GROUP BY a.node)""".stripMargin
    }
    s"""WITH ${knowsEdges(6)},
       |od AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS deg
       |                    FROM e GROUP BY src),
       |allp AS MATERIALIZED (SELECT c_custkey AS node FROM customer),
       |p0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM allp),
       |${levels.mkString(",\n")}
       |SELECT node AS k, round(rank, 6) AS pr FROM p$iters
       |WHERE node < 50 ORDER BY k""".stripMargin
  }

  /** WCC DP: undirected min-label propagation, enough rounds to pass the
    * largest component diameter (engine iterates to convergence; both reach
    * the same fixpoint). */
  private def wccOracle(rounds: Int): String = {
    val levels = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT node, min(comp) AS comp FROM (
         |    SELECT node, comp FROM c${i - 1}
         |    UNION ALL
         |    SELECT u.dst AS node, p.comp FROM c${i - 1} p
         |    JOIN und u ON u.src = p.node)
         |  GROUP BY node)""".stripMargin
    }
    s"""WITH ${knowsEdges(8)},
       |und AS MATERIALIZED (
       |  SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |c0 AS MATERIALIZED (
       |  SELECT c_custkey AS node, c_custkey AS comp FROM customer),
       |${levels.mkString(",\n")},
       |sizes AS (SELECT comp, count(*) AS sz FROM c$rounds GROUP BY comp)
       |SELECT count(*) AS n_comp, CAST(sum(sz) AS BIGINT) AS n_nodes,
       |       max(sz) AS max_size,
       |       count(CASE WHEN sz = 1 THEN 1 END) AS n_singletons
       |FROM sizes""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    // CALL + MAGE pagerank (operator.hpp:2891; src/mage/cpp/pagerank_module)
    // on the weight-filtered KNOWS subgraph (irregular degrees).
    cq(
      "call_pagerank",
      s"""CALL algo.pagerank({label: 'Customer', type: 'KNOWS', iterations: 15,
         |                   damping: 0.85, weightProp: 'k_weight', minWeight: 6.0})
         |YIELD node, rank
         |WITH node - $CustBase AS k, rank WHERE k < 50
         |RETURN k, round(rank, 6) AS pr ORDER BY k""".stripMargin,
      pagerankOracle(15)),

    // CALL + connected components (src/mage/cpp/connected_components) on a
    // sparser KNOWS subgraph (threshold 8 → multiple components).
    cq(
      "call_wcc",
      """CALL algo.wcc({label: 'Customer', type: 'KNOWS',
        |               weightProp: 'k_weight', minWeight: 8.0})
        |YIELD node, comp
        |WITH comp, count(*) AS sz
        |RETURN count(*) AS n_comp, sum(sz) AS n_nodes, max(sz) AS max_size,
        |       count(CASE WHEN sz = 1 THEN 1 END) AS n_singletons""".stripMargin,
      wccOracle(30)),

    // CALL + degree (awesome_memgraph_functions.cpp:2063-2065 degree
    // scalars, as a table-valued procedure).
    cq(
      "call_degree",
      s"""CALL algo.degree({label: 'Customer', type: 'PLACED'})
         |YIELD node, out_deg, in_deg
         |WITH node - $CustBase AS k, out_deg, in_deg WHERE k < 100
         |RETURN k, out_deg, in_deg ORDER BY k""".stripMargin,
      """SELECT c_custkey AS k, count(o_orderkey) AS out_deg,
        |  CAST(0 AS BIGINT) AS in_deg
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |WHERE c_custkey < 100 GROUP BY c_custkey ORDER BY k""".stripMargin),

    // COLLECT_MAP (aggregation.hpp:27): collect(k, v) → map; checked via
    // size + element lookup (portable scalars, no cross-engine map codec).
    cq(
      "cy_collect_map",
      """MATCH (r:Region)<-[:IN_REGION]-(n:Nation)
        |WITH r, collect(n.n_name, n.n_nationkey) AS m
        |RETURN r.r_name AS r_name, size(m) AS n_keys,
        |       m['ALGERIA'] AS algeria
        |ORDER BY r_name""".stripMargin,
      """SELECT r_name, count(DISTINCT n_name) AS n_keys,
        |  max(CASE WHEN n_name = 'ALGERIA' THEN n_nationkey END) AS algeria
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin),

    // Unbounded variable-length expansion over the order DAG — fixpoint
    // iteration, no silent hop cap (ExpandVariable, operator.hpp:1172).
    cq(
      "varexpand_unbounded",
      """MATCH (c:Customer {c_custkey: 1})
        |      -[:PLACED|HAS_LINE|OF_PART|BY_SUPPLIER*]->(x)
        |RETURN count(*) AS n_paths""".stripMargin,
      """SELECT (SELECT count(*) FROM orders WHERE o_custkey = 1)
        |     + 3 * (SELECT count(*) FROM lineitem
        |            JOIN orders ON l_orderkey = o_orderkey
        |            WHERE o_custkey = 1) AS n_paths""".stripMargin),

    // LOAD CSV roundtrip (operator.hpp:2935): export → loadCsv → aggregate.
    QueryDef(
      "load_csv_roundtrip",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
        val out = s"/root/repo/target/roundtrip/csv_$tag"
        TpchGraphLoader.table(s, dir, "region")
          .coalesce(1)
          .write.mode("overwrite").option("header", "true").csv(out)
        FileLoaders.loadCsv(s, out, TpchGraphLoader.schemas("region"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("r_regionkey")).cast("long").as("key_sum"),
            array_join(sort_array(collect_list(col("r_name"))), ",").as("names"))
      },
      Some("""SELECT count(*) AS n, CAST(sum(r_regionkey) AS BIGINT) AS key_sum,
             |  array_to_string(list_sort(list(r_name)), ',') AS names
             |FROM region""".stripMargin)),

    // LOAD JSONL roundtrip (operator.hpp:3000).
    QueryDef(
      "load_jsonl_roundtrip",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
        val out = s"/root/repo/target/roundtrip/jsonl_$tag"
        TpchGraphLoader.table(s, dir, "nation")
          .coalesce(1)
          .write.mode("overwrite").json(out)
        FileLoaders.loadJsonl(s, out, TpchGraphLoader.schemas("nation"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("n_nationkey")).cast("long").as("key_sum"),
            array_join(sort_array(collect_list(col("n_name"))), ",").as("names"))
      },
      Some("""SELECT count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
             |  array_to_string(list_sort(list(n_name)), ',') AS names
             |FROM nation""".stripMargin))
  )
}
