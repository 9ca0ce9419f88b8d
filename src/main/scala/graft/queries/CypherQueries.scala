package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Oracle-checked catalog entries whose engine side enters as **Cypher
  * text** through the full frontend (parser → AST → planner → Catalyst) —
  * the same conformance shape as the reference's gql_behave suite
  * (`tests/gql_behave/tests/memgraph_V1/features/` feature files): Cypher in,
  * result table out, checked against an independent engine (ours: DuckDB on
  * the raw tables; the reference's: Neo4j via `tests/mgbench/validation.py`).
  *
  * Aggregation discipline: sums/avgs over DOUBLE columns accumulate in
  * DECIMAL(38,4) inside the engine (see [[graft.cypher.Functions]]), so the
  * oracle SQL uses the identical cast chain — results are then bit-stable
  * across partitionings on both engines.
  */
object CypherQueries {

  private def g(s: SparkSession, dir: String) = TpchGraphLoader(s, dir)

  private def cq(
      name: String,
      cypher: String,
      oracle: String,
      params: Map[String, Any] = Map.empty): QueryDef =
    QueryDef(name, (s, dir) => Cypher.run(s, g(s, dir), cypher, params), Some(oracle))

  /** DuckDB-side mirror of the engine's decimal-sum discipline. */
  private def oSum(x: String) = s"CAST(sum(CAST($x AS DECIMAL(38,4))) AS DOUBLE)"
  private def oAvg(x: String) = s"CAST(sum(CAST($x AS DECIMAL(38,4))) AS DOUBLE) / count($x)"

  val defs: Seq[QueryDef] = Seq(
    // ScanAllByLabel + Aggregate w/o keys (operator.hpp:607, 1910).
    cq(
      "cy_scan_count",
      "MATCH (c:Customer) RETURN count(*) AS n",
      "SELECT count(*) AS n FROM customer"),

    // ScanAllByLabelProperties: label + property predicates (operator.hpp:888).
    cq(
      "cy_scan_props",
      """MATCH (c:Customer)
        |WHERE c.c_acctbal > 5000 AND c.c_mktsegment = 'BUILDING'
        |RETURN c.c_custkey AS k, c.c_name AS name, c.c_acctbal AS bal
        |ORDER BY k""".stripMargin,
      """SELECT c_custkey AS k, c_name AS name, c_acctbal AS bal FROM customer
        |WHERE c_acctbal > 5000 AND c_mktsegment = 'BUILDING' ORDER BY k""".stripMargin),

    // ScanAllById (operator.hpp:923): point lookup through id().
    cq(
      "cy_scan_by_id",
      s"""MATCH (c:Customer) WHERE id(c) = ${TpchGraphLoader.nodeId("Customer", 42L)}
         |RETURN c.c_custkey AS k, c.c_name AS name""".stripMargin,
      "SELECT c_custkey AS k, c_name AS name FROM customer WHERE c_custkey = 42"),

    // Expand one hop (operator.hpp:1063) + grouped aggregate.
    cq(
      "cy_expand_one_hop",
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |RETURN n.n_name AS n_name, count(*) AS n_cust,
        |       round(sum(c.c_acctbal), 2) AS total_bal
        |ORDER BY n_name""".stripMargin,
      s"""SELECT n_name, count(*) AS n_cust,
         |  round(${oSum("c_acctbal")}, 2) AS total_bal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // Two-hop chain Customer→Nation→Region.
    cq(
      "cy_expand_two_hop",
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)-[:IN_REGION]->(r:Region)
        |RETURN r.r_name AS r_name, count(*) AS n_cust
        |ORDER BY r_name""".stripMargin,
      """SELECT r_name, count(*) AS n_cust FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin),

    // Reverse expand (EdgeAtom::Direction::IN).
    cq(
      "cy_expand_reverse",
      """MATCH (n:Nation)<-[:FROM_NATION]-(s:Supplier)
        |RETURN n.n_name AS n_name, count(*) AS n_supp ORDER BY n_name""".stripMargin,
      """SELECT n_name, count(*) AS n_supp
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // Expand to existing node (operator.hpp:1063 `existing_node_`): the
    // customer's nation must equal the supplying nation — 5-hop chain plus a
    // second pattern with both endpoints bound.
    cq(
      "cy_expand_existing",
      """MATCH (c:Customer)-[:PLACED]->(o:Order)-[:HAS_LINE]->(l:Lineitem)
        |      -[:BY_SUPPLIER]->(sp:Supplier)-[:FROM_NATION]->(n:Nation),
        |      (c)-[:FROM_NATION]->(n)
        |RETURN n.n_name AS n_name, count(DISTINCT c.c_custkey) AS n_local_cust
        |ORDER BY n_name""".stripMargin,
      """SELECT n_name, count(DISTINCT c_custkey) AS n_local_cust
        |FROM customer
        |JOIN orders   ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation   ON n_nationkey = s_nationkey
        |WHERE c_nationkey = s_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // Filter + Produce expression coverage (operator.hpp:1289, 1347).
    cq(
      "cy_filter_exprs",
      """MATCH (p:Part) WHERE p.p_size >= 40 AND NOT p.p_brand = 'Brand#33'
        |RETURN p.p_partkey AS k, toUpper(p.p_name) AS uname,
        |       substring(p.p_name, 0, 8) AS prefix,
        |       size(p.p_name) AS name_len,
        |       round(p.p_retailprice * 1.1, 2) AS marked_up
        |ORDER BY k""".stripMargin,
      """SELECT p_partkey AS k, upper(p_name) AS uname,
        |  substr(p_name, 1, 8) AS prefix, length(p_name) AS name_len,
        |  round(p_retailprice * 1.1, 2) AS marked_up
        |FROM part WHERE p_size >= 40 AND NOT (p_brand = 'Brand#33')
        |ORDER BY k""".stripMargin),

    // Aggregate: all core ops + per-element DISTINCT (aggregation.hpp:27).
    cq(
      "cy_agg_ops",
      """MATCH (l:Lineitem)
        |RETURN l.l_returnflag AS f, count(*) AS n_rows,
        |       count(DISTINCT l.l_suppkey) AS n_supp,
        |       min(l.l_quantity) AS min_q, max(l.l_quantity) AS max_q,
        |       round(sum(l.l_extendedprice), 2) AS sum_price,
        |       round(avg(l.l_discount), 4) AS avg_disc
        |ORDER BY f""".stripMargin,
      s"""SELECT l_returnflag AS f, count(*) AS n_rows,
         |  count(DISTINCT l_suppkey) AS n_supp,
         |  min(l_quantity) AS min_q, max(l_quantity) AS max_q,
         |  round(${oSum("l_extendedprice")}, 2) AS sum_price,
         |  round(${oAvg("l_discount")}, 4) AS avg_disc
         |FROM lineitem GROUP BY f ORDER BY f""".stripMargin),

    // TPC-H Q1 shape through the frontend (Filter+Aggregate+OrderBy).
    cq(
      "cy_agg_pricing",
      """MATCH (l:Lineitem) WHERE l.l_shipdate <= datetime('1998-09-02')
        |RETURN l.l_returnflag AS rf, l.l_linestatus AS ls,
        |       round(sum(l.l_quantity), 2) AS sum_qty,
        |       round(sum(l.l_extendedprice), 2) AS sum_base,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS sum_disc,
        |       round(avg(l.l_quantity), 2) AS avg_qty,
        |       count(*) AS n
        |ORDER BY rf, ls""".stripMargin,
      s"""SELECT l_returnflag AS rf, l_linestatus AS ls,
         |  round(${oSum("l_quantity")}, 2) AS sum_qty,
         |  round(${oSum("l_extendedprice")}, 2) AS sum_base,
         |  round(${oSum("l_extendedprice * (1 - l_discount)")}, 2) AS sum_disc,
         |  round(${oAvg("l_quantity")}, 2) AS avg_qty,
         |  count(*) AS n
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY rf, ls ORDER BY rf, ls""".stripMargin),

    // COLLECT (aggregation.hpp:27) made deterministic via module helpers
    // (MAGE collections.sort / text.join, src/mage/).
    cq(
      "cy_collect_sorted",
      """MATCH (n:Nation)<-[:FROM_NATION]-(s:Supplier)
        |WITH n, collect(s.s_name) AS xs
        |RETURN n.n_name AS n_name, text.join(collections.sort(xs), ',') AS suppliers
        |ORDER BY n_name""".stripMargin,
      """SELECT n_name, array_to_string(list_sort(list(s_name)), ',') AS suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // OrderBy + Skip + Limit (operator.hpp:2534, 2382, 2480).
    cq(
      "cy_orderby_skip_limit",
      """MATCH (o:Order)
        |RETURN o.o_orderkey AS k, o.o_totalprice AS price
        |ORDER BY price DESC, k ASC SKIP 5 LIMIT 10""".stripMargin,
      """SELECT o_orderkey AS k, o_totalprice AS price FROM orders
        |ORDER BY price DESC, k ASC LIMIT 10 OFFSET 5""".stripMargin),

    // Distinct (operator.hpp:2719).
    cq(
      "cy_distinct",
      "MATCH (c:Customer) RETURN DISTINCT c.c_mktsegment AS seg ORDER BY seg",
      "SELECT DISTINCT c_mktsegment AS seg FROM customer ORDER BY seg"),

    // Union distinct (operator.hpp:2751 + Distinct on top). Row order is
    // irrelevant to the gate (it sorts), so no ORDER BY after UNION needed.
    cq(
      "cy_union",
      """MATCH (n:Nation) RETURN substring(n.n_name, 0, 1) AS initial
        |UNION
        |MATCH (r:Region) RETURN substring(r.r_name, 0, 1) AS initial""".stripMargin,
      """SELECT substr(n_name, 1, 1) AS initial FROM nation
        |UNION SELECT substr(r_name, 1, 1) FROM region""".stripMargin),

    // Unwind (operator.hpp:2687) over a computed list.
    cq(
      "cy_unwind",
      """MATCH (p:Part) UNWIND split(p.p_name, ' ') AS word
        |RETURN word, count(*) AS cnt ORDER BY word""".stripMargin,
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        |GROUP BY word ORDER BY word""".stripMargin),

    // Optional (operator.hpp:2636): zero-order customers kept, count(o)=0.
    cq(
      "cy_optional",
      """MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order)
        |RETURN c.c_custkey AS k, count(o) AS n_orders ORDER BY k""".stripMargin,
      """SELECT c_custkey AS k, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY k ORDER BY k""".stripMargin),

    // Pattern predicate with node-property constraint → semi join
    // (EvaluatePatternFilter, operator.hpp:2427).
    cq(
      "cy_exists",
      """MATCH (c:Customer) WHERE (c)-[:PLACED]->(:Order {o_orderpriority: '1-URGENT'})
        |RETURN c.c_custkey AS k ORDER BY k""".stripMargin,
      """SELECT c_custkey AS k FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY k""".stripMargin),

    // Negated pattern predicate → anti join.
    cq(
      "cy_not_exists",
      """MATCH (c:Customer) WHERE NOT (c)-[:PLACED]->(:Order {o_orderpriority: '1-URGENT'})
        |RETURN c.c_custkey AS k ORDER BY k""".stripMargin,
      """SELECT c_custkey AS k FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY k""".stripMargin),

    // ExpandVariable DFS *2..3 (operator.hpp:1172) over the reconstructable
    // KNOWS ring+chord; DuckDB oracle enumerates the same walks recursively
    // (no cycles within 3 hops at these sizes, so edge-uniqueness is moot).
    cq(
      "cy_varlen",
      """MATCH (a:Customer)-[e:KNOWS*2..3]->(b:Customer)
        |WHERE a.c_custkey = 0
        |RETURN b.c_custkey AS k, size(e) AS hops ORDER BY hops, k""".stripMargin,
      """WITH RECURSIVE e AS (
        |    SELECT c_custkey AS src,
        |           (c_custkey + 1) % (SELECT max(c_custkey)+1 FROM customer) AS dst
        |    FROM customer
        |    UNION ALL
        |    SELECT c_custkey,
        |           (c_custkey + 7) % (SELECT max(c_custkey)+1 FROM customer)
        |    FROM customer),
        |  walk(node, hops) AS (
        |    SELECT dst, 1 FROM e WHERE src = 0
        |    UNION ALL
        |    SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
        |    WHERE w.hops < 3)
        |SELECT node AS k, CAST(hops AS BIGINT) AS hops FROM walk
        |WHERE hops >= 2 ORDER BY hops, k""".stripMargin),

    // WITH pipeline + HAVING-style WHERE on an aggregate.
    cq(
      "cy_with_having",
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WITH c, count(o) AS n_orders WHERE n_orders > 5
        |RETURN c.c_custkey AS k, n_orders ORDER BY k""".stripMargin,
      """SELECT c_custkey AS k, count(*) AS n_orders
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |GROUP BY k HAVING count(*) > 5 ORDER BY k""".stripMargin),

    // CASE (IfOperator) inside an aggregate.
    cq(
      "cy_case",
      """MATCH (c:Customer)
        |RETURN c.c_mktsegment AS seg,
        |       count(CASE WHEN c.c_acctbal > 0 THEN 1 END) AS pos,
        |       count(*) AS total
        |ORDER BY seg""".stripMargin,
      """SELECT c_mktsegment AS seg,
        |  count(CASE WHEN c_acctbal > 0 THEN 1 END) AS pos, count(*) AS total
        |FROM customer GROUP BY seg ORDER BY seg""".stripMargin),

    // List expression machinery: reduce, comprehension, quantifier
    // (eval.hpp:279 list ops) — closed-form oracle.
    cq(
      "cy_list_exprs",
      """RETURN reduce(acc = 0, x IN range(1, 100) | acc + x) AS total,
        |       size([y IN range(1, 50) WHERE y % 3 = 0]) AS triples,
        |       single(x IN [1,2,3] WHERE x = 2) AS one""".stripMargin,
      "SELECT CAST(5050 AS BIGINT) AS total, CAST(16 AS BIGINT) AS triples, true AS one"),

    // Parameters (the reference strips literals to params for plan caching).
    cq(
      "cy_params",
      """MATCH (c:Customer) WHERE c.c_mktsegment = $seg AND c.c_acctbal > $minbal
        |RETURN count(*) AS n""".stripMargin,
      """SELECT count(*) AS n FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000""".stripMargin,
      params = Map("seg" -> "BUILDING", "minbal" -> 1000L)),

    // Temporal component access (PropertyLookup on temporals).
    cq(
      "cy_temporal",
      """MATCH (o:Order)
        |RETURN o.o_orderdate.year AS y, o.o_orderdate.month AS m, count(*) AS n
        |ORDER BY y, m""".stripMargin,
      """SELECT EXTRACT(year FROM o_orderdate) AS y,
        |  EXTRACT(month FROM o_orderdate) AS m, count(*) AS n
        |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin),

    // Scalar function coverage (awesome_memgraph_functions.cpp:2102-2143).
    cq(
      "cy_fn_scalar",
      """MATCH (s:Supplier)
        |RETURN s.s_suppkey AS k, abs(s.s_acctbal) AS abs_bal,
        |       round(sqrt(abs(s.s_acctbal)), 4) AS sqrt_bal,
        |       toLower(s.s_name) AS lname, reverse(s.s_name) AS rname,
        |       toString(s.s_suppkey) + '#' + s.s_name AS tagged
        |ORDER BY k""".stripMargin,
      """SELECT s_suppkey AS k, abs(s_acctbal) AS abs_bal,
        |  round(sqrt(abs(s_acctbal)), 4) AS sqrt_bal,
        |  lower(s_name) AS lname, reverse(s_name) AS rname,
        |  CAST(s_suppkey AS VARCHAR) || '#' || s_name AS tagged
        |FROM supplier ORDER BY k""".stripMargin),

    // Edge property access + aggregate over reconstructable KNOWS weights.
    cq(
      "cy_edge_props",
      """MATCH (a:Customer)-[k:KNOWS]->(b:Customer) WHERE a.c_custkey < 100
        |RETURN a.c_custkey AS k, round(sum(k.k_weight), 1) AS w, count(*) AS deg
        |ORDER BY k""".stripMargin,
      s"""SELECT k, round(${oSum("w")}, 1) AS w, count(*) AS deg FROM (
         |  SELECT c_custkey AS k,
         |    CAST((c_custkey * 7 + 1) % 10 + 1 AS DOUBLE) AS w
         |  FROM customer WHERE c_custkey < 100
         |  UNION ALL
         |  SELECT c_custkey, CAST((c_custkey * 7 + 7) % 10 + 1 AS DOUBLE)
         |  FROM customer WHERE c_custkey < 100)
         |GROUP BY k ORDER BY k""".stripMargin),

    // Cartesian (operator.hpp:2797).
    cq(
      "cy_cartesian",
      """MATCH (r:Region), (n:Nation)
        |RETURN r.r_name AS r_name, n.n_name AS n_name
        |ORDER BY r_name, n_name""".stripMargin,
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin),

    // Exact percentiles (Neo4j-compat aggregates; quantile semantics match
    // DuckDB quantile_cont/quantile_disc).
    cq(
      "cy_percentiles",
      """MATCH (c:Customer)
        |RETURN round(percentileCont(c.c_acctbal, 0.5), 4) AS median,
        |       percentileDisc(c.c_acctbal, 0.9) AS p90,
        |       round(stDev(c.c_acctbal), 4) AS sd""".stripMargin,
      """SELECT round(quantile_cont(c_acctbal, 0.5), 4) AS median,
        |  quantile_disc(c_acctbal, 0.9) AS p90,
        |  round(stddev_samp(c_acctbal), 4) AS sd
        |FROM customer""".stripMargin)
  )
}
