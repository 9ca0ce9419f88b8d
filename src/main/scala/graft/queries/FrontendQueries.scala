package graft.queries

import org.apache.spark.sql.SparkSession

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Frontend-surface coverage: pattern comprehension (RollUpApply), CALL { }
  * subqueries (Apply), named paths (ConstructNamedPath), spatial point
  * functions, and the edge property/id scan access paths — each as Cypher
  * text with a DuckDB oracle.
  */
object FrontendQueries {

  private def g(s: SparkSession, dir: String) = TpchGraphLoader(s, dir)

  private def cq(name: String, cypher: String, oracle: String): QueryDef =
    QueryDef(name, (s, dir) => Cypher.run(s, g(s, dir), cypher), Some(oracle))

  /** KNOWS edge id for customer c, slot 0 = the +1 ring edge. */
  private val knowsEdgeId5 = (107L << 48) + 10L // c=5, slot 0

  val defs: Seq[QueryDef] = Seq(
    // RollUpApply (operator.hpp:3185): list-per-row from a sub-pattern,
    // consumed by size() and reduce().
    cq(
      "cy_pattern_comprehension",
      """MATCH (n:Nation)
        |RETURN n.n_name AS nation,
        |  size([(n)<-[:FROM_NATION]-(c:Customer) | c.c_custkey]) AS n_cust,
        |  reduce(acc = 0,
        |         k IN [(n)<-[:FROM_NATION]-(s:Supplier) | s.s_suppkey] |
        |         acc + k) AS supp_key_sum
        |ORDER BY nation""".stripMargin,
      """SELECT n_name AS nation,
        |  (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey)
        |    AS n_cust,
        |  (SELECT CAST(coalesce(sum(s_suppkey), 0) AS BIGINT) FROM supplier
        |   WHERE s_nationkey = n_nationkey) AS supp_key_sum
        |FROM nation ORDER BY nation""".stripMargin),

    // Apply (operator.hpp:3061): correlated CALL { WITH r … RETURN aggs }.
    cq(
      "cy_call_subquery",
      """MATCH (r:Region)
        |CALL {
        |  WITH r
        |  MATCH (r)<-[:IN_REGION]-(n:Nation)
        |  RETURN count(*) AS n_nations, min(n.n_name) AS first_nation
        |}
        |RETURN r.r_name AS r_name, n_nations, first_nation
        |ORDER BY r_name""".stripMargin,
      """SELECT r_name, count(*) AS n_nations, min(n_name) AS first_nation
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin),

    // ConstructNamedPath (operator.hpp:1255): p = (…)-[…]->(…) with
    // nodes()/relationships()/length() accessors.
    cq(
      "cy_named_path",
      """MATCH p = (c:Customer)-[:FROM_NATION]->(n:Nation)-[:IN_REGION]->(r:Region)
        |WHERE c.c_custkey < 50
        |RETURN c.c_custkey AS k, length(p) AS len,
        |       size(nodes(p)) AS n_nodes, size(relationships(p)) AS n_edges
        |ORDER BY k""".stripMargin,
      """SELECT c_custkey AS k, CAST(2 AS BIGINT) AS len,
        |  CAST(3 AS BIGINT) AS n_nodes, CAST(2 AS BIGINT) AS n_edges
        |FROM customer WHERE c_custkey < 50 ORDER BY k""".stripMargin),

    // Spatial: point construction, euclidean distance, bbox containment
    // (point/point.distance/point.withinbbox; Point2d src/storage/v2/point.hpp).
    cq(
      "cy_point",
      """MATCH (s:Supplier)
        |WITH s, point({x: s.s_suppkey % 10, y: s.s_acctbal / 1000}) AS p
        |RETURN s.s_suppkey AS k,
        |       floor(point.distance(p, point({x: 0, y: 0})) * 10000) / 10000 AS dist,
        |       point.withinbbox(p, point({x: 0, y: -5}), point({x: 5, y: 5}))
        |         AS inbox
        |ORDER BY k""".stripMargin,
      """SELECT s_suppkey AS k,
        |  floor(sqrt((s_suppkey % 10) * (s_suppkey % 10)
        |           + (s_acctbal / 1000) * (s_acctbal / 1000)) * 10000) / 10000
        |    AS dist,
        |  (s_suppkey % 10 >= 0 AND s_suppkey % 10 <= 5
        |   AND s_acctbal / 1000 >= -5 AND s_acctbal / 1000 <= 5) AS inbox
        |FROM supplier ORDER BY k""".stripMargin),

    // ScanAllByEdgeTypePropertyRange (operator.hpp:745): edge-property
    // range scan over reconstructable KNOWS weights.
    cq(
      "cy_edge_scan_prop",
      """MATCH (a:Customer)-[k:KNOWS]->(b:Customer) WHERE k.k_weight >= 9.0
        |RETURN count(*) AS n, round(sum(k.k_weight), 1) AS w_sum""".stripMargin,
      """SELECT count(*) AS n,
        |  round(CAST(sum(CAST(w AS DECIMAL(38,4))) AS DOUBLE), 1) AS w_sum
        |FROM (
        |  SELECT CAST((c_custkey * 7 + 1) % 10 + 1 AS DOUBLE) AS w FROM customer
        |  UNION ALL
        |  SELECT CAST((c_custkey * 7 + 7) % 10 + 1 AS DOUBLE) FROM customer)
        |WHERE w >= 9""".stripMargin),

    // ScanAllByVertexProperty (operator.hpp:862): global property scan —
    // unlabeled match, property-existence + range predicate over the union
    // of all label frames.
    cq(
      "cy_scan_vertex_prop",
      """MATCH (v) WHERE v.o_totalprice IS NOT NULL AND v.o_totalprice > 300000
        |RETURN count(*) AS n, round(sum(v.o_totalprice), 2) AS total""".stripMargin,
      """SELECT count(*) AS n,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE), 2)
        |    AS total
        |FROM orders WHERE o_totalprice > 300000""".stripMargin),

    // SET on an edge binding (SetProperty on edges, operator.hpp:1448).
    QueryDef(
      "cy_set_edge_prop",
      (s, dir) => {
        val r = Cypher.execute(
          s,
          g(s, dir),
          """MATCH (a:Customer)-[k:KNOWS]->(b:Customer)
            |WHERE a.c_custkey < 200
            |SET k.boosted = k.k_weight * 2""".stripMargin)
        Cypher.run(
          s,
          r.graph,
          """MATCH (a:Customer)-[k:KNOWS]->(b:Customer)
            |WHERE k.boosted IS NOT NULL
            |RETURN count(*) AS n, round(sum(k.boosted), 1) AS total""".stripMargin)
      },
      Some("""SELECT count(*) AS n,
             |  round(CAST(sum(CAST(w * 2 AS DECIMAL(38,4))) AS DOUBLE), 1) AS total
             |FROM (
             |  SELECT CAST((c_custkey * 7 + 1) % 10 + 1 AS DOUBLE) AS w
             |  FROM customer WHERE c_custkey < 200
             |  UNION ALL
             |  SELECT CAST((c_custkey * 7 + 7) % 10 + 1 AS DOUBLE)
             |  FROM customer WHERE c_custkey < 200)""".stripMargin)),

    // ScanAllByEdgeId (operator.hpp:945): point lookup by edge id.
    cq(
      "cy_edge_scan_id",
      s"""MATCH (a:Customer)-[k:KNOWS]->(b:Customer) WHERE id(k) = $knowsEdgeId5
         |RETURN a.c_custkey AS a_key, b.c_custkey AS b_key, k.k_weight AS w""".stripMargin,
      """SELECT CAST(5 AS BIGINT) AS a_key, CAST(6 AS BIGINT) AS b_key,
        |  CAST(7 AS DOUBLE) AS w""".stripMargin),

    // toByteString/fromByteString round-trips (:2148-2149), deterministic
    // uniformSample (Weyl-sequence index stream; reference mt19937 is
    // impure so any fixed stream is conformant), counter (:1249 — row-rank
    // semantics in batch), and the datetime map ctor with a timezone.
    cq(
      "cy_fn_bytes_sample",
      """UNWIND [0, 1, 2] AS i
        |RETURN i,
        |  fromByteString(toByteString('0x0a1B')) AS bs,
        |  fromByteString(toByteString('0xabc'), 3) AS bs_pad,
        |  text.join([x IN uniformSample([10, 20, 30, 40], 3) |
        |             toString(x)], ',') AS samp,
        |  counter('c', 100, 10) AS cnt,
        |  toString(datetime({year: 2024, month: 3, day: 5, hour: 6,
        |                     minute: 7, timezone: 'UTC'})) AS zdt
        |ORDER BY i""".stripMargin,
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), '0x0a1b', '0x000abc', '40,10,20',
        |   CAST(100 AS BIGINT), '2024-03-05 06:07:00'),
        |  (1, '0x0a1b', '0x000abc', '40,10,20', 110,
        |   '2024-03-05 06:07:00'),
        |  (2, '0x0a1b', '0x000abc', '40,10,20', 120,
        |   '2024-03-05 06:07:00')) AS t(i, bs, bs_pad, samp, cnt, zdt)
        |ORDER BY i""".stripMargin),

    // collections_module / map_module helpers (apoc heritage, most-called
    // utility procedures in real Cypher): list folds + record-aware map
    // surgery (Cypher maps are typed records here).
    cq(
      "cy_fn_collections_map",
      """RETURN collections.sum([1, 2, 3]) AS s,
        |       collections.avg([1.0, 2.0, 6.0]) AS av,
        |       collections.contains([1, 2], 2) AS c,
        |       text.join([x IN collections.toSet([3, 1, 2, 1, 3]) |
        |                  toString(x)], ',') AS ts,
        |       collections.min([4, 2, 9]) AS mn,
        |       collections.max([4, 2, 9]) AS mx,
        |       map.fromPairs([['a', '1'], ['b', '2']])['b'] AS fpb,
        |       map.merge({a: 1, b: 2}, {b: 3, c: 4})['b'] AS mmb,
        |       map.merge({a: 1, b: 2}, {b: 3, c: 4})['c'] AS mmc,
        |       map.removeKey({a: 1, b: 2}, 'a')['b'] AS rkb,
        |       size(keys(map.removeKey({a: 1, b: 2}, 'a'))) AS rkn""".stripMargin,
      """SELECT CAST(6.0 AS DOUBLE) AS s, CAST(3.0 AS DOUBLE) AS av,
        |  true AS c, '3,1,2' AS ts,
        |  CAST(2 AS BIGINT) AS mn, CAST(9 AS BIGINT) AS mx,
        |  '2' AS fpb, CAST(3 AS BIGINT) AS mmb, CAST(4 AS BIGINT) AS mmc,
        |  CAST(2 AS BIGINT) AS rkb, CAST(1 AS BIGINT) AS rkn""".stripMargin)
  )
}
