package graft.queries

import org.apache.spark.sql.SparkSession

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Round-11 surface: the MAGE helper-module procedures (`create` /
  * `merge` / `map` / `collections` / `label` modules, reference
  * `src/mage/cpp/…`) — dynamic labels/types/properties from procedure
  * arguments, re-expressed as batch plans through the normal mutation
  * path, plus the value-helper function families as pure Column
  * expressions. Every gate replays in DuckDB closed-form or against the
  * TPC-H tables. */
object Round11Queries {

  private def g(s: SparkSession, dir: String) = TpchGraphLoader(s, dir)

  private def cq(name: String, cypher: String, oracle: String): QueryDef =
    QueryDef(name, (s, dir) => Cypher.run(s, g(s, dir), cypher), Some(oracle))

  val defs: Seq[QueryDef] = Seq(

    // create.node: dynamic labels + props (create_module.cpp:49)
    cq(
      "call_create_node",
      """CALL create.node(['Widget'], {name: 'w', qty: 3}) YIELD node
        |RETURN node.name AS name, node.qty AS qty""".stripMargin,
      "SELECT 'w' AS name, CAST(3 AS BIGINT) AS qty"),

    // create.nodes: one node per props map (create_module.cpp:58)
    cq(
      "call_create_nodes",
      """CALL create.nodes(['Widget'], [{i: 1}, {i: 2}, {i: 3}]) YIELD node
        |RETURN count(*) AS c, sum(node.i) AS s""".stripMargin,
      "SELECT CAST(3 AS BIGINT) AS c, CAST(6 AS BIGINT) AS s"),

    // merge.node MATCH path against real data (merge_module.cpp:20): the
    // FRANCE nation exists, so ON MATCH fires and ident props are read back
    cq(
      "call_merge_node_match",
      """CALL merge.node(['Nation'], {n_name: 'NATION_3'}, {}, {tag: 'seen'})
        |YIELD node RETURN node.n_nationkey AS k, node.tag AS tag""".stripMargin,
      "SELECT n_nationkey AS k, 'seen' AS tag FROM nation WHERE n_name = 'NATION_3'"),

    // merge.node CREATE path: no ATLANTIS nation → ON CREATE fires
    cq(
      "call_merge_node_create",
      """CALL merge.node(['Nation'], {n_name: 'ATLANTIS'},
        |                {n_nationkey: -1}, {n_nationkey: -2})
        |YIELD node RETURN node.n_nationkey AS k""".stripMargin,
      "SELECT CAST(-1 AS BIGINT) AS k"),

    // create.relationship with BOUND endpoints (create_module.cpp:105):
    // synthesized as a Create clause against the matched frame
    cq(
      "call_create_rel",
      """MATCH (a:Nation {n_name: 'NATION_3'})
        |MATCH (b:Nation {n_name: 'NATION_7'})
        |CALL create.relationship(a, 'NEIGHBOR', {since: 1957}, b)
        |YIELD relationship
        |RETURN type(relationship) AS t, relationship.since AS since""".stripMargin,
      "SELECT 'NEIGHBOR' AS t, CAST(1957 AS BIGINT) AS since"),

    // merge.relationship MATCH path (merge_module.cpp:31): every French
    // supplier's existing FROM_NATION edge matches; ON MATCH sets a flag
    cq(
      "call_merge_rel",
      """MATCH (s:Supplier)-[:FROM_NATION]->(n:Nation)
        |WHERE n.n_nationkey < 13
        |CALL merge.relationship(s, 'FROM_NATION', {}, {}, n, {seen: true})
        |YIELD rel
        |RETURN count(*) AS cnt, count(rel.seen) AS seen""".stripMargin,
      """SELECT CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(count(*) AS BIGINT) AS seen
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_nationkey < 13""".stripMargin),

    // map.from_nodes: distributed single-aggregation map yield
    cq(
      "call_map_from_nodes",
      """CALL map.from_nodes('Region', 'r_name') YIELD map
        |RETURN map['AFRICA'].r_regionkey AS k,
        |       map['EUROPE'].r_name AS n""".stripMargin,
      """SELECT (SELECT r_regionkey FROM region WHERE r_name = 'AFRICA') AS k,
        |       'EUROPE' AS n""".stripMargin),

    // collections.* value helpers as vectorized Column expressions
    cq(
      "cy_collections_fns",
      """RETURN collections.sum([1.5, 2.5]) AS s,
        |       collections.sum_longs([1, 2, 3]) AS sl,
        |       collections.avg([2.0, 4.0]) AS av,
        |       collections.contains([1, 2, 3], 2) AS c,
        |       text.join([x IN collections.to_set([1, 2, 2, 3]) |
        |                  toString(x)], ',') AS ts,
        |       text.join([x IN collections.sort([3, 1, 2]) |
        |                  toString(x)], ',') AS so,
        |       text.join([x IN collections.intersection([1, 2, 3],
        |                  [2, 3, 4]) | toString(x)], ',') AS xs,
        |       text.join([x IN collections.flatten([[1, 2], [3]]) |
        |                  toString(x)], ',') AS fl""".stripMargin,
      """SELECT 4.0 AS s, CAST(6 AS BIGINT) AS sl, 3.0 AS av, true AS c,
        |       '1,2,3' AS ts, '1,2,3' AS so, '2,3' AS xs,
        |       '1,2,3' AS fl""".stripMargin),

    // map.* value helpers
    cq(
      "cy_map_fns",
      """RETURN toInteger(map.from_pairs([['a', 1], ['b', 2]])['b']) AS b,
        |       map.merge({a: 1}, {b: 2})['a'] AS a2,
        |       map.get({x: 7}, 'x') AS gx,
        |       map.remove_key({a: 1, b: 2}, 'a')['b'] AS rb,
        |       map.from_lists(['k1', 'k2'], [10, 20])['k2'] AS fl""".stripMargin,
      """SELECT CAST(2 AS BIGINT) AS b, CAST(1 AS BIGINT) AS a2,
        |       CAST(7 AS BIGINT) AS gx, CAST(2 AS BIGINT) AS rb,
        |       CAST(20 AS BIGINT) AS fl""".stripMargin),

    // label.exists over a matched node
    cq(
      "cy_label_exists",
      """MATCH (n:Nation {n_nationkey: 3})
        |RETURN label.exists(n, 'Nation') AS yes,
        |       label.exists(n, 'Region') AS no""".stripMargin,
      "SELECT true AS yes, false AS no"),

    // set_cover.greedy (set_cover.py:46): closed-form instance —
    // set 10 covers {1,2}, 11 {3}, 12 {4}; greedy picks all three
    cq(
      "call_set_cover",
      """CALL set_cover.greedy([1, 2, 3, 4], [10, 10, 11, 12])
        |YIELD containing_set
        |RETURN containing_set ORDER BY containing_set""".stripMargin,
      """SELECT CAST(s AS BIGINT) AS containing_set
        |FROM (VALUES (10), (11), (12)) t(s) ORDER BY s""".stripMargin),

    // kmeans.get_clusters (kmeans.py:45): two well-separated planted
    // clusters; the first two created nodes (lowest ids) seed one center
    // in each, so Lloyd's converges to the planted split
    cq(
      "call_kmeans",
      """CALL create.nodes(['KmPt'], [
        |  {emb: [0.0, 0.0]}, {emb: [10.0, 10.0]}, {emb: [0.1, 0.0]},
        |  {emb: [0.0, 0.1]}, {emb: [10.1, 10.0]}, {emb: [10.0, 10.1]}])
        |YIELD node WITH count(*) AS created
        |CALL kmeans.get_clusters(2, 'emb') YIELD node, cluster_id
        |RETURN cluster_id, count(*) AS n ORDER BY cluster_id""".stripMargin,
      """SELECT CAST(c AS BIGINT) AS cluster_id, CAST(n AS BIGINT) AS n
        |FROM (VALUES (0, 3), (1, 3)) t(c, n) ORDER BY c""".stripMargin),

    // link_prediction.predict (link_prediction.py:327, deterministic
    // common-neighbors variant) over the reconstructable KNOWS+NEAR
    // customer graph; the oracle rebuilds both edge sets in SQL
    cq(
      "call_link_pred",
      {
        val base = graft.sources.TpchGraphLoader.nodeBases("Customer") << 48
        s"""CALL link_prediction.predict(${base}, ${base + 2},
           |  {method: 'common_neighbors', types: ['KNOWS', 'NEAR']})
           |YIELD score RETURN score""".stripMargin
      },
      """WITH n AS (SELECT max(c_custkey) + 1 AS N FROM customer),
        |mx AS (SELECT max(c_custkey) AS M FROM customer),
        |knows AS (
        |  SELECT c_custkey AS s, (c_custkey + 1) % (SELECT N FROM n) AS d
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, (c_custkey + 7) % (SELECT N FROM n) FROM customer),
        |near AS (
        |  SELECT c_custkey AS s, c_custkey + 1 AS d FROM customer
        |  WHERE c_custkey % 4 < 3 AND c_custkey + 1 <= (SELECT M FROM mx)
        |  UNION ALL
        |  SELECT c_custkey, c_custkey + 2 FROM customer
        |  WHERE c_custkey % 4 < 2 AND c_custkey + 2 <= (SELECT M FROM mx)),
        |e AS (SELECT * FROM knows UNION ALL SELECT * FROM near),
        |und AS (SELECT s, d FROM e UNION SELECT d, s FROM e),
        |a AS (SELECT DISTINCT d AS nb FROM und WHERE s = 0),
        |b AS (SELECT DISTINCT d AS nb FROM und WHERE s = 2)
        |SELECT CAST(count(*) AS DOUBLE) AS score FROM a JOIN b USING (nb)""".stripMargin))
}
