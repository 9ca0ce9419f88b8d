package graft.queries

import org.apache.spark.sql.SparkSession

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Round-3 surface: undirected var-length expansion (scale-shaped, no
  * nested-loop joins), SET += map, relationship MERGE, map projection, BFS
  * path values, WGS84 distance — each as Cypher text with a DuckDB oracle.
  */
object Round3Queries {

  private def g(s: SparkSession, dir: String) = TpchGraphLoader(s, dir)

  private def cq(name: String, cypher: String, oracle: String): QueryDef =
    QueryDef(name, (s, dir) => Cypher.run(s, g(s, dir), cypher), Some(oracle))

  val defs: Seq[QueryDef] = Seq(
    // Undirected ExpandVariable (operator.hpp:1172, Direction::BOTH): the
    // per-hop join runs over a pre-oriented edge frame (single equi-join,
    // never a nested-loop fallback). Oracle enumerates the same undirected
    // walks with edge-uniqueness over the reconstructable KNOWS ring+chord.
    cq(
      "cy_varlen_both",
      """MATCH (a:Customer)-[e:KNOWS*1..2]-(b:Customer)
        |WHERE a.c_custkey = 0
        |RETURN size(e) AS hops, b.c_custkey AS k, count(*) AS n
        |ORDER BY hops, k""".stripMargin,
      """WITH e AS (
        |    SELECT 'r' || c_custkey AS eid, c_custkey AS src,
        |           (c_custkey + 1) % (SELECT max(c_custkey)+1 FROM customer) AS dst
        |    FROM customer
        |    UNION ALL
        |    SELECT 'c' || c_custkey, c_custkey,
        |           (c_custkey + 7) % (SELECT max(c_custkey)+1 FROM customer)
        |    FROM customer),
        |  u AS (
        |    SELECT eid, src, dst FROM e
        |    UNION ALL
        |    SELECT eid, dst, src FROM e WHERE src <> dst),
        |  w1 AS (SELECT eid, dst AS node FROM u WHERE src = 0),
        |  w2 AS (
        |    SELECT u2.dst AS node FROM w1
        |    JOIN u u2 ON u2.src = w1.node AND u2.eid <> w1.eid)
        |SELECT hops, k, count(*) AS n FROM (
        |  SELECT CAST(1 AS BIGINT) AS hops, node AS k FROM w1
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), node FROM w2)
        |GROUP BY hops, k ORDER BY hops, k""".stripMargin),

    // SetProperties UPDATE (operator.hpp:1539 Op::UPDATE): SET n += {map} —
    // upserts listed keys, NULL value removes the key, others untouched.
    QueryDef(
      "cy_set_props_update",
      (s, dir) => {
        val r = Cypher.execute(
          s,
          g(s, dir),
          """MATCH (c:Customer) WHERE c.c_custkey < 100
            |SET c += {score: c.c_acctbal * 2, c_mktsegment: NULL}""".stripMargin)
        Cypher.run(
          s,
          r.graph,
          """MATCH (c:Customer)
            |RETURN count(c.score) AS n_scored,
            |       round(sum(c.score), 2) AS s,
            |       count(c.c_mktsegment) AS n_seg""".stripMargin)
      },
      Some("""SELECT
             |  (SELECT count(*) FROM customer WHERE c_custkey < 100) AS n_scored,
             |  (SELECT round(CAST(sum(CAST(c_acctbal * 2 AS DECIMAL(38,4)))
             |                     AS DOUBLE), 2)
             |   FROM customer WHERE c_custkey < 100) AS s,
             |  (SELECT count(*) FROM customer WHERE c_custkey >= 100)
             |    AS n_seg""".stripMargin)),

    // SetProperties REPLACE (operator.hpp:1539 Op::REPLACE): SET n = {map} —
    // every pre-existing property not in the map is removed.
    QueryDef(
      "cy_set_props_replace",
      (s, dir) => {
        val r = Cypher.execute(
          s,
          g(s, dir),
          """MATCH (r:Region)
            |SET r = {r_name: r.r_name, tier: r.r_regionkey + 1}""".stripMargin)
        Cypher.run(
          s,
          r.graph,
          """MATCH (r:Region)
            |RETURN r.r_name AS name, r.tier AS tier, r.r_comment AS comment
            |ORDER BY name""".stripMargin)
      },
      Some("""SELECT r_name AS name, r_regionkey + 1 AS tier,
             |  CAST(NULL AS VARCHAR) AS comment
             |FROM region ORDER BY name""".stripMargin)),

    // Relationship MERGE (operator.hpp:2579 over a one-hop pattern): first
    // pass creates every (a,b) FOLLOWS edge once; second pass matches all of
    // them (creates nothing — idempotent) and fires ON MATCH SET.
    QueryDef(
      "cy_merge_edge",
      (s, dir) => {
        val merge =
          """MATCH (a:Customer)-[:KNOWS]->(b:Customer) WHERE a.c_custkey < 50
            |MERGE (a)-[f:FOLLOWS]->(b)
            |ON CREATE SET f.w = 1.0
            |ON MATCH SET f.w = 3.0""".stripMargin
        val g1 = Cypher.execute(s, g(s, dir), merge).graph
        val g2 = Cypher.execute(s, g1, merge).graph
        Cypher.run(
          s,
          g2,
          """MATCH (a:Customer)-[f:FOLLOWS]->(b:Customer)
            |RETURN count(*) AS n, round(sum(f.w), 1) AS w""".stripMargin)
      },
      Some("""SELECT CAST(2 * count(*) AS BIGINT) AS n,
             |  CAST(6 * count(*) AS DOUBLE) AS w
             |FROM customer WHERE c_custkey < 50""".stripMargin)),

    // BFS path values (operator.cpp:2458): nodes(p)/relationships(p) on a
    // shortestPath binding. Representative path is deterministic (lexico-
    // graphically smallest node sequence), so the ring(+1)+chord(+7) KNOWS
    // graph gives closed-form oracles: to 2 = [0,1,2]; to 8 = min([0,1,8],
    // [0,7,8]) = [0,1,8]; to 14 = [0,7,14]. Ids are base+key (nodes,
    // 2·key+slot for edges), recovered mod 2^48.
    cq(
      "cy_bfs_path_nodes",
      """MATCH p = shortestPath((a:Customer)-[:KNOWS*..6]->(b:Customer))
        |WHERE a.c_custkey = 0 AND b.c_custkey IN [2, 8, 14]
        |RETURN b.c_custkey AS k, length(p) AS len,
        |       size(nodes(p)) AS n_nodes,
        |       id(nodes(p)[1]) % 281474976710656 AS second,
        |       id(relationships(p)[0]) % 281474976710656 AS e0
        |ORDER BY k""".stripMargin,
      """SELECT * FROM (VALUES
        |  (CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  (8, 2, 3, 1, 0),
        |  (14, 2, 3, 7, 1)) AS t(k, len, n_nodes, second, e0)
        |ORDER BY k""".stripMargin),

    // USING HOPS LIMIT (ast.hpp:2086): caps total edge traversals of the
    // unbounded fixpoint expansion. Under the cap, results are identical
    // to the uncapped query (partial results would be nondeterministic in
    // a batch engine, so breaching the cap raises — see VarExpand).
    cq(
      "cy_hops_limit",
      """USING HOPS LIMIT 500000
        |MATCH (c:Customer {c_custkey: 1})
        |      -[:PLACED|HAS_LINE|OF_PART|BY_SUPPLIER*]->(x)
        |RETURN count(*) AS n_paths""".stripMargin,
      """SELECT (SELECT count(*) FROM orders WHERE o_custkey = 1)
        |     + 3 * (SELECT count(*) FROM lineitem
        |            JOIN orders ON l_orderkey = o_orderkey
        |            WHERE o_custkey = 1) AS n_paths""".stripMargin),

    // Dynamic (non-literal) function arguments: split delimiter from a
    // column (\Q…\E-quoted regex), round scale from an expression (HALF_UP
    // formula), text.join separator via a stateful left fold.
    cq(
      "cy_fn_dynamic_args",
      """MATCH (n:Nation) WHERE n.n_nationkey < 8
        |RETURN n.n_name AS name,
        |       size(split(n.n_name, substring(n.n_name, 0, 1))) AS parts,
        |       round(n.n_nationkey / 7.0, n.n_nationkey % 3 + 1) AS r,
        |       text.join([n.n_name, 'x'], toString(n.n_nationkey)) AS j
        |ORDER BY name""".stripMargin,
      """SELECT n_name AS name,
        |  len(string_split(n_name, substr(n_name, 1, 1))) AS parts,
        |  sign(n_nationkey / 7.0)
        |    * floor(abs(n_nationkey / 7.0)
        |            * pow(10.0, n_nationkey % 3 + 1) + 0.5)
        |    / pow(10.0, n_nationkey % 3 + 1) AS r,
        |  n_name || CAST(n_nationkey AS VARCHAR) || 'x' AS j
        |FROM nation WHERE n_nationkey < 8 ORDER BY name""".stripMargin),

    // MERGE ON MATCH SET with expressions over the matched entity
    // (operator.hpp:2579 runs the on-match branch with the entity in
    // scope): edge MERGE bumps w from its own value; node MERGE derives a
    // property from the node's own.
    QueryDef(
      "cy_merge_onmatch_expr",
      (s, dir) => {
        val merge =
          """MATCH (a:Customer)-[:KNOWS]->(b:Customer) WHERE a.c_custkey < 30
            |MERGE (a)-[f:FOLLOWS3]->(b)
            |ON CREATE SET f.w = 1.0
            |ON MATCH SET f.w = f.w + 0.5""".stripMargin
        val g1 = Cypher.execute(s, g(s, dir), merge).graph
        val g2 = Cypher.execute(s, g1, merge).graph
        val g3 = Cypher.execute(
          s,
          g2,
          """MERGE (c:Customer {c_custkey: 5})
            |ON MATCH SET c.bonus = c.c_acctbal + 1""".stripMargin).graph
        val edges = Cypher.run(
          s,
          g3,
          """MATCH (:Customer)-[f:FOLLOWS3]->(:Customer)
            |RETURN count(*) AS n, round(sum(f.w), 1) AS w""".stripMargin)
        val node = Cypher.run(
          s,
          g3,
          """MATCH (c:Customer) WHERE c.c_custkey = 5
            |RETURN round(c.bonus - c.c_acctbal, 1) AS d""".stripMargin)
        edges.crossJoin(node)
      },
      Some("""SELECT
             |  2 * (SELECT CAST(count(*) AS BIGINT) FROM customer
             |       WHERE c_custkey < 30) AS n,
             |  1.5 * 2 * (SELECT count(*) FROM customer
             |             WHERE c_custkey < 30) AS w,
             |  1.0 AS d""".stripMargin)),

    // Constraints (src/storage/v2/constraints/): existence + unique +
    // type validation as set-wide aggregates, run after a mutation that
    // deliberately breaks the existence constraint (SET += {k: NULL}
    // removes the key on 10 customers).
    QueryDef(
      "constraint_check",
      (s, dir) => {
        import graft.core.{ExistsC, TypedC, UniqueC, Constraints}
        val g1 = Cypher.execute(
          s,
          g(s, dir),
          """MATCH (c:Customer) WHERE c.c_custkey < 10
            |SET c += {c_mktsegment: NULL}""".stripMargin).graph
        Constraints.validate(
          g1,
          Seq(
            UniqueC("Customer", Seq("c_custkey")),
            UniqueC("Supplier", Seq("s_nationkey")),
            ExistsC("Customer", "c_mktsegment"),
            TypedC("Customer", "c_acctbal", "double")))
          .orderBy("cname")
      },
      Some("""SELECT * FROM (VALUES
             |  ('exists(Customer.c_mktsegment)', CAST(10 AS BIGINT)),
             |  ('typed(Customer.c_acctbal: double)', 0),
             |  ('unique(Customer.c_custkey)', 0),
             |  ('unique(Supplier.s_nationkey)',
             |   (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM (
             |      SELECT count(*) AS n FROM supplier
             |      GROUP BY s_nationkey HAVING count(*) > 1)))
             |) AS t(cname, n_violations) ORDER BY cname""".stripMargin)),

    // Nested properties (SetNestedProperty operator.hpp:1490,
    // RemoveNestedProperty :1671): a map-valued property gets a key set
    // through a path (intermediate maps created on demand, including the
    // property itself), another key removed; reads go through record
    // field chains. Map literals lower to named structs, so every value
    // keeps its own type (tier/score stay BIGINT).
    QueryDef(
      "cy_set_nested",
      (s, dir) => {
        val g1 = Cypher.execute(
          s,
          g(s, dir),
          "MATCH (r:Region) SET r.meta = {tier: r.r_regionkey + 1, tag: 'seed'}").graph
        val g2 = Cypher.execute(
          s,
          g1,
          """MATCH (r:Region) WHERE r.r_regionkey < 3
            |SET r.meta.score = r.r_regionkey * 10""".stripMargin).graph
        val g3 = Cypher.execute(
          s,
          g2,
          "MATCH (r:Region) WHERE r.r_regionkey = 1 REMOVE r.meta.tag").graph
        val g4 = Cypher.execute(
          s,
          g3,
          """MATCH (r:Region) WHERE r.r_regionkey = 2
            |SET r.deep.a.b = r.r_regionkey * 7""".stripMargin).graph
        Cypher.run(
          s,
          g4,
          """MATCH (r:Region)
            |RETURN r.r_name AS name, r.meta.tier AS tier,
            |       r.meta.score AS score, r.meta.tag AS tag,
            |       r.deep.a.b AS deep
            |ORDER BY name""".stripMargin)
      },
      Some("""SELECT r_name AS name,
             |  CAST(r_regionkey + 1 AS BIGINT) AS tier,
             |  CASE WHEN r_regionkey < 3 THEN CAST(r_regionkey * 10 AS BIGINT)
             |       END AS score,
             |  CASE WHEN r_regionkey = 1 THEN NULL ELSE 'seed' END AS tag,
             |  CASE WHEN r_regionkey = 2 THEN CAST(14 AS BIGINT) END AS deep
             |FROM region ORDER BY name""".stripMargin)),

    // WGS-84 point.distance (point_functions.cpp:54-73 CRS dispatch):
    // longitude/latitude keys imply wgs-84; Lambert's ellipsoidal formula
    // (reduced latitudes + first-order flattening correction — matches
    // the reference's boost geographic strategy to ≪0.1 m at corpus
    // scales), floor-truncated at 0.1 m; the oracle mirrors the formula
    // operation-for-operation (libm agreement ~1e-9 relative — far
    // inside the truncation).
    cq(
      "cy_point_wgs84",
      """MATCH (c:Customer) WHERE c.c_custkey < 12
        |WITH c.c_custkey AS k,
        |     point({longitude: (c.c_custkey * 31) % 360 - 180.0,
        |            latitude: (c.c_custkey * 13) % 170 - 85.0}) AS p
        |RETURN k,
        |       floor(point.distance(p, point({longitude: 10.0, latitude: 20.0}))
        |             * 10) / 10.0 AS d
        |ORDER BY k""".stripMargin,
      """SELECT k, floor(sqrt(dist * dist) * 10) / 10 AS d FROM (
        |  SELECT k,
        |    6378137.0 * (sig - ((1.0/298.257223563)/2) * (
        |      (CASE WHEN cos(sig/2)*cos(sig/2) < 1e-12 THEN 0.0
        |            ELSE (sig - sin(sig)) * sin((b1+b2)/2)*sin((b1+b2)/2)
        |                 * cos((b2-b1)/2)*cos((b2-b1)/2)
        |                 / (cos(sig/2)*cos(sig/2)) END)
        |      + (CASE WHEN sin(sig/2)*sin(sig/2) < 1e-12 THEN 0.0
        |              ELSE (sig + sin(sig)) * cos((b1+b2)/2)*cos((b1+b2)/2)
        |                   * sin((b2-b1)/2)*sin((b2-b1)/2)
        |                   / (sin(sig/2)*sin(sig/2)) END))) AS dist
        |  FROM (
        |    SELECT k, b1, b2,
        |      2 * asin(least(1.0, sqrt(
        |        sin((b2-b1)/2)*sin((b2-b1)/2)
        |        + cos(b1)*cos(b2)
        |          * sin(radians(10.0 - lon)/2)*sin(radians(10.0 - lon)/2))))
        |        AS sig
        |    FROM (
        |      SELECT k,
        |        atan((1 - 1.0/298.257223563) * tan(radians(lat))) AS b1,
        |        atan((1 - 1.0/298.257223563) * tan(radians(20.0))) AS b2,
        |        lon
        |      FROM (
        |        SELECT c_custkey AS k,
        |               (c_custkey * 31) % 360 - 180.0 AS lon,
        |               (c_custkey * 13) % 170 - 85.0 AS lat
        |        FROM customer WHERE c_custkey < 12))))
        |ORDER BY k""".stripMargin),

    // Spatial grid bucketing — the point-index analog's shuffle key
    // (operator.hpp:973 ScanAllByPointDistance): cell id co-locates nearby
    // points so distance predicates join bucket-locally at scale.
    cq(
      "cy_point_bucket",
      """MATCH (c:Customer) WHERE c.c_custkey < 200
        |WITH point({x: c.c_custkey % 97, y: c.c_custkey % 89}) AS p
        |RETURN point.bucket(p, 10.0) AS cell, count(*) AS n
        |ORDER BY cell""".stripMargin,
      """SELECT CAST(CAST(floor((c_custkey % 97) / 10.0) AS BIGINT) AS VARCHAR)
        |    || ',' ||
        |    CAST(CAST(floor((c_custkey % 89) / 10.0) AS BIGINT) AS VARCHAR) AS cell,
        |  count(*) AS n
        |FROM customer WHERE c_custkey < 200
        |GROUP BY cell ORDER BY cell""".stripMargin),

    // text.format (text_module/algorithm/text.cpp:85 fmt::vformat): `{}`
    // auto-indexing and `{i}` positional selection, args stringified.
    cq(
      "fn_text_format",
      """MATCH (n:Nation) WHERE n.n_nationkey < 10
        |RETURN text.format('nation {} has key {1} in region {2}',
        |                   [n.n_name, n.n_nationkey, n.n_regionkey]) AS s
        |ORDER BY s""".stripMargin,
      """SELECT 'nation ' || n_name || ' has key ' || CAST(n_nationkey AS VARCHAR)
        |    || ' in region ' || CAST(n_regionkey AS VARCHAR) AS s
        |FROM nation WHERE n_nationkey < 10 ORDER BY s""".stripMargin),

    // degree/inDegree/outDegree scalar functions
    // (awesome_memgraph_functions.cpp:2063-2065) in both WHERE and RETURN:
    // one aggregate over the edge set per distinct call, equi-joined back.
    // Nation incidence: 1 out (IN_REGION), customers+suppliers in
    // (FROM_NATION).
    cq(
      "cy_degree_fn",
      """MATCH (n:Nation) WHERE degree(n) > 0
        |RETURN n.n_name AS name, degree(n) AS d,
        |       inDegree(n) AS din, outDegree(n) AS dout
        |ORDER BY name""".stripMargin,
      """SELECT n_name AS name,
        |  (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) +
        |  (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey) + 1
        |    AS d,
        |  (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) +
        |  (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey)
        |    AS din,
        |  CAST(1 AS BIGINT) AS dout
        |FROM nation ORDER BY name""".stripMargin),

    // Durations (utils/temporal.cpp): map + ISO-8601 constructors,
    // datetime + duration arithmetic, component access (.hour = broken-
    // down part), duration.between, toInteger(duration) = total seconds.
    cq(
      "cy_duration",
      """MATCH (o:Order) WHERE o.o_orderkey < 40
        |WITH o.o_orderkey AS k, o.o_orderdate AS d
        |RETURN k,
        |       d + duration({day: k % 5, hour: 12}) AS shifted,
        |       duration('P3DT4H5M6S').hour AS ph,
        |       toInteger(duration.between(d, datetime('1998-09-02'))) AS secs
        |ORDER BY k""".stripMargin,
      """SELECT o_orderkey AS k,
        |  o_orderdate + to_seconds((o_orderkey % 5) * 86400 + 43200) AS shifted,
        |  CAST(4 AS BIGINT) AS ph,
        |  CAST(date_diff('second', o_orderdate, TIMESTAMP '1998-09-02')
        |       AS BIGINT) AS secs
        |FROM orders WHERE o_orderkey < 40 ORDER BY k""".stripMargin),

    // Map projection (ast.hpp map-projection nodes): `.k` selectors, a
    // computed key, and `.*` splice, consumed through a WITH pipeline.
    cq(
      "cy_map_projection",
      """MATCH (n:Nation)
        |WITH n {.n_name, dbl: n.n_nationkey * 2} AS m,
        |     n {.*} AS allp
        |RETURN m.n_name AS name, m.dbl AS dbl,
        |       allp.n_regionkey AS rk
        |ORDER BY name""".stripMargin,
      """SELECT n_name AS name, n_nationkey * 2 AS dbl, n_regionkey AS rk
        |FROM nation ORDER BY name""".stripMargin)
  )
}
