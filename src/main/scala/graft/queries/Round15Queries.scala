package graft.queries

import org.apache.spark.sql.SparkSession

import graft.core.GraphState
import graft.cypher.Cypher

/** Round-15 surface: the reference's cpp `algo` module (astar / cover /
  * all_simple_paths, `src/mage/cpp/algo_module/algo_module.cpp:20-47`)
  * and the refactor module's tranche-2 procedures (categorize,
  * clone_subgraph(+_from_paths), delete_and_reconnect,
  * `refactor_module/algorithm/refactor.cpp:263,291,348,648`). */
object Round15Queries {

  private def empty = GraphState(Map.empty, Map.empty)

  /** 4-node weighted routing graph + a blacklisted shortcut node. */
  private def routeGraph(s: SparkSession) =
    Cypher.execute(
      s, empty,
      """CREATE (a:Geo {k: 0, lat: 0.0, lon: 0.0}),
        |       (b:Geo {k: 1, lat: 0.0, lon: 0.01}),
        |       (c:Geo {k: 2, lat: 0.01, lon: 0.0}),
        |       (d:Geo {k: 3, lat: 0.01, lon: 0.01}), (x:Blocked {k: 4}),
        |       (a)-[:RD {distance: 1.0}]->(b),
        |       (b)-[:RD {distance: 1.0}]->(d),
        |       (a)-[:RD {distance: 5.0}]->(d),
        |       (a)-[:RD {distance: 0.2}]->(x),
        |       (x)-[:RD {distance: 0.2}]->(d)""".stripMargin).graph

  /** Diamond + direct edge for the simple-path counts. */
  private def diamondGraph(s: SparkSession) =
    Cypher.execute(
      s, empty,
      """CREATE (a:Sp {k: 0}), (b:Sp {k: 1}), (c:Sp {k: 2}), (d:Sp {k: 3}),
        |       (a)-[:SE]->(b), (b)-[:SE]->(d),
        |       (a)-[:SE]->(c), (c)-[:SE]->(d),
        |       (a)-[:SE]->(d)""".stripMargin).graph

  /** a -F-> b -F-> c plus a back-edge c -F-> a for direction filters. */
  private def dirGraph(s: SparkSession) =
    Cypher.execute(
      s, empty,
      """CREATE (a:Dp {k: 0}), (b:Dp {k: 1}), (c:Dp {k: 2}),
        |       (a)-[:F]->(b), (b)-[:F]->(c), (c)-[:F]->(a)""".stripMargin)
      .graph

  /** 4-node chain with distinct types/props for delete_and_reconnect. */
  private def chainGraph(s: SparkSession) =
    Cypher.execute(
      s, empty,
      """CREATE (a:Dr {k: 0}), (b:Dr {k: 1}), (c:Dr {k: 2}), (d:Dr {k: 3}),
        |       (a)-[:R1 {x: 1}]->(b), (b)-[:R2 {x: 2}]->(c),
        |       (c)-[:R3 {x: 3}]->(d)""".stripMargin).graph

  val defs: Seq[QueryDef] = Seq(

    // algo.astar with epsilon 0 (uniform-cost — optimal regardless of
    // heuristic inputs) and a blacklisted shortcut label: the 0.4-cost
    // route through :Blocked is filtered, the answer is a->b->d at 2.0
    QueryDef(
      "call_algo_astar",
      (s, dir) => {
        val gr = routeGraph(s)
        Cypher.run(
          s, gr,
          """MATCH (a:Geo {k: 0}), (d:Geo {k: 3})
            |CALL algo.astar(a, d, {epsilon: 0.0,
            |                       blacklisted_labels: ['Blocked']})
            |YIELD path, weight
            |RETURN size(path) AS plen, weight""".stripMargin)
      },
      Some("SELECT CAST(3 AS BIGINT) AS plen, 2.0 AS weight")),

    // algo.astar with a custom admissible+consistent per-node heuristic
    // property (heuristic_name) — full A*, same optimum
    QueryDef(
      "call_algo_astar_heur",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (a:Gh {k: 0, h: 2.0}), (b:Gh {k: 1, h: 1.0}),
            |       (c:Gh {k: 2, h: 3.0}), (d:Gh {k: 3, h: 0.0}),
            |       (a)-[:RH {distance: 1.0}]->(b),
            |       (b)-[:RH {distance: 1.0}]->(d),
            |       (a)-[:RH {distance: 5.0}]->(d),
            |       (a)-[:RH {distance: 1.0}]->(c),
            |       (c)-[:RH {distance: 3.0}]->(d)""".stripMargin).graph
        Cypher.run(
          s, gr,
          """MATCH (a:Gh {k: 0}), (d:Gh {k: 3})
            |CALL algo.astar(a, d, {heuristic_name: 'h'})
            |YIELD path, weight
            |RETURN size(path) AS plen, weight""".stripMargin)
      },
      Some("SELECT CAST(3 AS BIGINT) AS plen, 2.0 AS weight")),

    // algo.astar with the default haversine lat/lon heuristic: nodes on
    // a meridian, edge distances chosen above the great-circle lower
    // bound so the heuristic stays admissible and the 224-km two-hop
    // route beats the 500-km direct edge
    QueryDef(
      "call_algo_astar_geo",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (a:Gg {k: 0, lat: 0.0, lon: 0.0}),
            |       (b:Gg {k: 1, lat: 0.0, lon: 1.0}),
            |       (d:Gg {k: 2, lat: 0.0, lon: 2.0}),
            |       (a)-[:RG {distance: 112.0}]->(b),
            |       (b)-[:RG {distance: 112.0}]->(d),
            |       (a)-[:RG {distance: 500.0}]->(d)""".stripMargin).graph
        Cypher.run(
          s, gr,
          """MATCH (a:Gg {k: 0}), (d:Gg {k: 2})
            |CALL algo.astar(a, d, {}) YIELD path, weight
            |RETURN size(path) AS plen, weight""".stripMargin)
      },
      Some("SELECT CAST(3 AS BIGINT) AS plen, 224.0 AS weight")),

    // algo.cover: the induced edge set of [a, b, d] in the routing graph
    // — a->b, b->d and the direct a->d qualify; edges through x do not
    QueryDef(
      "call_algo_cover",
      (s, dir) => {
        val gr = routeGraph(s)
        Cypher.run(
          s, gr,
          """MATCH (a:Geo {k: 0}), (b:Geo {k: 1}), (d:Geo {k: 3})
            |CALL algo.cover([a, b, d]) YIELD rel
            |RETURN count(*) AS n""".stripMargin)
      },
      Some("SELECT CAST(3 AS BIGINT) AS n")),

    // algo.all_simple_paths over the diamond+direct graph: one 1-hop and
    // two 2-hop simple paths from a to d (path yields its node-id list)
    QueryDef(
      "call_algo_simple_paths",
      (s, dir) => {
        val gr = diamondGraph(s)
        Cypher.run(
          s, gr,
          """MATCH (a:Sp {k: 0}), (d:Sp {k: 3})
            |CALL algo.all_simple_paths(a, d, [], 10) YIELD path
            |RETURN size(path) AS len, count(*) AS n
            |ORDER BY len""".stripMargin)
      },
      Some("""SELECT CAST(l AS BIGINT) AS len, CAST(c AS BIGINT) AS n
             |FROM (VALUES (2, 1), (3, 2)) v(l, c) ORDER BY len""".stripMargin)),

    // direction-decorated type filter `F>`: only OUTGOING F edges expand,
    // so the lone a-to-c route is a->b->c (the c->a back-edge is unusable)
    QueryDef(
      "call_algo_paths_out",
      (s, dir) => {
        val gr = dirGraph(s)
        Cypher.run(
          s, gr,
          """MATCH (a:Dp {k: 0}), (c:Dp {k: 2})
            |CALL algo.all_simple_paths(a, c, ['F>'], 10) YIELD path
            |RETURN size(path) AS len, count(*) AS n ORDER BY len""".stripMargin)
      },
      Some("SELECT CAST(3 AS BIGINT) AS len, CAST(1 AS BIGINT) AS n")),

    // undecorated type `F`: any orientation — the back-edge c->a is
    // traversable from a, adding the 1-hop a~c path
    QueryDef(
      "call_algo_paths_any",
      (s, dir) => {
        val gr = dirGraph(s)
        Cypher.run(
          s, gr,
          """MATCH (a:Dp {k: 0}), (c:Dp {k: 2})
            |CALL algo.all_simple_paths(a, c, ['F'], 10) YIELD path
            |RETURN size(path) AS len, count(*) AS n ORDER BY len""".stripMargin)
      },
      Some("""SELECT CAST(l AS BIGINT) AS len, CAST(c AS BIGINT) AS n
             |FROM (VALUES (2, 1), (3, 1)) v(l, c) ORDER BY len""".stripMargin)),

    // refactor.categorize: 'cat' property values become :Cat nodes, the
    // property (and the copied 'note') moves off the products; the copied
    // note on category x is the highest contributing node's ('n3')
    QueryDef(
      "call_refactor_categorize",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (:Prod {k: 1, cat: 'x', note: 'n1'}),
            |       (:Prod {k: 2, cat: 'y'}),
            |       (:Prod {k: 3, cat: 'x', note: 'n3'}),
            |       (:Prod {k: 4})""".stripMargin).graph
        val done = Cypher.execute(
          s, gr,
          """CALL refactor.categorize('cat', 'IN_CAT', true, 'Cat',
            |                         'name', ['note'])
            |YIELD status RETURN status""".stripMargin)
        Cypher.run(
          s, done.graph,
          """MATCH (p:Prod)-[:IN_CAT]->(c:Cat)
            |RETURN count(*) AS links, count(DISTINCT c) AS cats,
            |  sum(CASE WHEN p.cat IS NULL THEN 1 ELSE 0 END) AS cleared,
            |  sum(CASE WHEN c.name = 'x' AND c.note = 'n3'
            |      THEN 1 ELSE 0 END) AS xnote""".stripMargin)
      },
      Some("SELECT CAST(3 AS BIGINT) AS links, CAST(2 AS BIGINT) AS cats," +
        " CAST(3 AS BIGINT) AS cleared, CAST(2 AS BIGINT) AS xnote")),

    // refactor.clone_subgraph with no explicit rels: [a, b] clone plus
    // their INDUCED edge a->b (w copied), 'p' skipped on the clones
    QueryDef(
      "call_refactor_clone_subgraph",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (a:Sg {k: 0, p: 1}), (b:Sg {k: 1, p: 2}),
            |       (c:Sg {k: 2, p: 3}),
            |       (a)-[:SR {w: 1}]->(b), (b)-[:SR {w: 2}]->(c),
            |       (c)-[:SR {w: 4}]->(a)""".stripMargin).graph
        val done = Cypher.execute(
          s, gr,
          """MATCH (a:Sg {k: 0}), (b:Sg {k: 1})
            |CALL refactor.clone_subgraph([a, b], [],
            |                             {skipProperties: ['p']})
            |YIELD input, output, error RETURN input""".stripMargin)
        Cypher.run(
          s, done.graph,
          """MATCH (n:Sg)
            |WITH count(n) AS nodes,
            |     sum(CASE WHEN n.p IS NULL THEN 1 ELSE 0 END) AS nop
            |MATCH ()-[r:SR]->()
            |RETURN nodes, nop, count(r) AS edges,
            |       sum(r.w) AS wsum""".stripMargin)
      },
      Some("SELECT CAST(5 AS BIGINT) AS nodes, CAST(2 AS BIGINT) AS nop," +
        " CAST(4 AS BIGINT) AS edges, CAST(8 AS BIGINT) AS wsum")),

    // refactor.clone_subgraph_from_paths: the 2-hop path's 3 nodes and 2
    // relationships clone (properties kept); the off-path shortcut a->c
    // is NOT cloned
    QueryDef(
      "call_refactor_clone_paths",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (a:Pg {k: 0}), (b:Pg {k: 1}), (c:Pg {k: 2}),
            |       (a)-[:PR {w: 1}]->(b), (b)-[:PR {w: 2}]->(c),
            |       (a)-[:PR {w: 9}]->(c)""".stripMargin).graph
        val done = Cypher.execute(
          s, gr,
          """MATCH p = (a:Pg {k: 0})-[:PR]->(b:Pg {k: 1})-[:PR]->(c:Pg {k: 2})
            |CALL refactor.clone_subgraph_from_paths([p], {})
            |YIELD input, output, error RETURN input""".stripMargin)
        Cypher.run(
          s, done.graph,
          """MATCH (n:Pg) WITH count(n) AS nodes
            |MATCH ()-[r:PR]->()
            |RETURN nodes, count(r) AS edges, sum(r.w) AS wsum""".stripMargin)
      },
      Some("SELECT CAST(6 AS BIGINT) AS nodes, CAST(5 AS BIGINT) AS edges," +
        " CAST(15 AS BIGINT) AS wsum")),

    // refactor.delete_and_reconnect, default strategy (incoming+combine):
    // b is detach-deleted, the gap a~c bridges with the R1 relationship
    // that LEFT the previous survivor (props kept), c->d survives as-is
    QueryDef(
      "call_refactor_del_reconnect",
      (s, dir) => {
        val gr = chainGraph(s)
        val done = Cypher.execute(
          s, gr,
          """MATCH p = (a:Dr {k: 0})-[:R1]->(b:Dr {k: 1})
            |          -[:R2]->(c:Dr {k: 2})-[:R3]->(d:Dr {k: 3})
            |MATCH (b2:Dr {k: 1})
            |CALL refactor.delete_and_reconnect(p, [b2], {})
            |YIELD nodes, relationships
            |RETURN size(nodes) AS n, size(relationships) AS r""".stripMargin)
        val yielded = done.result
        val check = Cypher.run(
          s, done.graph,
          """MATCH (x:Dr) WITH count(x) AS remaining
            |MATCH (a:Dr {k: 0})-[r:R1]->(c:Dr {k: 2})
            |RETURN remaining, count(r) AS bridged,
            |       sum(r.x) AS xs""".stripMargin)
        yielded.crossJoin(check)
      },
      Some("SELECT CAST(3 AS BIGINT) AS n, CAST(2 AS BIGINT) AS r, " +
        "CAST(3 AS BIGINT) AS remaining, CAST(1 AS BIGINT) AS bridged, " +
        "CAST(1 AS BIGINT) AS xs")),

    // merge strategy + combine properties: the bridge takes the fused
    // type R2_R1 and the colliding 'x' combines into the [1, 2] list
    QueryDef(
      "call_refactor_del_reconnect_merge",
      (s, dir) => {
        val gr = chainGraph(s)
        val done = Cypher.execute(
          s, gr,
          """MATCH p = (a:Dr {k: 0})-[:R1]->(b:Dr {k: 1})
            |          -[:R2]->(c:Dr {k: 2})-[:R3]->(d:Dr {k: 3})
            |MATCH (b2:Dr {k: 1})
            |CALL refactor.delete_and_reconnect(p, [b2],
            |  {relationshipSelectionStrategy: 'merge',
            |   properties: 'combine'})
            |YIELD nodes, relationships
            |RETURN size(nodes) AS n""".stripMargin)
        Cypher.run(
          s, done.graph,
          """MATCH (a:Dr {k: 0})-[r:R2_R1]->(c:Dr {k: 2})
            |RETURN count(r) AS m, min(size(r.x)) AS xn""".stripMargin)
      },
      Some("SELECT CAST(1 AS BIGINT) AS m, CAST(2 AS BIGINT) AS xn")),

    // date.parse: wall-clock text in a timezone → epoch count in `unit`
    // (one UTC point and one DST-shifted Europe/Zagreb point)
    QueryDef(
      "call_date_parse",
      (s, dir) => {
        val a = Cypher.run(
          s, empty,
          """CALL date.parse('2023-01-01 12:00:00', 's',
            |                '%Y-%m-%d %H:%M:%S', 'UTC')
            |YIELD parsed RETURN parsed AS utc""".stripMargin)
        val b = Cypher.run(
          s, empty,
          """CALL date.parse('2023-06-15 12:00:00', 's',
            |                '%Y-%m-%d %H:%M:%S', 'Europe/Zagreb')
            |YIELD parsed RETURN parsed AS zagreb""".stripMargin)
        a.crossJoin(b)
      },
      Some("SELECT CAST(1672574400 AS BIGINT) AS utc, " +
        "CAST(1686823200 AS BIGINT) AS zagreb")),

    // date.format: epoch count → formatted wall time with %Z zone name
    QueryDef(
      "call_date_format",
      (s, dir) =>
        Cypher.run(
          s, empty,
          """CALL date.format(1672574400, 's',
            |                 '%Y-%m-%d %H:%M:%S %Z', 'UTC')
            |YIELD formatted RETURN formatted""".stripMargin),
      Some("SELECT '2023-01-01 12:00:00 UTC' AS formatted")),

    // the date/convert expression functions: date.add unit arithmetic,
    // date.convert_format ISO-name conversion, convert.str2object /
    // from_json_map (dotted path) / to_json
    QueryDef(
      "cy_date_convert_fns",
      (s, dir) =>
        Cypher.run(
          s, empty,
          """RETURN date.add(1000, 'ms', 2, 's') AS a,
            |  date.convert_format('2011-12-03T10:15:30+01:00',
            |    'iso_offset_date_time', 'iso_local_date') AS cf,
            |  date.convert_format('2011-12-03T10:15:30',
            |    'iso_local_date_time', 'iso_zoned_date_time') AS cz,
            |  toInteger(convert.str2object('5')) AS s5,
            |  toInteger(convert.from_json_map('{"a": {"b": 7}}', 'a.b'))
            |    AS jb,
            |  convert.to_json({x: 1}) AS cj""".stripMargin),
      Some("SELECT CAST(3000 AS BIGINT) AS a, '2011-12-03' AS cf, " +
        "'2011-12-03T10:15:30+00:00' AS cz, CAST(5 AS BIGINT) AS s5, " +
        "CAST(7 AS BIGINT) AS jb, '{\"x\":1}' AS cj")),

    // graph_analyzer.analyze over a 3-cycle + pendant + isolated node;
    // every id-free analysis, values rendered python-str style — the
    // oracle rows were computed with networkx 3.6 on the same shape
    QueryDef(
      "call_graph_analyzer",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (a:Ga {k: 0}), (b:Ga {k: 1}), (c:Ga {k: 2}),
            |       (d:Ga {k: 3}), (e:Ga {k: 4}),
            |       (a)-[:GE]->(b), (b)-[:GE]->(c), (c)-[:GE]->(a),
            |       (c)-[:GE]->(d)""".stripMargin).graph
        Cypher.run(
          s, gr,
          """CALL graph_analyzer.analyze(['nodes', 'edges', 'bridges',
            |  'articulation_points', 'avg_degree', 'self_loops',
            |  'is_bipartite', 'is_planar', 'is_biconnected',
            |  'is_weakly_connected', 'number_of_weakly_components',
            |  'is_strongly_connected', 'strongly_components', 'is_dag',
            |  'is_eulerian', 'is_forest', 'is_tree'])
            |YIELD name, value RETURN name, value ORDER BY name""".stripMargin)
      },
      Some("""SELECT n AS name, v AS value FROM (VALUES
             |  ('Number of nodes', '5'), ('Number of edges', '4'),
             |  ('Number of bridges', '1'),
             |  ('Number of articulation points', '1'),
             |  ('Average degree', '0.8'), ('Self loops', '0'),
             |  ('Is bipartite', 'False'), ('Is planar', 'True'),
             |  ('Is biconnected', 'False'),
             |  ('Is weakly connected', 'False'),
             |  ('Number of weakly connected components', '2'),
             |  ('Is strongly connected', 'False'),
             |  ('Number of strongly connected components', '3'),
             |  ('Is DAG', 'False'), ('Is eulerian', 'False'),
             |  ('Is forest', 'False'), ('Is tree', 'False')) t(n, v)
             |ORDER BY name""".stripMargin)),

    // graph_analyzer.analyze_subgraph: the cycle alone is strongly
    // connected, biconnected, eulerian and non-bipartite
    QueryDef(
      "call_graph_analyzer_sub",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (a:Gs {k: 0}), (b:Gs {k: 1}), (c:Gs {k: 2}),
            |       (d:Gs {k: 3}),
            |       (a)-[:GE]->(b), (b)-[:GE]->(c), (c)-[:GE]->(a),
            |       (c)-[:GE]->(d)""".stripMargin).graph
        Cypher.run(
          s, gr,
          """MATCH (a:Gs {k: 0}), (b:Gs {k: 1}), (c:Gs {k: 2})
            |MATCH (x:Gs {k: 0})-[r1:GE]->(y:Gs {k: 1})
            |MATCH (y2:Gs {k: 1})-[r2:GE]->(z:Gs {k: 2})
            |MATCH (z2:Gs {k: 2})-[r3:GE]->(w:Gs {k: 0})
            |CALL graph_analyzer.analyze_subgraph([a, b, c], [r1, r2, r3],
            |  ['nodes', 'edges', 'is_strongly_connected', 'is_eulerian',
            |   'is_biconnected', 'is_bipartite'])
            |YIELD name, value RETURN name, value ORDER BY name""".stripMargin)
      },
      Some("""SELECT n AS name, v AS value FROM (VALUES
             |  ('Number of nodes', '3'), ('Number of edges', '3'),
             |  ('Is strongly connected', 'True'),
             |  ('Is eulerian', 'True'), ('Is biconnected', 'True'),
             |  ('Is bipartite', 'False')) t(n, v)
             |ORDER BY name""".stripMargin)))
}
