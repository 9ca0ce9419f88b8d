package graft.queries

import org.apache.spark.sql.SparkSession

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Round-12 surface: PER-ROW helper write procedures (`UNWIND rows AS r
  * CALL create.node(r.labels, r.props)` — the reference runs create/merge
  * module procedures once per input row, create_module.cpp:49,
  * merge_module.cpp:20), planned as one distributed statement. */
object Round12Queries {

  private def g(s: SparkSession, dir: String) = TpchGraphLoader(s, dir)

  private def cq(name: String, cypher: String, oracle: String): QueryDef =
    QueryDef(name, (s, dir) => Cypher.run(s, g(s, dir), cypher), Some(oracle))

  val defs: Seq[QueryDef] = Seq(

    // create.node once per UNWIND row, labels and props both PER-ROW
    // (the dominant real-world shape the constant form can't express)
    cq(
      "cy_create_node_rows",
      """UNWIND [{labels: ['Widget'], props: {i: 1}},
        |        {labels: ['Widget', 'Gadget'], props: {i: 2}},
        |        {labels: ['Gadget'], props: {i: 3}}] AS r
        |CALL create.node(r.labels, r.props) YIELD node
        |RETURN size(labels(node)) AS nl, node.i AS i ORDER BY i""".stripMargin,
      """SELECT * FROM (VALUES (CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |                      (CAST(2 AS BIGINT), CAST(2 AS BIGINT)),
        |                      (CAST(1 AS BIGINT), CAST(3 AS BIGINT)))
        |  AS t(nl, i)""".stripMargin),

    // create.node once per MATCHED row — one new node per match, props
    // read off the matched entity
    cq(
      "cy_create_node_from_match",
      """MATCH (n:Nation) WHERE n.n_nationkey < 5
        |CALL create.node(['NationCopy'], {src: n.n_nationkey}) YIELD node
        |RETURN count(*) AS c, sum(node.src) AS s""".stripMargin,
      """SELECT CAST(count(*) AS BIGINT) AS c,
        |       CAST(sum(n_nationkey) AS BIGINT) AS s
        |FROM nation WHERE n_nationkey < 5""".stripMargin),

    // merge.node once per UNWIND row: first row matches an existing
    // nation (matchProps only); the next two share one NEW ident — the
    // first creates (identProps ∪ createProps), the duplicate matches it
    // and applies matchProps (reference serial-order semantics)
    cq(
      "cy_merge_node_rows",
      """UNWIND [{k: 'NATION_3', t: 'a'}, {k: 'ZZZ_NEW', t: 'b'},
        |        {k: 'ZZZ_NEW', t: 'c'}] AS r
        |CALL merge.node(['Nation'], {n_name: r.k},
        |                {n_nationkey: -5, made: true}, {seen: true})
        |YIELD node
        |RETURN r.t AS t, node.n_name AS name,
        |       coalesce(node.made, false) AS made,
        |       node.seen AS seen ORDER BY t""".stripMargin,
      """SELECT * FROM (VALUES ('a', 'NATION_3', false, true),
        |                      ('b', 'ZZZ_NEW', true, true),
        |                      ('c', 'ZZZ_NEW', true, true))
        |  AS t(t, name, made, seen)""".stripMargin),

    // uuid module (uuid_module.cpp:37): the value is random — pin the
    // deterministic shape (36 chars, v4 variant nibble positions)
    cq(
      "call_uuid",
      """CALL uuid.get() YIELD uuid
        |RETURN size(uuid) AS len,
        |       substring(uuid, 8, 1) AS d1, substring(uuid, 13, 1) AS d2,
        |       substring(uuid, 14, 1) AS ver""".stripMargin,
      "SELECT CAST(36 AS BIGINT) AS len, '-' AS d1, '-' AS d2, '4' AS ver"),

    // util.md5 — procedure AND function forms (util.cpp:15): list input
    // concatenates element string forms
    cq(
      "call_util_md5",
      """CALL util.md5(['ab', 1]) YIELD result
        |RETURN result, util.md5('hello') AS h""".stripMargin,
      "SELECT md5('ab1') AS result, md5('hello') AS h"),

    // meta.stats (meta.cpp:158): distributed label/type/pattern tallies
    cq(
      "call_meta_stats",
      """CALL meta.stats() YIELD labelCount, relationshipTypeCount,
        |     labels, relationshipTypes, relationshipTypesCount
        |RETURN labelCount, relationshipTypeCount,
        |       labels['Nation'] AS nations,
        |       relationshipTypesCount['IN_REGION'] AS inregion,
        |       relationshipTypes['(:Nation)-[:IN_REGION]->()'] AS nir""".stripMargin,
      """SELECT CAST(10 AS BIGINT) AS labelCount,
        |       CAST(8 AS BIGINT) AS relationshipTypeCount,
        |       (SELECT CAST(count(*) AS BIGINT) FROM nation) AS nations,
        |       (SELECT CAST(count(*) AS BIGINT) FROM nation) AS inregion,
        |       (SELECT CAST(count(*) AS BIGINT) FROM nation) AS nir""".stripMargin),

    // math.round rounding-mode matrix (math.cpp:33-95)
    cq(
      "cy_math_round",
      """RETURN math.round(2.5, 0, 'HALF_EVEN') AS he,
        |       math.round(-2.5) AS hu,
        |       math.round(1.234, 2, 'FLOOR') AS fl2,
        |       math.round(-1.2, 0, 'UP') AS up,
        |       math.round(1.9, 0, 'DOWN') AS dn,
        |       math.round(3.5, 0, 'HALF_DOWN') AS hd""".stripMargin,
      """SELECT 2.0 AS he, -3.0 AS hu, 1.23 AS fl2,
        |       -2.0 AS up, 1.0 AS dn, 3.0 AS hd""".stripMargin),

    // search.node: label→property disjunction, dedup by id
    // (search.cpp:143); Region names can't match, Nation prefix does
    cq(
      "call_search_node",
      """CALL search.node({Nation: ['n_name'], Region: 'r_name'},
        |                 'STARTS WITH', 'NATION_1') YIELD node
        |RETURN node.n_name AS name ORDER BY name""".stripMargin,
      """SELECT n_name AS name FROM nation
        |WHERE n_name LIKE 'NATION_1%' ORDER BY 1""".stripMargin),

    // search.node_all: one row per matching (label, property) pair; '='
    // on a non-string property (n_nationkey) must NOT match
    cq(
      "call_search_node_all",
      """CALL search.node_all({Nation: ['n_name', 'n_nationkey']},
        |                     '=', 'NATION_3') YIELD node
        |RETURN count(*) AS c""".stripMargin,
      "SELECT CAST(1 AS BIGINT) AS c"),

    // set_property.copyPropertyNode2Node per input row
    // (set_property_module.cpp:220): copy r_name onto each nation
    cq(
      "call_copy_prop",
      """MATCH (n:Nation)-[:IN_REGION]->(r:Region)
        |WHERE n.n_nationkey < 3
        |CALL set_property.copyPropertyNode2Node(
        |  r, ['r_name'], n, ['region_name']) YIELD result
        |RETURN n.n_nationkey AS k, n.region_name AS rn, result
        |ORDER BY k""".stripMargin,
      """SELECT CAST(n_nationkey AS BIGINT) AS k, r_name AS rn,
        |       true AS result
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |WHERE n_nationkey < 3 ORDER BY 1""".stripMargin),

    // two comma patterns with a shared variable: the planner must start
    // from the SMALL side of each (Region{ASIA} first, then drive the
    // Customer pattern from the bound nation) — the reference's
    // VariableStartPlanner order (variable_start_planner.hpp:161)
    cq(
      "cy_two_pattern_start",
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation),
        |      (n)-[:IN_REGION]->(r:Region {r_name: 'ASIA'})
        |RETURN count(*) AS cnt""".stripMargin,
      """SELECT CAST(count(*) AS BIGINT) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'""".stripMargin),

    // tsp.solve (tsp.py:15, greedy = travelling_salesman.py:69): four
    // points on a parallel, collected-ids → per-row CALL dispatch; ids
    // sort back to creation order, so greedy starts at i=0 and walks the
    // line 0-1-2-3, closing 3→0; legs read back via id() matches
    cq(
      "call_tsp",
      """CALL create.nodes(['TspPt'], [
        |  {i: 0, lat: 10.0, lng: 0.0}, {i: 1, lat: 10.0, lng: 0.01},
        |  {i: 2, lat: 10.0, lng: 0.02}, {i: 3, lat: 10.0, lng: 0.03}])
        |YIELD node
        |WITH collect(id(node)) AS pts0
        |WITH collections.sort(pts0) AS pts
        |CALL tsp.solve(pts, 'greedy') YIELD sources, destinations
        |UNWIND range(0, size(sources) - 1) AS k
        |MATCH (a:TspPt), (b:TspPt)
        |WHERE id(a) = sources[k] AND id(b) = destinations[k]
        |RETURN k, a.i AS s, b.i AS d ORDER BY k""".stripMargin,
      """SELECT CAST(k AS BIGINT) AS k, CAST(s AS BIGINT) AS s,
        |       CAST(d AS BIGINT) AS d
        |FROM (VALUES (0, 0, 1), (1, 1, 2), (2, 2, 3), (3, 3, 0)) t(k, s, d)
        |ORDER BY k""".stripMargin),

    // vrp.route (vrp.py:65, sweep heuristic): depot at the origin, two
    // points east and two west; two vehicles split the bearing sweep into
    // the east and west sectors, each routed greedily from the depot
    cq(
      "call_vrp",
      """CALL create.nodes(['VrpPt'], [
        |  {i: 0, lat: 0.0, lng: 0.0},
        |  {i: 1, lat: 0.0, lng: 0.01}, {i: 2, lat: 0.0, lng: 0.02},
        |  {i: 3, lat: 0.0, lng: -0.01}, {i: 4, lat: 0.0, lng: -0.02}])
        |YIELD node
        |WITH collect(id(node)) AS ids0
        |WITH collections.sort(ids0) AS ids
        |CALL vrp.route(ids[0], 2) YIELD from_vertex, to_vertex
        |MATCH (a:VrpPt), (b:VrpPt)
        |WHERE id(a) = from_vertex AND id(b) = to_vertex
        |RETURN a.i AS s, b.i AS d ORDER BY s, d""".stripMargin,
      """SELECT CAST(s AS BIGINT) AS s, CAST(d AS BIGINT) AS d
        |FROM (VALUES (0, 1), (0, 3), (1, 2), (2, 0), (3, 4), (4, 0)) t(s, d)
        |ORDER BY s, d""".stripMargin),

    // temporal.format (temporal.py:8): strftime directives lowered to one
    // date_format expression
    cq(
      "call_temporal_format",
      """CALL temporal.format('2011-03-02 05:06:07', '%Y/%m/%d %H:%M')
        |YIELD formatted RETURN formatted""".stripMargin,
      "SELECT '2011/03/02 05:06' AS formatted"),

    // json_util.load_from_str (json_util.py:99): a top-level array
    // explodes into one row per object
    cq(
      "call_json_str",
      """CALL json_util.load_from_str('[{"a": 1}, {"a": 2}, {"a": 5}]')
        |YIELD objects RETURN objects.a AS a ORDER BY a""".stripMargin,
      """SELECT CAST(a AS BIGINT) AS a FROM (VALUES (1), (2), (5)) t(a)
        |ORDER BY a""".stripMargin),

    // embeddings.compute (embeddings.py, hashing-trick stand-in): every
    // vector has the requested width and unit L2 norm
    cq(
      "call_embeddings",
      """CALL create.nodes(['DocE'], [{txt: 'alpha beta gamma'},
        |                             {txt: 'delta epsilon'}]) YIELD node
        |WITH count(*) AS created
        |CALL embeddings.compute({label: 'DocE', property: 'txt',
        |                         dimensions: 8})
        |YIELD node, embedding
        |RETURN count(*) AS n, min(size(embedding)) AS dims,
        |       round(min(reduce(acc = 0.0, x IN embedding | acc + x * x)), 6)
        |         AS mn,
        |       round(max(reduce(acc = 0.0, x IN embedding | acc + x * x)), 6)
        |         AS mx""".stripMargin,
      """SELECT CAST(2 AS BIGINT) AS n, CAST(8 AS BIGINT) AS dims,
        |       1.0 AS mn, 1.0 AS mx""".stripMargin),

    // text_search.fuzzy_phrase_search (text_index.cpp fuzzy phrase):
    // ordered adjacent run, shared OSA edit budget, trailing prefix —
    // 'big bad wolf' exact, 'big bd world' spends the budget on bd→bad
    // with wo* matching world, 'bad big wolf' fails the order
    QueryDef(
      "call_fuzzy_phrase",
      (s, dir) => {
        var g0 = graft.core.GraphState(Map.empty, Map.empty)
        g0 = Cypher
          .execute(s, g0, "CREATE TEXT INDEX fuzzyIdx ON :FDoc", Map.empty)
          .graph
        g0 = Cypher.execute(
          s, g0,
          """CREATE (:FDoc {title: 'big bad wolf', n: 1}),
            |       (:FDoc {title: 'big bd world', n: 2}),
            |       (:FDoc {title: 'bad big wolf', n: 3}),
            |       (:FDoc {title: 'coffee shop', n: 4})""".stripMargin,
          Map.empty).graph
        Cypher.run(
          s, g0,
          """CALL text_search.fuzzy_phrase_search('fuzzyIdx',
            |  'data.title:big bad wo', {fuzzy_distance: 1}) YIELD node
            |RETURN node.n AS n ORDER BY n""".stripMargin)
      },
      Some("""SELECT CAST(n AS BIGINT) AS n FROM (VALUES (1), (2)) t(n)
             |ORDER BY n""".stripMargin)),

    // graph_coloring.color_graph (graph_coloring.py:10, distributed
    // Jones–Plassmann): a planted 5-cycle must come back fully colored
    // with zero same-color edges (validity is the contract both engines
    // share; chromatic minimality is best-effort in both)
    QueryDef(
      "call_coloring",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import graft.core.GraphState
        import graft.operators.Mutations
        import graft.procedures.{ProcContext, PyTailProcs}
        // standalone planted state: the procedure's contract is to colour
        // the WHOLE graph, so the gate plants only the ring (the TPC-H
        // corpus would be a million always-colour-0 bystanders)
        val n = 5
        val base = 949L << 48
        // n ring nodes + one isolated bystander (exercises the isolated
        // → colour-0 map-side path; the ring tally below excludes it)
        val ring = s.range(n + 1).select(
          (lit(base) + col("id")).as(GraphState.IdCol),
          array(lit("RingN")).as(GraphState.LabelsCol))
        val e = s.range(n).select(
          (lit(base + 1024) + col("id")).as(GraphState.IdCol),
          (lit(base) + col("id")).as(GraphState.SrcCol),
          (lit(base) + (col("id") + 1) % n).as(GraphState.DstCol),
          lit("RING").as(GraphState.TypeCol))
        val g1 = Mutations.createEdges(
          Mutations.createNodes(
            GraphState(Map.empty, Map.empty), "RingN", ring),
          "RING", e)
        val colors = PyTailProcs.colorGraph(
          ProcContext(s, g1, Seq(Map("edge_types" -> Seq("RING")))))
        val conflicts = g1.edges("RING")
          .select(
            col(GraphState.SrcCol).as("a"), col(GraphState.DstCol).as("b"))
          .join(
            colors.select(col("node").as("a"), col("color").as("ca")),
            Seq("a"))
          .join(
            colors.select(col("node").as("b"), col("color").as("cb")),
            Seq("b"))
          .filter(col("ca") === col("cb"))
        conflicts.agg(count(lit(1)).as("conflicts")).crossJoin(
          colors
            .filter(col("node") >= base && col("node") < base + n)
            .agg(count(lit(1)).as("ring_colored")))
      },
      Some("""SELECT CAST(0 AS BIGINT) AS conflicts,
             |       CAST(5 AS BIGINT) AS ring_colored""".stripMargin))
  )
}
