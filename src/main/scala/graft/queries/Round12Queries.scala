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
        |WHERE n_nationkey < 3 ORDER BY 1""".stripMargin)
  )
}
