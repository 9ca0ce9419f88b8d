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
        |  AS t(t, name, made, seen)""".stripMargin)
  )
}
