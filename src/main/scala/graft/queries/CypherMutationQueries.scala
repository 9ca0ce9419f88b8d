package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Mutation statements through the Cypher frontend (CREATE / MERGE / SET /
  * DELETE / REMOVE / FOREACH clauses → [[graft.operators.Mutations]] →
  * new GraphState versions), verified by querying the post-mutation state
  * against a DuckDB oracle on the raw tables.
  */
object CypherMutationQueries {

  private def g(s: SparkSession, dir: String) = TpchGraphLoader(s, dir)

  val defs: Seq[QueryDef] = Seq(
    // CREATE node per matched row (CreateNode operator.hpp:411).
    QueryDef(
      "cy_create",
      (s, dir) => {
        val r = Cypher.execute(
          s,
          g(s, dir),
          """MATCH (r:Region)
            |CREATE (t:RTag {name: toLower(r.r_name), rk: r.r_regionkey})""".stripMargin)
        Cypher.run(
          s,
          r.graph,
          """MATCH (t:RTag)
            |RETURN count(*) AS n,
            |       text.join(collections.sort(collect(t.name)), ',') AS names""".stripMargin)
      },
      Some("""SELECT count(*) AS n,
             |  array_to_string(list_sort(list(lower(r_name))), ',') AS names
             |FROM region""".stripMargin)),

    // CREATE edge between bound endpoints (CreateExpand operator.hpp:494).
    QueryDef(
      "cy_create_edges",
      (s, dir) => {
        val r = Cypher.execute(
          s,
          g(s, dir),
          """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
            |WHERE c.c_custkey < 100
            |CREATE (c)-[:CITIZEN_OF {via: 'FROM_NATION'}]->(n)""".stripMargin)
        Cypher.run(
          s,
          r.graph,
          """MATCH (c:Customer)-[e:CITIZEN_OF]->(n:Nation)
            |RETURN count(*) AS n_edges,
            |       count(DISTINCT n.n_name) AS n_nations""".stripMargin)
      },
      Some("""SELECT count(*) AS n_edges, count(DISTINCT n_nationkey) AS n_nations
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_custkey < 100""".stripMargin)),

    // MERGE with ON CREATE SET, run twice to prove idempotent upsert
    // (Merge operator.hpp:2579).
    QueryDef(
      "cy_merge",
      (s, dir) => {
        val stmt =
          """MATCH (c:Customer) WHERE c.c_custkey < 75
            |MERGE (g:Seg {name: c.c_mktsegment})
            |ON CREATE SET g.flag = 1""".stripMargin
        val once = Cypher.execute(s, g(s, dir), stmt)
        val twice = Cypher.execute(s, once.graph, stmt)
        Cypher.run(
          s,
          twice.graph,
          """MATCH (g:Seg)
            |RETURN count(*) AS n_seg, sum(g.flag) AS n_flagged""".stripMargin)
      },
      Some("""SELECT count(DISTINCT c_mktsegment) AS n_seg,
             |  count(DISTINCT c_mktsegment) AS n_flagged
             |FROM customer WHERE c_custkey < 75""".stripMargin)),

    // SET then DETACH DELETE (SetProperty :1448, Delete :1396) — surviving
    // nodes, property flags, and surviving edges counted from the new state.
    QueryDef(
      "cy_set_delete",
      (s, dir) => {
        val e1 = Cypher.execute(
          s,
          g(s, dir),
          "MATCH (c:Customer) WHERE c.c_acctbal < 0 SET c.overdrawn = true")
        val e2 = Cypher.execute(
          s,
          e1.graph,
          "MATCH (c:Customer {c_mktsegment: 'HOUSEHOLD'}) DETACH DELETE c")
        Cypher.run(
          s,
          e2.graph,
          """MATCH (c:Customer)
            |WITH count(*) AS n_cust,
            |     count(CASE WHEN c.overdrawn THEN 1 END) AS n_over
            |MATCH (c2:Customer)-[:PLACED]->(o:Order)
            |RETURN n_cust, n_over, count(*) AS n_placed""".stripMargin)
      },
      Some("""WITH surv AS (SELECT * FROM customer WHERE c_mktsegment <> 'HOUSEHOLD')
             |SELECT (SELECT count(*) FROM surv) AS n_cust,
             |  (SELECT count(*) FROM surv WHERE c_acctbal < 0) AS n_over,
             |  (SELECT count(*) FROM orders JOIN surv ON o_custkey = c_custkey)
             |    AS n_placed""".stripMargin)),

    // REMOVE property + FOREACH-driven CREATE (RemoveProperty :1630,
    // Foreach :3032).
    QueryDef(
      "cy_remove_foreach",
      (s, dir) => {
        val e1 = Cypher.execute(
          s,
          g(s, dir),
          "MATCH (p:Supplier) WHERE p.s_acctbal < 0 REMOVE p.s_acctbal")
        val e2 = Cypher.execute(
          s,
          e1.graph,
          "FOREACH (i IN range(1, 5) | CREATE (:Counter {v: i * 10}))")
        Cypher.run(
          s,
          e2.graph,
          """MATCH (p:Supplier)
            |WITH count(CASE WHEN p.s_acctbal IS NULL THEN 1 END) AS n_nulled
            |MATCH (c:Counter)
            |RETURN n_nulled, count(*) AS n_counters, sum(c.v) AS v_sum""".stripMargin)
      },
      Some("""SELECT (SELECT count(*) FROM supplier WHERE s_acctbal < 0) AS n_nulled,
             |  CAST(5 AS BIGINT) AS n_counters,
             |  CAST(150 AS BIGINT) AS v_sum""".stripMargin)),

    // CREATE ENUM + Name::Value literals + toEnum validation
    // (CreateEnumQuery ast.hpp:4131; enum_store.hpp; ToEnum
    // awesome_memgraph_functions.cpp:1816). Values surface as stable
    // `Name::Value` strings — orderable and oracle-comparable.
    QueryDef(
      "cy_enum",
      (s, dir) => {
        val r = Cypher.execute(
          s,
          g(s, dir),
          "CREATE ENUM Tier VALUES { Bronze, Silver, Gold }")
        Cypher.run(
          s,
          r.graph,
          """MATCH (c:Customer) WHERE c.c_custkey < 60
            |WITH c, CASE WHEN c.c_acctbal < 0 THEN toEnum('Tier', 'Bronze')
            |             WHEN c.c_acctbal < 5000 THEN Tier::Silver
            |             ELSE Tier::Gold END AS tier
            |RETURN tier, count(*) AS n ORDER BY tier""".stripMargin)
      },
      Some("""SELECT tier, count(*) AS n FROM (
             |  SELECT CASE WHEN c_acctbal < 0 THEN 'Tier::Bronze'
             |              WHEN c_acctbal < 5000 THEN 'Tier::Silver'
             |              ELSE 'Tier::Gold' END AS tier
             |  FROM customer WHERE c_custkey < 60)
             |GROUP BY tier ORDER BY tier""".stripMargin))
  )
}
