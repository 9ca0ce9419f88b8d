package graft

import org.apache.spark.sql.Row

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Semantic tests for the Cypher frontend against the sf0.001 graph, checked
  * against independently-computed DataFrame results. */
class CypherSpec extends SparkTestBase {

  lazy val g = TpchGraphLoader(spark, sfDir)
  def run(q: String, params: Map[String, Any] = Map.empty) =
    Cypher.run(spark, g, q, params)

  test("scan by label + count") {
    val n = run("MATCH (c:Customer) RETURN count(*) AS n")
      .collect()(0).getLong(0)
    assert(n == g.nodes("Customer").count())
  }

  test("filter + projection + order + limit") {
    val rows = run(
      """MATCH (c:Customer) WHERE c.c_acctbal > 5000
        |RETURN c.c_custkey AS k, c.c_name AS name
        |ORDER BY k DESC LIMIT 3""".stripMargin).collect()
    assert(rows.length <= 3)
    val expected = g.nodes("Customer")
      .filter(org.apache.spark.sql.functions.col("c_acctbal") > 5000)
      .orderBy(org.apache.spark.sql.functions.col("c_custkey").desc)
      .limit(3)
      .select("c_custkey")
      .collect().map(_.getLong(0)).toSeq
    assert(rows.map(_.getLong(0)).toSeq == expected)
  }

  test("expand one hop with aggregation") {
    val rows = run(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |RETURN n.n_name AS nation, count(*) AS cnt
        |ORDER BY nation""".stripMargin).collect()
    assert(rows.map(_.getLong(1)).sum == g.nodes("Customer").count())
  }

  test("two-hop + property map in pattern") {
    val rows = run(
      """MATCH (c:Customer {c_mktsegment: 'BUILDING'})-[:FROM_NATION]->(n:Nation)-[:IN_REGION]->(r:Region)
        |RETURN r.r_name AS region, count(*) AS cnt ORDER BY region""".stripMargin)
      .collect()
    assert(rows.nonEmpty)
  }

  test("WITH pipeline + WHERE on aggregate (HAVING)") {
    val rows = run(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WITH c, count(o) AS n_orders
        |WHERE n_orders > 2
        |RETURN c.c_custkey AS k, n_orders ORDER BY k""".stripMargin).collect()
    assert(rows.forall(_.getLong(1) > 2))
  }

  test("UNWIND + collect + list ops") {
    val rows = run(
      "UNWIND [3, 1, 2] AS x RETURN x ORDER BY x").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("CASE + string functions") {
    val rows = run(
      """MATCH (r:Region)
        |RETURN r.r_name AS name,
        |       CASE WHEN r.r_name STARTS WITH 'A' THEN 'a-region' ELSE 'other' END AS kind
        |ORDER BY name""".stripMargin).collect()
    assert(rows.forall(r =>
      (r.getString(0).startsWith("A")) == (r.getString(1) == "a-region")))
  }

  test("OPTIONAL MATCH keeps unmatched rows with NULLs") {
    val rows = run(
      """MATCH (c:Customer)
        |OPTIONAL MATCH (c)-[:PLACED]->(o:Order)
        |RETURN c.c_custkey AS k, count(o.o_orderkey) AS n
        |ORDER BY k""".stripMargin).collect()
    assert(rows.length == g.nodes("Customer").count())
  }

  test("pattern predicate EXISTS as semi join") {
    val all = run("MATCH (n:Nation) RETURN n.n_name AS x").count()
    val some = run(
      """MATCH (n:Nation) WHERE (n)<-[:FROM_NATION]-(:Supplier)
        |RETURN n.n_name AS x""".stripMargin).count()
    val none = run(
      """MATCH (n:Nation) WHERE NOT (n)<-[:FROM_NATION]-(:Supplier)
        |RETURN n.n_name AS x""".stripMargin).count()
    assert(some + none == all && some > 0)
  }

  test("variable-length expansion over KNOWS") {
    val rows = run(
      """MATCH (a:Customer {c_custkey: 0})-[e:KNOWS*1..2]->(b:Customer)
        |RETURN b.c_custkey AS k, size(e) AS hops ORDER BY hops, k""".stripMargin)
      .collect()
    // 1 hop: customers 1 and 7; 2 hops: 2, 8, 8, 14 (two chords each)
    assert(rows.map(r => (r.getLong(1), r.getLong(0))).toSeq ==
      Seq((1L, 1L), (1L, 7L), (2L, 2L), (2L, 8L), (2L, 8L), (2L, 14L)))
  }

  test("UNION and UNION ALL") {
    val u = run(
      "MATCH (r:Region) RETURN r.r_name AS name UNION MATCH (r:Region) RETURN r.r_name AS name")
    assert(u.count() == g.nodes("Region").count())
    val ua = run(
      "MATCH (r:Region) RETURN r.r_name AS name UNION ALL MATCH (r:Region) RETURN r.r_name AS name")
    assert(ua.count() == 2 * g.nodes("Region").count())
  }

  test("list comprehension, reduce, quantifiers") {
    val r = run(
      """RETURN [x IN range(1, 5) WHERE x % 2 = 0 | x * 10] AS evens,
        |       reduce(acc = 0, x IN [1,2,3] | acc + x) AS total,
        |       all(x IN [1,2] WHERE x > 0) AS allpos,
        |       single(x IN [1,2] WHERE x = 2) AS one""".stripMargin)
      .collect()(0)
    assert(r.getAs[scala.collection.Seq[Long]]("evens").toSeq == Seq(20L, 40L))
    assert(r.getAs[Long]("total") == 6L)
    assert(r.getAs[Boolean]("allpos"))
    assert(r.getAs[Boolean]("one"))
  }

  test("parameters") {
    val n = run(
      "MATCH (c:Customer) WHERE c.c_custkey = $k RETURN c.c_name AS name",
      Map("k" -> 42L)).count()
    assert(n == 1)
  }

  test("ternary NULL semantics: WHERE null drops rows") {
    val n = run(
      "MATCH (c:Customer) WHERE c.no_such_prop > 1 RETURN c.c_custkey AS k").count()
    assert(n == 0)
  }

  test("DISTINCT") {
    val n = run(
      "MATCH (c:Customer) RETURN DISTINCT c.c_mktsegment AS seg ORDER BY seg").count()
    assert(n == 5)
  }

  test("undirected expand: (a)-[:KNOWS]-(b) counts both orientations once") {
    val rows = run(
      """MATCH (a:Customer {c_custkey: 10})-[:KNOWS]-(b:Customer)
        |RETURN b.c_custkey AS k ORDER BY k""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    // out: 11, 17; in: 9 (ring) and 3 (chord 3+7=10)
    assert(rows == Seq(3L, 9L, 11L, 17L))
  }

  test("undirected expand to existing endpoint") {
    val n = run(
      """MATCH (a:Customer {c_custkey: 10}), (b:Customer {c_custkey: 11})
        |MATCH (a)-[e:KNOWS]-(b) RETURN id(e) AS eid""".stripMargin).count()
    assert(n == 1)
  }

  test("USING HOPS LIMIT truncates subcritically, raises supercritically") {
    // subcritical typed edge set: the driver replays the reference's DFS
    // partial traversal — at most 3 edges fetched, so 1..3 paths survive
    val n = run(
      """USING HOPS LIMIT 3
        |MATCH (c:Customer {c_custkey: 1})
        |      -[:PLACED|HAS_LINE|OF_PART|BY_SUPPLIER*]->(x)
        |RETURN count(*) AS n""".stripMargin).collect()(0).getLong(0)
    assert(n >= 1 && n <= 3, s"expected 1..3 partial rows, got $n")
    // supercritical (forced): partial order is engine-specific — raise
    spark.conf.set("spark.graft.local.edges", "0")
    try {
      val e = intercept[Exception] {
        run(
          """USING HOPS LIMIT 3
            |MATCH (c:Customer {c_custkey: 1})
            |      -[:PLACED|HAS_LINE|OF_PART|BY_SUPPLIER*]->(x)
            |RETURN count(*) AS n""".stripMargin).collect()
      }
      assert(e.getMessage.contains("hops limit exceeded"))
    } finally spark.conf.unset("spark.graft.local.edges")
  }

  test("kShortest returns at most k rows per pair, shortest first") {
    val rows = run(
      """MATCH (a:Customer {c_custkey: 0})
        |      -[e:KNOWS *KSHORTEST ..6 {k: 2}]->(b:Customer {c_custkey: 8})
        |RETURN size(e) AS hops ORDER BY hops""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    // 8 = 1+7 (2 hops, two orders) or 8×1 (8 hops, out of bound)
    assert(rows == Seq(2L, 2L))
  }

  test("mutating statement via execute: create then read back") {
    val r = graft.cypher.Cypher.execute(
      spark,
      g,
      "MATCH (n:Nation) CREATE (x:NTag {nm: toUpper(n.n_name)})")
    val back = graft.cypher.Cypher.run(
      spark,
      r.graph,
      "MATCH (x:NTag) RETURN count(*) AS n")
    assert(back.collect()(0).getLong(0) == g.nodes("Nation").count())
  }

  test("CALL subquery aggregates per imported row") {
    val rows = run(
      """MATCH (r:Region)
        |CALL { WITH r MATCH (r)<-[:IN_REGION]-(n:Nation) RETURN count(*) AS nn }
        |RETURN r.r_name AS name, nn ORDER BY name""".stripMargin).collect()
    assert(rows.length == 5 && rows.map(_.getLong(1)).sum == g.nodes("Nation").count())
  }

  test("start-point chooser: the smaller label side drives the expansion") {
    // Customer (large) -> Nation (25): the VariableStartPlanner analog
    // must reverse, so the LEFTMOST leaf of the optimized plan is the
    // Nation relation (n_* columns), not a full Customer scan
    val df = run(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |WHERE n.n_name = 'FRANCE'
        |RETURN count(*) AS cnt""".stripMargin)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    val firstCols = leaves.head.output.map(_.name)
    assert(
      firstCols.exists(_.contains("n_name")),
      s"expected the Nation scan to drive; leftmost leaf columns: $firstCols")
    // and the answer is still the join count
    val expected = g.nodes("Customer")
      .join(
        g.nodes("Nation")
          .filter(org.apache.spark.sql.functions.col("n_name") === "FRANCE")
          .select(org.apache.spark.sql.functions
            .col("n_nationkey").as("__nk")),
        org.apache.spark.sql.functions.col("c_nationkey") ===
          org.apache.spark.sql.functions.col("__nk"))
      .count()
    assert(df.collect()(0).getLong(0) == expected)
  }
}
