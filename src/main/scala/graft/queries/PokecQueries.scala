package graft.queries

import org.apache.spark.sql.SparkSession

import graft.cypher.Cypher
import graft.sources.PokecGraphLoader

/** The reference's mgbench pokec workload as first-class oracle gates —
  * every query group of `/root/reference/tests/mgbench/workloads/pokec.py`
  * (expansion_1..4 ±filter :948-1127, neighbours_2 ±data ±filter
  * :1128-1251, shortest_path ±filter :480-568, allshortest :570-611,
  * pattern_cycle/long/short :706-770, aggregations :680-705,896-947,
  * vertex lookups :771-815, create/update writes :613-679,816-831) run
  * through the Cypher frontend against [[PokecGraphLoader]]'s :User/FRIEND
  * graph and checked against a DuckDB replay of the same derivation.
  *
  * Adaptations, each keeping the measured plan shape while making the
  * result deterministic (mgbench runs each query with a RANDOM vertex and
  * validates separately; the oracle gate needs a pinned answer):
  *  - $id/$from/$to parameters are pinned to data-probed vertices
  *    (17 = degree-12 hub, 0→1 = BFS distance 3 — and 4 under the
  *    age-filtered lambda, so the filter demonstrably changes the
  *    answer — 0→24 = a 2-hop shortest path with no direct edge,
  *    124 = cycle apex; all pinned ids also exist at sf0.001 so the
  *    catalog smoke test sees rows at every scale factor).
  *  - `RETURN n LIMIT 1` / `RETURN n5 LIMIT 1` probes become
  *    `min(...)`/`count(*)` aggregates (LIMIT 1 over an unordered match is
  *    nondeterministic in ANY engine; the traversal measured is identical).
  *  - `RETURN n` (whole vertex) projects the full property tuple instead.
  *  - the per-vertex read groups additionally get `_batch` variants — the
  *    BASELINE.md interpretation scores Spark's point-read throughput on
  *    the batched/vectorized form (500 sources evaluated as one join), the
  *    shape mgbench's `--num-workers` concurrency amortizes for the
  *    reference.
  */
object PokecQueries {

  private def g(s: SparkSession, dir: String) = PokecGraphLoader(s, dir)

  private def pq(name: String, cypher: String, oracle: String): QueryDef =
    QueryDef(name, (s, dir) => Cypher.run(s, g(s, dir), cypher), Some(oracle))

  /** DuckDB replay of PokecGraphLoader.derived: users + friendships. */
  private val prelude =
    """u AS (SELECT CAST(c_custkey AS BIGINT) AS id,
      |            CAST((c_custkey*37)%80 AS BIGINT) AS age,
      |            CAST(c_custkey%2 AS BIGINT) AS gender,
      |            CAST(c_custkey*13%100 AS BIGINT) AS cp
      |      FROM customer),
      |fr AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
      |              CAST(o_orderkey % (SELECT max(c_custkey)+1 FROM customer) AS BIGINT) AS dst
      |       FROM orders
      |       WHERE o_custkey != o_orderkey % (SELECT max(c_custkey)+1 FROM customer))""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // ---- expansion group (pokec.py:948-1127) -------------------------
    pq(
      "pokec_expansion_1",
      "MATCH (s:User {id: 17})-->(n:User) RETURN n.id AS id ORDER BY id",
      s"WITH $prelude SELECT dst AS id FROM fr WHERE src = 17 ORDER BY id"),

    pq(
      "pokec_expansion_1_filter",
      """MATCH (s:User {id: 17})-->(n:User)
        |WHERE n.age >= 18
        |RETURN n.id AS id ORDER BY id""".stripMargin,
      s"""WITH $prelude
         |SELECT dst AS id FROM fr JOIN u ON u.id = fr.dst
         |WHERE src = 17 AND u.age >= 18 ORDER BY id""".stripMargin),

    pq(
      "pokec_expansion_2",
      "MATCH (s:User {id: 17})-->()-->(n:User) RETURN DISTINCT n.id AS id ORDER BY id",
      s"""WITH $prelude
         |SELECT DISTINCT f2.dst AS id FROM fr f1 JOIN fr f2 ON f2.src = f1.dst
         |WHERE f1.src = 17 ORDER BY id""".stripMargin),

    pq(
      "pokec_expansion_2_filter",
      """MATCH (s:User {id: 17})-->()-->(n:User)
        |WHERE n.age >= 18
        |RETURN DISTINCT n.id AS id ORDER BY id""".stripMargin,
      s"""WITH $prelude
         |SELECT DISTINCT f2.dst AS id FROM fr f1 JOIN fr f2 ON f2.src = f1.dst
         |JOIN u ON u.id = f2.dst
         |WHERE f1.src = 17 AND u.age >= 18 ORDER BY id""".stripMargin),

    // 3- and 4-hop chains: the SQL replay must enforce Cypher's
    // edge-uniqueness (cyphermorphism) on the NON-adjacent hop pairs —
    // adjacent pairs can never repeat on a loopless graph.
    pq(
      "pokec_expansion_3",
      "MATCH (s:User {id: 17})-->()-->()-->(n:User) RETURN DISTINCT n.id AS id ORDER BY id",
      s"""WITH $prelude
         |SELECT DISTINCT f3.dst AS id
         |FROM fr f1 JOIN fr f2 ON f2.src = f1.dst JOIN fr f3 ON f3.src = f2.dst
         |WHERE f1.src = 17
         |AND NOT (f3.src = f1.src AND f3.dst = f1.dst)
         |ORDER BY id""".stripMargin),

    pq(
      "pokec_expansion_3_filter",
      """MATCH (s:User {id: 17})-->()-->()-->(n:User)
        |WHERE n.age >= 18
        |RETURN DISTINCT n.id AS id ORDER BY id""".stripMargin,
      s"""WITH $prelude
         |SELECT DISTINCT f3.dst AS id
         |FROM fr f1 JOIN fr f2 ON f2.src = f1.dst JOIN fr f3 ON f3.src = f2.dst
         |JOIN u ON u.id = f3.dst
         |WHERE f1.src = 17 AND u.age >= 18
         |AND NOT (f3.src = f1.src AND f3.dst = f1.dst)
         |ORDER BY id""".stripMargin),

    pq(
      "pokec_expansion_4",
      "MATCH (s:User {id: 17})-->()-->()-->()-->(n:User) RETURN DISTINCT n.id AS id ORDER BY id",
      s"""WITH $prelude
         |SELECT DISTINCT f4.dst AS id
         |FROM fr f1 JOIN fr f2 ON f2.src = f1.dst JOIN fr f3 ON f3.src = f2.dst
         |JOIN fr f4 ON f4.src = f3.dst
         |WHERE f1.src = 17
         |AND NOT (f3.src = f1.src AND f3.dst = f1.dst)
         |AND NOT (f4.src = f1.src AND f4.dst = f1.dst)
         |AND NOT (f4.src = f2.src AND f4.dst = f2.dst)
         |ORDER BY id""".stripMargin),

    pq(
      "pokec_expansion_4_filter",
      """MATCH (s:User {id: 17})-->()-->()-->()-->(n:User)
        |WHERE n.age >= 18
        |RETURN DISTINCT n.id AS id ORDER BY id""".stripMargin,
      s"""WITH $prelude
         |SELECT DISTINCT f4.dst AS id
         |FROM fr f1 JOIN fr f2 ON f2.src = f1.dst JOIN fr f3 ON f3.src = f2.dst
         |JOIN fr f4 ON f4.src = f3.dst
         |JOIN u ON u.id = f4.dst
         |WHERE f1.src = 17 AND u.age >= 18
         |AND NOT (f3.src = f1.src AND f3.dst = f1.dst)
         |AND NOT (f4.src = f1.src AND f4.dst = f1.dst)
         |AND NOT (f4.src = f2.src AND f4.dst = f2.dst)
         |ORDER BY id""".stripMargin),

    // ---- neighbours group (var-length *1..2, pokec.py:1128-1251) -----
    pq(
      "pokec_neighbours_2",
      "MATCH (s:User {id: 17})-[*1..2]->(n:User) RETURN DISTINCT n.id AS id ORDER BY id",
      s"""WITH $prelude
         |SELECT DISTINCT id FROM (
         |  SELECT dst AS id FROM fr WHERE src = 17
         |  UNION ALL
         |  SELECT f2.dst FROM fr f1 JOIN fr f2 ON f2.src = f1.dst
         |  WHERE f1.src = 17)
         |ORDER BY id""".stripMargin),

    pq(
      "pokec_neighbours_2_filter",
      """MATCH (s:User {id: 17})-[*1..2]->(n:User)
        |WHERE n.age >= 18
        |RETURN DISTINCT n.id AS id ORDER BY id""".stripMargin,
      s"""WITH $prelude
         |SELECT DISTINCT t.id FROM (
         |  SELECT dst AS id FROM fr WHERE src = 17
         |  UNION ALL
         |  SELECT f2.dst FROM fr f1 JOIN fr f2 ON f2.src = f1.dst
         |  WHERE f1.src = 17) t
         |JOIN u ON u.id = t.id WHERE u.age >= 18
         |ORDER BY t.id""".stripMargin),

    pq(
      "pokec_neighbours_2_data",
      """MATCH (s:User {id: 17})-[*1..2]->(n:User)
        |RETURN DISTINCT n.id AS id, n.age AS age, n.gender AS gender,
        |       n.completion_percentage AS cp
        |ORDER BY id""".stripMargin,
      s"""WITH $prelude
         |SELECT DISTINCT u.id, u.age, u.gender, u.cp FROM (
         |  SELECT dst AS id FROM fr WHERE src = 17
         |  UNION ALL
         |  SELECT f2.dst FROM fr f1 JOIN fr f2 ON f2.src = f1.dst
         |  WHERE f1.src = 17) t
         |JOIN u ON u.id = t.id
         |ORDER BY u.id""".stripMargin),

    pq(
      "pokec_neighbours_2_data_filter",
      """MATCH (s:User {id: 17})-[*1..2]->(n:User)
        |WHERE n.age >= 18
        |RETURN DISTINCT n.id AS id, n.age AS age, n.gender AS gender,
        |       n.completion_percentage AS cp
        |ORDER BY id""".stripMargin,
      s"""WITH $prelude
         |SELECT DISTINCT u.id, u.age, u.gender, u.cp FROM (
         |  SELECT dst AS id FROM fr WHERE src = 17
         |  UNION ALL
         |  SELECT f2.dst FROM fr f1 JOIN fr f2 ON f2.src = f1.dst
         |  WHERE f1.src = 17) t
         |JOIN u ON u.id = t.id WHERE u.age >= 18
         |ORDER BY u.id""".stripMargin),

    // ---- shortest-path group (pokec.py:480-611, memgraph *BFS /
    // *ALLSHORTEST syntax) --------------------------------------------
    pq(
      "pokec_shortest_path",
      """MATCH (n:User {id: 0}), (m:User {id: 1}) WITH n, m
        |MATCH p = (n)-[*BFS..15]->(m)
        |RETURN size(nodes(p)) - 1 AS hops""".stripMargin,
      s"""WITH RECURSIVE $prelude,
         |walk(node, hops) AS (
         |  SELECT dst, 1 FROM fr WHERE src = 0
         |  UNION
         |  SELECT f.dst, w.hops + 1 FROM walk w JOIN fr f ON f.src = w.node
         |  WHERE w.hops < 15)
         |SELECT CAST(min(hops) AS BIGINT) AS hops FROM walk WHERE node = 1""".stripMargin),

    pq(
      "pokec_shortest_path_filter",
      """MATCH (n:User {id: 0}), (m:User {id: 1}) WITH n, m
        |MATCH p = (n)-[*BFS..15 (e, v | v.age >= 18)]->(m)
        |RETURN size(nodes(p)) - 1 AS hops""".stripMargin,
      s"""WITH RECURSIVE $prelude,
         |walk(node, hops) AS (
         |  SELECT f.dst, 1 FROM fr f JOIN u ON u.id = f.dst
         |  WHERE f.src = 0 AND u.age >= 18
         |  UNION
         |  SELECT f.dst, w.hops + 1 FROM walk w JOIN fr f ON f.src = w.node
         |  JOIN u ON u.id = f.dst WHERE u.age >= 18 AND w.hops < 15)
         |SELECT CAST(min(hops) AS BIGINT) AS hops FROM walk WHERE node = 1""".stripMargin),

    // 0→24 sits at BFS distance exactly 2 with no direct edge
    // (data-probed); the oracle counts the 2-hop shortest paths.
    pq(
      "pokec_allshortest",
      """MATCH (n:User {id: 0}), (m:User {id: 24}) WITH n, m
        |MATCH p = (n)-[*ALLSHORTEST ..2 (r, v | 1) total_weight]->(m)
        |RETURN count(*) AS n_paths, toInteger(min(total_weight)) AS w""".stripMargin,
      s"""WITH $prelude
         |SELECT CAST(count(*) AS BIGINT) AS n_paths, CAST(2 AS BIGINT) AS w
         |FROM fr f1 JOIN fr f2 ON f2.src = f1.dst
         |WHERE f1.src = 0 AND f2.dst = 24""".stripMargin),

    // ---- pattern group (pokec.py:706-770) ----------------------------
    pq(
      "pokec_pattern_cycle",
      """MATCH (n:User {id: 124})-[e1]->(m)-[e2]->(n)
        |RETURN m.id AS mid ORDER BY mid""".stripMargin,
      s"""WITH $prelude
         |SELECT f1.dst AS mid FROM fr f1 JOIN fr f2
         |ON f2.src = f1.dst AND f2.dst = 124
         |WHERE f1.src = 124 ORDER BY mid""".stripMargin),

    // `RETURN n5 LIMIT 1` → deterministic count+min over the same 4-hop
    // chain (last hop reversed); uniqueness pairs (1,3)(1,4)(2,4)(3,4).
    pq(
      "pokec_pattern_long",
      """MATCH (n1:User {id: 17})-[e1]->(n2)-[e2]->(n3)-[e3]->(n4)<-[e4]-(n5)
        |RETURN count(*) AS n, min(n5.id) AS min_id""".stripMargin,
      s"""WITH $prelude
         |SELECT CAST(count(*) AS BIGINT) AS n, min(f4.src) AS min_id
         |FROM fr f1 JOIN fr f2 ON f2.src = f1.dst
         |JOIN fr f3 ON f3.src = f2.dst
         |JOIN fr f4 ON f4.dst = f3.dst
         |WHERE f1.src = 17
         |AND NOT (f3.src = f1.src AND f3.dst = f1.dst)
         |AND NOT (f4.src = f1.src AND f4.dst = f1.dst)
         |AND NOT (f4.src = f2.src AND f4.dst = f2.dst)
         |AND NOT (f4.src = f3.src AND f4.dst = f3.dst)""".stripMargin),

    pq(
      "pokec_pattern_short",
      "MATCH (n:User {id: 17})-[e]->(m) RETURN min(m.id) AS id",
      s"WITH $prelude SELECT min(dst) AS id FROM fr WHERE src = 17"),

    // ---- vertex-lookup group (pokec.py:771-815) ----------------------
    pq(
      "pokec_vertex_on_label_property",
      """MATCH (n:User) WITH n WHERE n.id = 42
        |RETURN n.id AS id, n.age AS age, n.gender AS gender,
        |       n.completion_percentage AS cp""".stripMargin,
      s"WITH $prelude SELECT id, age, gender, cp FROM u WHERE id = 42"),

    pq(
      "pokec_vertex_on_label_property_index",
      """MATCH (n:User {id: 42})
        |RETURN n.id AS id, n.age AS age, n.gender AS gender,
        |       n.completion_percentage AS cp""".stripMargin,
      s"WITH $prelude SELECT id, age, gender, cp FROM u WHERE id = 42"),

    pq(
      "pokec_vertex_on_property",
      """MATCH (n {id: 42})
        |RETURN n.id AS id, n.age AS age, n.gender AS gender,
        |       n.completion_percentage AS cp""".stripMargin,
      s"WITH $prelude SELECT id, age, gender, cp FROM u WHERE id = 42"),

    // ---- aggregation group (pokec.py:680-705, 896-947) ---------------
    pq(
      "pokec_aggregation_count",
      "MATCH (n) RETURN count(n) AS cnt, count(n.age) AS cnt_age",
      s"""WITH $prelude
         |SELECT count(*) AS cnt, count(age) AS cnt_age FROM u""".stripMargin),

    pq(
      "pokec_aggregation_min_max_avg",
      """MATCH (n) RETURN min(n.age) AS min_age, max(n.age) AS max_age,
        |round(avg(n.age), 6) AS avg_age""".stripMargin,
      s"""WITH $prelude
         |SELECT min(age) AS min_age, max(age) AS max_age,
         |round(CAST(sum(age) AS DOUBLE)/count(age), 6) AS avg_age FROM u""".stripMargin),

    pq(
      "pokec_aggregate_group",
      "MATCH (n:User) RETURN n.age AS age, count(*) AS cnt ORDER BY age",
      s"WITH $prelude SELECT age, count(*) AS cnt FROM u GROUP BY age ORDER BY age"),

    pq(
      "pokec_aggregate_filter",
      """MATCH (n:User) WHERE n.age >= 18
        |RETURN n.age AS age, count(*) AS cnt ORDER BY age""".stripMargin,
      s"""WITH $prelude
         |SELECT age, count(*) AS cnt FROM u WHERE age >= 18
         |GROUP BY age ORDER BY age""".stripMargin),

    // ---- batched read groups (BASELINE.md interpretation: score the
    // point-read groups as ONE vectorized join over a deterministic
    // 500-source parameter sequence — mgbench's analog is its
    // deterministic random-argument stream across workers) -------------
    pq(
      "pokec_expansion_1_batch",
      """MATCH (s:User) WITH count(s) AS nn
        |UNWIND range(0, 499) AS k
        |WITH (k * 97 + 13) % nn AS tid
        |MATCH (s:User)-->(n:User) WHERE s.id = tid
        |RETURN tid AS src, count(*) AS deg ORDER BY src""".stripMargin,
      s"""WITH $prelude,
         |ids AS (SELECT (r*97+13) % (SELECT max(c_custkey)+1 FROM customer) AS tid
         |        FROM range(500) t(r))
         |SELECT tid AS src, count(*) AS deg FROM ids JOIN fr ON fr.src = tid
         |GROUP BY tid ORDER BY src""".stripMargin),

    pq(
      "pokec_neighbours_2_batch",
      """MATCH (s:User) WITH count(s) AS nn
        |UNWIND range(0, 99) AS k
        |WITH (k * 211 + 7) % nn AS tid
        |MATCH (s:User)-[*1..2]->(n:User) WHERE s.id = tid
        |RETURN tid AS src, count(DISTINCT n.id) AS n_nodes ORDER BY src""".stripMargin,
      s"""WITH $prelude,
         |ids AS (SELECT (r*211+7) % (SELECT max(c_custkey)+1 FROM customer) AS tid
         |        FROM range(100) t(r)),
         |h1 AS (SELECT i.tid, f.dst FROM ids i JOIN fr f ON f.src = i.tid),
         |h2 AS (SELECT h1.tid, f2.dst FROM h1 JOIN fr f2 ON f2.src = h1.dst)
         |SELECT tid AS src, count(DISTINCT dst) AS n_nodes
         |FROM (SELECT * FROM h1 UNION ALL SELECT * FROM h2)
         |GROUP BY tid ORDER BY src""".stripMargin),

    // ---- write/update group (pokec.py:613-679, 816-831) — executed as
    // one batched statement (BASELINE.md: batch the write groups), then
    // the post-state is the oracle-checked result --------------------
    QueryDef(
      "pokec_create_edge",
      (s, dir) => {
        val r = Cypher.execute(
          s,
          g(s, dir),
          """MATCH (a:User), (b:User)
            |WHERE b.id = a.id + 3 AND a.id < 200
            |CREATE (a)-[:TempEdge]->(b)""".stripMargin)
        Cypher.run(
          s,
          r.graph,
          "MATCH (:User)-[e:TempEdge]->(:User) RETURN count(*) AS n")
      },
      Some(s"""WITH $prelude
              |SELECT count(*) AS n FROM u a JOIN u b ON b.id = a.id + 3
              |WHERE a.id < 200""".stripMargin)),

    QueryDef(
      "pokec_create_vertex",
      (s, dir) => {
        val r = Cypher.execute(
          s, g(s, dir), "CREATE (n:UserTemp {id: 99999})")
        Cypher.run(
          s, r.graph,
          "MATCH (n:UserTemp) RETURN count(*) AS n, min(n.id) AS id")
      },
      Some("SELECT CAST(1 AS BIGINT) AS n, CAST(99999 AS BIGINT) AS id")),

    QueryDef(
      "pokec_create_pattern",
      (s, dir) => {
        val r = Cypher.execute(s, g(s, dir), "CREATE ()-[:TempEdge2]->()")
        Cypher.run(s, r.graph, "MATCH ()-[e:TempEdge2]->() RETURN count(*) AS n")
      },
      Some("SELECT CAST(1 AS BIGINT) AS n")),

    QueryDef(
      "pokec_create_vertex_big",
      (s, dir) => {
        val r = Cypher.execute(
          s,
          g(s, dir),
          """CREATE (:L1:L2:L3:L4:L5:L6:L7 {
            |  p1: true, p2: 42,
            |  p3: "Here is some text that is not extremely short",
            |  p4: "Short text", p5: 234.434, p6: 11.11, p7: false})""".stripMargin)
        Cypher.run(
          s,
          r.graph,
          """MATCH (n:L4)
            |RETURN count(*) AS n_nodes, min(n.p2) AS p2, min(n.p4) AS p4,
            |       round(min(n.p5), 3) AS p5""".stripMargin)
      },
      Some("""SELECT CAST(1 AS BIGINT) AS n_nodes, CAST(42 AS BIGINT) AS p2,
             |'Short text' AS p4, 234.434 AS p5""".stripMargin)),

    QueryDef(
      "pokec_update_property",
      (s, dir) => {
        val r = Cypher.execute(
          s,
          g(s, dir),
          "MATCH (n:User) WHERE n.id < 300 SET n.property = -1")
        Cypher.run(
          s,
          r.graph,
          """MATCH (n:User) WHERE n.property = -1
            |RETURN count(*) AS n, sum(n.property) AS total""".stripMargin)
      },
      Some("""SELECT count(*) AS n, -count(*) AS total
             |FROM (SELECT c_custkey FROM customer WHERE c_custkey < 300)""".stripMargin))
  )
}
