package graft.queries

import org.apache.spark.sql.SparkSession

import graft.core.GraphState
import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Round-13 surface: the `igraphalg` MAGE module, the deterministic
  * `node_classification` variant, `xml_module.parse`, and the
  * `export_util.json` / `import_util.json` roundtrip (reference
  * `src/mage/python/igraphalg.py`, `node_classification.py`,
  * `xml_module.py`, `export_util.py`, `import_util.py`). */
object Round13Queries {

  private def g(s: SparkSession, dir: String) = TpchGraphLoader(s, dir)

  private def empty = GraphState(Map.empty, Map.empty)

  private val M = 281474976710656L // 2^48 — id offset within a namespace

  /** Weighted triangle for the igraph gates: a→b (1), b→c (2), a→c (5);
    * returns (graph, Seq(idA, idB, idC)). */
  private def igGraph(s: SparkSession, dir: String) = {
    val e1 = Cypher.execute(
      s,
      g(s, dir),
      """CREATE (a:IgV {k: 0})-[:IgE {w: 1.0}]->(b:IgV {k: 1}),
        |       (b)-[:IgE {w: 2.0}]->(c:IgV {k: 2}),
        |       (a)-[:IgE {w: 5.0}]->(c)""".stripMargin)
    val ids = Cypher
      .run(s, e1.graph, "MATCH (n:IgV) RETURN id(n) AS i ORDER BY n.k")
      .collect().map(_.getLong(0))
    (e1.graph, ids)
  }

  val defs: Seq[QueryDef] = Seq(

    // igraphalg.shortest_path_length: a→c weighted = 3.0 via b (the
    // direct edge costs 5) — distributed single-seed relaxation
    QueryDef(
      "call_ig_spl",
      (s, dir) => {
        val (gr, ids) = igGraph(s, dir)
        Cypher.run(
          s, gr,
          s"""CALL igraphalg.shortest_path_length(
             |  ${ids(0)}, ${ids(2)}, 'w', true, {type: 'IgE'})
             |YIELD length RETURN length""".stripMargin)
      },
      Some("SELECT 3.0 AS length")),

    // igraphalg.all_shortest_path_lengths: undirected unit triangle →
    // the full 3×3 matrix (diagonal 0, everything else 1)
    QueryDef(
      "call_ig_apsp",
      (s, dir) => {
        val (gr, _) = igGraph(s, dir)
        Cypher.run(
          s, gr,
          s"""CALL igraphalg.all_shortest_path_lengths(
             |  null, false, {label: 'IgV', type: 'IgE'})
             |YIELD src_node, dest_node, length
             |RETURN src_node % $M AS a, dest_node % $M AS b, length
             |ORDER BY a, b""".stripMargin)
      },
      Some("""SELECT a, b, CASE WHEN a = b THEN 0.0 ELSE 1.0 END AS length
             |FROM (SELECT CAST(x AS BIGINT) AS a FROM generate_series(0, 2) t(x)),
             |     (SELECT CAST(y AS BIGINT) AS b FROM generate_series(0, 2) u(y))
             |ORDER BY a, b""".stripMargin)),

    // igraphalg.get_shortest_path: the weighted a→b→c walk, as ids
    QueryDef(
      "call_ig_path",
      (s, dir) => {
        val (gr, ids) = igGraph(s, dir)
        Cypher.run(
          s, gr,
          s"""CALL igraphalg.get_shortest_path(
             |  ${ids(0)}, ${ids(2)}, 'w', true, {type: 'IgE'})
             |YIELD path
             |RETURN size(path) AS n, path[0] % $M AS p0,
             |       path[1] % $M AS p1, path[2] % $M AS p2""".stripMargin)
      },
      Some("""SELECT CAST(3 AS BIGINT) AS n, CAST(0 AS BIGINT) AS p0,
             |       CAST(1 AS BIGINT) AS p1, CAST(2 AS BIGINT) AS p2""".stripMargin)),

    // igraphalg.get_all_simple_paths a→c: the direct hop and the detour
    QueryDef(
      "call_ig_simple",
      (s, dir) => {
        val (gr, ids) = igGraph(s, dir)
        Cypher.run(
          s, gr,
          s"""CALL igraphalg.get_all_simple_paths(
             |  ${ids(0)}, ${ids(2)}, -1, {type: 'IgE'})
             |YIELD path
             |RETURN size(path) AS n,
             |       reduce(acc = 0, x IN path | acc * 10 + x % $M) AS enc
             |ORDER BY n""".stripMargin)
      },
      Some("""SELECT * FROM (VALUES (CAST(2 AS BIGINT), CAST(2 AS BIGINT)),
             |                      (3, 12)) t(n, enc) ORDER BY n""".stripMargin)),

    // igraphalg.topological_sort, both modes ('in' = reversed 'out')
    QueryDef(
      "call_ig_topo",
      (s, dir) => {
        val e1 = Cypher.execute(
          s,
          g(s, dir),
          "CREATE (d0:IgD)-[:IgDE]->(d1:IgD)-[:IgDE]->(d2:IgD)")
        Cypher.run(
          s, e1.graph,
          s"""CALL igraphalg.topological_sort(
             |  'in', {label: 'IgD', type: 'IgDE'}) YIELD nodes
             |RETURN nodes[0] % $M AS p0, nodes[1] % $M AS p1,
             |       nodes[2] % $M AS p2""".stripMargin)
      },
      Some("""SELECT CAST(2 AS BIGINT) AS p0, CAST(1 AS BIGINT) AS p1,
             |       CAST(0 AS BIGINT) AS p2""".stripMargin)),

    // igraphalg.contains_cycle: the scoped IgD chain is acyclic, the
    // whole loader graph (KNOWS ring) is not
    QueryDef(
      "call_ig_cycle",
      (s, dir) => {
        val e1 = Cypher.execute(
          s,
          g(s, dir),
          "CREATE (d0:IgD2)-[:IgDE2]->(d1:IgD2)-[:IgDE2]->(d2:IgD2)")
        Cypher.run(
          s, e1.graph,
          """CALL igraphalg.contains_cycle({label: 'IgD2', type: 'IgDE2'})
            |YIELD contains_cycle RETURN contains_cycle""".stripMargin)
      },
      Some("SELECT false AS contains_cycle")),

    // igraphalg.spanning_tree: Kruskal keeps (a,b,1) and (b,c,2),
    // drops the heavy (a,c,5) closing edge
    QueryDef(
      "call_ig_mst",
      (s, dir) => {
        val (gr, _) = igGraph(s, dir)
        Cypher.run(
          s, gr,
          s"""CALL igraphalg.spanning_tree('w', false, {type: 'IgE'})
             |YIELD tree
             |RETURN size(tree) AS n,
             |       reduce(acc = 0, p IN tree |
             |              acc * 100 + (p[0] % $M) * 10 + p[1] % $M) AS enc""".stripMargin)
      },
      Some("""SELECT CAST(2 AS BIGINT) AS n, CAST(112 AS BIGINT) AS enc""".stripMargin)),

    // igraphalg.mincut: max-flow a→c = 6 saturates both of a's out
    // edges, so the source partition is {a} (partition 0)
    QueryDef(
      "call_ig_mincut",
      (s, dir) => {
        val (gr, ids) = igGraph(s, dir)
        Cypher.run(
          s, gr,
          s"""CALL igraphalg.mincut(
             |  ${ids(0)}, ${ids(2)}, 'w', true, {label: 'IgV', type: 'IgE'})
             |YIELD node, partition_id
             |RETURN node % $M AS nk, partition_id ORDER BY nk""".stripMargin)
      },
      Some("""SELECT * FROM (VALUES (CAST(0 AS BIGINT), 0),
             |                      (1, 1), (2, 1)) t(nk, partition_id)
             |ORDER BY nk""".stripMargin)),

    // node_classification: two well-separated feature clusters,
    // split_ratio 1.0 (deterministic full-train) → loss 0 at every
    // logged epoch; nearest-centroid predicts the held-out-style probe
    QueryDef(
      "call_nc_train",
      (s, dir) => {
        var gr = g(s, dir)
        gr = Cypher.execute(
          s, gr,
          """CREATE (:NcV {features: [0.0, 0.0], class: 0}),
            |       (:NcV {features: [0.1, 0.2], class: 0}),
            |       (:NcV {features: [0.2, 0.1], class: 0}),
            |       (:NcV {features: [5.0, 5.0], class: 1}),
            |       (:NcV {features: [5.1, 4.9], class: 1}),
            |       (:NcV {features: [4.9, 5.2], class: 1})""".stripMargin).graph
        Cypher.run(s, gr, "CALL node_classification.reset() YIELD status RETURN 1").collect()
        Cypher.run(
          s, gr,
          """CALL node_classification.set_model_parameters(
            |  {observed_attribute: 'NcV', split_ratio: 1.0,
            |   console_log_freq: 2}) YIELD split_ratio RETURN 1""".stripMargin)
          .collect()
        Cypher.run(
          s, gr,
          """CALL node_classification.train(4)
            |YIELD epoch, loss, val_loss
            |RETURN epoch, loss, val_loss ORDER BY epoch""".stripMargin)
      },
      Some("""SELECT * FROM (VALUES (CAST(2 AS BIGINT), 0.0, 0.0),
             |                      (4, 0.0, 0.0)) t(epoch, loss, val_loss)
             |ORDER BY epoch""".stripMargin)),

    // predict after train: nearest centroid recovers each cluster's class
    QueryDef(
      "call_nc_predict",
      (s, dir) => {
        var gr = g(s, dir)
        gr = Cypher.execute(
          s, gr,
          """CREATE (:NcP {features: [0.0, 0.0], class: 0, probe: 1}),
            |       (:NcP {features: [0.2, 0.1], class: 0}),
            |       (:NcP {features: [5.0, 5.0], class: 1}),
            |       (:NcP {features: [5.2, 5.1], class: 1, probe: 2})""".stripMargin).graph
        Cypher.run(s, gr, "CALL node_classification.reset() YIELD status RETURN 1").collect()
        Cypher.run(
          s, gr,
          """CALL node_classification.set_model_parameters(
            |  {observed_attribute: 'NcP', split_ratio: 1.0})
            |YIELD split_ratio RETURN 1""".stripMargin).collect()
        Cypher.run(s, gr, "CALL node_classification.train(1) YIELD loss RETURN 1")
          .collect()
        val ids = Cypher.run(
          s, gr,
          "MATCH (n:NcP) WHERE n.probe IS NOT NULL " +
            "RETURN id(n) AS i ORDER BY n.probe").collect().map(_.getLong(0))
        val r1 = Cypher.run(
          s, gr,
          s"CALL node_classification.predict(${ids(0)}) " +
            "YIELD predicted_class RETURN predicted_class").collect()
        val r2 = Cypher.run(
          s, gr,
          s"CALL node_classification.predict(${ids(1)}) " +
            "YIELD predicted_class RETURN predicted_class").collect()
        import s.implicits._
        Seq((r1.head.getLong(0), r2.head.getLong(0))).toDF("c0", "c1")
      },
      Some("SELECT CAST(0 AS BIGINT) AS c0, CAST(1 AS BIGINT) AS c1")),

    // xml_module.parse: attributes + _text + _children, reference shape
    QueryDef(
      "call_xml_parse",
      (s, dir) => {
        val gr = g(s, dir)
        Cypher.run(
          s, gr,
          """CALL xml_module.parse('<a x="1">hi<b y="2"/><b/></a>')
            |YIELD result
            |RETURN result._type AS t, result.x AS x, result._text AS tx,
            |       size(result._children) AS nc,
            |       result._children[0].y AS y0""".stripMargin)
      },
      Some("""SELECT 'a' AS t, '1' AS x, 'hi' AS tx,
             |       CAST(2 AS BIGINT) AS nc, '2' AS y0""".stripMargin)),

    // export_util.json → import_util.json roundtrip on a fresh graph:
    // the re-imported copy has the same labels / properties / topology
    // under remapped ids
    QueryDef(
      "call_export_roundtrip",
      (s, dir) => {
        val path = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          "graft_export_gate.json").getAbsolutePath
        val src = Cypher.execute(
          s, empty,
          """CREATE (a:ExV {name: 'a', k: 1})-[:ExE {w: 2}]->(b:ExV {name: 'b'}),
            |       (b)-[:ExE]->(c:ExOther {name: 'c'})""".stripMargin).graph
        Cypher.run(
          s, src,
          s"CALL export_util.json('$path') YIELD path RETURN path").collect()
        val imp = Cypher.execute(
          s, empty,
          s"CALL import_util.json('$path')").graph
        Cypher.run(
          s, imp,
          """MATCH (n) OPTIONAL MATCH (n)-[r:ExE]->(m)
            |RETURN n.name AS name, labels(n)[0] AS lbl,
            |       count(r) AS deg, sum(coalesce(r.w, 0)) AS w
            |ORDER BY name""".stripMargin)
      },
      Some("""SELECT * FROM (VALUES ('a', 'ExV', CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
             |                      ('b', 'ExV', 1, 0),
             |                      ('c', 'ExOther', 0, 0)) t(name, lbl, deg, w)
             |ORDER BY name""".stripMargin)),

    // meta_util.schema: label-set / (src labels, type, dst labels)
    // schema maps with entity + property counts
    QueryDef(
      "call_meta_schema",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (a:MuA {x: 1})-[:MuT {w: 5}]->(b:MuB),
            |       (a2:MuA)-[:MuT]->(b2:MuB {y: 'z'})""".stripMargin).graph
        Cypher.run(
          s, gr,
          """CALL meta_util.schema(true) YIELD nodes, relationships
            |RETURN size(nodes) AS nn, size(relationships) AS nr,
            |       nodes[0].labels[0] AS l0,
            |       nodes[0].properties['count'] AS c0,
            |       nodes[0].properties['x'] AS px,
            |       relationships[0].label AS rl,
            |       relationships[0].properties['count'] AS rc,
            |       relationships[0].properties['w'] AS rw""".stripMargin)
      },
      Some("""SELECT CAST(2 AS BIGINT) AS nn, CAST(1 AS BIGINT) AS nr,
             |       'MuA' AS l0, CAST(2 AS BIGINT) AS c0,
             |       CAST(1 AS BIGINT) AS px, 'MuT' AS rl,
             |       CAST(2 AS BIGINT) AS rc, CAST(1 AS BIGINT) AS rw""".stripMargin)),

    // llm_util.schema prompt-ready string + llm.complete stub
    QueryDef(
      "call_llm_schema",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (a:LlA {x: 1, s: 'v'})-[:LlT {w: 1.5}]->(b:LlB)""".stripMargin).graph
        Cypher.run(
          s, gr,
          """CALL llm_util.schema('prompt_ready') YIELD schema
            |RETURN schema CONTAINS
            |  "Node name: 'LlA', Node properties: [{'property': 's', 'type': 'str'}, {'property': 'x', 'type': 'int'}]"
            |  AS np,
            |       schema CONTAINS
            |  "Relationship name: 'LlT', Relationship properties: [{'property': 'w', 'type': 'float'}]"
            |  AS rp,
            |       schema CONTAINS "['(:LlA)-[:LlT]->(:LlB)']" AS rel,
            |       llm.complete(' alpha beta  gamma ') AS comp""".stripMargin)
      },
      Some("""SELECT true AS np, true AS rp, true AS rel,
             |       'alpha beta gamma' AS comp""".stripMargin)),

    // csv_utils.create_csv_file → LOAD CSV → delete_csv_file roundtrip
    QueryDef(
      "call_csv_utils",
      (s, dir) => {
        val path = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          "graft_csv_utils_gate.csv").getAbsolutePath
        val gr = g(s, dir)
        Cypher.run(
          s, gr,
          s"""CALL csv_utils.create_csv_file('$path', 'a,b\\n1,x\\n', false)
             |YIELD filepath RETURN filepath""".stripMargin).collect()
        Cypher.run(
          s, gr,
          s"""CALL csv_utils.create_csv_file('$path', '2,y\\n', true)
             |YIELD filepath RETURN filepath""".stripMargin).collect()
        val out = Cypher.run(
          s, gr,
          s"""LOAD CSV FROM '$path' WITH HEADER AS row
             |RETURN row.a AS a, row.b AS b ORDER BY a""".stripMargin)
          .collect()
        Cypher.run(
          s, gr,
          s"CALL csv_utils.delete_csv_file('$path') YIELD filepath RETURN 1")
          .collect()
        import s.implicits._
        out.map(r => (r.getString(0), r.getString(1))).toSeq.toDF("a", "b")
      },
      Some("""SELECT * FROM (VALUES ('1', 'x'), ('2', 'y')) t(a, b)
             |ORDER BY a""".stripMargin)),

    // CREATE TRIGGER DDL (MemgraphCypher.g4:712): the registered
    // statement fires per ingest batch with the predefined
    // `createdVertices` variable bound from the batch diff — one audit
    // node per created vertex
    QueryDef(
      "cy_create_trigger",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import graft.streaming.GraphStream
        import graft.operators.Mutations
        val uid = java.util.UUID.randomUUID()
        val src = s"/root/repo/target/ddl_trig/src_$uid"
        val ckpt = s"/root/repo/target/ddl_trig/ckpt_$uid"
        import s.implicits._
        val ev = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
        ev.coalesce(1).write.json(src)
        GraphStream.triggerRegistry.remove("r13_audit")
        val g0 = Cypher.execute(
          s, empty,
          """CREATE TRIGGER r13_audit ON () CREATE AFTER COMMIT EXECUTE
            |UNWIND createdVertices AS v
            |CREATE (:Trig13 {src: v.id % 281474976710656})""".stripMargin)
          .graph
        try {
          val transform: GraphStream.Transformation = (gg, batch) => {
            val rows = batch.select(
              (lit(963L << 48) + col("k")).as("_id"),
              array(lit("Ingested13")).as("_labels"),
              col("v"))
            GraphStream.IngestResult(
              Mutations.createNodes(gg, "Ingested13", rows),
              createdNodes = Map("Ingested13" -> rows))
          }
          val gF = GraphStream.ingestAvailable(
            s, src, ev.schema, "json", g0, transform, Nil, ckpt)
          Cypher.run(
            s, gF,
            """MATCH (t:Trig13)
              |RETURN count(*) AS n, sum(t.src) AS ks""".stripMargin)
        } finally {
          Cypher.execute(s, g0, "DROP TRIGGER r13_audit")
          ()
        }
      },
      Some("""SELECT CAST(3 AS BIGINT) AS n, CAST(6 AS BIGINT) AS ks""".stripMargin)),

    // CREATE STREAM DDL (StreamQuery ast.hpp:3741): registry + SHOW
    // STREAMS surface. START now runs a REAL consumer pass (r14:
    // GraphStream.startStored) — a broker-backed spec can't start in this
    // environment, so this gate pins the declarative surface and the
    // not-yet-running status; the ingestion proof is cy_stream_ingest.
    QueryDef(
      "cy_create_stream",
      (s, dir) => {
        import graft.streaming.GraphStream
        GraphStream.streamRegistry.remove("r13_stream")
        val g1 = Cypher.execute(
          s, empty,
          """CREATE KAFKA STREAM r13_stream
            |TOPICS orders,events
            |TRANSFORM my_mod.my_transform
            |BOOTSTRAP_SERVERS 'localhost:9092'
            |BATCH_INTERVAL 100 BATCH_SIZE 50
            |CONSUMER_GROUP cg1""".stripMargin).graph
        try
          Cypher.run(
            s, g1,
            """SHOW STREAMS""".stripMargin)
            .filter(org.apache.spark.sql.functions.col("name") === "r13_stream")
            .select("name", "type", "batch_interval", "batch_size",
              "transformation_name", "is running")
        finally {
          Cypher.execute(s, g1, "DROP STREAM r13_stream")
          ()
        }
      },
      Some("""SELECT 'r13_stream' AS name, 'kafka' AS type,
             |       CAST(100 AS BIGINT) AS batch_interval,
             |       CAST(50 AS BIGINT) AS batch_size,
             |       'my_mod.my_transform' AS transformation_name,
             |       false AS "is running"""".stripMargin))
  )
}
