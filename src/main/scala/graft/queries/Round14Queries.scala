package graft.queries

import org.apache.spark.sql.SparkSession

import graft.core.GraphState
import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Round-14 surface: the deterministic `tgn.*` variant and the `gnn.*`
  * PyG / TF-GNN export-import module (reference `src/mage/python/tgn.py`,
  * `gnn.py`). */
object Round14Queries {

  private def empty = GraphState(Map.empty, Map.empty)

  /** 4-node / 6-edge temporal toy graph for the tgn gates. */
  private def tgnGraph(s: SparkSession) =
    Cypher.execute(
      s, empty,
      """CREATE (a:TgV {k: 0}), (b:TgV {k: 1}), (c:TgV {k: 2}),
        |       (d:TgV {k: 3}),
        |       (a)-[:TgE {ts: 1}]->(b), (b)-[:TgE {ts: 2}]->(c),
        |       (c)-[:TgE {ts: 3}]->(d), (d)-[:TgE {ts: 4}]->(a),
        |       (a)-[:TgE {ts: 5}]->(c), (b)-[:TgE {ts: 6}]->(d)""".stripMargin)
      .graph

  private val setParams =
    """CALL tgn.set_params({learning_type: 'self_supervised',
      |  batch_size: 2, num_of_layers: 1, layer_type: 'graph_attn',
      |  memory_dimension: 8, time_dimension: 8, num_edge_features: 4,
      |  num_node_features: 4, message_dimension: 8, num_neighbors: 4,
      |  edge_message_function_type: 'identity',
      |  message_aggregator_type: 'mean', memory_updater_type: 'gru'})""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // tgn.train_and_eval over a 4/2 train-eval split, batch_size 2, two
    // epochs: 2 train + 1 eval batch per epoch, precision bounded [0,1]
    // and identical across epochs (the deterministic variant has no
    // gradient path — reference tgn.py:862-911 yield shape)
    QueryDef(
      "call_tgn_train",
      (s, dir) => {
        val gr = tgnGraph(s)
        Cypher.run(s, gr, s"$setParams YIELD * RETURN count(*) AS c")
        Cypher.run(
          s, gr,
          """MATCH ()-[r:TgE]->() WHERE r.ts <= 4
            |WITH collect(id(r)) AS ids CALL tgn.update(ids)
            |YIELD * RETURN 1""".stripMargin)
        Cypher.run(s, gr, "CALL tgn.set_eval() YIELD message RETURN message")
        Cypher.run(
          s, gr,
          """MATCH ()-[r:TgE]->() WHERE r.ts > 4
            |WITH collect(id(r)) AS ids CALL tgn.update(ids)
            |YIELD * RETURN 1""".stripMargin)
        Cypher.run(
          s, gr,
          """CALL tgn.train_and_eval(2)
            |YIELD epoch_num, batch_num, precision, batch_type
            |RETURN epoch_num, batch_num, batch_type,
            |       precision >= 0 AND precision <= 1 AS ok
            |ORDER BY epoch_num, batch_type, batch_num""".stripMargin)
      },
      // 8 records: the two update() calls each fill a batch (one Train,
      // one post-set_eval Eval — tgn.py:1012 processes when the buffer
      // reaches batch_size and get_output_records returns EVERYTHING),
      // plus 2 epochs × (2 train + 1 eval) from train_and_eval
      Some("""SELECT CAST(e AS BIGINT) AS epoch_num,
             |       CAST(b AS BIGINT) AS batch_num,
             |       t AS batch_type, true AS ok
             |FROM (VALUES (0, 0, 'Eval'), (0, 1, 'Eval'),
             |             (0, 0, 'Train'), (0, 0, 'Train'), (0, 1, 'Train'),
             |             (1, 0, 'Eval'), (1, 0, 'Train'), (1, 1, 'Train'))
             |  v(e, b, t)
             |ORDER BY epoch_num, batch_type, batch_num""".stripMargin)),

    // tgn.get: one embedding per node, memory_dimension wide, unit norm
    QueryDef(
      "call_tgn_get",
      (s, dir) => {
        val gr = tgnGraph(s)
        Cypher.run(s, gr, s"$setParams YIELD * RETURN count(*) AS c")
        Cypher.run(
          s, gr,
          """CALL tgn.get() YIELD node, embedding
            |RETURN count(*) AS n, min(size(embedding)) AS dlo,
            |       max(size(embedding)) AS dhi""".stripMargin)
      },
      Some("SELECT CAST(4 AS BIGINT) AS n, CAST(8 AS BIGINT) AS dlo, " +
        "CAST(8 AS BIGINT) AS dhi")),

    // tgn.predict_link_score: sigmoid(dot) of the endpoint embeddings —
    // a proper probability (reference tgn.py:834-860)
    QueryDef(
      "call_tgn_link",
      (s, dir) => {
        val gr = tgnGraph(s)
        Cypher.run(s, gr, s"$setParams YIELD * RETURN count(*) AS c")
        val ids = Cypher
          .run(s, gr, "MATCH (n:TgV) RETURN id(n) AS i ORDER BY n.k LIMIT 2")
          .collect().map(_.getLong(0))
        Cypher.run(
          s, gr,
          s"""CALL tgn.predict_link_score(${ids(0)}, ${ids(1)})
             |YIELD prediction
             |RETURN prediction > 0 AND prediction < 1 AS ok""".stripMargin)
      },
      Some("SELECT true AS ok")),

    // gnn.pyg_export → gnn.pyg_import roundtrip: 3 nodes (feature f,
    // class y) + 2 weighted edges exported to PyG JSON, re-imported into
    // an empty graph — counts, labels, and property values survive
    QueryDef(
      "call_gnn_pyg_roundtrip",
      (s, dir) => {
        val src = Cypher.execute(
          s, empty,
          """CREATE (a:GnV {f: 1.0, cls: 7}), (b:GnV {f: 2.0, cls: 8}),
            |       (c:GnV {f: 3.0, cls: 9}),
            |       (a)-[:GnE {w: 0.5}]->(b),
            |       (b)-[:GnE {w: 1.5}]->(c)""".stripMargin).graph
        val json = Cypher.run(
          s, src,
          "CALL gnn.pyg_export(['f'], ['w'], 'cls') YIELD json_data " +
            "RETURN json_data").collect()(0).getString(0)
        val imp = Cypher.execute(
          s, empty,
          "CALL gnn.pyg_import($j, 'N', 'R', ['f'], ['w']) " +
            "YIELD nodes_created, edges_created RETURN *",
          Map("j" -> json))
        Cypher.run(
          s, imp.graph,
          """MATCH (n:GnV) OPTIONAL MATCH ()-[r]->()
            |RETURN count(DISTINCT n) AS nodes, count(DISTINCT r) AS edges,
            |       sum(DISTINCT n.f) AS fsum, sum(DISTINCT n.y) AS ysum
            |""".stripMargin)
      },
      Some("SELECT CAST(3 AS BIGINT) AS nodes, CAST(2 AS BIGINT) AS edges," +
        " 6.0 AS fsum, CAST(24 AS BIGINT) AS ysum")),

    // gnn.tf_export → gnn.tf_import roundtrip on the TF-GNN schema+graph
    // payload (node/edge sets, adjacency indices)
    QueryDef(
      "call_gnn_tf_roundtrip",
      (s, dir) => {
        val src = Cypher.execute(
          s, empty,
          """CREATE (a:TfV {score: 10}), (b:TfV {score: 20}),
            |       (a)-[:TfE {w: 2.0}]->(b)""".stripMargin).graph
        val json = Cypher.run(
          s, src,
          "CALL gnn.tf_export(['score'], ['w'], 'users', 'links') " +
            "YIELD json_data RETURN json_data").collect()(0).getString(0)
        val imp = Cypher.execute(
          s, empty,
          "CALL gnn.tf_import($j, 'TfGnnNode', 'CONNECTS') " +
            "YIELD nodes_created, edges_created RETURN *",
          Map("j" -> json))
        Cypher.run(
          s, imp.graph,
          """MATCH (n:TfGnnNode) OPTIONAL MATCH ()-[r:CONNECTS]->()
            |RETURN count(DISTINCT n) AS nodes, count(DISTINCT r) AS edges,
            |       sum(DISTINCT n.score) AS ssum""".stripMargin)
      },
      Some("SELECT CAST(2 AS BIGINT) AS nodes, CAST(1 AS BIGINT) AS edges," +
        " CAST(30 AS BIGINT) AS ssum")),

    // START STREAM runs a REAL consumer pass: a file-backed stream
    // declared via DDL, a registered TRANSFORM turning source rows into
    // CREATE statements, and the transformed rows visible to a MATCH
    // afterwards (reference streams.cpp:520-567 consumer loop)
    QueryDef(
      "cy_stream_ingest",
      (s, dir) => {
        import graft.streaming.GraphStream
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-ddl-stream").toString
        java.nio.file.Files.write(
          java.nio.file.Paths.get(tmp, "batch1.json"),
          "{\"sku\": 1, \"name\": \"alpha\"}\n{\"sku\": 2, \"name\": \"beta\"}\n"
            .getBytes("UTF-8"))
        GraphStream.streamRegistry.remove("r14_stream")
        GraphStream.transformRegistry.put(
          "my_mod.rows_to_nodes",
          (sp, batch) =>
            batch.select("sku", "name").collect().toSeq.map(r =>
              ("CREATE (:StreamedItem {sku: $sku, name: $name})",
                Map[String, Any](
                  "sku" -> r.getLong(0), "name" -> r.getString(1)))))
        val g1 = Cypher.execute(
          s, empty,
          s"""CREATE FILE STREAM r14_stream
             |PATH '$tmp' FORMAT 'json'
             |SCHEMA 'sku BIGINT, name STRING'
             |TRANSFORM my_mod.rows_to_nodes
             |BATCH_SIZE 10""".stripMargin).graph
        val g2 = Cypher.execute(s, g1, "START STREAM r14_stream").graph
        try
          Cypher.run(
            s, g2,
            """MATCH (n:StreamedItem)
              |RETURN n.sku AS sku, n.name AS name ORDER BY sku""".stripMargin)
        finally {
          Cypher.execute(s, g2, "DROP STREAM r14_stream")
          ()
        }
      },
      Some("""SELECT CAST(1 AS BIGINT) AS sku, 'alpha' AS name
             |UNION ALL SELECT CAST(2 AS BIGINT), 'beta'
             |ORDER BY sku""".stripMargin)),

    // CHECK STREAM dry-runs the transform: the would-be statements and
    // raw payloads come back, the graph stays untouched
    // (streams.cpp:832-889; yield header interpreter.cpp:3277)
    QueryDef(
      "cy_check_stream",
      (s, dir) => {
        import graft.streaming.GraphStream
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-ddl-check").toString
        java.nio.file.Files.write(
          java.nio.file.Paths.get(tmp, "b.json"),
          "{\"sku\": 7, \"name\": \"gamma\"}\n".getBytes("UTF-8"))
        GraphStream.streamRegistry.remove("r14_check")
        GraphStream.transformRegistry.put(
          "my_mod.rows_to_nodes_chk",
          (sp, batch) =>
            batch.select("sku").collect().toSeq.map(r =>
              (s"CREATE (:ChkItem {sku: ${r.getLong(0)}})",
                Map.empty[String, Any])))
        val g1 = Cypher.execute(
          s, empty,
          s"""CREATE FILE STREAM r14_check
             |PATH '$tmp' FORMAT 'json'
             |SCHEMA 'sku BIGINT, name STRING'
             |TRANSFORM my_mod.rows_to_nodes_chk""".stripMargin).graph
        val checked = Cypher.execute(s, g1, "CHECK STREAM r14_check")
        // nothing committed: the graph has no ChkItem nodes
        val untouched = Cypher
          .run(s, checked.graph,
            "OPTIONAL MATCH (n:ChkItem) RETURN count(n) AS c")
          .collect()(0).getLong(0)
        require(untouched == 0L, "CHECK STREAM must not commit")
        try {
          val spark = s
          import spark.implicits._
          checked.result
            .select(
              org.apache.spark.sql.functions.explode(
                org.apache.spark.sql.functions.col("queries")).as("q"))
            .select("q")
        } finally {
          Cypher.execute(s, g1, "DROP STREAM r14_check")
          ()
        }
      },
      Some("SELECT 'CREATE (:ChkItem {sku: 7})' AS q")),

    // disconnected two-pattern MATCH: the cheap pattern plans first and
    // the small label scan broadcasts into the Cartesian (reference
    // variable_start_planner.hpp:161-204 costs per-pattern starts) —
    // plan shape pinned by StartChoiceSpec
    QueryDef(
      "cy_two_pattern_disconnected",
      (s, dir) => Cypher.run(
        s, TpchGraphLoader(s, dir),
        """MATCH (l:Lineitem), (r:Region)
          |RETURN r.r_name AS region, count(*) AS n ORDER BY region""".stripMargin),
      Some("""SELECT r.r_name AS region,
             |       (SELECT count(*) FROM lineitem) AS n
             |FROM region r ORDER BY region""".stripMargin))
  )
}
