package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cypher.Cypher
import graft.sources.TpchGraphLoader

/** Round-9 surface: index DDL registry + SHOW INDEX INFO, registry-backed
  * text/vector search procedures (`text_search.*` / `vector_search.*`),
  * schema descriptions, server-side parameters, and the EXPLAIN/PROFILE
  * statement surface — each as Cypher text with a DuckDB oracle (or a
  * rows-only smoke where the output is engine-specific).
  */
object Round9Queries {

  private def g(s: SparkSession, dir: String) = TpchGraphLoader(s, dir)

  val defs: Seq[QueryDef] = Seq(

    // Index DDL + SHOW INDEX INFO (interpreter.cpp SHOW INDEX; registry
    // counts computed over the live frames). Composite + named-text
    // entries; the list-valued property cell is scalarized for the
    // hash compare.
    QueryDef(
      "cy_index_info",
      (s, dir) => {
        val g1 = Cypher
          .execute(s, g(s, dir), "CREATE INDEX ON :Customer(c_name)")
          .graph
        val g2 = Cypher
          .execute(
            s, g1,
            "CREATE TEXT INDEX custText ON :Customer(c_name, c_mktsegment)")
          .graph
        Cypher
          .run(s, g2, "SHOW INDEX INFO")
          .select(
            col("index type").as("kind"),
            col("label"),
            concat_ws(",", col("property")).as("props"),
            col("count"))
          .orderBy("kind")
      },
      Some("""SELECT * FROM (VALUES
             |  ('label+property', 'Customer', 'c_name',
             |   (SELECT count(*) FROM customer)),
             |  ('label_text (name: custText)', 'Customer',
             |   'c_name,c_mktsegment', (SELECT count(*) FROM customer)))
             |  AS t(kind, label, props, count)
             |ORDER BY kind""".stripMargin)),

    // Registry-backed vector search (vector_search.search over a named
    // index; usearch l2sq metric, f32 storage — exact on these values).
    QueryDef(
      "cy_vector_index_search",
      (s, dir) => {
        val g1 = Cypher
          .execute(
            s, g(s, dir),
            "CREATE VECTOR INDEX vs ON :VecNode(emb) WITH CONFIG " +
              "{'dimension': 2, 'capacity': 10}")
          .graph
        val g2 = Cypher
          .execute(
            s, g1,
            """CREATE (:VecNode {emb: [1.0, 1.0], tag: 'a'}),
              |       (:VecNode {emb: [1.0, 2.0], tag: 'b'}),
              |       (:VecNode {emb: [10.0, 10.0], tag: 'c'})""".stripMargin)
          .graph
        Cypher.run(
          s, g2,
          """CALL vector_search.search('vs', 2, [1.0, 1.0])
            |YIELD distance, node, similarity
            |RETURN node.tag AS tag, distance, similarity
            |ORDER BY distance""".stripMargin)
      },
      Some("""SELECT * FROM (VALUES
             |  ('a', 0.0, 1.0),
             |  ('b', 1.0, 0.5)) AS t(tag, distance, similarity)
             |ORDER BY distance""".stripMargin)),

    // Registry-backed text search (tantivy-style data.<prop>:term query
    // over a named index).
    QueryDef(
      "cy_text_index_search",
      (s, dir) => {
        val g1 = Cypher
          .execute(s, g(s, dir), "CREATE TEXT INDEX ntext ON :Nation")
          .graph
        // nation names are NATION_<k>; the tokenizer splits on non-
        // alphanumerics, so token '7' selects exactly NATION_7
        Cypher.run(
          s, g1,
          """CALL text_search.search('ntext', 'data.n_name:7')
            |YIELD node RETURN node.n_name AS name""".stripMargin)
      },
      Some("SELECT n_name AS name FROM nation WHERE n_name = 'NATION_7'")),

    // Schema descriptions (SET DESCRIPTION / SHOW DESCRIPTIONS).
    QueryDef(
      "cy_descriptions",
      (s, dir) => {
        val g1 = Cypher
          .execute(
            s, g(s, dir),
            "SET DESCRIPTION ON LABEL :Customer \"All customers\"")
          .graph
        val g2 = Cypher
          .execute(
            s, g1,
            "SET DESCRIPTION ON LABEL PROPERTY :Customer(c_name) " +
              "\"Customer name\"")
          .graph
        Cypher
          .run(s, g2, "SHOW DESCRIPTIONS")
          .select(
            col("type"),
            concat_ws(",", col("label")).as("label"),
            col("property"),
            col("description"))
          .orderBy("type")
      },
      Some("""SELECT * FROM (VALUES
             |  ('label', 'Customer', CAST(NULL AS VARCHAR), 'All customers'),
             |  ('label property', 'Customer', 'c_name', 'Customer name'))
             |  AS t(type, label, property, description)
             |ORDER BY type""".stripMargin)),

    // Server-side parameters (SET [GLOBAL] PARAMETER / SHOW PARAMETERS;
    // values render as JSON like the reference).
    QueryDef(
      "cy_server_params",
      (s, dir) => {
        val g1 = Cypher
          .execute(s, g(s, dir), "SET PARAMETER p1 = 'x'")
          .graph
        val g2 = Cypher
          .execute(s, g1, "SET GLOBAL PARAMETER p2 = 7")
          .graph
        Cypher.run(s, g2, "SHOW PARAMETERS").orderBy("name")
      },
      Some("""SELECT * FROM (VALUES
             |  ('p1', '"x"', 'database'),
             |  ('p2', '7', 'global')) AS t(name, value, scope)
             |ORDER BY name""".stripMargin)),

    // PROFILE executes the statement and reports the executed physical
    // plan with its real SQLMetrics — per-operator output rows and
    // measured times are engine-/run-specific, so the gate is rows-only
    // (the driver records a weaker rows>0 check).
    QueryDef(
      "cy_profile",
      (s, dir) =>
        Cypher.run(
          s, g(s, dir),
          "PROFILE MATCH (r:Region) RETURN count(*) AS n"),
      None),

    // EXPLAIN surfaces the optimized Catalyst plan (engine-specific text
    // — rows-only).
    QueryDef(
      "cy_explain",
      (s, dir) =>
        Cypher.run(
          s, g(s, dir),
          "EXPLAIN MATCH (r:Region) RETURN r.r_name AS name"),
      None))
}
