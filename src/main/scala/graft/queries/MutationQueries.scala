package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraphState
import graft.operators.Mutations
import graft.sources.TpchGraphLoader

/** Oracle-checked mutation queries (SURVEY.md §2.6): each applies
  * CREATE / MERGE / SET / DELETE through [[graft.operators.Mutations]] to a
  * fresh GraphState version and returns post-mutation aggregates that the
  * DuckDB oracle recomputes from the raw tables.
  */
object MutationQueries {

  private def g(s: SparkSession, dir: String) = TpchGraphLoader(s, dir)
  private def tbl(s: SparkSession, dir: String, n: String) =
    TpchGraphLoader.table(s, dir, n)

  /** Id base for the mutation-created Tag label (outside loader bases). */
  private val TagBase = 20L << 48
  private val TaggedBase = 120L << 48

  val defs: Seq[QueryDef] = Seq(
    // CreateNode + CreateExpand (operator.hpp:411, 494): a new Tag label
    // derived from regions plus TAGGED edges; post-state cardinalities and
    // a content hash prove the created frames.
    QueryDef(
      "create_nodes",
      (s, dir) => {
        val g0 = g(s, dir)
        val region = tbl(s, dir, "region")
        val tagRows = region.select(
          (lit(TagBase) + col("r_regionkey")).as(GraphState.IdCol),
          array(lit("Tag")).as(GraphState.LabelsCol),
          concat(lit("tag_"), lower(col("r_name"))).as("tag_name"))
        val taggedRows = region.select(
          (lit(TaggedBase) + col("r_regionkey")).as(GraphState.IdCol),
          TpchGraphLoader.nodeId("Region", col("r_regionkey")).as(GraphState.SrcCol),
          (lit(TagBase) + col("r_regionkey")).as(GraphState.DstCol),
          lit("TAGGED").as(GraphState.TypeCol))
        val g1 = Mutations.createEdges(
          Mutations.createNodes(g0, "Tag", tagRows),
          "TAGGED",
          taggedRows)
        // read back through the new version: Region -TAGGED-> Tag join
        val joined = g1.nodes("Region")
          .select(col(GraphState.IdCol).as("__rid"))
          .join(g1.edges("TAGGED"), col("__rid") === col(GraphState.SrcCol))
          .join(
            g1.nodes("Tag").select(
              col(GraphState.IdCol).as("__tid"),
              col("tag_name")),
            col(GraphState.DstCol) === col("__tid"))
        joined.agg(
          count(lit(1)).as("n_tagged"),
          array_join(sort_array(collect_list(col("tag_name"))), ",").as("tags"))
      },
      Some("""SELECT count(*) AS n_tagged,
             |  array_to_string(list_sort(list('tag_' || lower(r_name))), ',') AS tags
             |FROM region""".stripMargin)),

    // Merge (operator.hpp:2579): upsert a delta of 50 existing + 25 new
    // customers; matched rows must not duplicate, missing rows must appear.
    QueryDef(
      "merge_upsert",
      (s, dir) => {
        val g0 = g(s, dir)
        val cust = tbl(s, dir, "customer")
        val existingPart = cust
          .filter(col("c_custkey") < 50)
          .select(col("c_custkey"))
        val newPart = cust
          .filter(col("c_custkey") < 25)
          .select((col("c_custkey") + 10000000L).as("c_custkey"))
        val delta = existingPart
          .unionByName(newPart)
          .select(
            TpchGraphLoader.nodeId("Customer", col("c_custkey")).as(GraphState.IdCol),
            array(lit("Customer")).as(GraphState.LabelsCol),
            col("c_custkey"),
            concat(lit("merged_"), col("c_custkey")).as("c_name"),
            lit(0.0).as("c_acctbal"),
            lit("MERGED").as("c_mktsegment"))
        val g1 = Mutations.mergeNodes(g0, "Customer", delta)
        g1.nodes("Customer").agg(
          count(lit(1)).as("n_total"),
          countDistinct(col(GraphState.IdCol)).as("n_distinct"),
          count(when(col("c_name").startsWith("merged_"), 1)).as("n_created"))
      },
      Some("""SELECT count(*) + 25 AS n_total, count(*) + 25 AS n_distinct,
             |  25 AS n_created FROM customer""".stripMargin)),

    // SetProperty + Delete DETACH (operator.hpp:1448, 1396): flag VIPs,
    // detach-delete one market segment, then count the surviving graph.
    QueryDef(
      "set_delete",
      (s, dir) => {
        val g0 = g(s, dir)
        val g1 = Mutations.setProperty(
          g0,
          "Customer",
          "vip",
          col("c_acctbal") > 5000)
        val doomed = g1.nodes("Customer")
          .filter(col("c_mktsegment") === "MACHINERY")
          .select(GraphState.IdCol)
        val g2 = Mutations.deleteNodes(g1, doomed, detach = true)
        val counts = g2.nodes("Customer").agg(
          count(lit(1)).as("n_cust"),
          count(when(col("vip"), 1)).as("n_vip"))
        val placed = g2.edges("PLACED").agg(count(lit(1)).as("n_placed"))
        val knows = g2.edges("KNOWS").agg(count(lit(1)).as("n_knows"))
        counts.crossJoin(placed).crossJoin(knows)
      },
      Some("""WITH nn AS MATERIALIZED (SELECT max(c_custkey) + 1 AS n FROM customer),
             |surv AS MATERIALIZED (
             |  SELECT c_custkey, c_acctbal FROM customer
             |  WHERE c_mktsegment <> 'MACHINERY'),
             |e AS (
             |  SELECT c_custkey AS src, (c_custkey + 1) % (SELECT n FROM nn) AS dst
             |  FROM customer
             |  UNION ALL
             |  SELECT c_custkey, (c_custkey + 7) % (SELECT n FROM nn) FROM customer)
             |SELECT
             |  (SELECT count(*) FROM surv) AS n_cust,
             |  (SELECT count(*) FROM surv WHERE c_acctbal > 5000) AS n_vip,
             |  (SELECT count(*) FROM orders JOIN surv ON o_custkey = c_custkey)
             |    AS n_placed,
             |  (SELECT count(*) FROM e
             |   JOIN surv a ON a.c_custkey = e.src
             |   JOIN surv b ON b.c_custkey = e.dst) AS n_knows""".stripMargin)),

    // RemoveProperty + SetLabels/RemoveLabels (operator.hpp:1630,1590,1715):
    // schema-level mutations surfaced through the observed schema.
    QueryDef(
      "set_remove_labels",
      (s, dir) => {
        val g0 = g(s, dir)
        val g1 = Mutations.setLabels(g0, "Supplier", Seq("Vendor", "Partner"))
        val g2 = Mutations.removeLabels(g1, "Supplier", Seq("Partner"))
        val g3 = Mutations.removeProperty(g2, "Supplier", "s_acctbal")
        val n = g3.nodes("Supplier")
        n.agg(
          count(lit(1)).as("n_supp"),
          count(when(array_contains(col(GraphState.LabelsCol), "Vendor"), 1))
            .as("n_vendor"),
          count(when(array_contains(col(GraphState.LabelsCol), "Partner"), 1))
            .as("n_partner"),
          lit(n.columns.contains("s_acctbal")).as("has_acctbal"))
      },
      Some("""SELECT count(*) AS n_supp, count(*) AS n_vendor,
             |  0 AS n_partner, false AS has_acctbal FROM supplier""".stripMargin))
  )
}
