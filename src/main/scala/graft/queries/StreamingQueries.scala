package graft.queries

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.GraphState
import graft.operators.Mutations
import graft.sources.TpchGraphLoader
import graft.streaming.GraphStream
import QueryDef.{moneySum, sqlSum}

/** Structured-Streaming + TTL catalog entries (SURVEY.md §2.9). The
  * streaming entries run a real `readStream → agg → memory sink` query to
  * completion with `Trigger.AvailableNow` (the bounded equivalent of a
  * continuous source), so results are deterministic and DuckDB-checkable.
  */
object StreamingQueries {

  /** Streaming read of the events table (ts unit footer-probed, same
    * handling as the batch loader). The file source requires a directory,
    * so the single driver-generated file is staged into one. */
  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val staged = Paths.get(s"/root/repo/target/stream_src/$tag")
    Files.createDirectories(staged)
    Files.copy(
      Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val probe = TpchGraphLoader.eventsTsProbe(s, s"$dir/events.parquet")
    if (probe.nanos)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    TpchGraphLoader.decodeEventsTs(
      s.readStream
        .schema(TpchGraphLoader.eventsDiskSchema(probe.nanos))
        .parquet(staged.toString),
      probe.nanos)
  }

  private def runToMemory(df: DataFrame, mode: String): DataFrame = {
    val name = "q_" + UUID.randomUUID().toString.replace("-", "")
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .option(
        "checkpointLocation",
        s"/root/repo/target/ckpt/$name")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  val defs: Seq[QueryDef] = Seq(
    // Stream-ingested aggregate: the CREATE STREAM … TRANSFORM shape
    // (ast.hpp:3741) with an aggregation as the per-batch consumer.
    QueryDef(
      "stream_agg",
      (s, dir) =>
        runToMemory(
          eventStream(s, dir)
            .groupBy("event_type")
            .agg(
              count(lit(1)).as("n_events"),
              moneySum(col("value")).as("total_value")),
          mode = "complete").orderBy("event_type"),
      Some(s"""SELECT event_type, count(*) AS n_events,
              |  ${sqlSum("value")} AS total_value
              |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Event-time tumbling window + watermark (beyond the reference's
    // surface — stream analytics the Spark way).
    QueryDef(
      "stream_window",
      (s, dir) =>
        runToMemory(
          eventStream(s, dir)
            .withWatermark("ts", "1 day")
            .groupBy(
              window(col("ts"), "1 day").getField("start").as("day"),
              col("event_type"))
            .agg(count(lit(1)).as("n")),
          mode = "complete")
          .select(col("day").cast("date").as("day"), col("event_type"), col("n"))
          .orderBy("day", "event_type"),
      Some("""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             |  count(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin)),

    // Full trigger event matrix (trigger_context.hpp:151-163): one ingest
    // batch creates nodes, deletes the low-value ones, and updates a
    // Region counter — OnCreate/OnUpdate/OnDelete triggers each audit
    // their diff; an event class with an empty diff would not fire.
    // Single staged file → exactly one batch → deterministic audit counts.
    QueryDef(
      "stream_triggers",
      (s, dir) => {
        val src = s"/root/repo/target/stream_trig/src_${UUID.randomUUID()}"
        val ckpt = s"/root/repo/target/stream_trig/ckpt_${UUID.randomUUID()}"
        val ev = TpchGraphLoader.table(s, dir, "events")
          .filter(col("event_id") < 100)
          .select("event_id", "event_type", "value")
        ev.coalesce(1).write.json(src)
        val g0 = TpchGraphLoader(s, dir)
        val transform: GraphStream.Transformation = (g, batch) => {
          val rows = batch.select(
            (lit(956L << 48) + col("event_id")).as(GraphState.IdCol),
            array(lit("Ingested")).as(GraphState.LabelsCol),
            col("value"))
          val g1 = Mutations.createNodes(g, "Ingested", rows)
          val doomed = rows.filter(col("value") < 50).select(GraphState.IdCol)
          val g2 = Mutations.deleteNodes(g1, doomed, detach = false)
          val updates = g.nodes("Region")
            .filter(col("r_regionkey") === 0)
            .select(col(GraphState.IdCol), lit(1L).as("__nv"))
          val g3 = Mutations.setPropertyByIds(g2, updates, "touched")
          GraphStream.IngestResult(
            g3,
            createdNodes = Map("Ingested" -> rows),
            updatedNodes = Map("Region" -> updates),
            deletedNodes = Map("Ingested" -> doomed))
        }
        var auditBase = 957L
        def audit(
            lbl: String,
            cnt: GraphStream.IngestResult => Long): GraphStream.TriggerFn =
          (g, res) => {
            auditBase += 1
            val row = s.range(1).select(
              lit(auditBase << 48).as(GraphState.IdCol),
              array(lit(lbl)).as(GraphState.LabelsCol),
              lit(cnt(res)).as("n"))
            Mutations.createNodes(g, lbl, row)
          }
        val gF = GraphStream.ingestAvailable(
          s, src, ev.schema, "json", g0, transform,
          Seq(
            GraphStream.TriggerDef(
              "c",
              GraphStream.TriggerEvent.OnCreate,
              audit("CreateAudit", _.createdNodes.values.map(_.count()).sum)),
            GraphStream.TriggerDef(
              "u",
              GraphStream.TriggerEvent.OnUpdate,
              audit("UpdateAudit", _.updatedNodes.values.map(_.count()).sum)),
            GraphStream.TriggerDef(
              "d",
              GraphStream.TriggerEvent.OnDelete,
              audit("DeleteAudit", _.deletedNodes.values.map(_.count()).sum))),
          ckpt)
        gF.nodes("Ingested").agg(count(lit(1)).as("n_ingested"))
          .crossJoin(
            gF.nodes("CreateAudit").agg(
              sum(col("n")).cast("long").as("created_n")))
          .crossJoin(
            gF.nodes("UpdateAudit").agg(
              count(lit(1)).as("update_batches")))
          .crossJoin(
            gF.nodes("DeleteAudit").agg(
              sum(col("n")).cast("long").as("deleted_n")))
      },
      Some("""WITH e AS (SELECT * FROM events WHERE event_id < 100)
             |SELECT
             |  (SELECT count(*) FROM e WHERE value >= 50 OR value IS NULL)
             |    AS n_ingested,
             |  (SELECT count(*) FROM e) AS created_n,
             |  CAST(1 AS BIGINT) AS update_batches,
             |  (SELECT count(*) FROM e WHERE value < 50) AS deleted_n""".stripMargin)),

    // BEFORE COMMIT trigger (trigger.hpp:93): runs inside the batch
    // transaction against the candidate state — it ENRICHES the created
    // rows (validated flag) and ABORTS the whole batch when the diff
    // violates its rule (an odd event_id here). Two single-batch ingest
    // runs: the clean batch commits enriched, the dirty batch rolls back
    // completely.
    QueryDef(
      "stream_triggers_before",
      (s, dir) => {
        def run(g: GraphState, rows: DataFrame, tag: String): GraphState = {
          val src =
            s"/root/repo/target/stream_before/src_${tag}_${UUID.randomUUID()}"
          val ckpt =
            s"/root/repo/target/stream_before/ck_${tag}_${UUID.randomUUID()}"
          rows.coalesce(1).write.json(src)
          val transform: GraphStream.Transformation = (g0, batch) => {
            val staged = batch.select(
              (lit(959L << 48) + col("event_id")).as(GraphState.IdCol),
              array(lit("Staged")).as(GraphState.LabelsCol),
              col("event_id"),
              col("value"))
            GraphStream.IngestResult(
              Mutations.createNodes(g0, "Staged", staged),
              createdNodes = Map("Staged" -> staged))
          }
          val validate: GraphStream.TriggerFn = (cand, res) => {
            val created = res.createdNodes("Staged")
            if (created.filter(col("event_id") % 2 === 1).limit(1).count() > 0)
              throw new GraphStream.TriggerAbort("odd event_id staged")
            Mutations.setPropertyByIds(
              cand,
              created.select(col(GraphState.IdCol), lit(true).as("__nv")),
              "validated",
              Some(Seq("Staged")))
          }
          GraphStream.ingestAvailable(
            s, src, rows.schema, "json", g, transform,
            Seq(GraphStream.TriggerDef(
              "validate", GraphStream.TriggerEvent.OnCreate, validate,
              GraphStream.TriggerPhase.Before)),
            ckpt)
        }
        val ev = TpchGraphLoader.table(s, dir, "events")
          .filter(col("event_id") < 80)
          .select("event_id", "value")
        val g0 = TpchGraphLoader(s, dir)
        val g1 = run(g0, ev.filter(col("event_id") % 2 === 0), "clean")
        val g2 = run(g1, ev, "dirty") // contains odd ids → aborts
        g2.nodes("Staged").agg(
          count(lit(1)).as("staged"),
          count(when(col("validated"), 1)).as("validated"))
      },
      Some("""SELECT count(*) AS staged, count(*) AS validated
             |FROM events WHERE event_id < 80 AND event_id % 2 = 0""".stripMargin)),

    // TTL sweep (TtlQuery ast.hpp:4357): stamp orders with a ttl from their
    // order date, expire everything before 1995, count the surviving graph.
    QueryDef(
      "ttl_expire",
      (s, dir) => {
        val g0 = TpchGraphLoader(s, dir)
        val g1 = Mutations.setProperty(
          g0,
          "Order",
          "ttl",
          unix_timestamp(col("o_orderdate")))
        val cutoff = 788918400L // 1995-01-01 UTC
        val g2 = GraphStream.expire(g1, "Order", cutoff)
        val orders = g2.nodes("Order").agg(count(lit(1)).as("n_orders"))
        val hasLine = g2.edges("HAS_LINE").agg(count(lit(1)).as("n_has_line"))
        val placed = g2.edges("PLACED").agg(count(lit(1)).as("n_placed"))
        orders.crossJoin(hasLine).crossJoin(placed)
      },
      Some("""WITH surv AS (SELECT * FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00')
             |SELECT (SELECT count(*) FROM surv) AS n_orders,
             |  (SELECT count(*) FROM lineitem JOIN surv ON l_orderkey = o_orderkey)
             |    AS n_has_line,
             |  (SELECT count(*) FROM surv) AS n_placed""".stripMargin))
  )
}
