package graft

import org.apache.spark.sql.functions._

import graft.core.GraphState
import graft.operators.Mutations
import graft.sources.TpchGraphLoader
import graft.streaming.GraphStream

/** Ingestion-stream contract test: file source → foreachBatch
  * transformation → graph mutations, with an AFTER-COMMIT trigger
  * (reference: streams.cpp batch loop + trigger.hpp). */
class StreamingSpec extends SparkTestBase {

  test("stream ingestion mutates the graph; trigger sees the diff") {
    val src = s"/root/repo/target/streamspec/src_${java.util.UUID.randomUUID()}"
    val ckpt = s"/root/repo/target/streamspec/ckpt_${java.util.UUID.randomUUID()}"

    // stage a small jsonl source from the events table
    val events = TpchGraphLoader.table(spark, sfDir, "events").limit(40)
    events.coalesce(2).write.json(src)
    val nSrc = events.count()

    val schema = events.schema
    val g0 = TpchGraphLoader(spark, sfDir)

    val transform: GraphStream.Transformation = (g, batch) => {
      val rows = batch.select(
        (lit(950L << 48) + col("event_id")).as(GraphState.IdCol),
        array(lit("Ingested")).as(GraphState.LabelsCol),
        col("event_id"),
        col("event_type"),
        col("value"))
      val withNodes = Mutations.createNodes(g, "Ingested", rows)
      GraphStream.IngestResult(
        withNodes,
        createdNodes = Map("Ingested" -> rows))
    }

    // AFTER COMMIT trigger: log one BatchLog node per batch with its size
    var batches = 0
    val trigger: GraphStream.TriggerFn = (g, res) => {
      batches += 1
      val n = res.createdNodes("Ingested").count()
      val log = spark.range(1).select(
        (lit(951L << 48) + lit(batches.toLong)).as(GraphState.IdCol),
        array(lit("BatchLog")).as(GraphState.LabelsCol),
        lit(n).as("batch_size"))
      Mutations.createNodes(g, "BatchLog", log)
    }

    val gFinal = GraphStream.ingestAvailable(
      spark, src, schema, "json", g0, transform,
      Seq(GraphStream.TriggerDef(
        "log", GraphStream.TriggerEvent.OnCreate, trigger)),
      ckpt)

    assert(gFinal.nodes("Ingested").count() == nSrc)
    val logged = gFinal.nodes("BatchLog")
      .agg(sum(col("batch_size"))).collect()(0).getLong(0)
    assert(logged == nSrc && batches >= 1)
  }

  test("kafka CREATE STREAM config maps to connector options and trigger") {
    val spec = GraphStream.SourceSpec(
      format = "kafka",
      topics = Seq("events", "audit"),
      bootstrapServers = Some("broker1:9092,broker2:9092"),
      consumerGroup = Some("graft-cg"),
      batchIntervalMs = Some(250L),
      batchSize = Some(1000L),
      configs = Map("sasl.mechanism" -> "PLAIN", "kafka.security.protocol" -> "SASL_SSL"))
    val opts = GraphStream.sourceOptions(spec)
    assert(opts("subscribe") == "events,audit")
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("kafka.group.id") == "graft-cg")
    assert(opts("maxOffsetsPerTrigger") == "1000")
    // passthrough configs are namespaced for the connector either way
    assert(opts("kafka.sasl.mechanism") == "PLAIN")
    assert(opts("kafka.security.protocol") == "SASL_SSL")
    assert(GraphStream.triggerOf(spec) ==
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(250L))
    assert(GraphStream.triggerOf(spec.copy(batchIntervalMs = None)) ==
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    // missing required kafka fields fail loudly at declaration time
    intercept[IllegalArgumentException] {
      GraphStream.sourceOptions(spec.copy(topics = Nil))
    }
  }

  test("pulsar CREATE STREAM config maps to connector options") {
    val spec = GraphStream.SourceSpec(
      format = "pulsar",
      topics = Seq("events", "audit"),
      serviceUrl = Some("pulsar://broker1:6650"),
      consumerGroup = Some("graft-sub"),
      batchIntervalMs = Some(250L),
      batchSize = Some(500L),
      configs = Map("pulsar.client.authPluginClassName" -> "X"))
    val opts = GraphStream.sourceOptions(spec)
    assert(opts("topics") == "events,audit")
    assert(opts("service.url") == "pulsar://broker1:6650")
    assert(opts("predefinedSubscription") == "graft-sub")
    assert(opts("maxEntriesPerTrigger") == "500")
    assert(opts("pulsar.client.authPluginClassName") == "X")
    assert(GraphStream.triggerOf(spec) ==
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(250L))
    // missing required pulsar fields fail loudly at declaration time
    intercept[IllegalArgumentException] {
      GraphStream.sourceOptions(spec.copy(serviceUrl = None))
    }
    intercept[IllegalArgumentException] {
      GraphStream.sourceOptions(spec.copy(topics = Nil))
    }
  }

  test("kafka live ingestion (broker-gated)") {
    // live end-to-end needs a broker + the kafka connector jar; conf-gated
    assume(sys.env.contains("GRAFT_KAFKA_BROKER"),
      "no Kafka broker in this environment")
    GraphStream.reader(spark, GraphStream.SourceSpec(
      format = "kafka",
      topics = Seq("events"),
      bootstrapServers = sys.env.get("GRAFT_KAFKA_BROKER")))
  }

  test("update/delete triggers fire only on their event class") {
    val src = s"/root/repo/target/streamspec/src_${java.util.UUID.randomUUID()}"
    val ckpt = s"/root/repo/target/streamspec/ckpt_${java.util.UUID.randomUUID()}"
    val events = TpchGraphLoader.table(spark, sfDir, "events").limit(20)
    events.coalesce(1).write.json(src)
    val g0 = TpchGraphLoader(spark, sfDir)

    // transform: create Ingested nodes, immediately delete low-value ones,
    // and bump a counter property on Region 0 — reporting all three diffs
    val transform: GraphStream.Transformation = (g, batch) => {
      val rows = batch.select(
        (lit(955L << 48) + col("event_id")).as(GraphState.IdCol),
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
    var fired = Set.empty[String]
    def logTrigger(name: String): GraphStream.TriggerFn = (g, _) => {
      fired += name; g
    }
    val gFinal = GraphStream.ingestAvailable(
      spark, src, events.schema, "json", g0, transform,
      Seq(
        GraphStream.TriggerDef(
          "c", GraphStream.TriggerEvent.OnCreate, logTrigger("create")),
        GraphStream.TriggerDef(
          "u", GraphStream.TriggerEvent.OnUpdate, logTrigger("update")),
        GraphStream.TriggerDef(
          "d", GraphStream.TriggerEvent.OnDelete, logTrigger("delete"))),
      ckpt)
    assert(fired == Set("create", "update", "delete"))
    val kept = TpchGraphLoader.table(spark, sfDir, "events").limit(20)
      .filter(!(col("value") < 50)).count()
    assert(gFinal.nodes("Ingested").count() == kept)
    assert(
      gFinal.nodes("Region").filter(col("touched") === 1L).count() == 1)
  }

  test("periodic batched commit: each batch becomes its own state version") {
    val g0 = TpchGraphLoader(spark, sfDir)
    val rows = TpchGraphLoader.table(spark, sfDir, "region")
    var versions = 0
    val gFinal = Mutations.periodicBatches(g0, rows, batchSize = 2,
      orderCols = Seq("r_regionkey")) { (g, batch) =>
      versions += 1
      val nodes = batch.select(
        (lit(960L << 48) + col("r_regionkey")).as(GraphState.IdCol),
        array(lit("PBatch")).as(GraphState.LabelsCol),
        col("r_name"))
      Mutations.createNodes(g, "PBatch", nodes)
    }
    assert(versions == 3) // 5 regions / batches of 2
    assert(gFinal.nodes("PBatch").count() == rows.count())
  }

  test("TTL expiry drops expired nodes and incident edges") {
    val g0 = TpchGraphLoader(spark, sfDir)
    val g1 = Mutations.setProperty(
      g0, "Order", "ttl", unix_timestamp(col("o_orderdate")))
    val cutoff = 788918400L // 1995-01-01 UTC
    val g2 = GraphStream.expire(g1, "Order", cutoff)
    val expectOrders = TpchGraphLoader.table(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01")))
      .count()
    assert(g2.nodes("Order").count() == expectOrders)
    assert(g2.edges("PLACED").count() == expectOrders)
  }
  test("CREATE TRIGGER DDL: BEFORE COMMIT abort rolls the batch back") {
    import graft.cypher.Cypher
    val src = s"/root/repo/target/streamspec/ddl_src_${java.util.UUID.randomUUID()}"
    val ckpt = s"/root/repo/target/streamspec/ddl_ckpt_${java.util.UUID.randomUUID()}"
    import spark.implicits._
    val ev = Seq((1L, 5L), (2L, 99L)).toDF("k", "v")
    ev.coalesce(1).write.json(src)
    GraphStream.triggerRegistry.remove("spec_guard")
    // the BEFORE trigger statement raises for any created vertex whose
    // id offset is 99 — the whole batch must roll back, nothing publishes
    val g0 = Cypher.execute(
      spark, GraphState(Map.empty, Map.empty),
      """CREATE TRIGGER spec_guard ON () CREATE BEFORE COMMIT EXECUTE
        |UNWIND createdVertices AS v
        |WITH v WHERE v.id % 281474976710656 = 99
        |WITH v RETURN assert(false, 'poison row rejected')""".stripMargin).graph
    try {
      val transform: GraphStream.Transformation = (g, batch) => {
        val rows = batch.select(
          (lit(967L << 48) + col("v")).as(GraphState.IdCol),
          array(lit("DdlIngested")).as(GraphState.LabelsCol),
          col("v"))
        GraphStream.IngestResult(
          Mutations.createNodes(g, "DdlIngested", rows),
          createdNodes = Map("DdlIngested" -> rows))
      }
      val gF = GraphStream.ingestAvailable(
        spark, src, ev.schema, "json", g0, transform, Nil, ckpt)
      // the single batch contains the poison row -> aborted -> no nodes
      assert(!gF.hasLabel("DdlIngested") ||
        gF.nodes("DdlIngested").count() == 0L)
      assert(
        Cypher.run(spark, gF, "SHOW TRIGGERS").collect()
          .exists(_.getString(0) == "spec_guard"))
    } finally {
      Cypher.execute(spark, g0, "DROP TRIGGER spec_guard")
      ()
    }
  }


  test("kafka-shaped ingestion through the consumer loop " +
    "(in-memory broker stand-in)") {
    // The kafka connector jar and a live broker do not exist in this
    // container (zero egress), so the broker-gated test above stays
    // env-keyed. This test drives the SAME consumer loop (ingestFrom —
    // the code path START STREAM and the Scala ingest API share) from an
    // in-memory streaming source whose rows carry the kafka connector's
    // exact output shape (key/value binary, topic, partition, offset):
    // everything downstream of .load() is exercised for real.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long)]
    val stream = mem.toDF().toDF("key", "value", "topic", "partition", "offset")
    mem.addData((1 to 12).map(i =>
      (s"k$i".getBytes("UTF-8"),
        s"""{"sku": $i}""".getBytes("UTF-8"),
        "events", i % 3, i.toLong)))

    val transform: GraphStream.Transformation = (g, batch) => {
      // value payloads decode exactly as a broker-fed TRANSFORM would
      val rows = batch.select(
        (lit(952L << 48) +
          get_json_object(col("value").cast("string"), "$.sku")
            .cast("long")).as(GraphState.IdCol),
        array(lit("BrokerMsg")).as(GraphState.LabelsCol),
        get_json_object(col("value").cast("string"), "$.sku")
          .cast("long").as("sku"),
        col("topic"),
        col("offset"))
      GraphStream.IngestResult(
        Mutations.createNodes(g, "BrokerMsg", rows),
        createdNodes = Map("BrokerMsg" -> rows))
    }
    val ckpt =
      s"/root/repo/target/streamspec/kckpt_${java.util.UUID.randomUUID()}"
    val gFinal = GraphStream.ingestFrom(
      spark, stream, Trigger.AvailableNow(),
      GraphState(Map.empty, Map.empty), transform, Nil, ckpt)
    assert(gFinal.nodes("BrokerMsg").count() == 12)
    assert(gFinal.nodes("BrokerMsg")
      .agg(sum(col("sku"))).collect()(0).getLong(0) == 78)
  }
}
