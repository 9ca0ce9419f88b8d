package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.core.GraphState
import graft.operators.Mutations

/** Streaming ingestion, triggers, and TTL (SURVEY.md §2.9).
  *
  * The reference's streaming is *transactional ingestion*, not stream
  * analytics: `CREATE STREAM … TRANSFORM module.fn BATCH_INTERVAL ms
  * BATCH_SIZE n` (ast.hpp:3741; `CommonStreamInfo` common.hpp:34-40) pulls
  * message batches and hands them to a transformation that emits write
  * statements. Our Spark-native contract is the same shape:
  * `readStream` source → `foreachBatch` → a [[Transformation]] that turns
  * the batch DataFrame into mutations against the current [[GraphState]]
  * version.
  *
  * Delivery semantics: **at-least-once per process lifetime**. Structured
  * Streaming checkpoints source offsets durably, but the evolved
  * [[GraphState]] lives only in this JVM (`@volatile var` seeded from
  * `initial`) — restarting a run against an *existing* `checkpointDir`
  * would skip batches that committed in the previous process while their
  * mutations live only in that process's lost state. Use a fresh
  * `checkpointDir` per run (every call-site here does), or, for true
  * exactly-once across restarts, persist the state version keyed by
  * batchId alongside the offsets and make transforms idempotent on replay.
  *
  * Triggers (`CREATE TRIGGER … ON CREATE AFTER COMMIT`, trigger.hpp:93,
  * event set trigger_context.hpp:151-163): after each batch commits, every
  * registered trigger receives the batch's diff frames (created nodes /
  * created edges) — the `createdVertices`-style predefined variables — and
  * may further mutate the state.
  *
  * TTL (`TtlQuery` ast.hpp:4357, storage TTL src/storage/v2/ttl.hpp):
  * [[expire]] drops nodes whose `ttl` property (epoch seconds) is past, as
  * a scheduled filter job producing a new state version.
  */
object GraphStream {

  /** Batch transformation: (current graph, batch) → new graph + diffs. */
  type Transformation = (GraphState, DataFrame) => IngestResult

  /** Trigger event classes — the reference's event matrix
    * (trigger_context.hpp:151-163: CREATED_VERTEX/EDGE, SET/REMOVED
    * properties + labels as "update", DELETED_VERTEX/EDGE) collapsed to
    * entity-level create/update/delete, plus ANY. */
  sealed trait TriggerEvent
  object TriggerEvent {
    case object OnCreate extends TriggerEvent
    case object OnUpdate extends TriggerEvent
    case object OnDelete extends TriggerEvent
    case object Any extends TriggerEvent
  }

  /** Per-batch diff frames — the reference's predefined trigger variables
    * (trigger.hpp:103-116: createdVertices/Edges, updated objects with the
    * touched ids/properties, deletedVertices/Edges). A transformation
    * reports only what it actually changed; triggers fire on the matching
    * event class. */
  final case class IngestResult(
      graph: GraphState,
      createdNodes: Map[String, DataFrame] = Map.empty,
      createdEdges: Map[String, DataFrame] = Map.empty,
      updatedNodes: Map[String, DataFrame] = Map.empty,
      updatedEdges: Map[String, DataFrame] = Map.empty,
      deletedNodes: Map[String, DataFrame] = Map.empty,
      deletedEdges: Map[String, DataFrame] = Map.empty) {
    def has(e: TriggerEvent): Boolean = e match {
      case TriggerEvent.OnCreate =>
        createdNodes.nonEmpty || createdEdges.nonEmpty
      case TriggerEvent.OnUpdate =>
        updatedNodes.nonEmpty || updatedEdges.nonEmpty
      case TriggerEvent.OnDelete =>
        deletedNodes.nonEmpty || deletedEdges.nonEmpty
      case TriggerEvent.Any => true
    }
  }

  /** AFTER-COMMIT trigger: receives the post-batch state + diffs, returns
    * the (possibly further-mutated) state. */
  type TriggerFn = (GraphState, IngestResult) => GraphState

  /** Registered trigger (`CREATE TRIGGER name ON <event> AFTER COMMIT`,
    * trigger.hpp:93): fires only when the batch diff contains its event. */
  final case class TriggerDef(name: String, event: TriggerEvent, fn: TriggerFn)

  /** Run a file-source ingestion stream to completion of the available
    * data (Trigger.AvailableNow — the bounded-test analog of a continuous
    * Kafka stream; swap `.format("kafka")` at the source for production).
    * Returns the final graph version after all batches + triggers.
    */
  def ingestAvailable(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      format: String, // "json" | "parquet" | "csv"
      initial: GraphState,
      transform: Transformation,
      triggers: Seq[TriggerDef] = Nil,
      checkpointDir: String): GraphState = {
    // state evolves batch-serially inside foreachBatch (the reference runs
    // each transformed batch as one transaction, streams.cpp:520-567)
    @volatile var state = initial
    val src = spark.readStream.schema(schema).format(format).load(sourceDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val res = transform(state, batch)
        state = triggers
          .filter(t => res.has(t.event))
          .foldLeft(res.graph)((g, t) => t.fn(g, res))
      }
      .start()
    q.awaitTermination()
    state
  }

  /** TTL sweep: detach-delete every node of `label` whose `ttl` property
    * (epoch seconds) is < `cutoff`. Scheduled periodically in production;
    * one declarative anti-join here. */
  def expire(g: GraphState, label: String, cutoff: Long): GraphState = {
    val doomed = g.nodes(label)
      .filter(col("ttl").isNotNull && col("ttl") < cutoff)
      .select(GraphState.IdCol)
    Mutations.deleteNodes(g, doomed, detach = true)
  }
}
