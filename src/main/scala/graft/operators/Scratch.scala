package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Registry of ROUND-INTERMEDIATE checkpoint blocks. Driver fixpoints
  * (`localCheckpoint(eager = true)` per round) pin their blocks in the
  * block manager until the SparkContext dies — nothing unpersists them
  * when the query's frames go out of scope, so a long bench/verify run
  * accumulates storage-memory pressure that reads as phantom per-query
  * regressions on a contended host (the r7 driver bench).
  *
  * Operators wrap per-round eager checkpoints in [[cp]]; the harness
  * mains ([[graft.Bench]], [[graft.Verify]]) call [[sweep]] BETWEEN
  * queries, after the previous query's result is fully consumed.
  * Unpersisting a locally-checkpointed RDD destroys it irrecoverably, so
  * only frames that are dead once the query's output is materialized may
  * be registered — never cross-query caches (loader frames, memoized
  * text/vector indexes) and never frames a returned GraphState retains.
  */
object Scratch {

  private val tracked =
    scala.collection.mutable.ArrayBuffer.empty[java.lang.ref.WeakReference[RDD[_]]]

  /** Eagerly localCheckpoint `df` and register the resulting block-backed
    * RDD for the next [[sweep]]. */
  def cp(df: DataFrame): DataFrame = {
    val d = df.localCheckpoint(true)
    d.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        tracked.synchronized {
          tracked += new java.lang.ref.WeakReference[RDD[_]](lr.rdd)
        }
      case _ => ()
    }
    d
  }

  /** Unpersist every registered block (non-blocking) and clear the
    * registry. Returns how many live RDDs were swept. */
  def sweep(): Int = tracked.synchronized {
    var n = 0
    tracked.foreach { ref =>
      val rdd = ref.get()
      if (rdd != null) {
        try { rdd.unpersist(blocking = false); n += 1 }
        catch { case _: Throwable => () }
      }
    }
    tracked.clear()
    n
  }
}
