package graft

import org.apache.spark.sql.functions._

import graft.core.GraphState
import graft.procedures.{ProcContext, Procedures}

/** Text index memoization: one build per (graph version, label) — a CALL's
  * own plan must not contain the scan+explode+groupBy index construction
  * (it runs once inside the memo and is checkpointed to a leaf). */
class TextIndexMemoSpec extends SparkTestBase {

  import spark.implicits._

  private def docGraph(): GraphState = {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the lazy dog naps"),
      (3L, "quick dog quick fox"))
      .toDF("doc_id", "text")
      .withColumn("_id", col("doc_id"))
      .withColumn("_labels", array(lit("Document")))
      .cache()
    GraphState(Map("Document" -> (() => docs)), Map.empty)
  }

  test("second text.search CALL against one version plans no index build") {
    val g = docGraph()
    val ctx = ProcContext(spark, g, Seq(Map("terms" -> "quick fox")))
    Procedures.textSearch(ctx).collect() // first call builds + memoizes
    val plan2 =
      Procedures.textSearch(ctx).queryExecution.executedPlan.toString
    assert(
      !plan2.contains("Generate"),
      s"second CALL still inlines the posting-list explode:\n$plan2")
    val rows = Procedures.textSearch(ctx).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("with spark.graft.index.dir set, a fresh state scans the " +
    "persisted index table instead of rebuilding") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_idx_").toString
    spark.conf.set("spark.graft.index.dir", dir)
    try {
      val g1 = docGraph()
      Procedures
        .textSearch(ProcContext(spark, g1, Seq(Map("terms" -> "fox"))))
        .collect() // builds AND writes the index table
      // a DIFFERENT GraphState instance = fresh session analog: its first
      // CALL must plan a parquet scan of the stored index, no explode
      val g2 = docGraph()
      val df2 = Procedures
        .textSearch(ProcContext(spark, g2, Seq(Map("terms" -> "fox"))))
      val plan2 = df2.queryExecution.executedPlan.toString
      assert(
        !plan2.contains("Generate"),
        s"fresh state rebuilt the index instead of scanning it:\n$plan2")
      assert(
        plan2.contains("Parquet") || plan2.contains("FileScan"),
        s"fresh state's plan does not scan the stored index:\n$plan2")
      assert(df2.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    } finally spark.conf.unset("spark.graft.index.dir")
  }

  test("a MUTATED version does not serve the stale persisted index") {
    // r8 regression guard (ADVICE r7): the persisted path used to be keyed
    // by the index key alone, so the first CALL after a mutation found the
    // pre-mutation parquet table and silently served it
    val dir = java.nio.file.Files
      .createTempDirectory("graft_idx_").toString
    spark.conf.set("spark.graft.index.dir", dir)
    try {
      val g1 = docGraph()
      val r1 = Procedures
        .textSearch(ProcContext(spark, g1, Seq(Map("terms" -> "fox"))))
        .collect() // builds AND persists under g1's tag
      assert(r1.map(_.getLong(0)).toSet == Set(1L, 3L))
      // mutation: doc 1 loses "fox"; withNodes mints a new index tag
      val docs2 = Seq(
        (1L, "the quick brown cat"),
        (2L, "the lazy dog naps"),
        (3L, "quick dog quick fox"))
        .toDF("doc_id", "text")
        .withColumn("_id", col("doc_id"))
        .withColumn("_labels", array(lit("Document")))
        .cache()
      val g2 = g1.withNodes("Document", () => docs2)
      assert(g2.indexTag != g1.indexTag)
      val r2 = Procedures
        .textSearch(ProcContext(spark, g2, Seq(Map("terms" -> "fox"))))
        .collect()
      assert(
        r2.map(_.getLong(0)).toSet == Set(3L),
        "post-mutation CALL served the stale persisted index")
    } finally spark.conf.unset("spark.graft.index.dir")
  }

  test("a new graph version gets its own index") {
    val g1 = docGraph()
    val g2 = docGraph()
    val r1 = Procedures
      .textSearch(ProcContext(spark, g1, Seq(Map("terms" -> "dog"))))
      .collect()
    val r2 = Procedures
      .textSearch(ProcContext(spark, g2, Seq(Map("terms" -> "dog"))))
      .collect()
    assert(r1.map(_.getLong(0)).toSet == Set(2L, 3L))
    assert(r2.map(_.getLong(0)).toSet == Set(2L, 3L))
  }
}
