package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed dense-id assignment. `dense_rank().over(Window.orderBy(…))`
  * with no partitionBy funnels EVERY row through one partition — fine at
  * gate scale, a scale-killer at 100× (Spark warns). This helper gets the
  * same deterministic 0-based ids from a range-partitioned sort plus
  * per-partition offsets (RDD `zipWithIndex`): the sort is parallel and
  * the only extra cost is zipWithIndex's one offset-count job. */
private[graft] object Ranks {

  /** Append `idCol` = 0-based position of each row in the total order of
    * `by`. Rows must be UNIQUE in `by` (then row position == dense rank);
    * callers wanting ids per distinct key rank the distinct frame and
    * join back. */
  def orderedIds(df: DataFrame, idCol: String, by: String*): DataFrame = {
    val sorted = df.orderBy(by.map(col): _*)
    df.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      StructType(
        sorted.schema.fields :+ StructField(idCol, LongType, nullable = false)))
  }
}
