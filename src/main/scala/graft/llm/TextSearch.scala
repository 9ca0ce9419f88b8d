package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text search over a document column — the reference's tantivy-backed text
  * index (`src/storage/v2/indices/text_index.hpp:37-48`, surfaced as
  * `text_search` procedures) re-expressed as a DataFrame inverted index:
  *
  *   postings(word, doc_id, tf) — built once, partitioned by word; a query
  *   is a semi-join of the query terms against the postings followed by a
  *   per-doc conjunction check and a tf ranking. At 100 TB the postings
  *   table is bucketed by word so a query touches only its terms'
  *   partitions — the columnar analog of an inverted index segment.
  */
object TextSearch {

  /** Build the postings list: one row per (word, doc, term frequency). */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(LlmOps.words(col(textCol))).as("word"))
      .groupBy("word", idCol)
      .agg(count(lit(1)).as("tf"))

  /** All-terms (AND) search ranked by summed term frequency. */
  def searchAll(
      postings: DataFrame,
      idCol: String,
      terms: Seq[String],
      limit: Int): DataFrame =
    postings
      .filter(col("word").isin(terms: _*))
      .groupBy(idCol)
      .agg(
        countDistinct(col("word")).as("n_terms"),
        sum(col("tf")).as("score"))
      .filter(col("n_terms") === terms.size)
      .drop("n_terms")
      .orderBy(col("score").desc, col(idCol))
      .limit(limit)
}
