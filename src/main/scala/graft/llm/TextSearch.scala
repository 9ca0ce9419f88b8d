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

  /** Positional postings: one row per (word, doc, 1-based position) —
    * the phrase-query side of the index (tantivy stores positions the
    * same way; text_index.hpp:37-48). */
  def positionalIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol), posexplode(LlmOps.words(col(textCol))))
      .select(col(idCol), col("col").as("word"), (col("pos") + 1).as("pos"))

  /** Any-term (OR) search ranked by Okapi BM25 (k1=1.2, b=0.75), the
    * ranking tantivy uses. Per-doc scores sum per-term contributions in
    * DECIMAL(38,12) so results are bit-stable across partitionings.
    * Corpus stats (N, avgdl) come from one-row aggregates cross-joined in —
    * no driver-side collect. */
  def searchBM25(
      postings: DataFrame,
      docLens: DataFrame,
      idCol: String,
      terms: Seq[String],
      limit: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      /** Floor scores to 1/scale BEFORE ranking/limiting, so the top-limit
        * cut uses the same key as any floored oracle — ranking on the raw
        * double and flooring after can pick different docs at the boundary
        * when cross-engine ULPs differ. */
      floorScale: Option[Long] = None): DataFrame = {
    val stats = docLens.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("len")).cast("double") / count(lit(1))).as("avgdl"))
    val dfT = postings
      .filter(col("word").isin(terms: _*))
      .groupBy("word")
      .agg(count(lit(1)).cast("double").as("df"))
    val idf =
      log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") + lit(k1) *
      (lit(1 - b) + lit(b) * col("len") / col("avgdl"))
    val termScore = idf * (col("tf") * lit(k1 + 1)) / norm
    val agg = postings
      .filter(col("word").isin(terms: _*))
      .join(broadcast(dfT), "word")
      .join(docLens, idCol)
      .crossJoin(broadcast(stats))
      .select(col(idCol), termScore.as("s"))
      .groupBy(idCol)
      .agg(
        sum(col("s").cast("decimal(38,12)")).cast("double").as("score"),
        count(lit(1)).as("n_terms"))
    floorScale
      .map(s => agg.withColumn("score", floor(col("score") * s) / s.toDouble))
      .getOrElse(agg)
      .orderBy(col("score").desc, col(idCol))
      .limit(limit)
  }

  /** Exact phrase search: count of adjacent-position runs matching the
    * phrase, one equi-join per extra term on (doc, position) — the
    * distributed form of a positional-index phrase scan. */
  def searchPhrase(
      positional: DataFrame,
      idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val first = positional
      .filter(col("word") === phrase.head)
      .select(col(idCol), col("pos"))
    val matches = phrase.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (t, i)) =>
        acc.join(
          positional
            .filter(col("word") === t)
            .select(col(idCol).as("__id2"), (col("pos") - i).as("__p2")),
          col(idCol) === col("__id2") && col("pos") === col("__p2"))
          .select(col(idCol), col("pos"))
    }
    matches
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_occ"))
      .orderBy(idCol)
  }
}
