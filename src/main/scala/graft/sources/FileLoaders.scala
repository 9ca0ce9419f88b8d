package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File ingestion — the reference's `LOAD CSV` / `LOAD PARQUET` /
  * `LOAD JSONL` clauses (`src/query/plan/operator.hpp:2935,2971,3000`;
  * csv reader `src/csv/`, jsonl reader `src/query/jsonl/reader.cppm`).
  *
  * Spark-native: these are thin, explicit-schema wrappers over
  * `spark.read` — schema-on-read with no inference job (inference at 100 TB
  * is a full extra pass), header/delimiter/nullif config mapping 1:1 to the
  * reference's LOAD CSV options.
  */
object FileLoaders {

  /** LOAD CSV (operator.hpp:2935): delimiter/quote/header/nullif config. */
  def loadCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      delimiter: String = ",",
      quote: String = "\"",
      nullValue: String = ""): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("quote", quote)
      .option("nullValue", nullValue)
      .csv(path)

  /** LOAD JSONL (operator.hpp:3000): one JSON object per line. */
  def loadJsonl(
      spark: SparkSession,
      path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** LOAD PARQUET (operator.hpp:2971) — native. */
  def loadParquet(
      spark: SparkSession,
      path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)
}
