package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named, oracle-checked query: the engine-side DataFrame program plus
  * (where SQL-expressible) the equivalent DuckDB SQL over the same raw
  * parquet tables. Mirrors the reference's cross-vendor result-validation
  * mode (`tests/mgbench/validation.py` — Neo4j as oracle; ours is DuckDB).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {

  /** Money/double aggregation discipline: sum in DECIMAL (order-independent,
    * exact — a distributed sum of doubles is not reproducible across
    * partitionings), round to 2, surface as DOUBLE. The DuckDB oracle does
    * the identical cast chain, so hashes match bit-for-bit.
    */
  def dec(c: Column): Column = c.cast(DecimalType(38, 4))
  def moneySum(c: Column): Column = round(sum(dec(c)), 2).cast("double")

  /** avg = exact decimal sum / count, divided and rounded in double space —
    * deterministic given identical inputs on both engines. */
  def moneyAvg(c: Column): Column =
    round(sum(dec(c)).cast("double") / count(c), 2)

  /** DuckDB-side equivalents of the above. */
  def sqlSum(expr: String): String =
    s"CAST(round(sum(CAST($expr AS DECIMAL(38,4))), 2) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"round(CAST(sum(CAST($expr AS DECIMAL(38,4))) AS DOUBLE) / count($expr), 2)"
}
