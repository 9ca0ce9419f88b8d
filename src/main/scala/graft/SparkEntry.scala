package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one named query in
  * [[queries]]; SQL-expressible ones also register the equivalent DuckDB SQL
  * in [[oracleSql]] (the driver's correctness gate hashes both result sets).
  */
object SparkEntry {

  /** The full query catalog (each area contributes QueryDefs). */
  def catalog: Seq[QueryDef] = graft.queries.Registry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
