package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Pipeline, QueryDef, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each implemented operator from SURVEY.md §2 registers one entry in
  * [[queries]]; the SQL-expressible ones also register DuckDB oracle SQL in
  * [[oracleSql]] for the driver's hash-compare at sf0.01.
  */
object SparkEntry {

  /** All declared queries, keyed by name. */
  def all: Map[String, QueryDef] = Relational.defs ++ Pipeline.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q03_join_revenue_nation").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
