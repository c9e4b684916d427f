package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query IDs map 1:1 to SURVEY.md §2.C rows.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q13(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_counts" -> (Relational.q01 _),
    "q02_csv_roundtrip" -> (Relational.q02 _),
    "q03_filter_project" -> (Relational.q03 _),
    "q04_predicates" -> (Relational.q04 _),
    "q05_join_inner" -> (Relational.q05 _),
    "q06_join_broadcast" -> (Relational.q06 _),
    "q07_join_left" -> (Relational.q07 _),
    "q08_join_semi" -> (Relational.q08 _),
    "q09_join_anti" -> (Relational.q09 _),
    "q10_join_cross" -> (Relational.q10 _),
    "q13_agg_pricing" -> (Relational.q13 _),
    "q14_distinct" -> (Relational.q14 _),
    "q23_sort_limit" -> (Relational.q23 _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_counts" -> Relational.q01Sql,
    "q02_csv_roundtrip" -> Relational.q02Sql,
    "q03_filter_project" -> Relational.q03Sql,
    "q04_predicates" -> Relational.q04Sql,
    "q05_join_inner" -> Relational.q05Sql,
    "q06_join_broadcast" -> Relational.q06Sql,
    "q07_join_left" -> Relational.q07Sql,
    "q08_join_semi" -> Relational.q08Sql,
    "q09_join_anti" -> Relational.q09Sql,
    "q10_join_cross" -> Relational.q10Sql,
    "q13_agg_pricing" -> Relational.q13Sql,
    "q14_distinct" -> Relational.q14Sql,
    "q23_sort_limit" -> Relational.q23Sql,
  )
}
