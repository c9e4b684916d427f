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
    "q11_join_range" -> (Relational2.q11 _),
    "q12_join_asof" -> (Relational2.q12 _),
    "q15_approx_distinct" -> (Relational2.q15 _),
    "q16_rollup" -> (Relational2.q16 _),
    "q17_cube" -> (Relational2.q17 _),
    "q18_agg_conditional" -> (Relational2.q18 _),
    "q19_win_rank" -> (Relational2.q19 _),
    "q20_win_analytic" -> (Relational2.q20 _),
    "q21_win_frames" -> (Relational2.q21 _),
    "q22_win_topk" -> (Relational2.q22 _),
    "q24_sort_nulls" -> (Relational2.q24 _),
    "q25_union" -> (Relational2.q25 _),
    "q26_intersect_except" -> (Relational2.q26 _),
    "q27_strings" -> (Relational2.q27 _),
    "q28_dates" -> (Relational2.q28 _),
    "q29_math" -> (Relational2.q29 _),
    "q30_arrays" -> (Relational2.q30 _),
    "q31_json_map" -> (Relational2.q31 _),
    "q32_tumbling_window" -> (StreamingBatch.q32 _),
    "q33_sliding_window" -> (StreamingBatch.q33 _),
    "q34_session_window" -> (StreamingBatch.q34 _),
    "q35_dedup_exact" -> (LlmOps.q35 _),
    "q36_neardup_jaccard" -> (LlmOps.q36 _),
    "q37_ann_topk" -> (LlmOps.q37 _),
    "q38_token_stats" -> (LlmOps.q38 _),
    "q39_tfidf" -> (LlmOps.q39 _),
    "q40_nested_struct" -> (LlmOps.q40 _),
    "s01_move_single" -> (FileMover.s01 _),
    "s02_move_collision" -> (FileMover.s02 _),
    "x37_cosine_expr" -> (Extensions.q37Expr _),
    "x13_sum_aggregator" -> (Extensions.q13Aggregator _),
    "x38_flatmap_tokens" -> (Extensions.q38FlatMap _),
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
    "q11_join_range" -> Relational2.q11Sql,
    "q12_join_asof" -> Relational2.q12Sql,
    "q16_rollup" -> Relational2.q16Sql,
    "q17_cube" -> Relational2.q17Sql,
    "q18_agg_conditional" -> Relational2.q18Sql,
    "q19_win_rank" -> Relational2.q19Sql,
    "q20_win_analytic" -> Relational2.q20Sql,
    "q21_win_frames" -> Relational2.q21Sql,
    "q22_win_topk" -> Relational2.q22Sql,
    "q24_sort_nulls" -> Relational2.q24Sql,
    "q25_union" -> Relational2.q25Sql,
    "q26_intersect_except" -> Relational2.q26Sql,
    "q27_strings" -> Relational2.q27Sql,
    "q28_dates" -> Relational2.q28Sql,
    "q29_math" -> Relational2.q29Sql,
    "q30_arrays" -> Relational2.q30Sql,
    "q31_json_map" -> Relational2.q31Sql,
    "q32_tumbling_window" -> StreamingBatch.q32Sql,
    "q33_sliding_window" -> StreamingBatch.q33Sql,
    "q34_session_window" -> StreamingBatch.q34Sql,
    "q35_dedup_exact" -> LlmOps.q35Sql,
    "q36_neardup_jaccard" -> LlmOps.q36Sql,
    "q37_ann_topk" -> LlmOps.q37Sql,
    "q38_token_stats" -> LlmOps.q38Sql,
    "q39_tfidf" -> LlmOps.q39Sql,
    "q40_nested_struct" -> LlmOps.q40Sql,
    "s01_move_single" -> FileMover.s01Sql,
    "s02_move_collision" -> FileMover.s02Sql,
    "x37_cosine_expr" -> LlmOps.q37Sql,
    "x13_sum_aggregator" -> Extensions.q13AggregatorSql,
    "x38_flatmap_tokens" -> LlmOps.q38Sql,
  )
}
