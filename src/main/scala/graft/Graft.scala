package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The library's single public entry point — what a user of the
  * reference (`nightscape/spark-file-mover`) imports to switch, plus
  * the engine surface built around it. Everything here delegates to the
  * documented implementation objects; nothing is defined twice.
  *
  * {{{
  * import graft.Graft
  *
  * // 1. the file mover (the reference's capability):
  * Graft.enableFileMover(spark)
  * df.write.option(Graft.MoveFilesOption, "\$outputDirectory/report_\$category.csv")
  *   .partitionBy("category").csv(out)
  *
  * // 2. SQL extensions (cosine_sim, rolling_hash, TopK planning):
  * //    SparkSession.builder.withExtensions(Graft.extensions) or
  * //    spark.sql.extensions=graft.GraftExtensions
  *
  * // 3. scale operators:
  * Graft.topKPerGroup(scored, 10, Seq("query_id"),
  *   Seq(Graft.Order("score", desc = true)))
  * }}}
  */
object Graft {

  // ---- file mover (reference parity surface) --------------------------

  /** Per-write option carrying the rename template (reference:
    * MoveFilesOutputCommitter.scala:16). */
  val MoveFilesOption: String = filemover.MoveFilesCommitProtocol.MOVE_FILES_OPTION

  /** Route this session's file-sink writes through the move-files
    * commit protocol (no-op for writes without [[MoveFilesOption]]). */
  def enableFileMover(spark: SparkSession): Unit =
    filemover.MoveFilesCommitProtocol.register(spark)

  // ---- session extensions ---------------------------------------------

  /** Extension installer for `SparkSession.builder.withExtensions` /
    * the `spark.sql.extensions` conf: registers the SQL functions
    * (`cosine_sim`, `rolling_hash`) and the TopK planner strategy. */
  def extensions: org.apache.spark.sql.SparkSessionExtensions => Unit =
    new GraftExtensions() // GraftExtensions IS the installer function

  // ---- scale operators ------------------------------------------------

  type Order = plans.GraftOps.Order
  val Order = plans.GraftOps.Order

  /** Bounded-heap top-k rows per group (partial pass before the
    * shuffle); see [[plans.GraftOps.topKPerGroup]]. */
  def topKPerGroup(df: DataFrame, k: Int, groupCols: Seq[String],
      orders: Seq[plans.GraftOps.Order], rankName: String = "rnk"): DataFrame =
    plans.GraftOps.topKPerGroup(df, k, groupCols, orders, rankName)

  /** Shuffle-free small-file compaction of a parquet directory toward a
    * byte target (the standing maintenance job next to the mover);
    * see [[operators.Compaction.compact]]. */
  def compact(spark: SparkSession, in: String, out: String,
      targetBytes: Long): operators.Compaction.Stats =
    operators.Compaction.compact(spark, in, out, targetBytes)

  /** Materialized near-dup connected-component labels `(doc_id, label)`
    * over the Jaccard ≥ 0.7 pair graph of `dir`'s documents table;
    * label = min doc_id in the component. The propagation rounds run
    * ONCE here (the result is checkpoint-pinned) — feed the returned
    * frame to [[clusterSizes]] and [[clusterCanonicals]] (or any other
    * consumer) so a pipeline that needs several views over one
    * clustering never pays the graph computation twice.
    * See [[queries.LlmOps3.clusterLabels]] for the 100 TB design notes
    * (O(log diameter) rounds, edges shuffled once, labels broadcast). */
  def nearDupLabels(spark: SparkSession, dir: String): DataFrame =
    queries.LlmOps3.clusterLabels(spark, dir)

  /** Cluster sizes from a [[nearDupLabels]] relation (q57 semantics). */
  def clusterSizes(spark: SparkSession, labels: DataFrame): DataFrame =
    queries.LlmOps3.q57From(spark, labels)

  /** Cluster-canonical retention from a [[nearDupLabels]] relation
    * (q80 semantics): keeps exactly the min doc per component. */
  def clusterCanonicals(spark: SparkSession, dir: String,
      labels: DataFrame): DataFrame =
    queries.LlmOps3.q80From(spark, dir, labels)

  // ---- columnar functions ---------------------------------------------

  /** Codegen cosine similarity between two ARRAY&lt;DOUBLE&gt; columns. */
  def cosineSim(a: Column, b: Column): Column =
    functions.CosineSimilarity.cosineSim(a, b)

  /** Portable content fingerprint (base-31 fold over the first `maxLen`
    * UTF-8 bytes, mod 1e9+7) — the engine's RNG-free split/sample key. */
  def rollingHash(text: Column, maxLen: Int): Column =
    functions.RollingHash.rollingHash(text, maxLen)

  /** Codegen sign-random-projection LSH signature over an
    * ARRAY&lt;DOUBLE&gt; column. */
  def srpSignature(v: Column, sigBits: Int = 16): Column =
    functions.SrpSignature.srpSignature(v, sigBits)

  /** Exact-integer text quality score over a token-array column name. */
  def qualityScore(toksCol: String): Column =
    queries.LlmOps2.qualityScore(toksCol)
}
