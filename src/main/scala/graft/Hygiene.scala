package graft

import org.apache.spark.sql.SparkSession

/** Session storage hygiene for the long-lived harness mains: drops every
  * cached Dataset (CacheManager) and any RDD-level persistence the
  * queries created (e.g. `localCheckpoint` lineage cuts in q57), so one
  * query's working set never pins executor storage for the next — the
  * session-lifetime equivalent of the 100 TB "no unbounded persist"
  * rule.
  *
  * CONTRACT: checkpoint-backed result frames (q44, q57) are invalidated
  * by this call — their lineage was truncated, so the unpersisted blocks
  * cannot be recomputed. Materialize (write/collect/count) any retained
  * result BEFORE clearing, as Verify and Bench both do. */
object Hygiene {
  def clearAll(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
