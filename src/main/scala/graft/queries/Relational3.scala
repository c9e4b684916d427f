package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational surface part 3: the SQL-only query shapes — correlated
  * scalar subqueries, LATERAL joins, and explicit GROUPING SETS. Each
  * query is ONE portable SQL string executed verbatim by both engines
  * (`spark.sql` over temp views here, DuckDB as the oracle), proving
  * the engine's pure-SQL surface without a DataFrame translation in
  * between. Catalyst decorrelates the subqueries into the same
  * join+aggregate plans the DSL would build.
  *
  * Portability rules (same as SURVEY §2.C.0): every derived number is
  * DECIMAL arithmetic (order-free, exact) or a ROUND of one; threshold
  * comparisons are cross-multiplied instead of divided so no float
  * boundary exists; sort order spells NULLS FIRST because the engines'
  * defaults differ (Spark: NULLS FIRST asc, DuckDB: NULLS LAST).
  */
object Relational3 {

  private def views(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))

  // ---- Q71: correlated scalar subqueries -----------------------------
  // Orders priced above 1.5× their customer's own average, phrased as
  // price·2·COUNT > 3·SUM (two correlated scalar subqueries, exact
  // decimal, no division). Catalyst rewrites both into one aggregated
  // join on o_custkey — the decorrelation is the point being tested.
  val q71Sql: String =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |WHERE CAST(o.o_totalprice AS DECIMAL(18,4)) * 2 *
      |      (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = c.c_custkey)
      |    > 3 * (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,4)))
      |           FROM orders o2 WHERE o2.o_custkey = c.c_custkey)
      |ORDER BY c_custkey, o_orderkey""".stripMargin
  def q71(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "customer", "orders")
    s.sql(q71Sql)
  }

  // ---- Q72: LATERAL join (SQL-level top-k per group) -----------------
  // Each customer's top-3 orders via a correlated LATERAL subquery with
  // ORDER BY + LIMIT — the declarative per-group top-k. (The engine's
  // scale formulation for this shape is the TopKPerGroup operator —
  // x22/q37; this proves the SQL surface accepts the lateral phrasing.)
  val q72Sql: String =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin
  def q72(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "customer", "orders")
    s.sql(q72Sql)
  }

  // ---- Q73: explicit GROUPING SETS -----------------------------------
  // Arbitrary grouping-set combinations (not derivable from q16's
  // ROLLUP / q17's CUBE), with a portable grouping id built from
  // single-column grouping() — DuckDB's multi-arg GROUPING() bit order
  // need not match Spark's grouping_id().
  val q73Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid,
      |  COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
  def q73(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "orders")
    s.sql(q73Sql)
  }
}
