package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational surface part 3: the SQL-only query shapes — correlated
  * scalar subqueries, LATERAL joins, explicit GROUPING SETS — plus the
  * multi-join TPC-H Q3/Q5 shapes (q82/q83) in DataFrame form. The
  * SQL-only queries are ONE portable SQL string executed verbatim by both engines
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

  // ---- Q82: TPC-H Q3 shape (shipping priority) ------------------------
  // The classic 3-table selective join + agg + top-k: filters push into
  // all three scans, the filtered customer key set is the smallest side
  // (1/5 of customers, one column — AQE broadcasts it), lineitem⋈orders
  // carries the only real shuffle, and the rounded-decimal revenue
  // keeps the oracle exact. Top-10 via sort+limit plans as
  // TakeOrderedAndProject (no global sort).
  def q82(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import Relational.{dec, rd}
    val cutoff = lit("1998-03-15").cast("timestamp")
    val cust = Tables(s, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val ord = Tables(s, dir, "orders")
      .filter($"o_orderdate" < cutoff)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = Tables(s, dir, "lineitem")
      .filter($"l_shipdate" > cutoff)
      .select($"l_orderkey",
        (dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))).as("rev"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(rd(sum($"rev")).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderdate", $"l_orderkey")
      .limit(10)
  }
  val q82Sql: String =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |    * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin

  // ---- Q83: TPC-H Q5 shape (local-supplier volume) --------------------
  // The join-reorder stress test: six tables, where the planner must
  // route lineitem (the fact) through orders/supplier while the
  // region→nation→customer dimension chain broadcasts. The
  // c_nationkey = s_nationkey "local supplier" equi-condition is the
  // interesting bit — it correlates two dimension FKs through the fact.
  def q83(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import Relational.{dec, rd}
    val asia = Tables(s, dir, "region").filter($"r_name" === "ASIA")
    val nat = Tables(s, dir, "nation")
      .join(asia, $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val cust = Tables(s, dir, "customer").select($"c_custkey", $"c_nationkey")
    val ord = Tables(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val sup = Tables(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
    val li = Tables(s, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey",
        (dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))).as("rev"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(sup, $"l_suppkey" === $"s_suppkey" &&
        $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(rd(sum($"rev")).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }
  val q83Sql: String =
    """SELECT n_name,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |    * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---- Q112: VariantType ingestion (the Spark 4 semi-structured path) --
  // q31 covers the CLASSIC JSON path (get_json_object / from_json with a
  // declared schema); Variant is Spark 4's schema-on-read replacement —
  // parse once into a compact binary encoding, extract typed fields
  // without re-parsing per access, shred-friendly at the storage layer.
  // try_parse_json + try_variant_get give the null-on-malformed
  // semantics a crawl pipeline needs (the adversarial events fixture
  // ships literal "not json"). Null event_type groups survive (GROUP BY
  // semantics), so the sort pins NULLS FIRST on both engines.
  //
  // KNOWN FIXTURE CONSTRAINT (ADVICE r14): the two engines' int
  // extraction agrees only when `$.k` is a JSON integer. Spark's
  // variant cast coerces non-integer JSON types (number 5.0 → 5,
  // boolean true → 1, string "5" → 5) where the DuckDB twin's
  // TRY_CAST(json_extract_string(...) AS INTEGER) yields NULL for
  // 'true'/'5.0'. The events fixture's props grammar only ever emits
  // integer-typed k (incl. the adversarial seeds' nulls and non-JSON
  // strings, where both engines agree on NULL) — if a future fixture
  // adds non-integer k values, pin the coercion on one side first.
  def q112(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"event_type",
        try_variant_get(try_parse_json($"props"), "$.k", "int").as("k"))
      .filter($"k".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), min($"k").as("k_min"),
        max($"k").as("k_max"), sum($"k").cast("long").as("k_sum"))
      .orderBy($"event_type".asc_nulls_first)
  }
  val q112Sql: String =
    """SELECT event_type, count(*) AS n,
      |  min(k) AS k_min, max(k) AS k_max,
      |  CAST(sum(k) AS BIGINT) AS k_sum
      |FROM (
      |  SELECT event_type,
      |         CASE WHEN props IS NOT NULL AND json_valid(props)
      |              THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
      |         END AS k
      |  FROM events
      |) WHERE k IS NOT NULL
      |GROUP BY event_type
      |ORDER BY event_type NULLS FIRST""".stripMargin
}
