package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface part 2: range/as-of joins, grouping sets, windows,
  * sorts with nulls, set ops, scalar-function suites (SURVEY.md §2.C.3–
  * §2.C.8). Same determinism discipline as [[Relational]].
  */
object Relational2 {
  import Relational.{dec, rd}

  // ---- Q11: theta/range join — event pairs per user within 5 minutes --
  // Equi-key on user_id carries the shuffle; the range predicate is
  // evaluated post-match, so at scale this stays a hash join on user_id.
  def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .select($"event_id", $"user_id", $"ts")
    val a = ev.as("a")
    val b = ev.as("b")
    a.join(b, $"a.user_id" === $"b.user_id"
        && unix_micros($"b.ts") > unix_micros($"a.ts")
        && unix_micros($"b.ts") <= unix_micros($"a.ts") + lit(300000000L))
      .select($"a.user_id".as("user_id"),
        $"a.event_id".as("a_id"), $"b.event_id".as("b_id"),
        (unix_micros($"b.ts") - unix_micros($"a.ts")).as("gap_us"))
      .orderBy($"a_id", $"b_id")
  }
  val q11Sql: String =
    """SELECT a.user_id AS user_id, a.event_id AS a_id, b.event_id AS b_id,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND epoch_us(b.ts) > epoch_us(a.ts)
      | AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000
      |ORDER BY a_id, b_id""".stripMargin

  // ---- Q12: as-of join — most recent click at/before each purchase ----
  // Spark side uses the scalable union + carry-forward-window formulation
  // (single shuffle on user_id, linear state), not an O(n^2) pair join:
  // interleave clicks and purchases in (ts, clicks-first, event_id) order
  // and carry the last click forward with last(..., ignoreNulls).
  def q12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_id", $"user_id", $"ts", $"event_type",
        when($"event_type" === "click", 1).otherwise(0).as("is_click"))
    // ts NULLS LAST: a null-ts click must never be carried (the
    // oracle's c.ts <= p.ts excludes it); nulls-first would hand it to
    // any purchase that precedes the first real click
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc_nulls_last, $"is_click".desc, $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("click_id",
        last(when($"is_click" === 1, $"event_id"), ignoreNulls = true).over(w))
      .withColumn("click_us",
        last(when($"is_click" === 1, unix_micros($"ts")), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"click_id",
        (unix_micros($"ts") - $"click_us").as("lag_us"))
      .orderBy($"purchase_id")
  }
  /** q12 through the general as-of operator ([[graft.operators.AsofJoin]])
    * — the general operator is driver-verified against q12's oracle
    * (the x87/x94 delegation pattern). Same union-and-carry plan, but
    * built from two separate frames with the contract surface a user
    * actually has (keys, two timestamp columns, a tiebreak). */
  def x12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("cts"))
    graft.operators.AsofJoin
      .asofJoin(purchases, clicks, Seq("user_id"), "ts", "cts", "click_id")
      .select($"event_id".as("purchase_id"), $"user_id", $"click_id",
        (unix_micros($"ts") - unix_micros($"cts")).as("lag_us"))
      .orderBy($"purchase_id")
  }

  val q12Sql: String =
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
      |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click'),
      |j AS (SELECT p.event_id AS purchase_id, p.user_id AS user_id,
      |        c.event_id AS click_id, epoch_us(p.ts) - epoch_us(c.ts) AS lag_us,
      |        ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |      FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
      |SELECT purchase_id, user_id, click_id, lag_us FROM j WHERE rn = 1
      |ORDER BY purchase_id""".stripMargin

  // ---- Q15 ≈: approx distinct (bounded-error, no hash oracle) ---------
  def q15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(approx_count_distinct($"o_custkey").as("approx_custs"),
        countDistinct($"o_custkey").as("exact_custs"))
      .orderBy($"o_orderstatus")
  }

  // ---- Q16: ROLLUP with grouping_id -----------------------------------
  def q16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        rd(sum(dec($"l_quantity"))).as("sum_qty"))
      .select(coalesce($"l_returnflag", lit("(all)")).as("flag"),
        coalesce($"l_linestatus", lit("(all)")).as("status"),
        $"gid", $"n", $"sum_qty")
      .orderBy($"gid", $"flag", $"status")
  }
  val q16Sql: String =
    """SELECT COALESCE(l_returnflag,'(all)') AS flag,
      |  COALESCE(l_linestatus,'(all)') AS status,
      |  GROUPING(l_returnflag, l_linestatus) AS gid,
      |  COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))),2) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY gid, flag, status""".stripMargin

  // ---- Q17: CUBE over orders(status, priority) ------------------------
  def q17(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        rd(sum(dec($"o_totalprice"))).as("sum_price"))
      .select(coalesce($"o_orderstatus", lit("(all)")).as("status"),
        coalesce($"o_orderpriority", lit("(all)")).as("priority"),
        $"gid", $"n", $"sum_price")
      .orderBy($"gid", $"status", $"priority")
  }
  val q17Sql: String =
    """SELECT COALESCE(o_orderstatus,'(all)') AS status,
      |  COALESCE(o_orderpriority,'(all)') AS priority,
      |  GROUPING(o_orderstatus, o_orderpriority) AS gid,
      |  COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))),2) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY gid, status, priority""".stripMargin

  // ---- Q18: filtered/conditional aggregation + deterministic argmax ---
  // min_by/max_by tie-break: composite integer key round(price*100)*1e10 +
  // orderkey, pure int64 arithmetic on both engines. The 1e10 stride
  // keeps the orderkey term from carrying into the price field up to
  // orderkey < 1e10 (TPC-H sf ~1600; the old 1e7 stride corrupted the
  // argmax once orderkeys passed 10M, i.e. sf ~1.7), while the product
  // stays exact: price*100 < 1e8 => key < 1e18 < 2^63.
  def q18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val key = (round($"o_totalprice" * 100).cast("long") * 10000000000L
      + $"o_orderkey").as("k")
    Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority",
        $"o_totalprice", key)
      .groupBy($"o_orderstatus")
      .agg(
        rd(sum(when($"o_orderpriority" === "1-URGENT", dec($"o_totalprice"))
          .otherwise(dec(lit(0))))).as("urgent_price"),
        count_if($"o_totalprice" > 100000).as("n_big"),
        max_by($"o_orderkey", $"k").as("top_order"),
        min_by($"o_orderkey", $"k").as("bottom_order"))
      .orderBy($"o_orderstatus")
  }
  val q18Sql: String =
    """SELECT o_orderstatus,
      |  CAST(ROUND(SUM(CASE WHEN o_orderpriority='1-URGENT'
      |    THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END),2) AS DOUBLE) AS urgent_price,
      |  CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
      |  arg_max(o_orderkey, CAST(round(o_totalprice*100,0) AS BIGINT)*10000000000 + o_orderkey) AS top_order,
      |  arg_min(o_orderkey, CAST(round(o_totalprice*100,0) AS BIGINT)*10000000000 + o_orderkey) AS bottom_order
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- Q53: exact percentiles (linear interpolation) ------------------
  // Spark `percentile` and DuckDB `quantile_cont` share the same
  // continuous-quantile definition; inputs are exact-in-double values so
  // the interpolated results are bit-identical.
  def q53(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("qty_p25"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("qty_p50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("qty_p75"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_p50"))
      .orderBy($"l_returnflag")
  }
  val q53Sql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.25), 4) AS qty_p25,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
      |  round(quantile_cont(l_quantity, 0.75), 4) AS qty_p75,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** x53: q53's scale path — approx_percentile (a positional-error
    * sketch: rank error ≤ n/accuracy, mergeable across partitions with
    * one partial-agg shuffle like any hash aggregate). Exact percentile
    * collects per-group value multisets, which stops being feasible
    * when a group outgrows an executor; the sketch never holds more
    * than O(accuracy) items per group. No oracle (sketch internals are
    * engine-specific) — ApproxOpsSpec bounds it against exact q53. */
  def q53Approx(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        round(expr("approx_percentile(l_quantity, 0.25, 10000)"), 4).as("qty_p25"),
        round(expr("approx_percentile(l_quantity, 0.5, 10000)"), 4).as("qty_p50"),
        round(expr("approx_percentile(l_quantity, 0.75, 10000)"), 4).as("qty_p75"),
        round(expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 4).as("price_p50"))
      .orderBy($"l_returnflag")
  }

  // ---- Q54: PIVOT (long → wide) ----------------------------------------
  // Pivot column values are pinned explicitly (never inferred by a scan
  // at 100 TB); the oracle spells the equivalent conditional aggregation.
  def q54(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(rd(sum(dec($"l_quantity"))))
      .select($"l_linestatus", $"A".as("qty_a"), $"N".as("qty_n"),
        $"R".as("qty_r"))
      .orderBy($"l_linestatus")
  }
  val q54Sql: String =
    """SELECT l_linestatus,
      |  CAST(ROUND(SUM(CASE WHEN l_returnflag='A' THEN CAST(l_quantity AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS qty_a,
      |  CAST(ROUND(SUM(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS qty_n,
      |  CAST(ROUND(SUM(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS qty_r
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // ---- Q55: UNPIVOT (wide → long) --------------------------------------
  def q55(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "part")
      .select($"p_partkey", $"p_size".cast("double").as("size"),
        $"p_retailprice".as("retailprice"))
      .unpivot(Array($"p_partkey"), Array($"size", $"retailprice"),
        "attribute", "value")
      .orderBy($"p_partkey", $"attribute")
  }
  val q55Sql: String =
    """SELECT p_partkey, attribute, value FROM (
      |  SELECT p_partkey, 'size' AS attribute, CAST(p_size AS DOUBLE) AS value FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'retailprice', p_retailprice FROM part)
      |ORDER BY p_partkey, attribute""".stripMargin

  // ---- Q58: histogram via width_bucket ---------------------------------
  def q58(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .withColumn("bucket",
        expr("width_bucket(o_totalprice, 0, 600000, 12)"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), rd(sum(dec($"o_totalprice"))).as("sum_price"))
      .orderBy($"bucket")
  }
  // DuckDB 1.0 has no width_bucket; the oracle spells the same
  // arithmetic (bucket width = (600000-0)/12 = 50000 exactly, so both
  // reduce to floor(x/50000.0)+1 on identical doubles)
  val q58Sql: String =
    """SELECT CASE WHEN o_totalprice < 0 THEN 0
      |            WHEN o_totalprice >= 600000 THEN 13
      |            ELSE 1 + CAST(floor(o_totalprice / 50000.0) AS BIGINT) END AS bucket,
      |  COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---- Q59: correlation / stddev from exact decimal sums --------------
  // corr/stddev aggregates are accumulation-order-dependent in both
  // engines; computing them from EXACT decimal component sums makes the
  // result deterministic and cross-engine identical (same few double
  // ops on the same exact inputs).
  def q59(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // narrow carriers so squares stay inside DECIMAL(38,_) in both engines
    val x = $"l_quantity".cast(org.apache.spark.sql.types.DecimalType(19, 4))
    val y = $"l_extendedprice".cast(org.apache.spark.sql.types.DecimalType(19, 4))
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
      // the component sums are exact decimals; the final combination is
      // a fixed sequence of double ops on doubles derived from them —
      // identical in any engine (same inputs, same IEEE ops)
      .select($"l_returnflag", $"n",
        $"n".cast("double").as("dn"),
        $"sx".cast("double").as("dsx"), $"sy".cast("double").as("dsy"),
        $"sxx".cast("double").as("dsxx"), $"syy".cast("double").as("dsyy"),
        $"sxy".cast("double").as("dsxy"))
      .select($"l_returnflag", $"n",
        round(($"dn" * $"dsxy" - $"dsx" * $"dsy") /
          sqrt($"dn" * $"dsxx" - $"dsx" * $"dsx") /
          sqrt($"dn" * $"dsyy" - $"dsy" * $"dsy"), 6).as("corr_qty_price"),
        round(sqrt(($"dn" * $"dsxx" - $"dsx" * $"dsx") /
          ($"dn" * ($"dn" - 1))), 6).as("stddev_qty"))
      .orderBy($"l_returnflag")
  }
  val q59Sql: String =
    """WITH c AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(CAST(l_quantity AS DECIMAL(19,4))) AS sx,
      |    SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS sy,
      |    SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS sxx,
      |    SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy,
      |    SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS sxy
      |  FROM lineitem GROUP BY l_returnflag),
      |d AS (
      |  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS dn,
      |    CAST(sx AS DOUBLE) AS dsx, CAST(sy AS DOUBLE) AS dsy,
      |    CAST(sxx AS DOUBLE) AS dsxx, CAST(syy AS DOUBLE) AS dsyy,
      |    CAST(sxy AS DOUBLE) AS dsxy
      |  FROM c)
      |SELECT l_returnflag, n,
      |  round((dn * dsxy - dsx * dsy)
      |    / sqrt(dn * dsxx - dsx * dsx)
      |    / sqrt(dn * dsyy - dsy * dsy), 6) AS corr_qty_price,
      |  round(sqrt((dn * dsxx - dsx * dsx) / (dn * (dn - 1))), 6) AS stddev_qty
      |FROM d ORDER BY l_returnflag""".stripMargin

  // ---- Q61: LIMIT + OFFSET pagination ----------------------------------
  def q61(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .select($"o_orderkey", $"o_totalprice")
      .offset(10).limit(10)
  }
  val q61Sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 10""".stripMargin

  // ---- Q19: ranking window functions ----------------------------------
  def q19(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    Tables(s, dir, "customer")
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
        row_number().over(w).as("rn"), rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"), ntile(4).over(w).as("quartile"))
      .orderBy($"c_mktsegment", $"rn")
  }
  val q19Sql: String =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |  ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk,
      |  DENSE_RANK() OVER w AS drnk, NTILE(4) OVER w AS quartile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_mktsegment, rn""".stripMargin

  // ---- Q20: analytic window functions over events ---------------------
  def q20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NULLS LAST pinned in the sequence order (adversarial-events
    // finding): Spark sorts a null-ts event first in its user's
    // timeline, DuckDB last — shifting every lag/lead/first/last
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc_nulls_last, $"event_id")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir, "events")
      .select($"event_id", $"user_id", $"value",
        lag($"value", 1).over(w).as("prev_v"),
        lead($"value", 1).over(w).as("next_v"),
        first($"value").over(wf).as("first_v"),
        last($"value").over(wf).as("last_v"))
      .orderBy($"event_id")
  }
  val q20Sql: String =
    """SELECT event_id, user_id, value,
      |  LAG(value, 1) OVER w AS prev_v, LEAD(value, 1) OVER w AS next_v,
      |  FIRST_VALUE(value) OVER wf AS first_v, LAST_VALUE(value) OVER wf AS last_v
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id),
      |  wf AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY event_id""".stripMargin

  // ---- Q21: window frame specs (running sum, 3-row moving average) ----
  def q21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mov = w.rowsBetween(-2, Window.currentRow)
    Tables(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
        rd(sum(dec($"o_totalprice")).over(run)).as("running_price"),
        rd(sum(dec($"o_totalprice")).over(mov) / count(lit(1)).over(mov), 4)
          .as("moving_avg"))
      .orderBy($"o_custkey", $"o_orderkey")
  }
  val q21Sql: String =
    """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER run, 2) AS DOUBLE) AS running_price,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER mov / COUNT(*) OVER mov, 4) AS DOUBLE) AS moving_avg
      |FROM orders
      |WINDOW run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- Q22: top-k per group via row_number ----------------------------
  def q22(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_orderstatus", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderstatus", $"rn")
  }
  val q22Sql: String =
    """SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_orderstatus, rn""".stripMargin

  // ---- Q24: multi-key mixed-direction sort with explicit null order ---
  def q24(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .withColumn("prio_or_null", nullif($"o_orderpriority", lit("3-MEDIUM")))
      .select($"o_orderkey", $"prio_or_null", $"o_totalprice")
      .orderBy($"prio_or_null".asc_nulls_first, $"o_totalprice".desc, $"o_orderkey")
  }
  val q24Sql: String =
    """SELECT o_orderkey, NULLIF(o_orderpriority,'3-MEDIUM') AS prio_or_null, o_totalprice
      |FROM orders
      |ORDER BY prio_or_null ASC NULLS FIRST, o_totalprice DESC, o_orderkey""".stripMargin

  // ---- Q25: UNION ALL vs UNION (distinct) -----------------------------
  def q25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables(s, dir, "customer").select($"c_nationkey".as("nkey"))
    val sup = Tables(s, dir, "supplier").select($"s_nationkey".as("nkey"))
    val allKeys = c.unionAll(sup).groupBy($"nkey")
      .agg(count(lit(1)).as("n")).select(lit("all").as("mode"), $"nkey", $"n")
    val distinctKeys = c.union(sup).distinct()
      .select(lit("dist").as("mode"), $"nkey", lit(1L).as("n"))
    allKeys.unionAll(distinctKeys).orderBy($"mode", $"nkey")
  }
  val q25Sql: String =
    """SELECT 'all' AS mode, nkey, COUNT(*) AS n FROM (
      |  SELECT c_nationkey AS nkey FROM customer
      |  UNION ALL SELECT s_nationkey FROM supplier) GROUP BY nkey
      |UNION ALL
      |SELECT 'dist' AS mode, nkey, 1 AS n FROM (
      |  SELECT c_nationkey AS nkey FROM customer
      |  UNION SELECT s_nationkey FROM supplier)
      |ORDER BY mode, nkey""".stripMargin

  // ---- Q26: INTERSECT and EXCEPT --------------------------------------
  def q26(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables(s, dir, "customer").select($"c_nationkey".as("nkey"))
    val sup = Tables(s, dir, "supplier").select($"s_nationkey".as("nkey"))
    val both = c.intersect(sup).select(lit("intersect").as("mode"), $"nkey")
    val only = c.except(sup).select(lit("except").as("mode"), $"nkey")
    both.unionAll(only).orderBy($"mode", $"nkey")
  }
  val q26Sql: String =
    """SELECT 'intersect' AS mode, nkey FROM (
      |  SELECT c_nationkey AS nkey FROM customer
      |  INTERSECT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT 'except' AS mode, nkey FROM (
      |  SELECT c_nationkey AS nkey FROM customer
      |  EXCEPT SELECT s_nationkey FROM supplier)
      |ORDER BY mode, nkey""".stripMargin

  // ---- Q27: string function suite over part ---------------------------
  def q27(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "part")
      .select($"p_partkey",
        upper(substring($"p_name", 1, 10)).as("up_name"),
        concat($"p_brand", lit("#"), $"p_type").as("brand_type"),
        length($"p_name").as("len_name"),
        trim(concat(lit(" "), $"p_name", lit(" "))).as("trimmed"),
        $"p_type".like("PROMO%").as("is_promo"),
        regexp_extract($"p_type", "^(\\w+)", 1).as("first_word"),
        element_at(split($"p_name", " "), 1).as("tok1"))
      .orderBy($"p_partkey")
  }
  val q27Sql: String =
    """SELECT p_partkey,
      |  upper(substring(p_name, 1, 10)) AS up_name,
      |  p_brand || '#' || p_type AS brand_type,
      |  length(p_name) AS len_name,
      |  trim(' ' || p_name || ' ') AS trimmed,
      |  p_type LIKE 'PROMO%' AS is_promo,
      |  regexp_extract(p_type, '^(\w+)', 1) AS first_word,
      |  string_split(p_name, ' ')[1] AS tok1
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---- Q28: date/time function suite ----------------------------------
  def q28(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_shipdate")
    val o = Tables(s, dir, "orders").select($"o_orderkey", $"o_orderdate")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select($"l_orderkey", $"l_linenumber",
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"),
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"),
        datediff($"l_shipdate", $"o_orderdate").cast("long").as("ship_days"),
        date_format(date_add($"o_orderdate".cast("date"), 30), "yyyy-MM-dd").as("due_date"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }
  val q28Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS ship_days,
      |  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- Q29: math function suite ---------------------------------------
  def q29(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        round(abs($"l_discount" - 0.05), 4).as("abs_disc"),
        floor($"l_quantity" / 7).as("fl"),
        ceil($"l_quantity" / 7).as("ce"),
        pow($"l_quantity", 2).as("qty_sq"),
        round(sqrt($"l_quantity"), 6).as("qty_sqrt"),
        round(log($"l_extendedprice"), 6).as("ln_price"),
        ($"l_orderkey" % 7).as("key_mod"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }
  val q29Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  round(abs(l_discount - 0.05), 4) AS abs_disc,
      |  CAST(floor(l_quantity / 7) AS BIGINT) AS fl,
      |  CAST(ceil(l_quantity / 7) AS BIGINT) AS ce,
      |  pow(l_quantity, 2) AS qty_sq,
      |  round(sqrt(l_quantity), 6) AS qty_sqrt,
      |  round(ln(l_extendedprice), 6) AS ln_price,
      |  l_orderkey % 7 AS key_mod
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- Q30: array functions over embeddings ---------------------------
  def q30(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def r6(c: org.apache.spark.sql.Column) = round(c.cast("double"), 6)
    Tables(s, dir, "embeddings")
      .withColumn("sorted", sort_array($"embedding"))
      .select($"vec_id",
        size($"embedding").as("dim"),
        r6(element_at($"embedding", 1)).as("e1"),
        r6(element_at($"embedding", 2)).as("e2"),
        r6(element_at($"embedding", 3)).as("e3"),
        r6(element_at($"embedding", 4)).as("e4"),
        r6(element_at($"sorted", 1)).as("min1"),
        r6(element_at($"sorted", 2)).as("min2"),
        r6(element_at($"sorted", 64)).as("max1"))
      .orderBy($"vec_id")
  }
  val q30Sql: String =
    """SELECT vec_id, len(embedding) AS dim,
      |  round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
      |  round(CAST(embedding[2] AS DOUBLE), 6) AS e2,
      |  round(CAST(embedding[3] AS DOUBLE), 6) AS e3,
      |  round(CAST(embedding[4] AS DOUBLE), 6) AS e4,
      |  round(CAST(list_sort(embedding, 'ASC', 'NULLS FIRST')[1] AS DOUBLE), 6) AS min1,
      |  round(CAST(list_sort(embedding, 'ASC', 'NULLS FIRST')[2] AS DOUBLE), 6) AS min2,
      |  round(CAST(list_sort(embedding, 'ASC', 'NULLS FIRST')[64] AS DOUBLE), 6) AS max1
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---- Q31: JSON extraction + map build/explode -----------------------
  def q31(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val byK = ev
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .groupBy($"k")
      .agg(count(lit(1)).as("n"), rd(sum(dec($"value"))).as("sum_value"))
      .select(lit("k").as("mode"), $"k".cast("string").as("key"), $"n", $"sum_value")
    // exercise MapType: counts → map_from_entries → explode back to
    // rows. A NULL event_type group must ROUTE AROUND the map — map
    // keys cannot be null (one degenerate row failed the whole job
    // with NULL_MAP_KEY; adversarial-events finding) — and rejoin
    // after the round-trip, so the group survives like any other.
    val typeCounts = ev.groupBy($"event_type").agg(count(lit(1)).as("n"))
    val byType = typeCounts.filter($"event_type".isNotNull)
      .agg(map_from_entries(sort_array(collect_list(struct($"event_type", $"n"))))
        .as("m"))
      .select(explode($"m").as(Seq("key", "n")))
      .unionByName(typeCounts.filter($"event_type".isNull)
        .select(lit(null).cast("string").as("key"), $"n"))
      .select(lit("type").as("mode"), $"key", $"n",
        lit(null).cast("double").as("sum_value"))
    // key NULLS LAST pinned on both sides (the r9 convention)
    byK.unionAll(byType).orderBy($"mode", $"key".asc_nulls_last)
  }
  // json_valid guard: DuckDB's json_extract_string ERRORS on malformed
  // JSON where Spark's get_json_object yields NULL — at corpus scale a
  // malformed props cell is data, so the lenient semantic is pinned
  val q31Sql: String =
    """SELECT 'k' AS mode,
      |  CAST(CAST(CASE WHEN json_valid(props)
      |                 THEN json_extract_string(props, '$.k') END AS INTEGER)
      |       AS VARCHAR) AS key,
      |  COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),2) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 2
      |UNION ALL
      |SELECT 'type' AS mode, event_type AS key, COUNT(*) AS n, NULL AS sum_value
      |FROM events GROUP BY 2
      |ORDER BY mode, key NULLS LAST""".stripMargin
}
