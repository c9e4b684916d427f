package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator surface (SURVEY.md §2.C.1–§2.C.8).
  *
  * Determinism discipline (SURVEY §2.C.0): every query ends in a total
  * ORDER BY; doubles are cast to DECIMAL(18,4) before aggregation and the
  * final value is ROUND(...)::DOUBLE; averages are SUM(dec)/COUNT, never
  * AVG; timestamps are emitted as formatted strings.
  *
  * All plans are declarative DataFrame programs — Catalyst handles
  * pushdown, pruning, join selection and partial aggregation; at scale the
  * only shuffles are the ones the semantics require (group keys / join
  * keys), and small dimension tables are broadcast explicitly.
  */
object Relational {

  /** DECIMAL(18,4) carrier for deterministic aggregation of doubles. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  /** Final projection of a decimal aggregate: round + emit as double. */
  def rd(c: Column, scale: Int = 2): Column = round(c, scale).cast("double")

  // ---- Q01: parquet scan + count over every table --------------------
  def q01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.all.map { t =>
      Tables(s, dir, t).groupBy().agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("tbl"), $"n_rows")
    }.reduce(_.unionAll(_)).orderBy($"tbl")
  }
  val q01Sql: String = Tables.all
    .map(t => s"SELECT '$t' AS tbl, COUNT(*) AS n_rows FROM $t")
    .mkString("", " UNION ALL ", " ORDER BY tbl")

  // ---- Q02: CSV round-trip (write nation as CSV, re-read) ------------
  def q02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = graft.RunTmp.dir("q02_csv")
    val nation = Tables(s, dir, "nation")
    nation.coalesce(1).write.mode("overwrite").option("header", "true").csv(out)
    s.read.schema(nation.schema).option("header", "true").csv(out)
      .orderBy($"n_nationkey")
  }
  val q02Sql: String =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"

  // ---- Q03: projection + filter --------------------------------------
  def q03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .filter($"l_quantity" > 45 && $"l_returnflag" === "R")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber")
  }
  val q03Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_quantity > 45 AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- Q04: compound predicates (IN / BETWEEN / IS NULL / NOT LIKE) --
  def q04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH")
        && $"o_totalprice".between(10000, 150000)
        && !$"o_orderpriority".like("3%")
        && nullif($"o_orderstatus", lit("X")).isNotNull)
      .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority", $"o_totalprice")
      .orderBy($"o_orderkey")
  }
  val q04Sql: String =
    """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice FROM orders
      |WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
      |  AND o_totalprice BETWEEN 10000 AND 150000
      |  AND o_orderpriority NOT LIKE '3%'
      |  AND NULLIF(o_orderstatus, 'X') IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin

  // ---- Q05: equi inner join (shuffle — both sides large at scale) ----
  def q05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables(s, dir, "orders")
    val c = Tables(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        rd(sum(dec($"o_totalprice"))).as("sum_price"))
      .orderBy($"c_mktsegment")
  }
  val q05Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---- Q06: broadcast hash join (small dim side broadcast) -----------
  def q06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
    val p = Tables(s, dir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy($"p_brand")
      .agg(rd(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"p_brand")
  }
  val q06Sql: String =
    """SELECT p_brand,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---- Q07: left outer join (order-less customers kept, count 0) -----
  def q07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy($"c_custkey", $"c_name")
      .agg(count($"o_orderkey").as("n_orders"))
      .orderBy($"c_custkey")
  }
  val q07Sql: String =
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin

  // ---- Q08: left semi join (customers having >= 1 order) -------------
  def q08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }
  val q08Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---- Q09: left anti join (customers with no big urgent orders) -----
  // (every customer has ≥1 order in this data, so the anti-join is
  // against a filtered order set to keep the result non-trivial)
  def q09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 200000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }
  val q09Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |  AND o_orderpriority = '1-URGENT' AND o_totalprice > 200000)
      |ORDER BY c_custkey""".stripMargin

  // ---- Q10: cross join (125-row product) -----------------------------
  def q10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "region").crossJoin(Tables(s, dir, "nation"))
      .select($"r_regionkey", $"r_name", $"n_nationkey", $"n_name")
      .orderBy($"r_regionkey", $"n_nationkey")
  }
  val q10Sql: String =
    """SELECT r_regionkey, r_name, n_nationkey, n_name
      |FROM region CROSS JOIN nation
      |ORDER BY r_regionkey, n_nationkey""".stripMargin

  // ---- Q13: TPC-H Q1 pricing summary ---------------------------------
  def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val price = dec($"l_extendedprice")
    val disc = price * (lit(1) - dec($"l_discount"))
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        rd(sum(dec($"l_quantity"))).as("sum_qty"),
        rd(sum(price)).as("sum_base_price"),
        rd(sum(disc)).as("sum_disc_price"),
        rd(sum(disc * (lit(1) + dec($"l_tax")))).as("sum_charge"),
        rd(sum(dec($"l_quantity")) / count(lit(1)), 4).as("avg_qty"),
        rd(sum(price) / count(lit(1)), 4).as("avg_price"),
        rd(sum(dec($"l_discount")) / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  val q13Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))) / COUNT(*), 4) AS DOUBLE) AS avg_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) / COUNT(*), 4) AS DOUBLE) AS avg_price,
      |  CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,4))) / COUNT(*), 4) AS DOUBLE) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- Q14: exact distinct (global + per group via ROLLUP) ------------
  def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .rollup($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("n_custs"),
        count(lit(1)).as("n_orders"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        $"n_custs", $"n_orders")
      .orderBy($"status")
  }
  val q14Sql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COUNT(DISTINCT o_custkey) AS n_custs, COUNT(*) AS n_orders
      |FROM orders GROUP BY ROLLUP(o_orderstatus)
      |ORDER BY status""".stripMargin

  // ---- Q23: global sort + limit (TakeOrderedAndProject) ---------------
  def q23(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .limit(10)
  }
  val q23Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin
}
