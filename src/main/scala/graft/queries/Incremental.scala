package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental / temporal processing operators: the shapes a pipeline
  * that maintains 100 TB of state needs between full rebuilds —
  * point-in-interval joins without an equi key, SCD2 history
  * construction, CDC changeset application, and mergeable-sketch
  * aggregation. All exact except x15 (HLL, spec-bounded).
  *
  * Portability follows SURVEY §2.C.0: event timestamps are compared in
  * integer microseconds (`unix_micros` / DuckDB `epoch_us` — both
  * truncate the parquet NANOS column identically), money math is
  * DECIMAL-exact with one terminal ROUND.
  */
object Incremental {
  import Relational.{dec, rd}

  // ---- Q87: interval join via time binning ---------------------------
  // Count `view` events inside each 10-minute incident window opened by
  // an `error` event. There is deliberately NO equi key between the two
  // sides — the naive formulation is a pure theta join (BNL: |W|·|P|
  // comparisons, undoable at 100 TB). The engine formulation
  // manufactures one: quantize time into bins exactly as long as the
  // window, explode each window onto the (≤2) bins it overlaps, and
  // equi-join on the bin id — every true (window, point) pair shares
  // the point's bin, and a point lands in exactly one bin, so the
  // equi-join is lossless and duplicate-free; the residual range
  // predicate only discards. Both sides shuffle once on the bin key
  // (time-uniform by construction — no hot bins at any scale); the
  // per-bin candidate set is |windows in 2 bins| × |points in bin|,
  // bounded by the event rate, never by corpus size.
  private val WinUs = 600L * 1000000L // 10 min; also the bin width

  def q87(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val windows = ev.filter($"event_type" === "error")
      .select($"event_id".as("w_id"), unix_micros($"ts").as("w_start_us"),
        (unix_micros($"ts") + WinUs).as("w_end_us"))
      // a window [s, e) overlaps bins s div B .. (e-1) div B (≤2 here
      // because the window is exactly one bin wide)
      .withColumn("bin",
        explode(sequence(expr(s"w_start_us div $WinUs"),
          expr(s"(w_end_us - 1) div $WinUs"))))
    val points = ev.filter($"event_type" === "view")
      .select(unix_micros($"ts").as("p_us"), $"value")
      .withColumn("bin", expr(s"p_us div $WinUs"))
    windows.join(points,
        windows("bin") === points("bin") &&
          points("p_us") >= windows("w_start_us") &&
          points("p_us") < windows("w_end_us"))
      .groupBy($"w_id")
      .agg(count(lit(1)).as("n_views"), rd(sum(dec($"value"))).as("sum_value"))
      .orderBy($"w_id")
  }
  val q87Sql: String =
    """WITH w AS (SELECT event_id AS w_id, epoch_us(ts) AS ws,
      |                  epoch_us(ts) + 600000000 AS we
      |           FROM events WHERE event_type = 'error'),
      |p AS (SELECT epoch_us(ts) AS us, value FROM events
      |      WHERE event_type = 'view')
      |SELECT w_id, COUNT(*) AS n_views,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),2) AS DOUBLE) AS sum_value
      |FROM w JOIN p ON p.us >= w.ws AND p.us < w.we
      |GROUP BY w_id ORDER BY w_id""".stripMargin

  // ---- Q88: SCD2 history build (change-point compression) ------------
  // Collapse each user's event stream into type-2 validity intervals:
  // one row per *change* of event_type, valid [valid_from_us,
  // valid_to_us), open-ended (NULL) for the current state. Two window
  // passes over the same (user_id | us, event_id) sort — Catalyst plans
  // ONE exchange + one sort; the filter between the lag and the
  // lead/row_number windows preserves both. Partitioning is by user —
  // at 100 TB that is millions of small groups, the window never sees
  // an unbounded partition.
  def q88(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val changes = Tables(s, dir, "events")
      .select($"user_id", unix_micros($"ts").as("us"), $"event_type", $"event_id")
      .withColumn("prev", lag($"event_type", 1).over(w))
      .filter($"prev".isNull || $"prev" =!= $"event_type")
    changes
      .withColumn("valid_to_us", lead($"us", 1).over(w))
      .withColumn("version", row_number().over(w))
      .select($"user_id", $"event_type".as("attr"), $"us".as("valid_from_us"),
        $"valid_to_us", $"version")
      .orderBy($"user_id", $"version")
  }
  val q88Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type, event_id
      |           FROM events),
      |c AS (SELECT *, LAG(event_type) OVER
      |        (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
      |f AS (SELECT user_id, us, event_type, event_id FROM c
      |      WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type AS attr, us AS valid_from_us,
      |  LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS version
      |FROM f ORDER BY user_id, version""".stripMargin

  // ---- Q89: CDC changeset apply (keyed upsert/delete merge) ----------
  // Apply a change stream (op ∈ {U,D,I}, per-key sequence numbers) onto
  // a base snapshot: latest op per key wins, deletes drop, updates
  // replace, inserts append. The changeset here is DERIVED
  // deterministically from `orders` so both engines see the same one
  // (in production it arrives from a log); insert keys are -(key+1) so
  // they provably miss the non-negative base key space (plain negation
  // collides on key 0 — the fixture's keys start there). Scale shape: the changeset
  // first collapses to one row per key (shuffle of the CHANGESET only —
  // in an incremental pipeline |changes| ≪ |base|), then a single
  // equi-join applies it; AQE broadcasts the collapsed side when small.
  // Update prices are DECIMAL-exact (×1.1 / ×1.2 as DECIMAL literals).
  def q89(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    def ch(pred: Column, key: Column, op: String, price: Column, seq: Int) =
      base.filter(pred).select(key.as("key"), lit(op).as("op"),
        price.as("price"), lit(seq).as("seq"))
    val changes =
      ch($"o_orderkey" % 5 === 0, $"o_orderkey", "U",
        rd(dec($"o_totalprice") * dec(lit(1.1))), 1)
      .unionAll(ch($"o_orderkey" % 20 === 0, $"o_orderkey", "U",
        rd(dec($"o_totalprice") * dec(lit(1.2))), 2))
      .unionAll(ch($"o_orderkey" % 7 === 0, $"o_orderkey", "D",
        lit(null).cast("double"), 3))
      .unionAll(ch($"o_orderkey" % 13 === 0, -($"o_orderkey" + 1), "I",
        $"o_totalprice", 1))
    // seq values are unique per key by construction, so max_by is
    // deterministic; struct packaging keeps the null update price
    val latest = changes.groupBy($"key")
      .agg(max_by(struct($"op", $"price"), $"seq").as("c"))
      .select($"key", $"c.op".as("op"), $"c.price".as("price"))
    base.join(latest, base("o_orderkey") === latest("key"), "full_outer")
      .filter(coalesce($"op", lit("")) =!= "D")
      .select(coalesce($"o_orderkey", $"key").as("o_orderkey"),
        coalesce($"o_orderstatus", lit("NEW")).as("o_orderstatus"),
        when($"op" === "U", $"price")
          .otherwise(coalesce($"o_totalprice", $"price")).as("price"))
      .orderBy($"o_orderkey")
  }
  val q89Sql: String =
    """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      |changes AS (
      |  SELECT o_orderkey AS key, 'U' AS op,
      |    CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(1.1 AS DECIMAL(18,4)), 2) AS DOUBLE) AS price,
      |    1 AS seq FROM orders WHERE o_orderkey % 5 = 0
      |  UNION ALL SELECT o_orderkey, 'U',
      |    CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(1.2 AS DECIMAL(18,4)), 2) AS DOUBLE),
      |    2 FROM orders WHERE o_orderkey % 20 = 0
      |  UNION ALL SELECT o_orderkey, 'D', NULL, 3 FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL SELECT -(o_orderkey + 1), 'I', o_totalprice, 1 FROM orders WHERE o_orderkey % 13 = 0),
      |latest AS (SELECT key, op, price FROM (
      |  SELECT key, op, price,
      |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
      |  FROM changes) WHERE rn = 1)
      |SELECT COALESCE(b.o_orderkey, l.key) AS o_orderkey,
      |  COALESCE(b.o_orderstatus, 'NEW') AS o_orderstatus,
      |  CASE WHEN l.op = 'U' THEN l.price
      |       ELSE COALESCE(b.o_totalprice, l.price) END AS price
      |FROM base b FULL OUTER JOIN latest l ON b.o_orderkey = l.key
      |WHERE COALESCE(l.op, '') <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  // ---- x15: mergeable HLL sketches (two-level union) -----------------
  // The scale path for Q14/Q15-style distinct counts when a single agg
  // pass is not possible (per-shard jobs, incremental refresh):
  // per-bucket HLL sketches built independently, then merged with a
  // register-wise-max union. Once dense, the union reproduces the
  // single-pass register state, so splitting the data N ways costs no
  // accuracy (measured: within 0.2% of the direct sketch at sf0.001 —
  // not bit-equal, because datasketches' sparse→dense promotion path
  // differs between build and union; IncrementalSpec bounds both) —
  // the property that makes the sketch usable as persisted state at
  // 100 TB. No oracle (DuckDB's HLL is a different implementation);
  // driver records rows-only, the spec bounds error vs exact distinct.
  def x15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag", pmod(hash($"l_orderkey"), lit(32)).as("bucket"))
      .agg(hll_sketch_agg($"l_orderkey").as("sk"))
      .groupBy($"l_returnflag")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("approx_orders"))
      .orderBy($"l_returnflag")
  }
}
