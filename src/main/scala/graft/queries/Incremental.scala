package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental / temporal processing operators: the shapes a pipeline
  * that maintains 100 TB of state needs between full rebuilds —
  * point-in-interval joins without an equi key (fixed q87, var-length
  * q94, multi-resolution x94), SCD2 history construction (q88), CDC
  * changeset application / reconciliation / delta aggregation
  * (q89/q92/q93), winsorization (q91), LOCF resample (q96), funnel
  * conversion (q97), and mergeable-sketch aggregation (x15). All exact
  * except x15 (HLL, spec-bounded).
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

  /** Exact floor division for the bin id: `x div w` truncates toward
    * zero, which misassigns pre-1970 (negative-µs) timestamps at bin
    * boundaries; `pmod` is non-negative, so this is floor for any sign.
    */
  private def binExpr(x: String, w: Long): String =
    s"(($x - pmod($x, ${w}L)) div ${w}L)"

  def q87(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val windows = ev.filter($"event_type" === "error")
      .select($"event_id".as("w_id"), unix_micros($"ts").as("w_start_us"),
        (unix_micros($"ts") + WinUs).as("w_end_us"))
      // a window [s, e) overlaps bins floor(s/B) .. floor((e-1)/B) (≤2
      // here because the window is exactly one bin wide)
      .withColumn("bin",
        explode(sequence(expr(binExpr("w_start_us", WinUs)),
          expr(binExpr("(w_end_us - 1)", WinUs)))))
    val points = ev.filter($"event_type" === "view")
      .select(unix_micros($"ts").as("p_us"), $"value")
      .withColumn("bin", expr(binExpr("p_us", WinUs)))
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

  // ---- x87: q87 through the general IntervalJoin operator ------------
  // Same output as q87 (shares its oracle): fixed 10-minute windows are
  // the degenerate hierarchy (median == max ⇒ one level, bin width ==
  // window length — exactly q87's hand-built binning, now derived).
  def x87(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val windows = ev.filter($"event_type" === "error")
      .select($"event_id".as("w_id"), unix_micros($"ts").as("w_start_us"),
        (unix_micros($"ts") + WinUs).as("w_end_us"))
    val points = ev.filter($"event_type" === "view")
      .select(unix_micros($"ts").as("p_us"), $"value")
    graft.operators.IntervalJoin.pointInInterval(
        windows, points, "w_start_us", "w_end_us", "p_us")
      .groupBy($"w_id")
      .agg(count(lit(1)).as("n_views"), rd(sum(dec($"value"))).as("sum_value"))
      .orderBy($"w_id")
  }

  // ---- Q94: interval join, variable-length windows -------------------
  // q87's generalization: windows of heterogeneous length (5/10/15 min
  // here, keyed off the event id) binned by the MAXIMUM length. The
  // lemma holds unchanged — a window [s, e) with e−s ≤ B overlaps bins
  // s div B .. (e−1) div B (still ≤2), a point sits in exactly one bin,
  // so the bin equi-join remains lossless and duplicate-free. The cost
  // of binning by the max is looser candidates for the short windows
  // (the residual range predicate discards them); a length distribution
  // with a long tail wants a two-level bin hierarchy (short windows in
  // fine bins, long in coarse, points probe both) — not needed at a 3×
  // spread.
  private val MaxWinUs = 900L * 1000000L // 15 min: the max length = bin width

  def q94(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val windows = ev.filter($"event_type" === "error")
      .select($"event_id".as("w_id"),
        (lit(1) + pmod($"event_id", lit(3))).as("w_len"),
        unix_micros($"ts").as("w_start_us"))
      .withColumn("w_end_us", $"w_start_us" + $"w_len" * (300L * 1000000L))
      .withColumn("bin",
        explode(sequence(expr(binExpr("w_start_us", MaxWinUs)),
          expr(binExpr("(w_end_us - 1)", MaxWinUs)))))
    val points = ev.filter($"event_type" === "view")
      .select(unix_micros($"ts").as("p_us"))
      .withColumn("bin", expr(binExpr("p_us", MaxWinUs)))
    windows.join(points,
        windows("bin") === points("bin") &&
          points("p_us") >= windows("w_start_us") &&
          points("p_us") < windows("w_end_us"))
      .groupBy($"w_id", $"w_len")
      .agg(count(lit(1)).as("n_views"))
      .orderBy($"w_id")
  }
  val q94Sql: String =
    """WITH w AS (SELECT event_id AS w_id,
      |                  1 + (event_id % 3) AS w_len,
      |                  epoch_us(ts) AS ws,
      |                  epoch_us(ts) + (1 + (event_id % 3)) * 300000000 AS we
      |           FROM events WHERE event_type = 'error'),
      |p AS (SELECT epoch_us(ts) AS us FROM events WHERE event_type = 'view')
      |SELECT w_id, w_len, COUNT(*) AS n_views
      |FROM w JOIN p ON p.us >= w.ws AND p.us < w.we
      |GROUP BY w_id, w_len ORDER BY w_id""".stripMargin

  // ---- x94: interval join, multi-resolution bin hierarchy ------------
  // The long-tail alternative to q94's bin-by-max, now delegated to the
  // general [[graft.operators.IntervalJoin]] operator: each window
  // lands at the level whose bin width first fits its length, points
  // replicate to every level, the equi-join key is (level, bin), and
  // the level widths are DERIVED from the interval-length distribution
  // (median base, doublings to the max) rather than hand-tuned. Same
  // per-level lemma — a window spans ≤2 bins of its own level, a point
  // sits in exactly 1, a pair can only meet at the window's level — so
  // the join is lossless and duplicate-free across levels, and output
  // is identical to q94 by construction (shares q94's oracle). On this
  // fixture the derivation lands on base = 10 min (median of the
  // 5/10/15 spread), 2 levels; IntervalJoinSpec exercises the 100×
  // long-tail case q94's bin-by-max can't serve.
  def x94(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val windows = ev.filter($"event_type" === "error")
      .select($"event_id".as("w_id"),
        (lit(1) + pmod($"event_id", lit(3))).as("w_len"),
        unix_micros($"ts").as("w_start_us"))
      .withColumn("w_end_us", $"w_start_us" + $"w_len" * (300L * 1000000L))
    val points = ev.filter($"event_type" === "view")
      .select(unix_micros($"ts").as("p_us"))
    graft.operators.IntervalJoin.pointInInterval(
        windows, points, "w_start_us", "w_end_us", "p_us")
      .groupBy($"w_id", $"w_len")
      .agg(count(lit(1)).as("n_views"))
      .orderBy($"w_id")
  }

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
    // us NULLS LAST (adversarial-events finding): a null event time
    // has no position in a validity chain; the pinned convention makes
    // it the FINAL version on both engines instead of Spark's
    // primordial-first vs DuckDB's last
    val w = Window.partitionBy($"user_id")
      .orderBy($"us".asc_nulls_last, $"event_id")
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
      |        (PARTITION BY user_id ORDER BY us NULLS LAST, event_id) AS prev
      |      FROM e),
      |f AS (SELECT user_id, us, event_type, event_id FROM c
      |      WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type AS attr, us AS valid_from_us,
      |  LEAD(us) OVER (PARTITION BY user_id
      |                 ORDER BY us NULLS LAST, event_id) AS valid_to_us,
      |  ROW_NUMBER() OVER (PARTITION BY user_id
      |                     ORDER BY us NULLS LAST, event_id) AS version
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
  /** The base snapshot q89/q92/q93 operate on. */
  private def ordersBase(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  /** The synthetic CDC change log, pre-collapse. Columns: key,
    * op ∈ {U,D,I}, price, seq. Package-visible so the streaming twin
    * (E08, [[graft.streaming.EventStreams.latestKeyState]]) replays the
    * SAME log instead of re-deriving one that could drift.
    */
  private[graft] def changeLog(base: DataFrame): DataFrame = {
    def ch(pred: Column, key: Column, op: String, price: Column,
        status: Column, seq: Int) =
      base.filter(pred).select(key.as("key"), lit(op).as("op"),
        price.as("price"), status.as("status"), lit(seq.toLong).as("seq"))
    val k = col("o_orderkey")
    val noStatus = lit(null).cast("string")
    // the seq-2 update also REPLACES the status ('P') — so the merge
    // must apply a two-column update, the diff must attribute both
    // columns, and the delta aggregation must migrate the row between
    // status groups
    ch(k % 5 === 0, k, "U", rd(dec(col("o_totalprice")) * dec(lit(1.1))),
        noStatus, 1)
      .unionAll(ch(k % 20 === 0, k, "U",
        rd(dec(col("o_totalprice")) * dec(lit(1.2))), lit("P"), 2))
      .unionAll(ch(k % 7 === 0, k, "D", lit(null).cast("double"), noStatus, 3))
      .unionAll(ch(k % 13 === 0, -(k + 1), "I", col("o_totalprice"),
        noStatus, 1))
  }

  private[graft] def ordersBaseFor(s: SparkSession, dir: String): DataFrame =
    ordersBase(s, dir)

  /** The change log collapsed to the latest op per key (seq values are
    * unique per key by construction, so max_by is deterministic; struct
    * packaging keeps the null delete price). Columns: key, op, price.
    */
  private def latestChanges(base: DataFrame): DataFrame =
    changeLog(base).groupBy(col("key"))
      .agg(max_by(struct(col("op"), col("price"), col("status")),
        col("seq")).as("c"))
      .select(col("key"), col("c.op").as("op"), col("c.price").as("price"),
        col("c.status").as("new_status"))

  /** The changeset derivation above, as oracle SQL (shared CTE text). */
  private val ChangesCte: String =
    """changes AS (
      |  SELECT o_orderkey AS key, 'U' AS op,
      |    CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(1.1 AS DECIMAL(18,4)), 2) AS DOUBLE) AS price,
      |    CAST(NULL AS VARCHAR) AS status, 1 AS seq
      |  FROM orders WHERE o_orderkey % 5 = 0
      |  UNION ALL SELECT o_orderkey, 'U',
      |    CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(1.2 AS DECIMAL(18,4)), 2) AS DOUBLE),
      |    'P', 2 FROM orders WHERE o_orderkey % 20 = 0
      |  UNION ALL SELECT o_orderkey, 'D', NULL, NULL, 3 FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL SELECT -(o_orderkey + 1), 'I', o_totalprice, NULL, 1 FROM orders WHERE o_orderkey % 13 = 0),
      |latest AS (SELECT key, op, price, status FROM (
      |  SELECT key, op, price, status,
      |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
      |  FROM changes) WHERE rn = 1)""".stripMargin

  /** The merged (post-CDC) snapshot, as oracle SQL built on ChangesCte. */
  private val MergedSql: String =
    s"""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
       |$ChangesCte,
       |merged AS (
       |  SELECT COALESCE(b.o_orderkey, l.key) AS o_orderkey,
       |    CASE WHEN l.op = 'U' AND l.status IS NOT NULL THEN l.status
       |         ELSE COALESCE(b.o_orderstatus, 'NEW') END AS o_orderstatus,
       |    CASE WHEN l.op = 'U' THEN l.price
       |         ELSE COALESCE(b.o_totalprice, l.price) END AS price
       |  FROM base b FULL OUTER JOIN latest l ON b.o_orderkey = l.key
       |  WHERE COALESCE(l.op, '') <> 'D')""".stripMargin

  /** q89's merge, unordered — also the "new snapshot" input of q92. */
  private def mergedSnapshot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = ordersBase(s, dir)
    val latest = latestChanges(base)
    base.join(latest, base("o_orderkey") === latest("key"), "full_outer")
      .filter(coalesce($"op", lit("")) =!= "D")
      .select(coalesce($"o_orderkey", $"key").as("o_orderkey"),
        when($"op" === "U" && $"new_status".isNotNull, $"new_status")
          .otherwise(coalesce($"o_orderstatus", lit("NEW"))).as("o_orderstatus"),
        when($"op" === "U", $"price")
          .otherwise(coalesce($"o_totalprice", $"price")).as("price"))
  }

  def q89(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mergedSnapshot(s, dir).orderBy($"o_orderkey")
  }
  val q89Sql: String =
    s"""$MergedSql
       |SELECT o_orderkey, o_orderstatus, price FROM merged
       |ORDER BY o_orderkey""".stripMargin

  // ---- Q98: CDC apply through the GENERAL operator -------------------
  // The same changeset as q89 applied via the frame-shaped
  // [[graft.operators.Cdc.applyChanges]] (collapse-then-join, column-
  // wise coalesce merge) — driver-verifying the operator a real user
  // calls on their own tables. Differs from q89 only in the declared
  // insert default: general semantics leave base-only/absent payload
  // NULL ('NEW' was q89's fixture-specific default), and the oracle
  // mirrors the general contract.
  def q98(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = ordersBase(s, dir)
    val changes = changeLog(base).select(
      $"key".as("o_orderkey"), $"op",
      $"price".as("o_totalprice"), $"status".as("o_orderstatus"), $"seq")
    graft.operators.Cdc.applyChanges(base, changes, "o_orderkey")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice".as("price"))
      .orderBy($"o_orderkey")
  }
  val q98Sql: String =
    s"""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
       |$ChangesCte
       |SELECT COALESCE(b.o_orderkey, l.key) AS o_orderkey,
       |  CASE WHEN b.o_orderkey IS NULL THEN l.status
       |       WHEN l.op IS NOT NULL THEN COALESCE(l.status, b.o_orderstatus)
       |       ELSE b.o_orderstatus END AS o_orderstatus,
       |  CASE WHEN b.o_orderkey IS NULL THEN l.price
       |       WHEN l.op IS NOT NULL THEN COALESCE(l.price, b.o_totalprice)
       |       ELSE b.o_totalprice END AS price
       |FROM base b FULL OUTER JOIN latest l ON b.o_orderkey = l.key
       |WHERE COALESCE(l.op, '') <> 'D'
       |ORDER BY o_orderkey""".stripMargin

  // ---- Q99: LOCF resample through the GENERAL operator ---------------
  // q96's semantics via the frame-shaped
  // [[graft.operators.Resample.resampleLocf]]: per-(µs-timestamp, type)
  // observations (pre-collapsed with MAX so the latest-in-cell pick is
  // deterministic on both engines) onto the dense hourly grid.
  def q99(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val obs = Tables(s, dir, "events")
      .groupBy($"ts", $"event_type").agg(max($"value").as("v"))
    graft.operators.Resample.resampleLocf(obs, "event_type", "ts", "v", "hour")
      .select(date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type", $"v")
      // NULLS LAST pinned (adversarial-events finding)
      .orderBy($"hour", $"event_type".asc_nulls_last)
  }
  val q99Sql: String =
    """WITH obs AS (
      |  SELECT epoch_us(ts) AS us, event_type, MAX(value) AS v
      |  FROM events GROUP BY 1, 2),
      |cells AS (
      |  SELECT date_trunc('hour', make_timestamp(us)) AS h, event_type,
      |         arg_max(v, us) AS v
      |  FROM obs GROUP BY 1, 2),
      |bounds AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM cells),
      |spine AS (
      |  SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM bounds),
      |keys AS (SELECT DISTINCT event_type FROM obs),
      |grid AS (
      |  SELECT s.h, k.event_type, c.v
      |  FROM spine s CROSS JOIN keys k
      |  LEFT JOIN cells c ON c.h = s.h AND c.event_type = k.event_type)
      |SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type,
      |  last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
      |FROM grid ORDER BY hour, event_type NULLS LAST""".stripMargin

  // ---- Q100: one-pass column profiling -------------------------------
  // The data-quality sweep through the general operator
  // ([[graft.operators.Profiler]]): row/null/distinct counts per column
  // from ONE aggregation pass. min/max are engine-side only (cross-
  // engine number formatting differs) — the driver-verified projection
  // is the formatting-free counts.
  def q100(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Profiler
      .profile(Tables(s, dir, "lineitem"),
        Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))
      .select($"col_name", $"n_rows", $"n_nulls", $"n_distinct")
      .orderBy($"col_name")
  }
  val q100Sql: String =
    """SELECT 'l_orderkey' AS col_name, COUNT(*) AS n_rows,
      |  COUNT(*) - COUNT(l_orderkey) AS n_nulls,
      |  COUNT(DISTINCT l_orderkey) AS n_distinct FROM lineitem
      |UNION ALL SELECT 'l_quantity', COUNT(*),
      |  COUNT(*) - COUNT(l_quantity), COUNT(DISTINCT l_quantity) FROM lineitem
      |UNION ALL SELECT 'l_returnflag', COUNT(*),
      |  COUNT(*) - COUNT(l_returnflag), COUNT(DISTINCT l_returnflag) FROM lineitem
      |UNION ALL SELECT 'l_shipdate', COUNT(*),
      |  COUNT(*) - COUNT(l_shipdate), COUNT(DISTINCT l_shipdate) FROM lineitem
      |ORDER BY col_name""".stripMargin

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

  // ---- Q91: per-group winsorization (percentile clipping) ------------
  // The standard outlier-cleaning step before training-data aggregation:
  // clamp each event's value into its type's [p05, p95]. The per-group
  // cutoffs are a tiny aggregate (|groups| rows) computed in one
  // shuffle, then broadcast back — the clip itself is map-side, so the
  // corpus is read once and never re-shuffled. The cutoffs use the
  // exact continuous-quantile (bit-compatible with DuckDB, q53's
  // contract); at 100 TB a group can outgrow the exact percentile
  // buffer, and the drop-in scale path is x53's mergeable
  // approx_percentile sketch at the cost of sketch-bounded cutoffs.
  // Output rounds to 4 decimals (same guard as q53 — the clipped value
  // is an engine-arithmetic result only at the two cutoff points).
  def q91(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val cuts = ev.groupBy($"event_type").agg(
      expr("percentile(value, 0.05)").as("lo"),
      expr("percentile(value, 0.95)").as("hi"))
    ev.join(broadcast(cuts), "event_type")
      .select($"event_id", $"event_type",
        round(greatest(least($"value", $"hi"), $"lo"), 4).as("v_clip"))
      .orderBy($"event_id")
  }
  val q91Sql: String =
    """WITH cuts AS (SELECT event_type,
      |    quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
      |  FROM events GROUP BY event_type)
      |SELECT event_id, e.event_type, round(greatest(least(value, hi), lo), 4) AS v_clip
      |FROM events e JOIN cuts USING (event_type)
      |ORDER BY event_id""".stripMargin

  // ---- Q92: snapshot diff (reconciliation with change attribution) ---
  // Compare two snapshots of the same keyed table and emit one row per
  // difference: A (added), R (removed), C (changed, with the changed
  // column names). This is the reconciliation/regression primitive for
  // pipeline outputs — and composed with q89 it closes the CDC loop:
  // diff(base, apply(base, changes)) must recover exactly the net
  // changeset. One full-outer equi-join on the key, column compares
  // map-side; at 100 TB both sides shuffle once on the key (or none if
  // both snapshots are bucketed on it).
  def q92(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val old = ordersBase(s, dir)
    val neu = mergedSnapshot(s, dir)
      .select($"o_orderkey".as("n_key"), $"o_orderstatus".as("n_status"),
        $"price".as("n_price"))
    old.join(neu, old("o_orderkey") === neu("n_key"), "full_outer")
      .select(coalesce($"o_orderkey", $"n_key").as("key"),
        when($"o_orderkey".isNull, "A")
          .when($"n_key".isNull, "R").otherwise("C").as("change"),
        when($"o_orderkey".isNull || $"n_key".isNull, lit(""))
          .otherwise(concat_ws(",",
            when($"o_orderstatus" =!= $"n_status", "o_orderstatus"),
            when($"o_totalprice" =!= $"n_price", "price"))).as("changed_cols"))
      .filter($"change" =!= "C" || $"changed_cols" =!= "")
      .orderBy($"key")
  }
  val q92Sql: String =
    s"""$MergedSql
       |SELECT COALESCE(b.o_orderkey, m.o_orderkey) AS key,
       |  CASE WHEN b.o_orderkey IS NULL THEN 'A'
       |       WHEN m.o_orderkey IS NULL THEN 'R' ELSE 'C' END AS change,
       |  CASE WHEN b.o_orderkey IS NULL OR m.o_orderkey IS NULL THEN ''
       |       ELSE concat_ws(',',
       |         CASE WHEN b.o_orderstatus <> m.o_orderstatus THEN 'o_orderstatus' END,
       |         CASE WHEN b.o_totalprice <> m.price THEN 'price' END) END AS changed_cols
       |FROM base b FULL OUTER JOIN merged m ON b.o_orderkey = m.o_orderkey
       |WHERE NOT (b.o_orderkey IS NOT NULL AND m.o_orderkey IS NOT NULL
       |           AND b.o_orderstatus = m.o_orderstatus
       |           AND b.o_totalprice = m.price)
       |ORDER BY key""".stripMargin

  // ---- Q93: incremental aggregate maintenance (delta aggregation) ----
  // Maintain a per-status (count, revenue) aggregate across the CDC
  // changeset WITHOUT rescanning the base table. Every change
  // decomposes into remove-old + add-new: U/D retract the old row from
  // its group (−1, −old price), U/I add the new row to its
  // POST-CHANGE group (+1, +new price) — which handles the seq-2
  // updates that move a row between status groups, the case a naive
  // "same-group (new − old)" delta silently corrupts. All math is
  // exact DECIMAL, so the maintained total is bit-equal to a full
  // recompute — which is exactly what the oracle does (aggregate the
  // merged snapshot). At 100 TB this is the difference between
  // touching |changes| rows and touching the whole table; the base is
  // read only by the (already-maintained) baseAgg and the old-value
  // lookup join, which in a real deployment is an index/bucketed probe
  // of the changed keys, not a scan.
  def q93(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = ordersBase(s, dir)
    val baseAgg = base.groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n0"), sum(dec($"o_totalprice")).as("s0"))
    // old-value lookup: U/D need the base row they affect; I rows miss
    // base by construction (negative keys) and land in status 'NEW'
    val looked = latestChanges(base)
      .join(base, $"key" === $"o_orderkey", "left_outer")
    val removeOld = looked.filter($"op".isin("U", "D"))
      .select($"o_orderstatus", lit(-1L).as("dn"),
        (-dec($"o_totalprice")).as("ds"))
    val addNew = looked.filter($"op".isin("U", "I"))
      .select(
        when($"op" === "I", lit("NEW"))
          .when($"new_status".isNotNull, $"new_status")
          .otherwise($"o_orderstatus").as("o_orderstatus"),
        lit(1L).as("dn"), dec($"price").as("ds"))
    val deltas = removeOld.unionAll(addNew)
      .groupBy($"o_orderstatus")
      .agg(sum($"dn").as("dn"), sum($"ds").as("ds"))
    baseAgg.join(deltas, Seq("o_orderstatus"), "full_outer")
      .select($"o_orderstatus",
        (coalesce($"n0", lit(0L)) + coalesce($"dn", lit(0L))).as("n_orders"),
        rd(coalesce($"s0", lit(0).cast("decimal(18,4)")) +
          coalesce($"ds", lit(0).cast("decimal(18,4)"))).as("revenue"))
      .filter($"n_orders" > 0)
      .orderBy($"o_orderstatus")
  }
  val q93Sql: String =
    s"""$MergedSql
       |SELECT o_orderstatus, COUNT(*) AS n_orders,
       |  CAST(ROUND(SUM(CAST(price AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
       |FROM merged GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin

  // ---- Q97: funnel conversion (ordered event-pattern match) ----------
  // Per signup-day: how many signups converted (ANY purchase by the
  // same user within the next hour). Existence, not counting — the
  // purchase side is a LEFT SEMI join, so a user's 50 purchases in the
  // window neither multiply the signup row nor survive past the first
  // probe hit. The user_id equi key carries the one shuffle; the time
  // range is a residual predicate (q11's pattern — here the equi key
  // exists, so no binning is needed).
  def q97(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id", $"user_id", unix_micros($"ts").as("s_us"),
        date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), unix_micros($"ts").as("p_us"))
    val converted = signups.join(purchases,
        $"user_id" === $"p_user" && $"p_us" > $"s_us" &&
          $"p_us" <= $"s_us" + 3600L * 1000000L, "left_semi")
      .groupBy($"day").agg(count(lit(1)).as("n_converted"))
    signups.groupBy($"day").agg(count(lit(1)).as("n_signups"))
      .join(converted, Seq("day"), "left_outer")
      .select($"day", $"n_signups",
        coalesce($"n_converted", lit(0L)).as("n_converted"))
      .orderBy($"day")
  }
  val q97Sql: String =
    """WITH s AS (SELECT event_id, user_id, epoch_us(ts) AS s_us,
      |             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
      |           FROM events WHERE event_type = 'signup'),
      |p AS (SELECT user_id, epoch_us(ts) AS p_us FROM events
      |      WHERE event_type = 'purchase'),
      |conv AS (SELECT day, COUNT(*) AS n_converted FROM s
      |         WHERE EXISTS (SELECT 1 FROM p WHERE p.user_id = s.user_id
      |           AND p.p_us > s.s_us AND p.p_us <= s.s_us + 3600000000)
      |         GROUP BY day),
      |everyone AS (SELECT day, COUNT(*) AS n_signups FROM s GROUP BY day)
      |SELECT day, n_signups, COALESCE(n_converted, 0) AS n_converted
      |FROM everyone LEFT JOIN conv USING (day)
      |ORDER BY day""".stripMargin

  // ---- Q96: resample with forward fill (LOCF) ------------------------
  // q74's zero-fill sibling for state-like metrics, where an empty hour
  // means "unchanged", not "zero": build the dense hour×type spine,
  // then carry the last observed hourly sum forward
  // (last-observation-carried-forward) with an ignore-nulls running
  // window. Hours before a type's first observation stay NULL — a
  // fabricated zero would be a lie. Scale: the window partitions by
  // type and runs over the SPINE (hours × types — calendar-sized, not
  // corpus-sized), after the corpus collapsed to per-cell aggregates in
  // one shuffle.
  def q96(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .select(date_trunc("hour", $"ts").as("h"), $"event_type", $"value")
    val hourly = ev.groupBy($"h", $"event_type")
      .agg(count(lit(1)).as("n"), rd(sum(dec($"value"))).as("sum_value"))
    val spine = ev.agg(min($"h").as("mn"), max($"h").as("mx"))
      .select(explode(expr("sequence(mn, mx, interval 1 hour)")).as("h"))
    val types = ev.select($"event_type").distinct()
    val w = Window.partitionBy($"event_type").orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.crossJoin(types)
      .join(hourly, Seq("h", "event_type"), "left")
      .select(date_format($"h", "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type",
        coalesce($"n", lit(0L)).as("n"),
        last($"sum_value", ignoreNulls = true).over(w).as("filled_sum"))
      // NULLS LAST pinned (adversarial-events finding)
      .orderBy($"hour", $"event_type".asc_nulls_last)
  }
  val q96Sql: String =
    """WITH ev AS (
      |  SELECT date_trunc('hour', ts) AS h, event_type, value FROM events),
      |hourly AS (
      |  SELECT h, event_type, COUNT(*) AS n,
      |    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
      |  FROM ev GROUP BY 1, 2),
      |bounds AS (SELECT min(h) AS mn, max(h) AS mx FROM ev),
      |spine AS (
      |  SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM ev),
      |cells AS (
      |  SELECT s.h, t.event_type, COALESCE(x.n, 0) AS n, x.sum_value
      |  FROM spine s CROSS JOIN types t
      |  LEFT JOIN hourly x ON x.h = s.h AND x.event_type = t.event_type)
      |SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type, n,
      |  last_value(sum_value IGNORE NULLS) OVER (
      |    PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
      |FROM cells ORDER BY hour, event_type NULLS LAST""".stripMargin
}
