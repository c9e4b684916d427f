package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch twins of the streaming queries (SURVEY.md §2.C.9, rule 7):
  * the same windowed aggregations expressed over the static `events`
  * table. The streaming forms (readStream + watermark) live in
  * [[graft.streaming.EventStreams]] and are asserted equal to these in
  * the test suite; the DuckDB oracle verifies the batch results here.
  */
object StreamingBatch {
  import Relational.{dec, rd}

  // ---- Q32 ST: tumbling 1-hour window ---------------------------------
  def q32(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), rd(sum(dec($"value"))).as("sum_value"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n", $"sum_value")
      // NULLS LAST pinned (adversarial-events finding): Spark sorts a
      // null event_type group first, DuckDB last. A null EVENT TIME
      // belongs to no window on either side — Spark's window() drops it
      // structurally; the oracle filters it explicitly.
      .orderBy($"window_start", $"event_type".asc_nulls_last)
  }
  val q32Sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),2) AS DOUBLE) AS sum_value
      |FROM events WHERE ts IS NOT NULL
      |GROUP BY 1, 2 ORDER BY window_start, event_type NULLS LAST""".stripMargin

  // ---- Q33 ST: sliding 1 hour / 15 min window -------------------------
  // Spark's window() with slide assigns each event to 4 windows aligned
  // to the epoch; the oracle reproduces that assignment arithmetically.
  def q33(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy(window($"ts", "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), rd(sum(dec($"value"))).as("sum_value"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"n", $"sum_value")
      .orderBy($"window_start")
  }
  val q33Sql: String =
    """WITH e AS (SELECT epoch_us(ts) AS us, value FROM events
      |           WHERE ts IS NOT NULL),
      |w AS (SELECT (us // 900000000) * 900000000 - i * 900000000 AS ws_us, value
      |      FROM e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i))
      |SELECT strftime(make_timestamp(ws_us), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),2) AS DOUBLE) AS sum_value
      |FROM w GROUP BY 1 ORDER BY window_start""".stripMargin

  // ---- Q34 ST: session window, 30-minute gap, per user ----------------
  // Spark side uses the native session_window operator; the oracle is the
  // classic gaps-and-islands formulation (lag → new-session flag →
  // cumulative sum → group). Session span is emitted in exact micros.
  def q34(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros($"ts")).as("start_us"),
        (max(unix_micros($"ts")) - min(unix_micros($"ts"))).as("span_us"))
      .select($"user_id", $"start_us", $"span_us", $"n_events")
      .orderBy($"user_id", $"start_us")
  }
  val q34Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events
      |           WHERE ts IS NOT NULL),
      |f AS (SELECT user_id, us,
      |        CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
      |             OR LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
      |             THEN 1 ELSE 0 END AS new_s
      |      FROM e),
      |g AS (SELECT user_id, us,
      |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM f)
      |SELECT user_id, MIN(us) AS start_us, MAX(us) - MIN(us) AS span_us,
      |  COUNT(*) AS n_events
      |FROM g GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin

  // ---- Q74: time-series resample + gap fill ---------------------------
  // The dashboard/feature-store primitive: hourly per-type counts over a
  // DENSE time spine — (hour, type) cells with no events emit zeros
  // instead of disappearing (215 such cells at sf0.01). The spine is
  // generated from the data's own bounds (sequence of hours) and
  // cross-joined with the type dimension; both are tiny by construction
  // (hours × |types|), so the gap-fill join broadcasts and the only
  // data-sized work is the pre-aggregation, which map-side combines.
  def q74(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.queries.Relational.{dec, rd}
    val ev = Tables(s, dir, "events")
      .select(date_trunc("hour", $"ts").as("h"), $"event_type", $"value")
    val hourly = ev.groupBy($"h", $"event_type")
      .agg(count(lit(1)).as("n"), rd(sum(dec($"value"))).as("sum_value"))
    val spine = ev.agg(min($"h").as("mn"), max($"h").as("mx"))
      .select(explode(expr("sequence(mn, mx, interval 1 hour)")).as("h"))
    val types = ev.select($"event_type").distinct()
    spine.crossJoin(types)
      .join(hourly, Seq("h", "event_type"), "left")
      .select(date_format($"h", "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type",
        coalesce($"n", lit(0L)).as("n"),
        coalesce($"sum_value", lit(0.0)).as("sum_value"))
      // NULLS LAST pinned (adversarial-events finding; the null-type
      // DIMENSION row is kept by both engines — its cells are all-zero
      // because SQL equality never matches the null key on either side)
      .orderBy($"hour", $"event_type".asc_nulls_last)
  }
  val q74Sql: String =
    """WITH ev AS (
      |  SELECT date_trunc('hour', ts) AS h, event_type, value FROM events),
      |hourly AS (
      |  SELECT h, event_type, COUNT(*) AS n,
      |    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
      |  FROM ev GROUP BY 1, 2),
      |bounds AS (SELECT min(h) AS mn, max(h) AS mx FROM ev),
      |spine AS (
      |  SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM ev)
      |SELECT strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
      |  t.event_type AS event_type,
      |  COALESCE(hh.n, 0) AS n, COALESCE(hh.sum_value, 0.0) AS sum_value
      |FROM spine s CROSS JOIN types t
      |LEFT JOIN hourly hh ON hh.h = s.h AND hh.event_type = t.event_type
      |ORDER BY hour, t.event_type NULLS LAST""".stripMargin
}
