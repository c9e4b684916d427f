package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Domain preflight (VERDICT r9 task 6): the declared-domain rules the
  * r9 adversarial sweeps documented, now VALIDATED — each planted
  * violation from those sweeps is caught with an exact count, clean
  * data sails through, and the whole report is one aggregation pass. */
class DomainCheckSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def report(df: org.apache.spark.sql.DataFrame,
      rules: Seq[DomainCheck.Rule]): Map[(String, String), Long] =
    DomainCheck.check(df, rules).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("events domain: every planted r9-sweep violation is counted " +
      "exactly; clean rows contribute nothing") {
    import spark.implicits._
    val events = Seq(
      // clean rows (nulls are IN domain for ts/value/props)
      (1L, ts("2024-01-01 10:00:00"), 10L, "click", 5.0, """{"a":"b"}"""),
      (2L, null.asInstanceOf[Timestamp], 11L, "view", 1.5, null.asInstanceOf[String]),
      (3L, ts("2024-06-01 00:00:00"), 12L, null.asInstanceOf[String], 99.9999, "7"),
      // planted violations, one family each:
      (7L, ts("2024-01-02 00:00:00"), 13L, "dup", 1.0, null.asInstanceOf[String]),
      (7L, ts("2024-01-03 00:00:00"), 13L, "dup", 2.0, null.asInstanceOf[String]),
      (8L, ts("2024-01-04 00:00:00"), 14L, "nan", Double.NaN, null.asInstanceOf[String]),
      (9L, ts("2024-01-05 00:00:00"), 15L, "huge", 1e18, null.asInstanceOf[String]),
      (10L, ts("2100-01-01 00:00:00"), 16L, "outlier", 1.0, null.asInstanceOf[String]),
      (11L, ts("1970-01-01 00:00:01"), 17L, "outlier", 1.0, null.asInstanceOf[String]),
      (12L, ts("2024-01-06 00:00:00"), 18L, "badjson", 1.0, "not json"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = report(events, DomainCheck.rulesFor("events"))
    assert(got == Map(
      ("unique_key", "event_id") -> 1L,       // one excess row for id 7
      ("decimal_castable", "value") -> 2L,    // NaN + 1e18 overflow
      ("bounded_abs", "value") -> 2L,         // the same two
      ("ts_between", "ts") -> 2L,             // 2100 + 1970 outliers
      ("valid_json", "props") -> 1L), got.toString)
  }

  test("embeddings domain: fixed dim, well-formed-vector and key rules " +
      "count their own families independently") {
    import spark.implicits._
    def vec(seed: Int): Seq[Float] =
      Seq.tabulate(64)(d => ((seed + d) % 7).toFloat + 0.5f)
    val emb = Seq(
      (0L, vec(0), 1),
      (1L, vec(1), 1),
      (2L, vec(2).take(63), 2),                       // wrong dim (well-formed otherwise)
      (3L, null.asInstanceOf[Seq[Float]], 2),         // null vector
      (4L, vec(4).updated(5, Float.NaN), 3),          // NaN component
      (5L, Seq.fill(64)(0.0f), 3),                    // zero-norm
      (0L, vec(9), 4))                                // dup key
      .toDF("vec_id", "embedding", "label")
    val got = report(emb, DomainCheck.rulesFor("embeddings"))
    assert(got == Map(
      ("unique_key", "vec_id") -> 1L,
      ("fixed_dim", "embedding") -> 1L,
      ("well_formed_vec", "embedding") -> 3L), got.toString)
  }

  test("the real sf0.001 tables ARE in their declared domains (preflight " +
      "gate passes on conforming data)") {
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "documents", "embeddings")) {
      val df = graft.Tables(spark, dir, t)
      DomainCheck.requireClean(df, DomainCheck.rulesFor(t)) // must not throw
    }
  }

  test("the JSON literal 'null' is VALID json, not a violation " +
      "(ADVICE r10: the $-probe returns NULL for it like malformed text)") {
    import spark.implicits._
    val df = Seq("null", "  null ", """{"a":1}""", "nope", "nulls")
      .toDF("props")
    val got = report(df, Seq(DomainCheck.ValidJson("props")))
    // 'nope' and 'nulls' are malformed; bare/padded 'null' is legal
    assert(got == Map(("valid_json", "props") -> 2L), got.toString)
    DomainCheck.requireClean(
      Seq("null", """{"a":1}""").toDF("props"),
      Seq(DomainCheck.ValidJson("props"))) // must not throw
  }

  test("composite key: excess rows per duplicated tuple counted exactly; " +
      "null-component tuples don't count against keyness (or go negative)") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), 1, "a"), (Some(1L), 2, "b"),   // distinct tuples — clean
      (Some(2L), 1, "c"), (Some(2L), 1, "d"),
      (Some(2L), 1, "e"),                       // one tuple ×3 → 2 excess
      (None, 1, "f"), (None, 1, "g"))           // null keys: skipped
      .toDF("l_orderkey", "l_linenumber", "payload")
    val got = report(df,
      Seq(DomainCheck.CompositeKey(Seq("l_orderkey", "l_linenumber"))))
    assert(got ==
      Map(("composite_key", "l_orderkey+l_linenumber") -> 2L), got.toString)
  }

  test("relational presets: planted key/money/date violations on the " +
      "orders shape are counted exactly (VERDICT r10 task 7)") {
    import spark.implicits._
    val orders = Seq(
      (1L, 10L, "O", 100.5, ts("1995-01-01 00:00:00"), "1-URGENT"),
      (2L, 11L, "F", 3.25, ts("1996-06-01 00:00:00"), "2-HIGH"),
      (2L, 12L, "F", 4.0, ts("1996-06-02 00:00:00"), "2-HIGH"), // dup key
      (3L, 13L, "O", Double.NaN, ts("1997-01-01 00:00:00"), "3-MEDIUM"),
      (4L, 14L, "O", 1e18, ts("1997-01-01 00:00:00"), "3-MEDIUM"),
      (5L, 15L, "O", 9.0, ts("2100-01-01 00:00:00"), "4-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = report(orders, DomainCheck.rulesFor("orders"))
    assert(got == Map(
      ("unique_key", "o_orderkey") -> 1L,
      ("decimal_castable", "o_totalprice") -> 2L,
      ("bounded_abs", "o_totalprice") -> 2L,
      ("ts_between", "o_orderdate") -> 1L), got.toString)
  }

  test("the real sf0.001 RELATIONAL tables are in their declared " +
      "domains too (orders/lineitem/customer presets pass)") {
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("orders", "lineitem", "customer")) {
      val df = graft.Tables(spark, dir, t)
      DomainCheck.requireClean(df, DomainCheck.rulesFor(t)) // must not throw
    }
  }

  test("requireClean throws naming each violated rule with its count") {
    import spark.implicits._
    val df = Seq((1L, "x"), (1L, "y"), (2L, "not json"))
      .toDF("event_id", "props")
    val e = intercept[IllegalStateException] {
      DomainCheck.requireClean(df, Seq(
        DomainCheck.UniqueKey("event_id"), DomainCheck.ValidJson("props")))
    }
    assert(e.getMessage.contains("unique_key(event_id)=1"), e.getMessage)
    assert(e.getMessage.contains("valid_json(props)=3"), e.getMessage)
  }

  test("empty frame reports zero violations everywhere (one pass, no " +
      "null leakage from the empty aggregate)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("event_id", "value")
    val got = report(empty, Seq(DomainCheck.UniqueKey("event_id"),
      DomainCheck.BoundedAbs("value", 1e14), DomainCheck.NotNull("value")))
    assert(got.values.forall(_ == 0L), got.toString)
  }

  test("one aggregation pass: the report plan contains exactly one " +
      "Aggregate subtree chain and no joins") {
    import spark.implicits._
    val df = Seq((1L, 2.0)).toDF("event_id", "value")
    val plan = DomainCheck.check(df, Seq(DomainCheck.UniqueKey("event_id"),
      DomainCheck.BoundedAbs("value", 1e14)))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan)
  }
}
