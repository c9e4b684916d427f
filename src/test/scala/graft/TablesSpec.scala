package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The era-branching events loader: the micros-era (TIMESTAMP_NTZ)
  * promotion must be timezone-INDEPENDENT — same instants in any
  * session timezone (the nanos-era Long path is tz-free by
  * construction), and a micros-era read must not flip the session-wide
  * legacy nanos conf. */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("events loads identical instants under UTC and a shifted " +
      "session timezone (micros-era tz independence)") {
    def instants(): Seq[Long] =
      Tables(spark, dir, "events")
        .select(unix_micros(col("ts")).as("um"))
        .orderBy(col("um"))
        .limit(50).collect().map(_.getLong(0)).toSeq
    val utc = instants()
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      // +05:30 — a non-hour offset catches both sign and magnitude bugs
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      assert(instants() == utc,
        "events instants shifted with the session timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
    assert(utc.nonEmpty)
  }

  test("loader fails loudly when inferTimestampNTZ is disabled instead " +
      "of silently passing a session-reinterpreted TimestampType through") {
    // ADVICE r7 #3: with spark.sql.parquet.inferTimestampNTZ.enabled=
    // false a micros NTZ column surfaces as TimestampType — wall clock
    // reinterpreted in the session timezone, indistinguishable from a
    // genuinely UTC-adjusted file. The loader must refuse, not guess.
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "false")
      val e = intercept[IllegalStateException](
        Tables(spark, dir, "events").count())
      assert(e.getMessage.contains("inferTimestampNTZ"), e.getMessage)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("micros-era read does not flip the session-wide nanos conf") {
    // this suite's session does NOT preset the legacy key, so a clean
    // micros-era load must leave it unset (ADVICE: flipping it changes
    // how unrelated nanos-timestamp parquet reads behave session-wide)
    assert(!spark.conf.getOption(Tables.NanosKey).contains("true"),
      "precondition: suite session must not preset the nanos conf")
    Tables(spark, dir, "events").count()
    assert(!spark.conf.getOption(Tables.NanosKey).contains("true"),
      "micros-era load flipped the session-wide nanos conf")
  }
}
