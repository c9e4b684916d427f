package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-hygiene round (q108/q109/q111) + the bucketed co-located
  * join (q110): operator semantics the oracle gate can't isolate —
  * first-occurrence line retention, reassembly order, zero-survivor
  * rows — and the q110 PLAN property (no shuffle under the join),
  * which result equality alone would never notice. */
class LlmOps7Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("lineDedup keeps a line only at its first (id, position) " +
      "occurrence, reassembles in original order, and keeps " +
      "zero-survivor rows with empty text") {
    import spark.implicits._
    val docs = Seq(
      // doc 1: within-doc duplicate of "a b" — kept ONCE (first pos)
      (1L, Seq("a b", "c d", "a b")),
      // doc 2: cross-doc duplicates of doc 1's lines, one fresh line
      (2L, Seq("c d", "x y", "a b")),
      // doc 3: every line already seen → zero survivors
      (3L, Seq("a b", "c d", "x y")),
      // doc 4: no lines at all
      (4L, Seq.empty[String])
    ).toDF("doc_id", "lines")
    val got = graft.operators.Dedup.lineDedup(docs, "doc_id", "lines",
        sep = " | ")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got === Array(
      (1L, 3L, 2L, "a b | c d"),
      (2L, 3L, 1L, "x y"),
      (3L, 3L, 0L, ""),
      (4L, 0L, 0L, "")))
  }

  test("lineDedup: NULL line entries form one dedup group — one " +
      "survivor, counted in n_kept, omitted from new_text") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("a", null)),
      (2L, Seq(null, "b"))
    ).toDF("doc_id", "lines")
    val got = graft.operators.Dedup.lineDedup(docs, "doc_id", "lines", " ")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got === Array(
      (1L, 2L, 2L, "a"), // the null survives here (first occurrence)...
      (2L, 2L, 1L, "b"))) // ...and is dropped here
  }

  test("lineDedup passes non-line columns through and rejects frames " +
      "that collide with its reserved scratch names") {
    import spark.implicits._
    val docs = Seq((1L, "meta", Seq("l1")), (2L, "meta2", Seq("l1")))
      .toDF("doc_id", "tag", "lines")
    val got = graft.operators.Dedup.lineDedup(docs, "doc_id", "lines")
      .orderBy($"doc_id")
      .select($"doc_id", $"tag", $"n_kept").as[(Long, String, Long)]
      .collect()
    assert(got === Array((1L, "meta", 1L), (2L, "meta2", 0L)))
    val bad = Seq((1L, 0, Seq("l"))).toDF("doc_id", "__li", "lines")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.lineDedup(bad, "doc_id", "lines")
    }
    assert(e.getMessage.contains("__li"))
  }

  test("q110's join of the bucketed tables plans with NO shuffle " +
      "exchange under the join — the co-located layout IS the point") {
    Sources.bucketedTables(spark, dir)
    // force the large-large regime the layout exists for: at fixture
    // scale Catalyst (rightly) broadcasts the dimension instead, and a
    // broadcast join never consults bucketing at all
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      saved.foreach { case (k, _) => spark.conf.set(k, "-1") }
      check()
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def check(): Unit = {
    import spark.implicits._
    val j = spark.table("q110_orders_b")
      .join(spark.table("q110_customer_b"), $"o_custkey" === $"c_custkey")
    j.count() // materialize so AQE commits its final plan
    val plan = j.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan // collect() does not descend into the AQE wrapper
      case p => p
    }
    val joins = plan.collect {
      case smj: SortMergeJoinExec => smj: org.apache.spark.sql.execution.SparkPlan
      case shj: ShuffledHashJoinExec => shj
    }
    assert(joins.nonEmpty, s"expected a shuffle-class join:\n$plan")
    val exchangesUnderJoin = joins.flatMap(_.collect {
      case e: ShuffleExchangeExec => e
    })
    assert(exchangesUnderJoin.isEmpty,
      s"bucketed join still shuffles:\n$plan")
    // and the result is the plain join's result
    val expected = graft.Tables(spark, dir, "orders")
      .join(graft.Tables(spark, dir, "customer"),
        $"o_custkey" === $"c_custkey").count()
    assert(j.count() === expected)
  }

  test("q109 entropy HOF: uniform text hits log2(k) exactly; " +
      "single-char text is +0.0, not -0.0") {
    import spark.implicits._
    // 4 equiprobable chars → exactly 2 bits; 'aaaa' → 0 bits
    val chs = filter(split($"text", ""), c => c =!= lit(""))
    val t = size(chs).cast("double")
    val probs = transform(array_distinct(chs),
      c => size(filter(chs, x => x === c)).cast("double") / t)
    val ent = when(size(chs) > 0,
      round(-aggregate(probs, lit(0.0),
        (acc, p) => acc + p * log(p) / log(lit(2.0))), 6) + lit(0.0))
    val got = Seq("abcd", "aaaa").toDF("text").select(ent.as("e"))
      .as[Double].collect()
    assert(got(0) === 2.0)
    assert(got(1) === 0.0)
    assert(1.0 / got(1) === Double.PositiveInfinity, "-0.0 leaked")
  }
}
