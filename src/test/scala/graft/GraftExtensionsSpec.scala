package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .withExtensions(new GraftExtensions)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("rolling_hash is callable from SQL via session extensions") {
    // matches the portable SQL formulation for ASCII input
    val got = spark.sql("SELECT rolling_hash('abc', 64) h")
      .collect().head.getLong(0)
    val want = "abc".getBytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    assert(got == want)
    // one-arg form hashes the whole string
    assert(spark.sql("SELECT rolling_hash('abc') h").collect().head.getLong(0) == want)
  }

  test("cosine_sim returns NULL for arrays containing null elements") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) c")
      .collect().head
    assert(r.isNullAt(0), "null element must yield SQL NULL, not garbage")
  }

  test("cosine_sim auto-casts float arrays from SQL (ADVICE regression)") {
    val r = spark.sql(
      "SELECT round(cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))), 6) c")
      .collect().head.getDouble(0)
    assert(r == 1.0)
  }

  test("TopKStrategy is injected: DataFrame top-k plans without manual registration") {
    import spark.implicits._
    // fresh strategy path: GraftOps also lazily registers, so assert the
    // extension injection independently via the session's planner
    assert(spark.sessionState.planner.strategies.exists(
      _.getClass.getName.contains("TopKStrategy")))
  }

  private def windowTopK = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = (0 until 100).map(i => (i % 5, i)).toDF("grp", "v")
    val w = Window.partitionBy($"grp").orderBy($"v".desc, $"grp")
    df.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
      .select($"grp", $"rnk", $"v")
  }

  test("TopKRewrite is inert without the opt-in conf") {
    val df = windowTopK
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Window") && !p.contains("TopKPerGroup"),
      s"stock plan was altered without opt-in:\n$p")
  }

  test("TopKRewrite rewrites the window-top-k pattern when opted in") {
    val baseline = windowTopK.collect().map(_.toSeq).toSet
    spark.conf.set(graft.plans.TopKRewrite.ConfKey, "true")
    try {
      val df = windowTopK
      val rows = df.collect().map(_.toSeq).toSet
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerGroup"), s"rewrite did not fire:\n$p")
      assert(!p.contains("Window"), s"Window survived the rewrite:\n$p")
      assert(rows == baseline, "rewritten plan changed the result")
    } finally spark.conf.set(graft.plans.TopKRewrite.ConfKey, "false")
  }

  test("TopKRewrite leaves global (no PARTITION BY) top-N untouched and working") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    spark.conf.set(graft.plans.TopKRewrite.ConfKey, "true")
    try {
      val df = (0 until 50).map(i => (i % 5, i)).toDF("grp", "v")
        .withColumn("rnk", row_number().over(Window.orderBy($"v".desc)))
        .filter($"rnk" <= 3).select($"rnk", $"v")
      // ClusteredDistribution(Nil) is illegal, so the rule must skip
      // this shape — an opted-in session must not break queries that
      // work without the opt-in
      val rows = df.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(rows == Set((1, 49), (2, 48), (3, 47)))
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    } finally spark.conf.set(graft.plans.TopKRewrite.ConfKey, "false")
  }

  test("cosine_sim is callable from SQL via session extensions") {
    val r = spark.sql(
      "SELECT round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) c")
      .collect().head.getDouble(0)
    assert(r == 1.0)
    val orth = spark.sql(
      "SELECT round(cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)), 6) c")
      .collect().head.getDouble(0)
    assert(orth == 0.0)
  }
}
