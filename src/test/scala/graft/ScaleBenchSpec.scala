package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The scale-crossover harness's generators must be PURE functions of
  * (seed, id): the SCALING.md numbers are only reproducible if a rerun
  * regenerates byte-identical corpora, and the near-dup density the
  * measurements assume has to actually be planted. */
class ScaleBenchSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("genDocs is deterministic across runs and partitionings, and " +
      "plants real ≥-threshold near-dup pairs at roughly the asked rate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def snap(parts: Int): Map[Long, String] =
      ScaleBench.genDocs(spark, 2000, 0.05, 3000, 42)
        .repartition(parts).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = snap(4)
    assert(a == snap(13), "generation depends on partitioning or reruns")
    // planted density: the exact pair operator finds pairs on the order
    // of the dup fraction (each dup doc forms ≥1 pair with its base;
    // chains/exact-set groups can add more)
    val toks = ScaleBench.genDocs(spark, 2000, 0.05, 3000, 42)
      .select($"doc_id", array_distinct(split($"text", " ")).as("toks"))
    val pairs = queries.LlmOps.neardupPairs(toks, 0.7, sorted = false).count()
    assert(pairs >= 50 && pairs <= 1000, s"planted density off: $pairs pairs")
  }

  test("genEmbeddings is deterministic and clustered (same-cluster " +
      "cosine ≫ cross-cluster)") {
    import spark.implicits._
    val a = ScaleBench.genEmbeddings(spark, 500, 8, 99).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = ScaleBench.genEmbeddings(spark, 500, 8, 99).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
    def cos(x: Seq[Double], y: Seq[Double]): Double = {
      val dot = x.zip(y).map { case (p, q) => p * q }.sum
      dot / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    // nearest-by-cosine neighbors should be far more similar than a
    // fixed cross pair on clustered data
    val vs = a.values.toIndexedSeq
    val sims = for (i <- 0 until 50; j <- (i + 1) until 50)
      yield cos(vs(i), vs(j))
    assert(sims.max > 0.95, s"no tight same-cluster pair: max ${sims.max}")
    assert(sims.min < 0.5, s"no distant cross-cluster pair: min ${sims.min}")
  }

  test("genAsof plants the hot key at the asked size, deterministically") {
    val (l1, r1) = ScaleBench.genAsof(spark, 1000L, 3, 100L, 7)
    val (l2, r2) = ScaleBench.genAsof(spark, 1000L, 3, 100L, 7)
    assert(r1.collect().toSeq == r2.collect().toSeq)
    assert(l1.collect().toSeq == l2.collect().toSeq)
    val byKey = r1.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey("hot") == 1000L, byKey.toString)
    assert(byKey.filter(_._1 != "hot").values.forall(_ == 100L), byKey.toString)
  }
}
