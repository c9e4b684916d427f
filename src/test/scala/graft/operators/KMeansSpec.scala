package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def centroids(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  test("identical centroids regardless of partition layout") {
    import spark.implicits._
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id",
        org.apache.spark.sql.functions.transform(
          $"embedding", _.cast("double")).as("v"))
    // the deterministic sample selection + single-threaded id-ordered
    // local sums must make the fit bit-identical across layouts
    val a = centroids(KMeans.fit(emb.repartition(7), 8, iters = 4))
    val b = centroids(KMeans.fit(emb.repartition(3), 8, iters = 4))
    assert(a == b)
  }

  test("recovers tight clusters around distinct directions") {
    import spark.implicits._
    // 3 clusters of 20 points, each a small deterministic perturbation
    // of an axis direction — k-means must assign each cluster purely
    val pts = for (c <- 0 until 3; i <- 0 until 20) yield {
      val v = Array.fill(8)(0.01 * ((c * 20 + i) % 7))
      v(c) = 10.0 + 0.1 * i
      ((c * 20 + i).toLong, v.toSeq, c)
    }
    val emb = pts.map(p => (p._1, p._2)).toDF("vec_id", "v")
    val cents = KMeans.fit(emb, 3, iters = 5)
    val assigned = graft.plans.GraftOps.topKPerGroup(
        emb.join(org.apache.spark.sql.functions.broadcast(cents))
          .select($"vec_id", $"cent_id",
            graft.functions.CosineSimilarity.cosineSim($"v", $"cv").as("sim")),
        1, Seq("vec_id"),
        Seq(graft.plans.GraftOps.Order("sim", desc = true),
          graft.plans.GraftOps.Order("cent_id")))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cent_id"))
      .toMap
    val byTrueCluster = pts.groupBy(_._3)
      .map { case (c, ps) => c -> ps.map(p => assigned(p._1)).distinct }
    // each true cluster maps to exactly one centroid, and no two true
    // clusters share a centroid
    byTrueCluster.values.foreach(cs => assert(cs.size == 1, s"$byTrueCluster"))
    assert(byTrueCluster.values.flatten.toSet.size == 3, s"$byTrueCluster")
  }

  test("empty cells keep their seed centroid") {
    import spark.implicits._
    // every point shares one direction: with c=2 the argmax tie order
    // sends all of them to cell 0, so cell 1 must retain its seed
    val emb = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(2.0, 0.0)),
      (2L, Seq(3.0, 0.0))).toDF("vec_id", "v")
    val cents = centroids(KMeans.fit(emb, 2, iters = 3))
    assert(cents.size == 2)
    assert(cents(1L) == Seq(2.0, 0.0)) // seed = vec_id 1 (second lowest)
    assert(math.abs(cents(0L).head - 2.0) < 1e-12 && cents(0L)(1) == 0.0)
  }
}
