package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF index: build-once/query-many must reproduce the
  * inline q48 formulation exactly (same deterministic codebook), and
  * the probed-cells partition prune must reach the assignments scan. */
class IvfIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("persisted index query == inline q48; probe prunes partitions") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val emb = graft.Tables(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    IvfIndex.build(emb, idx, c = 16)
    // the index is plain parquet: one dir per cell
    val cellDirs = new java.io.File(s"$idx/assignments").listFiles()
      .filter(_.getName.startsWith("cent_id=")).map(_.getName).sorted
    assert(cellDirs.length > 1, cellDirs.mkString(","))

    val queries = emb.filter($"vec_id".isin(0, 1, 2))
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val fromIndex = IvfIndex.query(spark, idx, queries, k = 10, nprobe = 4)
    val inline = graft.queries.ApproxOps.q48(spark, dir)
    val a = fromIndex.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val b = inline.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(a.nonEmpty && a == b)

    // the probed-cell filter must reach the assignments scan as a
    // partition filter (so only nprobe-ish of the 16 cell dirs are read)
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cent_id"), plan)
  }

  test("incremental append: new vectors join existing cells with ZERO " +
      "k-means refits and a frozen codebook; recall holds vs a rebuild") {
    import spark.implicits._
    val emb = graft.Tables(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val base = emb.filter($"vec_id" % 5 =!= 0 || $"vec_id".isin(0))
    val delta = emb.filter($"vec_id" % 5 === 0 && !$"vec_id".isin(0))
    val idxA = java.nio.file.Files.createTempDirectory("ivf_app").toString
    val idxB = java.nio.file.Files.createTempDirectory("ivf_reb").toString
    IvfIndex.build(base, idxA, c = 16)
    val centsBefore = spark.read.parquet(s"$idxA/centroids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

    // the append itself: no KMeans.fit call, no codebook change, and
    // every delta row lands in some existing cell partition
    val fitsBefore = KMeans.fitCount.get()
    IvfIndex.append(spark, idxA, delta)
    assert(KMeans.fitCount.get() == fitsBefore,
      "append refit the quantizer — the rebuild path's job")
    val centsAfter = spark.read.parquet(s"$idxA/centroids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(centsAfter == centsBefore, "append mutated the codebook")
    assert(spark.read.parquet(s"$idxA/assignments").count() == emb.count())

    // query quality: the appended index meets the same recall bound vs
    // exact brute force (q37) as a full rebuild over base ∪ delta does
    // (codebooks differ — base-fit vs full-fit — so results need not be
    // identical; the bound is the contract, per the drift note)
    IvfIndex.build(emb, idxB, c = 16)
    val queries = emb.filter($"vec_id".isin(0, 1, 2))
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val exact = graft.queries.LlmOps.q37(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(idx: String): Double = {
      val got = IvfIndex.query(spark, idx, queries, k = 10, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(got.size == 30)
      (exact & got).size.toDouble / exact.size
    }
    val rAppended = recall(idxA)
    val rRebuilt = recall(idxB)
    assert(rAppended >= 0.6, s"appended-index recall $rAppended")
    assert(rRebuilt >= 0.6, s"rebuilt-index recall $rRebuilt")
    Seq(idxA, idxB).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
  }

  test("stats: a skewed append drives skew and appendedFraction past " +
      "the refit thresholds; a fresh build reads balanced") {
    import spark.implicits._
    // 4 well-separated clusters (one-hot corners + small noise): the
    // farthest-first codebook lands one centroid per corner, so cell
    // membership — and therefore the balance numbers — is predictable
    val rng = new scala.util.Random(5)
    def around(corner: Int, id: Long): (Long, Seq[Double]) =
      (id, Seq.tabulate(4)(i =>
        (if (i == corner) 1.0 else 0.0) + rng.nextGaussian() * 0.01))
    val base = (0 until 40).map(i => around(i % 4, i.toLong))
    val idx = java.nio.file.Files.createTempDirectory("ivf_stats").toString
    IvfIndex.build(base.toDF("vec_id", "v"), idx, c = 4)
    val s0 = IvfIndex.stats(spark, idx)
    assert(s0.cells == 4 && s0.rows == 40L, s0.toString)
    assert(s0.appendedFraction == 0.0, s0.toString)
    assert(s0.skew <= 1.5, s"fresh build should be balanced: $s0")

    // everything appended lands in corner 0's cell: 70/100 rows in one
    // cell of 4 → fattest 0.7, skew 2.8 — the refit signal
    val delta = (0 until 60).map(i => around(0, 1000L + i))
    IvfIndex.append(spark, idx, delta.toDF("vec_id", "v"))
    val s1 = IvfIndex.stats(spark, idx)
    assert(s1.rows == 100L, s1.toString)
    assert(math.abs(s1.appendedFraction - 0.6) < 1e-9, s1.toString)
    assert(s1.fattestCellFraction >= 0.65, s1.toString)
    assert(s1.skew >= 2.0, s"skewed append must trip the signal: $s1")

    // compaction: append slivers merge per cell, queries identical
    val queries = (delta.take(3) ++ base.take(3))
      .toDF("query_id", "qv")
      .selectExpr("query_id", "qv")
    val wantQ = IvfIndex.query(spark, idx, queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    val (fb, fa) = IvfIndex.compact(spark, idx)
    assert(fa < fb, s"compact must shrink files: $fb -> $fa")
    val s2 = IvfIndex.stats(spark, idx)
    assert(s2.rows == s1.rows && s2.skew == s1.skew,
      s"compact must not touch contents: $s1 vs $s2")
    val gotQ = IvfIndex.query(spark, idx, queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    assert(gotQ == wantQ, "query diverged after compact")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
  }
}
