package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Q57 connected components verified against a local union-find over
  * the same pair set. */
class ClusteringSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("near-dup clusters match a local union-find") {
    val dir = "/root/testdata/sf0.001"
    val pairs = LlmOps.q36(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    // union-find
    val parent = scala.collection.mutable.Map(docs.toSeq.map(d => d -> d): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = docs.groupBy(find).map { case (root, ms) =>
      ms.min -> ms.length.toLong
    }
    val got = LlmOps3.q57(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.size < docs.length, "expected at least one non-trivial cluster")
  }

  test("Q80 keeps exactly the union-find canonical (min) doc per component") {
    val dir = "/root/testdata/sf0.001"
    val pairs = LlmOps.q36(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(docs.toSeq.map(d => d -> d): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = docs.groupBy(find).values.map(_.min).toSet
    val got = LlmOps3.q80(spark, dir).collect().map(_.getLong(0)).toSet
    assert(got == want)
    // cluster-canonical keeps a subset of what greedy retention keeps:
    // q76 drops only docs with an earlier near-dup; q80 also collapses
    // chains through dropped intermediates
    val greedy = LlmOps5.q76(spark, dir).collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(greedy))
  }

  test("materialize-once labels: q57From/q80From from Graft.nearDupLabels " +
      "≡ the standalone queries") {
    val dir = "/root/testdata/sf0.001"
    // ONE propagation run, two consumers — the facade path a real
    // pipeline should take (VERDICT r3 task 1)
    val labels = graft.Graft.nearDupLabels(spark, dir)
    val sizes = graft.Graft.clusterSizes(spark, labels).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val kept = graft.Graft.clusterCanonicals(spark, dir, labels).collect()
      .map(_.getLong(0)).toSeq
    // standalone queries each run their own propagation; outputs must be
    // identical to the shared-label path
    val wantSizes = LlmOps3.q57(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val wantKept = LlmOps3.q80(spark, dir).collect()
      .map(_.getLong(0)).toSeq
    assert(sizes == wantSizes)
    assert(kept == wantKept)
    // and the label relation itself is coherent: every kept doc is its
    // own label, cluster sizes sum to the doc count
    val labelMap = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    kept.foreach(d => assert(labelMap(d) == d))
    assert(sizes.map(_._2).sum == labelMap.size)
  }
}
