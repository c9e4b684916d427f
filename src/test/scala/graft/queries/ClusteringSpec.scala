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

  test("empty-token-set docs are singleton components on every path " +
      "(never mutually clustered, never dropped by canonical-keep)") {
    import spark.implicits._
    // exact pairs never exist between empty sets (jaccard is
    // 0/0-undefined; q36's contract), so clustering must keep each
    // empty doc its OWN component and canonical-keep must keep ALL of
    // them — both the mask path and the generic setkey path previously
    // contracted identical-empty docs into one group
    val docs = Seq(
      (1L, Seq("a", "b", "c")), (2L, Seq("a", "b", "c")), // jac-1 pair
      (10L, Seq.empty[String]), (11L, Seq.empty[String]),
      (12L, Seq.empty[String]),
      (20L, Seq("x", "y"))).toDF("doc_id", "toks")
    for (inverted <- Seq(false, true)) {
      // exact pair operators: no pair touches an empty doc
      val pairs = LlmOps.neardupPairs(docs, 0.7, forceInverted = inverted)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L)), s"inverted=$inverted: $pairs")
      // graph path: every doc present, empties are their own rep/label
      val (membership, repEdges) = LlmOps.neardupGraph(docs, 0.7,
        forceInverted = inverted)
      val mem = membership.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(mem.keySet == Set(1L, 2L, 10L, 11L, 12L, 20L),
        s"inverted=$inverted: docs dropped from membership: $mem")
      assert(Seq(10L, 11L, 12L).forall(d => mem(d) == d),
        s"inverted=$inverted: empty docs share a rep: $mem")
      val edges = repEdges.collect().map(r => (r.get(0), r.get(1))).toSet
      assert(!edges.exists(e =>
          Set[Any](10L, 11L, 12L).contains(e._1) ||
          Set[Any](10L, 11L, 12L).contains(e._2)),
        s"inverted=$inverted: empty docs acquired edges: $edges")
    }
    // LSH path: same pair set as exact — no empty-doc pairs
    val lsh = ApproxOps.minhashNearDupPairs(docs, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == Set((1L, 2L)), s"LSH emitted empty-doc pairs: $lsh")
    // facade composition: dedup pipeline keeps every (distinct-text)
    // empty doc — canonical-keep must not collapse them
    val asDocs = Seq((1L, "a b c"), (2L, "a b c"), (10L, ""),
      (20L, "x y")).toDF("doc_id", "text")
    val kept = graft.Graft.dedupPipeline(asDocs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 20L), s"pipeline kept $kept")
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
