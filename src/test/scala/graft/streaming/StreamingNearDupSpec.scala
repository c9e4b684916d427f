package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** E09: streaming near-dup detection — exact-verified precision,
  * q47-grade banding recall, stream == batch, bounded state. */
class StreamingNearDupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  private def exactPairs: Set[(Long, Long)] =
    graft.queries.LlmOps.q36(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("batch twin: emitted pairs ⊆ exact pairs, recall >= 0.95") {
    import spark.implicits._
    val sigs = graft.queries.ApproxOps.docSigs(spark, dir).as[DocSig]
    val got = StreamingNearDup.matches(sigs).collect()
      .map(m => (m.doc_a, m.doc_b)).toSet // consumer-side dedupe
    val exact = exactPairs
    assert(got.subsetOf(exact), // the verify is exact → zero false pairs
      s"false pairs: ${(got -- exact).take(5)}")
    val recall = (exact & got).size.toDouble / exact.size
    assert(exact.nonEmpty && recall >= 0.95, s"recall $recall")
  }

  test("streaming: incremental matches across micro-batches == batch run, " +
      "state = distinct buckets") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val sigRows = graft.queries.ApproxOps.docSigs(spark, dir).as[DocSig]
      .collect().toSeq
    // all 16 band rows of a doc must arrive in the same micro-batch
    val byDoc = sigRows.groupBy(_.doc_id).toSeq.sortBy(_._1).map(_._2)
    val batches = byDoc.grouped(math.max(1, byDoc.size / 3))
      .map(_.flatten).toSeq
    val mem = MemoryStream[DocSig]
    val q = StreamingNearDup.matches(mem.toDS()).writeStream
      .format("memory").queryName("e09")
      .outputMode(OutputMode.Append()).start()
    val firstBatchDocs = batches.head.map(_.doc_id).toSet
    mem.addData(batches.head)
    q.processAllAvailable()
    val early = spark.table("e09").as[NearDupMatch].collect()
      .map(m => (m.doc_a, m.doc_b)).toSet
    // incremental property: nothing emitted against unseen documents
    assert(early.forall(p =>
      firstBatchDocs.contains(p._1) && firstBatchDocs.contains(p._2)))
    batches.tail.foreach { b => mem.addData(b); q.processAllAvailable() }
    val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
    q.stop()
    val streamed = spark.table("e09").as[NearDupMatch].collect()
      .map(m => (m.doc_a, m.doc_b)).toSet
    val batchRun = StreamingNearDup
      .matches(sigRows.toDS()).collect().map(m => (m.doc_a, m.doc_b)).toSet
    assert(streamed == batchRun && streamed.nonEmpty)
    // state is the corpus's signature footprint: one row per distinct
    // (band, sig) bucket — bounded by content, not stream length
    val buckets = sigRows.map(s => (s.band, s.sig)).distinct.size
    assert(stateRows == buckets, s"$stateRows state rows vs $buckets buckets")
  }
}
