package graft.operators

import java.util.concurrent.{SynchronousQueue, TimeUnit}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Readers take no [[MaintenanceLease]] — the stores' no-reader-lease
  * design rests on "the swap protocol makes a torn read LOUD, never
  * silent". Until now that was an argument; these specs make it
  * evidence (VERDICT r12 task 3): a maintenance `compact` is HELD
  * inside each of [[Compaction.swapDir]]'s two windows (via the
  * pauseHook seam — a sleep cannot pin the interleave) while a probe
  * runs from a second thread, and every probe must either return
  * exactly the correct answer (pre- and post-swap bytes are the same
  * rows — compaction preserves contents) or throw. An EMPTY or partial
  * result is the one forbidden outcome.
  *
  * Window 1, `swap-mid` (live dir renamed aside, replacement not yet
  * in place): there is NO live dir — a reader that lists the path
  * fails loudly (missing path / vanished files), which is the design's
  * loud-not-silent claim. Window 2, `swap-pre-clean` (replacement
  * live, `__old` copy not yet deleted): the live tree is complete and
  * consistent — a reader must SUCCEED with the correct rows. */
class SwapRacingReaderSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docs(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map(i =>
      (i, Seq("a", "b", s"t${i % 5}", s"u${i % 3}"))).toDF("doc_id", "toks")
  }

  private def sortedRows(d: DataFrame): Seq[String] =
    d.collect().map(_.mkString("|")).toSeq.sorted

  /** Run `maintenance` on a daemon thread, pausing at every
    * [[Compaction.swapDir]] window; at each of the `fires` expected
    * pauses run `probe` from THIS thread and enforce the loud-or-correct
    * contract (`expected` = the correct answer; at a `swap-pre-clean`
    * window success is REQUIRED — the live tree is complete there).
    * Returns (successes, loudFailures) over the windows. */
  private def raceProbes(fires: Int, expected: Seq[String])(
      maintenance: => Unit)(probe: () => Seq[String]): (Int, Int) = {
    val atPause = new SynchronousQueue[String]()
    val resume = new SynchronousQueue[java.lang.Boolean]()
    Compaction.pauseHook = Some { p => atPause.put(p); resume.take(); () }
    @volatile var maintErr: Throwable = null
    val t = new Thread(() =>
      try maintenance catch { case e: Throwable => maintErr = e })
    t.setDaemon(true) // a failed assertion must not wedge the suite
    t.start()
    var ok = 0
    var loud = 0
    try {
      for (i <- 1 to fires) {
        val point = atPause.poll(120, TimeUnit.SECONDS)
        assert(point != null, s"maintenance never reached pause $i of $fires")
        scala.util.Try(probe()) match {
          case scala.util.Success(rows) =>
            assert(rows == expected,
              s"probe during window '$point' (fire $i) returned a TORN " +
                s"result: ${rows.size} rows vs expected ${expected.size} — " +
                "the swap leaked a silent partial read")
            ok += 1
          case scala.util.Failure(_) if point == "swap-pre-clean" =>
            fail(s"probe FAILED during '$point' (fire $i) — the live " +
              "tree is complete in that window; a reader must succeed")
          case scala.util.Failure(_) => loud += 1 // the documented outcome
        }
        resume.put(java.lang.Boolean.TRUE)
      }
      t.join(180000)
      assert(!t.isAlive, "maintenance did not finish after the last window")
      assert(maintErr == null, s"maintenance failed: $maintErr")
    } finally Compaction.pauseHook = None
    (ok, loud)
  }

  test("signature-store probe racing compact: loud-or-correct through " +
      "all four swap windows (sigs + toksets, mid + pre-clean), and " +
      "correct after") {
    val dir = tmp("race_store")
    NearDupSignatureStore.build(docs(60), dir, threshold = 0.5, cells = 4)
    NearDupSignatureStore.append(spark, dir, docs(60)
      .selectExpr("doc_id + 100 as doc_id", "toks")) // 2nd sliver set
    val delta = docs(6).selectExpr("doc_id + 1000 as doc_id", "toks")
    val expected = sortedRows(NearDupSignatureStore.probe(spark, dir, delta))
    assert(expected.nonEmpty, "fixture: probe must actually find pairs")
    // compact swaps sigs (compactPartitioned) then toksets: 2 swaps ×
    // 2 windows = 4 fires
    val (ok, loud) = raceProbes(4, expected) {
      NearDupSignatureStore.compact(spark, dir, targetBytes = 1L << 30)
    } { () => sortedRows(NearDupSignatureStore.probe(spark, dir, delta)) }
    assert(ok + loud == 4)
    assert(ok >= 2, // both pre-clean windows MUST have succeeded
      s"no successful mid-maintenance probe at all (ok=$ok loud=$loud)")
    assert(sortedRows(NearDupSignatureStore.probe(spark, dir, delta))
      == expected, "probe diverged after the compaction")
  }

  test("refreshOutput racing a FOLD's mix/meta finishSwap: a reader " +
      "mid-fold sees the PRE-fold answer, the POST-fold answer, or " +
      "fails loudly — never an empty/partial corpus (the fold changes " +
      "content, so linearizing on either side of the swap is correct)") {
    import spark.implicits._
    import graft.queries.{CorpusPipeline, CorpusPipelineDelta}
    def txt(seed: Int): String =
      (0 until 30).map(i => s"w${seed}_$i").mkString(" ")
    def docsDf(ids: Seq[Int]) = ids.map(i =>
      (i.toLong, txt(i), "en", s"src${i % 2}"))
      .toDF("doc_id", "text", "lang", "source")
    val eval = Seq((900L, "alpha beta gamma benchmark suite text"))
      .toDF("doc_id", "text")
    val cfg = CorpusPipeline.Config(evalDocs = Some(eval))
    val state = tmp("race_fold") + "/state"
    CorpusPipelineDelta.foldIncrement(docsDf(1 to 8), state, cfg)
    val pre = sortedRows(CorpusPipelineDelta.refreshOutput(spark, state, cfg))
    assert(pre.nonEmpty)
    // day-2 fold: finishSwap runs on the mix dir and the meta dir —
    // 2 swaps × 2 windows = 4 pauseHook fires
    val atPause = new SynchronousQueue[String]()
    val resume = new SynchronousQueue[java.lang.Boolean]()
    Compaction.pauseHook = Some { p => atPause.put(p); resume.take(); () }
    @volatile var foldErr: Throwable = null
    val t = new Thread(() =>
      try CorpusPipelineDelta.foldIncrement(docsDf(11 to 16), state, cfg)
      catch { case e: Throwable => foldErr = e })
    t.setDaemon(true)
    t.start()
    val probed = scala.collection.mutable.ArrayBuffer
      .empty[scala.util.Try[Seq[String]]]
    try {
      for (i <- 1 to 4) {
        val point = atPause.poll(120, TimeUnit.SECONDS)
        assert(point != null, s"fold never reached pause $i of 4")
        probed += scala.util.Try(
          sortedRows(CorpusPipelineDelta.refreshOutput(spark, state, cfg)))
        resume.put(java.lang.Boolean.TRUE)
      }
      t.join(180000)
      assert(!t.isAlive, "fold did not finish after the last window")
      assert(foldErr == null, s"fold failed: $foldErr")
    } finally Compaction.pauseHook = None
    val post = sortedRows(CorpusPipelineDelta.refreshOutput(spark, state, cfg))
    assert(post != pre, "fixture: the fold must change the corpus")
    val succeeded = probed.collect { case scala.util.Success(rows) => rows }
    succeeded.foreach { rows =>
      assert(rows == pre || rows == post,
        s"mid-fold reader returned a TORN corpus (${rows.size} rows; " +
          s"pre=${pre.size}, post=${post.size})")
    }
    assert(succeeded.nonEmpty,
      "no mid-fold probe succeeded at all — at least the pre-clean " +
        "windows have a complete live tree")
  }

  test("IVF query racing compact: loud-or-correct through the " +
      "assignments swap's two windows, and correct after") {
    import spark.implicits._
    val dir = tmp("race_ivf")
    val emb = (0L until 60L).map(i =>
      (i, Seq.tabulate(4)(d => ((i + d) % 7).toDouble + 0.5)))
      .toDF("vec_id", "v")
    IvfIndex.build(emb, dir, c = 4)
    IvfIndex.append(spark, dir, emb
      .selectExpr("vec_id + 100 as vec_id", "v")) // 2nd sliver set
    val queries = (0L until 3L).map(i =>
      (i, Seq.tabulate(4)(d => ((i + d) % 7).toDouble + 0.4)))
      .toDF("query_id", "qv")
    val expected = sortedRows(IvfIndex.query(spark, dir, queries, k = 5))
    assert(expected.nonEmpty)
    val (ok, loud) = raceProbes(2, expected) {
      IvfIndex.compact(spark, dir, targetBytes = 1L << 30)
    } { () => sortedRows(IvfIndex.query(spark, dir, queries, k = 5)) }
    assert(ok + loud == 2)
    assert(ok >= 1, s"the pre-clean window must succeed (ok=$ok loud=$loud)")
    assert(sortedRows(IvfIndex.query(spark, dir, queries, k = 5)) == expected,
      "query diverged after the compaction")
  }
}
