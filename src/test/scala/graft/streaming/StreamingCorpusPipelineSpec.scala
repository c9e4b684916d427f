package graft.streaming

import graft.queries.{CorpusPipeline, CorpusPipelineDelta}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Top-level (not nested in the suite): Spark's bean/product encoder
  * cannot reach an inner class's outer scope. */
case class PipeDoc(doc_id: Long, text: String, lang: String, source: String)

/** The multimodal training-record shape the media-aware sink ingests:
  * the pipeline's document columns plus a nullable attached payload. */
case class MultiDoc(doc_id: Long, text: String, lang: String,
    source: String, media_type: String, payload: Array[Byte])

/** E10: the streaming corpus-pipeline sink's END-TO-END exactly-once
  * claim, driven through a REAL stream — a MemoryStream source, a real
  * checkpoint, real query restarts. The claim is a composition of two
  * verified pieces (Structured Streaming's batch replay and the fold
  * journal); these specs execute the composition itself at both crash
  * windows it case-splits on:
  *
  *   - crash BEFORE the fold's commit marker → the restarted stream
  *     replays the batch, `recoverFold` rolls the partial writes back,
  *     and the replay RE-APPLIES the increment;
  *   - crash AFTER the marker → recovery completes the staged swaps,
  *     `meta.last_batch` now records the batch, and the replayed batch
  *     is SKIPPED (re-folding would violate the strictly-increasing-id
  *     precondition — the skip is the exactly-once path).
  *
  * Every test's final check is the same oracle the rest of the pipeline
  * family leans on: the refreshed state equals the BATCH pipeline on
  * the union of every micro-batch delivered. */
class StreamingCorpusPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fs = new Path("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmp(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    p.toFile.delete()
    p.toString
  }

  // same deterministic fixture family as CorpusPipelineRecoverySpec:
  // 30 distinct filler tokens pass the quality gate, near-dups share
  // 30/31 tokens (banding recall 1 at that density), decon hits the
  // fixed eval grams
  private def txt(seed: Int, extra: String = ""): String = {
    val base = (0 until 30).map(i => s"w${seed}_$i").mkString(" ")
    if (extra.isEmpty) base else base + " " + extra
  }

  

  private val batch0 = Seq(
    PipeDoc(1L, txt(1), "en", "src0"),
    PipeDoc(2L, txt(2), "en", "src0"),
    PipeDoc(3L, txt(3), "en", "src2"),
    PipeDoc(4L, txt(4), "en", "src2"),
    PipeDoc(5L, txt(5), "en", "src0"))
  private val batch1 = Seq(
    PipeDoc(10L, txt(2), "en", "src0"), // exact dup of id 2, across batches
    PipeDoc(11L, txt(4, "x1"), "en", "src2"), // near-dup of id 4 (jac 30/31)
    PipeDoc(12L, txt(12, "alpha beta gamma"), "en", "src0"), // decon hit
    PipeDoc(13L, txt(13), "en", "src2"),
    PipeDoc(14L, txt(14), "en", "src0"))
  private val batch2 = Seq(
    PipeDoc(20L, txt(20), "en", "src0"),
    PipeDoc(21L, txt(4, "y1"), "en", "src2")) // near-dup of id 4, 2 batches back

  private lazy val eval = {
    import spark.implicits._
    Seq((900L, "alpha beta gamma benchmark suite text"))
      .toDF("doc_id", "text")
  }
  private def cfg = CorpusPipeline.Config(evalDocs = Some(eval))

  private def batchDf(bs: Seq[PipeDoc]*): DataFrame = {
    import spark.implicits._
    bs.flatten.toDF()
  }

  private def rows(d: DataFrame): Set[String] =
    d.collect().map(_.mkString("|")).toSet

  private def assertEqualsBatch(state: String, bs: Seq[PipeDoc]*): Unit =
    assert(rows(CorpusPipelineDelta.refreshOutput(spark, state, cfg)) ==
      rows(CorpusPipeline.assemble(batchDf(bs: _*), cfg)),
      "stream-folded state diverged from the batch pipeline on the " +
        "unioned micro-batches")

  private def hasInjectedCrash(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .exists(_.isInstanceOf[CorpusPipelineDelta.InjectedCrash])

  test("sink: micro-batches fold through a real stream; final state == " +
      "batch pipeline on the union; last_batch advances") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val state = tmp("e10_clean")
    val ckpt = tmp("e10_clean_ckpt")
    val mem = MemoryStream[PipeDoc]
    val q = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg)
    Seq(batch0, batch1, batch2).foreach { b =>
      mem.addData(b); q.processAllAvailable()
    }
    q.stop()
    assertEqualsBatch(state, batch0, batch1, batch2)
    assert(CorpusPipelineDelta.lastBatch(spark, state).exists(_ >= 2L),
      "last_batch did not advance with the stream")
    assert(CorpusPipelineDelta.recoverFold(spark, state) ==
      CorpusPipelineDelta.Clean, "a healthy stream left a crashed state")
  }

  test("pre-commit crash mid-batch: the restarted stream REPLAYS the " +
      "batch, recovery rolls back, the replay re-applies — nothing " +
      "lost, nothing doubled") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val state = tmp("e10_pre")
    val ckpt = tmp("e10_pre_ckpt")
    val mem = MemoryStream[PipeDoc]
    val q1 = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg)
    mem.addData(batch0); q1.processAllAvailable()
    q1.stop()
    // arm the crash, restart: batch 1 dies inside the fold BEFORE its
    // commit marker — offsets uncommitted, journal left behind
    spark.conf.set(CorpusPipelineDelta.CrashPointConf, "pre-commit")
    val q2 = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg)
    mem.addData(batch1)
    val e = intercept[StreamingQueryException](q2.processAllAvailable())
    assert(hasInjectedCrash(e), s"query died of something else: $e")
    spark.conf.unset(CorpusPipelineDelta.CrashPointConf)
    assert(fs.exists(new Path(s"$state/journal")),
      "pre-commit crash left no journal (fixture broken)")
    // restart from the checkpoint: the SAME batch id replays with the
    // SAME rows; foldBatch recovers (RolledBack) then re-applies it
    val q3 = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg)
    q3.processAllAvailable()
    assert(!fs.exists(new Path(s"$state/journal")),
      "replayed batch did not retire the recovered journal")
    assertEqualsBatch(state, batch0, batch1)
    // the stream keeps going: a fresh batch folds on top of the replay
    mem.addData(batch2); q3.processAllAvailable()
    q3.stop()
    assertEqualsBatch(state, batch0, batch1, batch2)
  }

  test("post-commit crash mid-batch: recovery rolls FORWARD, the " +
      "replayed batch is SKIPPED via meta.last_batch — applied exactly " +
      "once (re-folding would throw the id precondition)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val state = tmp("e10_post")
    val ckpt = tmp("e10_post_ckpt")
    val mem = MemoryStream[PipeDoc]
    val q1 = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg)
    mem.addData(batch0); q1.processAllAvailable()
    q1.stop()
    // crash AFTER the fold's commit marker: the increment is applied,
    // but the stream never commits its offsets — the batch WILL replay
    spark.conf.set(CorpusPipelineDelta.CrashPointConf, "post-commit")
    val q2 = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg)
    mem.addData(batch1)
    val e = intercept[StreamingQueryException](q2.processAllAvailable())
    assert(hasInjectedCrash(e), s"query died of something else: $e")
    spark.conf.unset(CorpusPipelineDelta.CrashPointConf)
    // restart: the replayed batch must be recognized as applied and
    // skipped — if the skip failed, foldIncrement would throw the
    // strictly-increasing-id precondition and this drain would die
    val q3 = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg)
    q3.processAllAvailable()
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(1L),
      "roll-forward did not record the batch tag")
    assertEqualsBatch(state, batch0, batch1)
    // and the NEXT batch folds normally after the skip
    mem.addData(batch2); q3.processAllAvailable()
    q3.stop()
    assertEqualsBatch(state, batch0, batch1, batch2)
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(2L))
  }

  test("an EMPTY micro-batch mid-stream is a no-op fold that still " +
      "advances last_batch (sources DO deliver empty batches); the " +
      "chain stays equal to batch on the non-empty union") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val state = tmp("e10_empty")
    val ckpt = tmp("e10_empty_ckpt")
    val mem = MemoryStream[PipeDoc]
    val q = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg)
    mem.addData(batch0); q.processAllAvailable()
    mem.addData(Seq.empty[PipeDoc]); q.processAllAvailable()
    val afterEmpty = CorpusPipelineDelta.lastBatch(spark, state)
    mem.addData(batch1); q.processAllAvailable()
    q.stop()
    // the empty batch may or may not get its own batchId depending on
    // the engine's no-data handling; what must hold: no wedged state,
    // monotone last_batch, and the final answer == batch on the
    // non-empty union
    assert(CorpusPipelineDelta.recoverFold(spark, state) ==
      CorpusPipelineDelta.Clean)
    assert(afterEmpty.exists(_ >= 0L))
    assert(CorpusPipelineDelta.lastBatch(spark, state).get >=
      afterEmpty.get, "last_batch went backwards")
    assertEqualsBatch(state, batch0, batch1)
  }

  // ---- E19's streaming twin (round 16): media rides the same sink ----

  /** batch0/1/2 re-issued as multimodal records: payloads attach to a
    * subset of rows — cross-batch image dups (10's payload re-encodes
    * 1's; 20's brightens 2's), a corrupt payload (4), payload-less
    * rows (null), a fresh image per batch. */
  private def multiBatches: Seq[Seq[MultiDoc]] = {
    def md(d: PipeDoc, t: String, p: Array[Byte]) =
      MultiDoc(d.doc_id, d.text, d.lang, d.source, t, p)
    val b0 = Seq(
      md(batch0(0), "image/png", graft.TestImages.png(0)),
      md(batch0(1), "image/png", graft.TestImages.png(1)),
      md(batch0(2), null, null),
      md(batch0(3), "image/png", Array[Byte](1, 2, 3)), // corrupt
      md(batch0(4), "image/png", graft.TestImages.png(2)))
    val b1 = Seq(
      md(batch1(0), "image/bmp", // dup of doc 1's image, re-encoded
        graft.TestImages.encode(graft.TestImages.pattern(0, 48, 36), "bmp")),
      md(batch1(1), "image/png", graft.TestImages.png(3)),
      md(batch1(2), null, null),
      md(batch1(3), null, null),
      md(batch1(4), "image/png", graft.TestImages.png(4)))
    val b2 = Seq(
      md(batch2(0), "image/png", graft.TestImages.png(1, brightness = 25)),
      md(batch2(1), null, null))
    Seq(b0, b1, b2)
  }

  private def mediaOf(bs: Seq[MultiDoc]*) = {
    import spark.implicits._
    bs.flatten.filter(_.payload != null)
      .map(m => graft.multimodal.Multimodal.MediaRecord(
        m.doc_id, m.media_type, m.payload)).toDS()
  }

  private def retainedMediaIds(state: String): Set[Long] =
    CorpusPipelineDelta.retainedMediaIds(spark, state)
      .collect().map(_.getLong(0)).toSet

  private def batchMediaIds(bs: Seq[MultiDoc]*): Set[Long] =
    graft.Graft.imageDedup(mediaOf(bs: _*))
      .collect().map(_.doc_id).toSet

  test("MEDIA rides the sink (E19's streaming twin): one stream, one " +
      "checkpoint — text == batch pipeline AND media retention == " +
      "imageDedup on the unioned payload rows; payload-less and " +
      "corrupt rows cost nothing") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val state = tmp("e19s_clean")
    val ckpt = tmp("e19s_clean_ckpt")
    val mbs = multiBatches
    val mem = MemoryStream[MultiDoc]
    val q = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg,
      mediaCols = Some(("media_type", "payload")))
    mbs.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    assertEqualsBatch(state, batch0, batch1, batch2)
    val got = retainedMediaIds(state)
    assert(got == batchMediaIds(mbs: _*),
      s"streamed media retention diverged from the batch facade: $got")
    // by name: the cross-batch dups dropped exactly at the newcomer
    assert(!got(10L) && !got(20L) && got(1L) && got(2L),
      s"cross-batch image dups mishandled: $got")
    // the corrupt payload was ledgered (fp NULL) and retained
    assert(got(4L), "fingerprint-less media row must be retained")
  }

  test("post-commit crash + replay skip is MEDIA-exactly-once too: the " +
      "skipped batch re-folds neither its text nor its images (media " +
      "ledger row count pinned)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val state = tmp("e19s_post")
    val ckpt = tmp("e19s_post_ckpt")
    val mbs = multiBatches
    def start() = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt,
      cfg, mediaCols = Some(("media_type", "payload")))
    lazy val mem = MemoryStream[MultiDoc]
    val q1 = start()
    mem.addData(mbs(0)); q1.processAllAvailable()
    q1.stop()
    spark.conf.set(CorpusPipelineDelta.CrashPointConf, "post-commit")
    val q2 = start()
    mem.addData(mbs(1))
    val e = intercept[StreamingQueryException](q2.processAllAvailable())
    assert(hasInjectedCrash(e), s"query died of something else: $e")
    spark.conf.unset(CorpusPipelineDelta.CrashPointConf)
    // restart: the replayed batch is recognized and skipped WHOLE —
    // re-folding its media would double the ledger (and the id
    // precondition would kill the text half first)
    val q3 = start()
    q3.processAllAvailable()
    val ledgerRows = spark.read.parquet(s"$state/media_seen").count()
    val expect = (mbs(0) ++ mbs(1)).count(_.payload != null)
    assert(ledgerRows == expect,
      s"media ledger has $ledgerRows rows, want $expect — the replay " +
        "re-folded the media half")
    assert(retainedMediaIds(state) == batchMediaIds(mbs(0), mbs(1)))
    // the stream keeps going with media intact
    mem.addData(mbs(2)); q3.processAllAvailable()
    q3.stop()
    assertEqualsBatch(state, batch0, batch1, batch2)
    assert(retainedMediaIds(state) == batchMediaIds(mbs: _*))
  }

  test("a FOREIGN checkpoint against an advanced state dir fails LOUDLY " +
      "instead of silently skipping arriving batches (batchId < " +
      "last_batch can never be a legitimate replay) (r12 sweep)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val state = tmp("e10_foreign")
    val mem = MemoryStream[PipeDoc]
    val q1 = StreamingCorpusPipeline.sink(mem.toDF(), state,
      tmp("e10_foreign_ckpt1"), cfg)
    Seq(batch0, batch1).foreach { b => mem.addData(b); q1.processAllAvailable() }
    q1.stop()
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(1L))
    // a FRESH checkpoint restarts batch ids at 0; its batch 0 must not
    // be mistaken for a replay of the state's batch 0
    val mem2 = MemoryStream[PipeDoc]
    val q2 = StreamingCorpusPipeline.sink(mem2.toDF(), state,
      tmp("e10_foreign_ckpt2"), cfg)
    mem2.addData(batch2)
    val e = intercept[StreamingQueryException](q2.processAllAvailable())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("does not belong"), s"wrong failure: $msgs")
    // the state survives untouched for a correctly-paired restart
    assertEqualsBatch(state, batch0, batch1)
  }

  // ---- E10 over a REAL FileStreamSource (VERDICT r12 task 2): the
  // production shape named in the class doc — a directory of arriving
  // increment files drained by Trigger.AvailableNow — exercises the
  // engine's OWN batch-id/offset-log behavior (file listing order,
  // multi-batch drains, checkpoint-filtered reruns), which MemoryStream
  // cannot. One file per increment (coalesce(1) + rename) because the
  // fold's contract is ids-strictly-increase ACROSS micro-batches and
  // maxFilesPerTrigger=1 makes each file its own batch.

  private def writeIncrement(srcDir: String, name: String,
      docs: Seq[PipeDoc]): Unit = {
    import spark.implicits._
    val staging = tmp(s"e10stage_$name")
    docs.toDF().coalesce(1).write.parquet(staging)
    val part = fs.listStatus(new Path(staging)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new Path(srcDir))
    fs.rename(part, new Path(s"$srcDir/$name.parquet"))
    // distinct mtimes keep the source's age-ordered listing (and so the
    // batch order the id contract leans on) deterministic
    Thread.sleep(100)
  }

  private def fileSource(srcDir: String): DataFrame = spark.readStream
    .schema(org.apache.spark.sql.Encoders.product[PipeDoc].schema)
    .option("maxFilesPerTrigger", "1")
    .parquet(srcDir)

  test("E10 over a real file source: an increment-file directory drains " +
      "under Trigger.AvailableNow (one file per micro-batch), state == " +
      "batch pipeline on the union; tomorrow's rerun folds ONLY the new " +
      "arrival (the checkpoint's file log filters seen files)") {
    val srcDir = tmp("e10f_src")
    val state = tmp("e10f_state")
    val ckpt = tmp("e10f_ckpt")
    writeIncrement(srcDir, "day0", batch0)
    writeIncrement(srcDir, "day1", batch1)
    val q1 = StreamingCorpusPipeline.sink(fileSource(srcDir), state, ckpt,
      cfg, trigger = Some(Trigger.AvailableNow()))
    q1.awaitTermination(180000)
    assert(!q1.isActive, "AvailableNow drain did not stop on its own")
    assertEqualsBatch(state, batch0, batch1)
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(1L),
      "two files under maxFilesPerTrigger=1 must arrive as two batches")
    // tomorrow: one new file lands; the rerun must fold it and nothing else
    writeIncrement(srcDir, "day2", batch2)
    val q2 = StreamingCorpusPipeline.sink(fileSource(srcDir), state, ckpt,
      cfg, trigger = Some(Trigger.AvailableNow()))
    q2.awaitTermination(180000)
    assert(!q2.isActive)
    assertEqualsBatch(state, batch0, batch1, batch2)
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(2L))
    assert(CorpusPipelineDelta.recoverFold(spark, state) ==
      CorpusPipelineDelta.Clean)
  }

  test("E10 file source, crash-restart mid-drain: a post-commit crash " +
      "replays the file batch and SKIPS it; a pre-commit crash replays " +
      "and RE-APPLIES it — exactly-once against the engine's own " +
      "offset log, not MemoryStream's") {
    val srcDir = tmp("e10fc_src")
    val state = tmp("e10fc_state")
    val ckpt = tmp("e10fc_ckpt")
    def drain(): Unit = {
      val q = StreamingCorpusPipeline.sink(fileSource(srcDir), state, ckpt,
        cfg, trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination(180000)
      assert(!q.isActive)
    }
    def crashDrain(point: String): Unit = {
      spark.conf.set(CorpusPipelineDelta.CrashPointConf, point)
      try {
        val q = StreamingCorpusPipeline.sink(fileSource(srcDir), state,
          ckpt, cfg, trigger = Some(Trigger.AvailableNow()))
        val e = intercept[StreamingQueryException](q.awaitTermination(180000))
        assert(hasInjectedCrash(e), s"query died of something else: $e")
      } finally spark.conf.unset(CorpusPipelineDelta.CrashPointConf)
    }
    writeIncrement(srcDir, "day0", batch0)
    drain() // clean batch 0
    // post-commit: the fold applied, the offsets did not commit — the
    // restarted drain must redeliver the SAME file under the SAME
    // batch id and skip it via meta.last_batch
    writeIncrement(srcDir, "day1", batch1)
    crashDrain("post-commit")
    drain()
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(1L),
      "roll-forward did not record the file batch's tag")
    assertEqualsBatch(state, batch0, batch1)
    // pre-commit: the fold died mid-mutation — the journal survives the
    // crash, the replayed file batch rolls it back and re-applies
    writeIncrement(srcDir, "day2", batch2)
    crashDrain("pre-commit")
    assert(fs.exists(new Path(s"$state/journal")),
      "pre-commit crash left no journal (fixture broken)")
    drain()
    assert(!fs.exists(new Path(s"$state/journal")),
      "replayed file batch did not retire the recovered journal")
    assertEqualsBatch(state, batch0, batch1, batch2)
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(2L))
    assert(CorpusPipelineDelta.recoverFold(spark, state) ==
      CorpusPipelineDelta.Clean)
  }

  test("E10 file source, genesis WARN for real: an ADVANCED checkpoint " +
      "re-pointed at a FRESH state dir folds its next batch under a " +
      "non-zero id (warned, not refused) — the engine can legitimately " +
      "deliver first rows under a later id, and only this checkpoint's " +
      "EARLIER batches are missing from the new corpus") {
    val srcDir = tmp("e10g_src")
    val state1 = tmp("e10g_state1")
    val ckpt = tmp("e10g_ckpt")
    writeIncrement(srcDir, "day0", batch0)
    writeIncrement(srcDir, "day1", batch1)
    val q1 = StreamingCorpusPipeline.sink(fileSource(srcDir), state1, ckpt,
      cfg, trigger = Some(Trigger.AvailableNow()))
    q1.awaitTermination(180000)
    assert(CorpusPipelineDelta.lastBatch(spark, state1).contains(1L))
    // operator re-points the SAME checkpoint at a new, empty state dir;
    // the next arrival is delivered under batch id 2 against genesis
    val state2 = tmp("e10g_state2")
    writeIncrement(srcDir, "day2", batch2)
    val q2 = StreamingCorpusPipeline.sink(fileSource(srcDir), state2, ckpt,
      cfg, trigger = Some(Trigger.AvailableNow()))
    q2.awaitTermination(180000)
    assert(!q2.isActive)
    // the new state holds ONLY the post-repoint arrivals — under the
    // checkpoint's continued numbering, not a restarted one
    assertEqualsBatch(state2, batch2)
    assert(CorpusPipelineDelta.lastBatch(spark, state2).contains(2L))
    // the original state is untouched by the re-point
    assertEqualsBatch(state1, batch0, batch1)
  }

  // ---- mixed-mode folds (VERDICT r12 task 5): manual foldIncrement
  // calls (no batchTag) interleaved with streamed micro-batches on ONE
  // state dir. The load-bearing detail is the meta write's
  // `batchTag.orElse(meta0.lastBatch)`: an untagged manual fold must
  // CARRY the last streamed batch id forward, or the next streamed
  // replay would be misread as a first delivery.

  test("mixed-mode: a manual untagged fold between streamed batches " +
      "carries last_batch forward; the resumed stream folds its next " +
      "batch normally and the chain equals batch on everything folded") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val state = tmp("e10m_state")
    val ckpt = tmp("e10m_ckpt")
    val manual = Seq(
      PipeDoc(15L, txt(15), "en", "src0"),
      PipeDoc(16L, txt(16), "en", "src2"))
    val mem = MemoryStream[PipeDoc]
    val q1 = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg)
    mem.addData(batch0); q1.processAllAvailable()
    mem.addData(batch1); q1.processAllAvailable()
    q1.stop()
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(1L))
    // the nightly operator folds a hand-delivered increment, untagged
    CorpusPipelineDelta.foldIncrement(batchDf(manual), state, cfg)
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(1L),
      "an untagged manual fold must PRESERVE last_batch, not drop it")
    // the stream resumes on the same checkpoint: next batch id is 2
    val q2 = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg)
    mem.addData(batch2); q2.processAllAvailable()
    q2.stop()
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(2L))
    assertEqualsBatch(state, batch0, batch1, manual, batch2)
  }

  test("mixed-mode replay: a manual fold lands BETWEEN a post-commit " +
      "crash and the stream's replay — the replay is still recognized " +
      "as applied and skipped, because the manual fold carried the " +
      "crashed batch's tag through (exactly-once across the interleave)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val state = tmp("e10mr_state")
    val ckpt = tmp("e10mr_ckpt")
    val manual = Seq(
      PipeDoc(15L, txt(15), "en", "src0"),
      PipeDoc(16L, txt(16), "en", "src2"))
    val mem = MemoryStream[PipeDoc]
    val q1 = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg)
    mem.addData(batch0); q1.processAllAvailable()
    q1.stop()
    // batch 1 applies but its offsets never commit
    spark.conf.set(CorpusPipelineDelta.CrashPointConf, "post-commit")
    val q2 = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg)
    mem.addData(batch1)
    val e = intercept[StreamingQueryException](q2.processAllAvailable())
    assert(hasInjectedCrash(e), s"query died of something else: $e")
    spark.conf.unset(CorpusPipelineDelta.CrashPointConf)
    // before anyone restarts the stream, the operator manually folds an
    // increment. A blind fold REFUSES on the crashed journal (spec'd in
    // CorpusPipelineRecoverySpec); following the error's instruction,
    // recoverFold completes the crashed swap — Completed, recording the
    // batch tag — and the untagged fold then carries it through
    assert(CorpusPipelineDelta.recoverFold(spark, state)
      .isInstanceOf[CorpusPipelineDelta.Completed],
      "post-commit crash must recover as Completed")
    CorpusPipelineDelta.foldIncrement(batchDf(manual), state, cfg)
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(1L),
      "manual fold lost the crashed batch's tag — the replay below " +
        "would re-fold it")
    // the restarted stream replays batch 1: must SKIP it (it is
    // applied), then fold fresh arrivals on top of the manual increment
    val q3 = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg)
    q3.processAllAvailable()
    mem.addData(batch2); q3.processAllAvailable()
    q3.stop()
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(2L))
    assertEqualsBatch(state, batch0, batch1, manual, batch2)
  }

  test("adopting streaming on a MANUALLY-built state: a fresh checkpoint " +
      "with higher ids folds (genesis, last_batch never set); a second " +
      "foreign checkpoint COLLIDING at batchId == last_batch with " +
      "different rows is refused by the skip path's recorded-bounds " +
      "verification (r13) — by ids alone it would wear the legitimate-" +
      "replay signature and its rows would vanish silently") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val state = tmp("e10a_state")
    CorpusPipelineDelta.foldIncrement(batchDf(batch0), state, cfg)
    CorpusPipelineDelta.foldIncrement(batchDf(batch1), state, cfg)
    assert(CorpusPipelineDelta.lastBatch(spark, state).isEmpty,
      "manual-only chain must have no last_batch")
    // legitimate adoption: new checkpoint, new higher-id arrivals
    val mem = MemoryStream[PipeDoc]
    val q1 = StreamingCorpusPipeline.sink(mem.toDF(), state,
      tmp("e10a_ckpt1"), cfg)
    mem.addData(batch2); q1.processAllAvailable()
    q1.stop()
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(0L))
    assertEqualsBatch(state, batch0, batch1, batch2)
    // foreign checkpoint COLLIDING at batchId == last_batch (= 0) with
    // DIFFERENT rows: undetectable by batch id alone (it looks exactly
    // like a legitimate replay) — the recorded fold bounds [20, 21]
    // catch the mismatch and fail the drain loudly instead of silently
    // dropping the arriving rows in the skip
    val mem2 = MemoryStream[PipeDoc]
    val q2 = StreamingCorpusPipeline.sink(mem2.toDF(), state,
      tmp("e10a_ckpt2"), cfg)
    mem2.addData(batch1) // ids 10..14 — not the recorded batch 0's 20..21
    val e = intercept[StreamingQueryException](q2.processAllAvailable())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("does not belong"), s"wrong failure: $msgs")
    assert(msgs.contains("[20, 21]"), s"bounds not named: $msgs")
    // nothing was double-ingested by the refused drain
    assertEqualsBatch(state, batch0, batch1, batch2)
  }

  // ---- multi-file micro-batches (VERDICT r13 task 3): all three r13
  // file-source specs pinned maxFilesPerTrigger=1, but a real
  // AvailableNow drain delivers batches SPANNING several files. The
  // replay-bounds verification assumes a replay redelivers the same
  // rows — for FileStreamSource that holds by construction even across
  // files: the exact FILE SET of every batch is persisted in the
  // checkpoint's offset log (FileStreamSourceLog), and a restart
  // re-reads that entry, so a replayed batch can never RE-SPLIT across
  // batch boundaries whatever maxFilesPerTrigger says (the NOTES_r13
  // seed's concern, pinned here: the post-commit crash below replays a
  // TWO-file batch and the bounds×count check passes). A hypothetical
  // source that did re-split would trip that check — a loud refusal,
  // never a silent partial skip.

  private def fileSourceN(srcDir: String, maxFiles: Int): DataFrame =
    spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[PipeDoc].schema)
      .option("maxFilesPerTrigger", maxFiles.toString)
      .parquet(srcDir)

  private def mkDocs(ids: Long*): Seq[PipeDoc] =
    ids.map(i => PipeDoc(i, txt(i.toInt), "en",
      if (i % 2 == 0) "src0" else "src2"))

  test("E10 multi-file micro-batches: a 3-file AvailableNow drain folds " +
      "as ONE batch; a post-commit crash replays a TWO-file batch and " +
      "the recorded-bounds skip verifies it across the file boundary; a " +
      "pre-commit crash rolls a two-file batch back and re-applies it") {
    val srcDir = tmp("e10mf_src")
    val state = tmp("e10mf_state")
    val ckpt = tmp("e10mf_ckpt")
    def drain(): Unit = {
      val q = StreamingCorpusPipeline.sink(fileSourceN(srcDir, 3), state,
        ckpt, cfg, trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination(180000)
      assert(!q.isActive)
    }
    def crashDrain(point: String): Unit = {
      spark.conf.set(CorpusPipelineDelta.CrashPointConf, point)
      try {
        val q = StreamingCorpusPipeline.sink(fileSourceN(srcDir, 3), state,
          ckpt, cfg, trigger = Some(Trigger.AvailableNow()))
        val e = intercept[StreamingQueryException](q.awaitTermination(180000))
        assert(hasInjectedCrash(e), s"query died of something else: $e")
      } finally spark.conf.unset(CorpusPipelineDelta.CrashPointConf)
    }
    // three files, one cap-3 batch: the union folds as a single increment
    writeIncrement(srcDir, "f0", batch0)
    writeIncrement(srcDir, "f1", batch1)
    writeIncrement(srcDir, "f2", batch2)
    drain()
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(0L),
      "three files under maxFilesPerTrigger=3 must arrive as ONE batch")
    assertEqualsBatch(state, batch0, batch1, batch2)
    // post-commit crash: the replayed batch spans TWO files — the skip
    // path's bounds check must see [30, 41] × 4 re-assembled from the
    // offset log's file set and skip, not refuse
    val f3 = mkDocs(30L, 31L)
    val f4 = mkDocs(40L, 41L)
    writeIncrement(srcDir, "f3", f3)
    writeIncrement(srcDir, "f4", f4)
    crashDrain("post-commit")
    drain()
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(1L),
      "roll-forward did not record the multi-file batch's tag")
    assertEqualsBatch(state, batch0, batch1, batch2, f3, f4)
    // pre-commit crash on another two-file batch: journal survives, the
    // multi-file replay rolls back and re-applies
    val f5 = mkDocs(50L, 51L)
    val f6 = mkDocs(60L, 61L)
    writeIncrement(srcDir, "f5", f5)
    writeIncrement(srcDir, "f6", f6)
    crashDrain("pre-commit")
    assert(fs.exists(new Path(s"$state/journal")),
      "pre-commit crash left no journal (fixture broken)")
    drain()
    assert(!fs.exists(new Path(s"$state/journal")),
      "replayed multi-file batch did not retire the recovered journal")
    assertEqualsBatch(state, batch0, batch1, batch2, f3, f4, f5, f6)
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(2L))
    assert(CorpusPipelineDelta.recoverFold(spark, state) ==
      CorpusPipelineDelta.Clean)
  }

  test("E10 multi-file: an EMPTY-listing drain is a no-op (no fold, tag " +
      "unchanged); the bounds-collision refusal holds for a multi-file " +
      "batch id colliding at last_batch; a content-IDENTICAL foreign " +
      "batch is indistinguishable from a replay and skips") {
    val srcDir = tmp("e10me_src")
    val state = tmp("e10me_state")
    val ckpt = tmp("e10me_ckpt")
    writeIncrement(srcDir, "f0", batch0)
    writeIncrement(srcDir, "f1", batch1)
    writeIncrement(srcDir, "f2", batch2)
    val q1 = StreamingCorpusPipeline.sink(fileSourceN(srcDir, 3), state,
      ckpt, cfg, trigger = Some(Trigger.AvailableNow()))
    q1.awaitTermination(180000)
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(0L))
    val folded = rows(CorpusPipelineDelta.refreshOutput(spark, state, cfg))
    // empty listing: nothing new arrived — the scheduled rerun must
    // terminate cleanly without folding anything
    val q2 = StreamingCorpusPipeline.sink(fileSourceN(srcDir, 3), state,
      ckpt, cfg, trigger = Some(Trigger.AvailableNow()))
    q2.awaitTermination(180000)
    assert(!q2.isActive, "empty-listing drain did not stop")
    assert(CorpusPipelineDelta.lastBatch(spark, state).contains(0L),
      "an empty drain advanced last_batch")
    assert(rows(CorpusPipelineDelta.refreshOutput(spark, state, cfg))
      == folded, "an empty drain changed the corpus")
    assert(CorpusPipelineDelta.recoverFold(spark, state) ==
      CorpusPipelineDelta.Clean)
    // a FRESH checkpoint over the SAME directory redelivers the same 3
    // files as ITS batch 0 — identical id bounds and count, genuinely
    // indistinguishable from a replay: the skip is correct (the union
    // is already in the corpus) and nothing double-ingests
    val q3 = StreamingCorpusPipeline.sink(fileSourceN(srcDir, 3), state,
      tmp("e10me_ckpt2"), cfg, trigger = Some(Trigger.AvailableNow()))
    q3.awaitTermination(180000)
    assert(rows(CorpusPipelineDelta.refreshOutput(spark, state, cfg))
      == folded, "content-identical foreign batch was not skipped cleanly")
    // a foreign checkpoint whose multi-file batch 0 carries DIFFERENT
    // rows wears the legitimate-replay batch id but not the recorded
    // bounds [1, 21] × 12 — refused loudly, nothing lost in a skip
    val srcDir2 = tmp("e10me_src2")
    writeIncrement(srcDir2, "g0", mkDocs(70L, 71L))
    writeIncrement(srcDir2, "g1", mkDocs(80L, 81L))
    val q4 = StreamingCorpusPipeline.sink(fileSourceN(srcDir2, 3), state,
      tmp("e10me_ckpt3"), cfg, trigger = Some(Trigger.AvailableNow()))
    val e = intercept[StreamingQueryException](q4.awaitTermination(180000))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("does not belong"), s"wrong failure: $msgs")
    assert(msgs.contains("[1, 21]"), s"recorded bounds not named: $msgs")
    assert(rows(CorpusPipelineDelta.refreshOutput(spark, state, cfg))
      == folded, "the refused foreign drain mutated the corpus")
  }

  test("Trigger.AvailableNow: the scheduled-daily-drain shape processes " +
      "everything then stops; a rerun drains only the new arrivals " +
      "(cadence guidance from the class doc, compiled and executed)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val state = tmp("e10_avail")
    val ckpt = tmp("e10_avail_ckpt")
    val mem = MemoryStream[PipeDoc]
    mem.addData(batch0)
    val q1 = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg,
      trigger = Some(Trigger.AvailableNow()))
    q1.awaitTermination(240000)
    assert(!q1.isActive, "AvailableNow drain did not stop on its own")
    assertEqualsBatch(state, batch0)
    // tomorrow's scheduled run: only the new increment folds
    mem.addData(batch1)
    val q2 = StreamingCorpusPipeline.sink(mem.toDF(), state, ckpt, cfg,
      trigger = Some(Trigger.AvailableNow()))
    q2.awaitTermination(240000)
    assert(!q2.isActive)
    assertEqualsBatch(state, batch0, batch1)
  }
}
