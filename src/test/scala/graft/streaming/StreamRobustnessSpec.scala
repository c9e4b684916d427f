package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.max
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming robustness: exactly-once file-sink recovery from a
  * checkpoint, stream-static dimension join, and the richer
  * flatMapGroupsWithState (0..n outputs per group per batch). */
class StreamRobustnessSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ev(id: Long, uid: Long, v: Double,
      t: String = "2024-01-01 10:00:00") =
    Event(id, Timestamp.valueOf(t), uid, "click", v)

  test("file sink + checkpoint: restart does not reprocess committed input") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("rec_src").toString
    val sink = java.nio.file.Files.createTempDirectory("rec_sink").toString
    val chk = java.nio.file.Files.createTempDirectory("rec_chk").toString
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(Seq.empty[Event].toDS().schema)
        .parquet(src)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    // the file stream source lists the path non-recursively: stage each
    // batch as a flat part file in src
    def addFile(name: String, data: Seq[Event]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("stage").toString
      data.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(src, name))
    }
    addFile("f1.parquet", Seq(ev(1, 1, 1.0), ev(2, 1, 2.0)))
    runOnce()
    assert(spark.read.parquet(sink).count() == 2)
    addFile("f2.parquet", Seq(ev(3, 2, 3.0)))
    runOnce() // restart from the same checkpoint
    val rows = spark.read.parquet(sink)
    assert(rows.count() == 3) // f1 NOT reprocessed, f2 picked up
    assert(rows.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
  }

  test("windowed aggregation survives a deliberate mid-stream stop/restart " +
      "(exactly-once from checkpoint)") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("mid_src").toString
    val sink = java.nio.file.Files.createTempDirectory("mid_sink").toString
    val chk = java.nio.file.Files.createTempDirectory("mid_chk").toString
    def addFile(name: String, data: Seq[Event]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("stage").toString
      data.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(src, name))
    }
    // 8 hourly files, two event types per hour — all staged up front so
    // the kill happens while input is still pending
    val nFiles = 8
    (0 until nFiles).foreach { h =>
      addFile(s"f$h.parquet", Seq(
        Event(h * 10 + 1, Timestamp.valueOf(f"2024-01-01 ${10 + h}%02d:00:00"),
          1L, "click", 1.0),
        Event(h * 10 + 2, Timestamp.valueOf(f"2024-01-01 ${10 + h}%02d:30:00"),
          2L, "view", 2.0)))
    }
    val allEvents = spark.read
      .schema(Seq.empty[Event].toDS().schema).parquet(src)
    def stream = spark.readStream
      .schema(Seq.empty[Event].toDS().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    // run 1: one file per micro-batch, throttled — then a deliberate
    // stop() while later files are still unprocessed. The window state
    // and watermark at the kill point live only in the checkpoint.
    val q1 = EventStreams.tumblingWithWatermark(stream).writeStream
      .format("parquet").option("path", sink)
      .option("checkpointLocation", chk)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    val deadline = System.currentTimeMillis + 60000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
        System.currentTimeMillis < deadline) Thread.sleep(10)
    q1.stop()
    val batchesRun1 = q1.recentProgress.count(_.numInputRows > 0)
    assert(batchesRun1 >= 2, "run 1 never got going")
    assert(batchesRun1 < nFiles,
      s"run 1 drained all $nFiles files before the kill — not mid-stream")
    // run 2: same checkpoint, drain the remaining files to completion
    val q2 = EventStreams.tumblingWithWatermark(stream).writeStream
      .format("parquet").option("path", sink)
      .option("checkpointLocation", chk)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    // exactly-once: the sink (read through its _spark_metadata commit
    // log, which hides any uncommitted files from the kill) must equal
    // the batch twin's closed windows — nothing lost at the kill point,
    // nothing emitted twice across the restart
    val maxTs = allEvents.agg(max($"ts")).collect().head.getTimestamp(0)
    val wmMillis = maxTs.getTime - 3600 * 1000L
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val expected = EventStreams.tumblingWithWatermark(allEvents)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .filter { case (ws, _, _) =>
        fmt.parse(ws).getTime + 3600 * 1000L <= wmMillis }
      .sorted.toSeq
    val got = spark.read.parquet(sink).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(expected.nonEmpty)
    assert(got == expected, // Seq, not Set: a replayed window would show as a dup
      s"sink windows diverged after restart:\n got $got\n want $expected")
  }

  test("stream-static join enriches events with a broadcast dimension") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[Event]
    val joined = mem.toDF().join(dim, Seq("user_id"), "left")
    val q = joined.writeStream.format("memory").queryName("ssdim")
      .outputMode("append").start()
    mem.addData(Seq(ev(1, 1, 1.0), ev(2, 2, 2.0), ev(3, 99, 3.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssdim").collect()
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("tier"))).toMap
    assert(got == Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
  }

  test("E05: event-time-timeout sessionizer closes sessions by gap AND by watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("e05")
      .outputMode(OutputMode.Append()).start()
    // session 1: two events 10 min apart; then an event 2h later for the
    // same user → closes session 1 in-operator (gap exceeded)
    mem.addData(Seq(ev(1, 1, 1.0, "2024-01-01 10:00:00"),
      ev(2, 1, 1.0, "2024-01-01 10:10:00")))
    q.processAllAvailable()
    mem.addData(Seq(ev(3, 1, 1.0, "2024-01-01 12:00:00")))
    q.processAllAvailable()
    // advance the watermark far past 12:00+30min via another user → the
    // open session for user 1 times out and is emitted
    mem.addData(Seq(ev(9, 7, 1.0, "2024-01-01 20:00:00")))
    q.processAllAvailable()
    mem.addData(Seq(ev(10, 7, 1.0, "2024-01-01 23:00:00")))
    q.processAllAvailable()
    q.stop()
    def tUs(t: String) = Timestamp.valueOf(t).getTime * 1000L
    val got = spark.table("e05").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got.contains((1L, tUs("2024-01-01 10:00:00"), tUs("2024-01-01 10:10:00"), 2L)),
      s"gap-closed session missing: $got")
    assert(got.contains((1L, tUs("2024-01-01 12:00:00"), tUs("2024-01-01 12:00:00"), 1L)),
      s"timeout-closed session missing: $got")
  }

  test("sessionizer: cross-batch out-of-order event extends the session " +
      "bounds instead of rewinding the end") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // watermark delay (1 h) > gap (30 min), so a late event from an
    // earlier batch is admitted mid-session: end must become
    // max(end, t) — the rewind bug set end=9:45 < start and split the
    // session at the next in-order event
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("e05ooo")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Seq(ev(1, 1, 1.0, "2024-01-01 10:00:00"),
      ev(2, 1, 1.0, "2024-01-01 10:10:00")))
    q.processAllAvailable()
    mem.addData(Seq(ev(3, 1, 1.0, "2024-01-01 09:45:00"))) // late, admitted
    q.processAllAvailable()
    mem.addData(Seq(ev(4, 1, 1.0, "2024-01-01 10:20:00"))) // in-order
    q.processAllAvailable()
    // close the session via the watermark (another user far ahead)
    mem.addData(Seq(ev(9, 7, 1.0, "2024-01-01 20:00:00")))
    q.processAllAvailable()
    mem.addData(Seq(ev(10, 7, 1.0, "2024-01-01 23:00:00")))
    q.processAllAvailable()
    q.stop()
    def tUs(t: String) = Timestamp.valueOf(t).getTime * 1000L
    val user1 = spark.table("e05ooo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 == 1L).toSet
    assert(user1 == Set((1L, tUs("2024-01-01 09:45:00"),
        tUs("2024-01-01 10:20:00"), 4L)),
      s"out-of-order event split/corrupted the session: $user1")
  }

  test("sessionizer: an admitted late event BEYOND the gap forms its own " +
      "earlier session instead of inflating the open session's bounds") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // ADVICE r7 #1: the pre-r8 merge guard (`t - end < gap`) was
    // trivially true for any t <= end, so an admitted event arbitrarily
    // older than `start` stretched the open session backward. Fixture:
    // open session (10:00, 10:10); late events 9:15 and 9:20 are inside
    // the 1 h watermark (9:10) but gap-separated (>30 min) from 10:00 —
    // they must merge with EACH OTHER into one immediately-closed
    // earlier session, leaving the open session untouched.
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("e05late")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Seq(ev(1, 1, 1.0, "2024-01-01 10:00:00"),
      ev(2, 1, 1.0, "2024-01-01 10:10:00")))
    q.processAllAvailable()
    mem.addData(Seq(ev(3, 1, 1.0, "2024-01-01 09:15:00"),
      ev(4, 1, 1.0, "2024-01-01 09:20:00"))) // admitted, beyond the gap
    q.processAllAvailable()
    mem.addData(Seq(ev(5, 1, 1.0, "2024-01-01 10:20:00"))) // in-order
    q.processAllAvailable()
    // close the open session via the watermark (another user far ahead)
    mem.addData(Seq(ev(9, 7, 1.0, "2024-01-01 20:00:00")))
    q.processAllAvailable()
    mem.addData(Seq(ev(10, 7, 1.0, "2024-01-01 23:00:00")))
    q.processAllAvailable()
    q.stop()
    def tUs(t: String) = Timestamp.valueOf(t).getTime * 1000L
    val user1 = spark.table("e05late").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 == 1L).toSet
    assert(user1 == Set(
      (1L, tUs("2024-01-01 09:15:00"), tUs("2024-01-01 09:20:00"), 2L),
      (1L, tUs("2024-01-01 10:00:00"), tUs("2024-01-01 10:20:00"), 3L)),
      s"late events mishandled: $user1")
  }

  test("sessionizer preserves sub-millisecond timestamp precision") {
    import spark.implicits._
    // batch mode: each group runs once; closed (non-final) sessions emit
    val t1 = Timestamp.valueOf("2024-01-01 10:00:00")
    t1.setNanos(123456000) // .123456 s
    val t2 = Timestamp.valueOf("2024-01-01 10:05:00")
    t2.setNanos(654321000)
    val t3 = Timestamp.valueOf("2024-01-01 12:00:00") // new session
    val events = Seq(
      Event(1, t1, 1, "click", 1.0), Event(2, t2, 1, "click", 1.0),
      Event(3, t3, 1, "click", 1.0)).toDS()
    val sessions = EventStreams.sessionize(events).collect()
    assert(sessions.length == 1) // only the gap-closed session emits in batch
    val s0 = sessions.head
    assert(s0.start_us % 1000000L == 123456L, s"lost µs: ${s0.start_us}")
    assert(s0.end_us % 1000000L == 654321L, s"lost µs: ${s0.end_us}")
    assert(s0.n_events == 2)
  }

  test("foreachBatch + Cdc.applyChanges maintains a versioned parquet snapshot") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the incremental-materialization loop a 100 TB pipeline runs: each
    // micro-batch applies its changes onto the latest immutable snapshot
    // version (read vN -> applyChanges -> write vN+1; never overwrite
    // the dir being read). Cross-batch PARTIAL updates must accumulate —
    // the property a one-shot latest-op collapse of the whole stream
    // would lose (it keeps only the newest change per key).
    val root = java.nio.file.Files.createTempDirectory("cdc_mat").toString
    Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"))
      .toDF("k", "price", "status")
      .write.parquet(s"$root/v0")
    val version = new java.util.concurrent.atomic.AtomicInteger(0)
    val mem = MemoryStream[Change]
    val q = mem.toDS().writeStream
      .foreachBatch { (batch: Dataset[Change], _: Long) =>
        if (!batch.isEmpty) {
          val v = version.get()
          val cur = spark.table(s"parquet.`$root/v$v`")
          val changes = batch.toDF().select($"key".as("k"), $"op",
            $"price", $"status".as("status"), $"seq")
          graft.operators.Cdc.applyChanges(cur, changes, "k")
            .write.parquet(s"$root/v${v + 1}")
          version.incrementAndGet()
          ()
        }
      }
      .start()
    val batches = Seq(
      // batch 1: price-only update of k=1, delete k=2
      Seq(Change(1L, "U", Some(11.0), None, 1L),
        Change(2L, "D", None, None, 1L)),
      // batch 2: STATUS-only update of k=1 (the earlier price update
      // must survive), insert k=9 with full payload
      Seq(Change(1L, "U", None, Some("Z"), 2L),
        Change(9L, "I", Some(90.0), Some("N"), 1L)))
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    assert(version.get() == 2)
    val got = spark.read.parquet(s"$root/v2").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Double]("price"),
        r.getAs[String]("status"))).toSet
    assert(got == Set((1L, 11.0, "Z"), (3L, 30.0, "C"), (9L, 90.0, "N")),
      got.toString)
  }

  test("flatMapGroupsWithState emits 0..n alerts as thresholds are crossed") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def alerts(events: Dataset[Event]): Dataset[(Long, Long)] =
      events.groupByKey(_.user_id)
        .flatMapGroupsWithState[Double, (Long, Long)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (uid: Long, evs: Iterator[Event], state: GroupState[Double]) =>
            val before = state.getOption.getOrElse(0.0)
            val after = before + evs.map(_.value).sum
            state.update(after)
            // one alert per multiple of 10 newly crossed
            val crossed = (before / 10).toLong until (after / 10).toLong
            crossed.map(level => (uid, (level + 1) * 10)).iterator
        }
    val mem = MemoryStream[Event]
    val q = alerts(mem.toDS()).toDF("user_id", "threshold").writeStream
      .format("memory").queryName("alerts").outputMode("append").start()
    mem.addData(Seq(ev(1, 1, 7.0)))  // total 7 → no alert
    q.processAllAvailable()
    mem.addData(Seq(ev(2, 1, 5.0)))  // total 12 → alert at 10
    q.processAllAvailable()
    mem.addData(Seq(ev(3, 1, 25.0))) // total 37 → alerts at 20, 30
    q.processAllAvailable()
    q.stop()
    val got = spark.table("alerts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 10L), (1L, 20L), (1L, 30L)))
  }
}
