package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.max
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Streaming tests (SURVEY.md §5.2.3): batch-equivalence for the ST
  * queries and scripted MemoryStream batches for watermark/dedup
  * semantics (E01/E02). */
class EventStreamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sf0001Events: DataFrame =
    graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type", "value")

  private def runStream(transform: DataFrame => DataFrame, data: Seq[Seq[Ev]],
      mode: OutputMode, name: String): DataFrame = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = transform(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    data.foreach { batch =>
      mem.addData(batch)
      q.processAllAvailable()
    }
    q.stop()
    spark.table(name)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("Q32 streaming tumbling window == batch twin") {
    import spark.implicits._
    val events = sf0001Events.as[Ev].collect().toSeq
    val got = runStream(EventStreams.tumbling, Seq(events), OutputMode.Complete(), "t32")
    val want = EventStreams.tumbling(sf0001Events)
    assert(canon(got) == canon(want))
  }

  test("Q33 streaming sliding window == batch twin") {
    import spark.implicits._
    val events = sf0001Events.as[Ev].collect().toSeq
    val got = runStream(EventStreams.sliding,
      events.grouped(300).toSeq, OutputMode.Complete(), "t33")
    val want = EventStreams.sliding(sf0001Events)
    assert(canon(got) == canon(want))
  }

  test("Q34 streaming session window == batch twin") {
    import spark.implicits._
    val events = sf0001Events.as[Ev].collect().toSeq
    val got = runStream(EventStreams.sessions, Seq(events), OutputMode.Complete(), "t34")
    val want = EventStreams.sessions(sf0001Events)
    assert(canon(got) == canon(want))
  }

  private def ev(id: Long, t: String, typ: String = "click"): Ev =
    Ev(id, Timestamp.valueOf(t), 1L, typ, 1.0)

  test("E01: append-mode watermark drops events later than 1 hour") {
    // batch1 fills 10:00-11:00; batch2 advances watermark past it (13:30
    // → watermark 12:30); batch3 is a late event at 10:05 → dropped.
    val batches = Seq(
      Seq(ev(1, "2024-01-01 10:10:00"), ev(2, "2024-01-01 10:50:00")),
      Seq(ev(3, "2024-01-01 13:30:00")),
      Seq(ev(4, "2024-01-01 10:05:00")), // late: behind watermark
      Seq(ev(5, "2024-01-01 15:00:00"))) // closes the 13:00 window
    val got = runStream(EventStreams.tumblingWithWatermark, batches,
      OutputMode.Append(), "e01")
    val rows = got.collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(rows.get("2024-01-01 10:00:00").contains(2L)) // late event NOT counted
    assert(rows.get("2024-01-01 13:00:00").contains(1L))
  }

  test("E06: stream-stream range join matches its batch twin and bounds matches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def e(id: Long, uid: Long, t: String) =
      Ev(id, Timestamp.valueOf(t), uid, "x", 0.0)
    val impressions = Seq(
      e(1, 1, "2024-01-01 10:00:00"),
      e(2, 2, "2024-01-01 10:00:00"),
      e(3, 3, "2024-01-01 12:00:00"))
    val clicks = Seq(
      e(101, 1, "2024-01-01 10:10:00"), // in range  → joins imp 1
      e(102, 1, "2024-01-01 10:45:00"), // >30 min   → dropped
      e(103, 2, "2024-01-01 09:55:00"), // before    → dropped
      e(104, 4, "2024-01-01 10:10:00"), // no imp    → dropped
      e(105, 3, "2024-01-01 12:30:00")) // boundary  → joins imp 3
    val impStream = MemoryStream[Ev]
    val clkStream = MemoryStream[Ev]
    val q = EventStreams.clickImpressionJoin(impStream.toDF(), clkStream.toDF())
      .writeStream.format("memory").queryName("e06")
      .outputMode(OutputMode.Append()).start()
    impStream.addData(impressions)
    clkStream.addData(clicks.take(3))
    q.processAllAvailable()
    clkStream.addData(clicks.drop(3)) // matches may span micro-batches
    q.processAllAvailable()
    q.stop()
    val got = spark.table("e06").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(got == Set((1L, 101L), (3L, 105L)))
    // batch twin: identical code over static frames (watermark a no-op)
    val batch = EventStreams.clickImpressionJoin(
        impressions.toDF(), clicks.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(batch == got)
  }

  test("E12: stream-stream LEFT OUTER join null-pads an unmatched " +
      "impression only after the watermark proves no click can arrive, " +
      "and matches its batch twin") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def e(id: Long, uid: Long, t: String) =
      Ev(id, Timestamp.valueOf(t), uid, "x", 0.0)
    val impressions = Seq(
      e(1, 1, "2024-01-01 10:00:00"), // clicked in range
      e(2, 2, "2024-01-01 10:00:00")) // never clicked → outer row
    val clicks = Seq(e(101, 1, "2024-01-01 10:10:00"))
    val impStream = MemoryStream[Ev]
    val clkStream = MemoryStream[Ev]
    val q = EventStreams
      .clickImpressionJoinOuter(impStream.toDF(), clkStream.toDF())
      .writeStream.format("memory").queryName("e12")
      .outputMode(OutputMode.Append()).start()
    impStream.addData(impressions)
    clkStream.addData(clicks)
    q.processAllAvailable()
    // the matched pair may emit now, but imp 2's null-padded row MUST
    // NOT: a click at 10:29 is still admissible until the CLICK
    // watermark passes 10:30
    val early = spark.table("e12").collect()
      .filter(r => r.getLong(0) == 2L)
    assert(early.isEmpty,
      s"outer row emitted while a match was still admissible: " +
        s"${early.toSeq}")
    // advance BOTH watermarks well past imp 2's attribution range
    impStream.addData(Seq(e(9, 9, "2024-01-01 20:00:00")))
    clkStream.addData(Seq(e(999, 9, "2024-01-01 20:00:01")))
    q.processAllAvailable()
    // one more micro-batch so the new watermark actually evicts/emits
    impStream.addData(Seq(e(10, 9, "2024-01-01 20:00:02")))
    clkStream.addData(Seq(e(998, 9, "2024-01-01 20:00:03")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("e12").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got(1L) == 101L, s"matched impression wrong: $got")
    assert(got(2L) == -1L,
      s"unmatched impression missing/not null-padded: $got")
    // batch twin: identical code over static frames
    val batch = EventStreams
      .clickImpressionJoinOuter(impressions.toDF(), clicks.toDF())
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(batch == got.view.filterKeys(Set(1L, 2L)).toMap)
  }

  test("E04: mapGroupsWithState carries per-user state across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.runningUserStats(mem.toDS()).writeStream
      .format("memory").queryName("e04").outputMode(OutputMode.Update()).start()
    def e(id: Long, uid: Long, v: Double) =
      Event(id, Timestamp.valueOf("2024-01-01 10:00:00"), uid, "click", v)
    mem.addData(Seq(e(1, 1, 1.0), e(2, 1, 2.0), e(3, 2, 5.0)))
    q.processAllAvailable()
    mem.addData(Seq(e(4, 1, 3.0)))
    q.processAllAvailable()
    q.stop()
    // update-mode sink: the LAST row per user is the final state
    val rows = spark.table("e04").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
    val finalState = rows.groupBy(_._1).map { case (u, rs) =>
      u -> rs.map(_._2).maxBy(_._1) // counter is monotone → max = latest
    }
    assert(finalState(1L) == ((3L, 6.0)))
    assert(finalState(2L) == ((1L, 5.0)))
    // batch twin: same code over a static Dataset gives the same totals
    val batch = EventStreams.runningUserStats(
      Seq(e(1, 1, 1.0), e(2, 1, 2.0), e(3, 2, 5.0), e(4, 1, 3.0)).toDS())
      .collect().map(s => s.user_id -> ((s.n_events, s.sum_value))).toMap
    assert(batch == finalState)
  }

  test("E14: transformWithState (new Spark 4 arbitrary-state API, " +
      "RocksDB store) carries the same running state as E04's " +
      "mapGroupsWithState across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try {
      def e(id: Long, uid: Long, v: Double) =
        Event(id, Timestamp.valueOf("2024-01-01 10:00:00"), uid, "click", v)
      val batches = Seq(
        Seq(e(1, 1, 1.0), e(2, 1, 2.0), e(3, 2, 5.0)),
        Seq(e(4, 1, 3.0)))
      val mem = MemoryStream[Event]
      val q = EventStreams.runningUserStatsTws(mem.toDS()).writeStream
        .format("memory").queryName("e14")
        .outputMode(OutputMode.Update()).start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      val rows = spark.table("e14").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      val finalState = rows.groupBy(_._1).map { case (u, rs) =>
        u -> rs.map(_._2).maxBy(_._1) // counter is monotone → max = latest
      }
      // identical to E04's twin over the same data (batch mode — the
      // mapGroupsWithState path is its own batch twin, spec'd above)
      val want = EventStreams.runningUserStats(batches.flatten.toDS())
        .collect().map(s => s.user_id -> ((s.n_events, s.sum_value))).toMap
      assert(finalState == want && want.size == 2)
      assert(finalState(1L) == ((3L, 6.0)), "state lost across batches")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("E14-TTL: event-time timers retire idle keys (state restarts " +
      "from zero), a stale timer never clears a fresh arrival") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try {
      def e(id: Long, uid: Long, t: String, v: Double) =
        Event(id, Timestamp.valueOf(t), uid, "click", v)
      val mem = MemoryStream[Event]
      val q = EventStreams
        .runningUserStatsTwsTtl(mem.toDS(), "0 seconds", gapMs = 60000L)
        .writeStream.format("memory").queryName("e14ttl")
        .outputMode(OutputMode.Update()).start()
      // user 1 at 10:00; user 2 at 10:00 — both alive
      mem.addData(Seq(e(1, 1, "2024-01-01 10:00:00", 1.0),
        e(2, 2, "2024-01-01 10:00:00", 5.0)))
      q.processAllAvailable()
      // user 2 again at 10:00:30 (inside its 60 s gap — re-arms);
      // watermark stays at 10:00:30, nobody expires yet
      mem.addData(Seq(e(3, 2, "2024-01-01 10:00:30", 7.0)))
      q.processAllAvailable()
      // unrelated user far ahead: advances the max event time to 11:00
      mem.addData(Seq(e(4, 9, "2024-01-01 11:00:00", 0.0)))
      q.processAllAvailable()
      // one more unrelated batch: NOW the watermark (11:00, committed
      // at the previous batch's end) is past every armed timer. User
      // 1's 10:01:00 timer legitimately clears (lastSeen 10:00 + gap =
      // 10:01:00 ≤ expiry). User 2 has TWO timers: the stale 10:01:00
      // one (armed before the 10:00:30 arrival — the guard must
      // ignore it: expiry < lastSeen 10:00:30 + gap) and the fresh
      // 10:01:30 one, which legitimately clears. Both users retired.
      mem.addData(Seq(e(7, 9, "2024-01-01 11:00:01", 0.0)))
      q.processAllAvailable()
      // both restart from zero after retirement
      mem.addData(Seq(e(5, 1, "2024-01-01 11:00:10", 3.0),
        e(6, 2, "2024-01-01 11:00:10", 9.0)))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("e14ttl").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      val byUser = rows.groupBy(_._1).view
        .mapValues(_.map(_._2).sortBy(t => (t._1, t._2)).toSeq).toMap
      // the exact emission multisets pin BOTH behaviors: accumulation
      // up to the legitimate expiry (u2 reaches (2, 12.0) — a stale
      // timer never partially cleared it) and the restart at count 1
      // (no (2, 4.0) / (3, 21.0) continuations after retirement)
      assert(byUser(1L) == Seq((1L, 1.0), (1L, 3.0)),
        s"user 1 emissions: ${rows.toSeq}")
      assert(byUser(2L) == Seq((1L, 5.0), (1L, 9.0), (2L, 12.0)),
        s"user 2 emissions: ${rows.toSeq}")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("E14-List: ListState keeps a bounded last-k window per user " +
      "across micro-batches — older events fall out, state stays O(k)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try {
      def e(id: Long, uid: Long, t: String, v: Double) =
        Event(id, Timestamp.valueOf(t), uid, "click", v)
      val mem = MemoryStream[Event]
      val q = EventStreams.recentEventsTws(mem.toDS(), k = 3)
        .writeStream.format("memory").queryName("e14list")
        .outputMode(OutputMode.Update()).start()
      // batch 1: two events for user 1 (window not yet full)
      mem.addData(Seq(e(1, 1, "2024-01-01 10:00:00", 1.0),
        e(2, 1, "2024-01-01 10:00:10", 2.0)))
      q.processAllAvailable()
      // batch 2: two MORE — the 4-event history must collapse to the
      // 3 most recent (values 2, 4, 8), proving the batch-1 list was
      // persisted AND the oldest fell out
      mem.addData(Seq(e(3, 1, "2024-01-01 10:00:20", 4.0),
        e(4, 1, "2024-01-01 10:00:30", 8.0)))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("e14list").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set((1L, 2L, 3.0), (1L, 3L, 14.0)),
        s"window emissions: $rows")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("E14-Map: MapState maintains a per-user event-type histogram " +
      "point-wise across micro-batches, equal to the batch groupBy") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try {
      def e(id: Long, uid: Long, t: String) =
        Event(id, Timestamp.valueOf("2024-01-01 10:00:00"), uid, t, 0.0)
      val batches = Seq(
        Seq(e(1, 1, "click"), e(2, 1, "view"), e(3, 2, "click")),
        Seq(e(4, 1, "click"), e(5, 1, "click"), e(6, 2, "view")))
      val mem = MemoryStream[Event]
      val q = EventStreams.typeCountsTws(mem.toDS()).writeStream
        .format("memory").queryName("e14map")
        .outputMode(OutputMode.Update()).start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      // update mode re-emits a touched cell per batch: its final count
      // is the max (counts are monotone)
      val got = spark.table("e14map").collect()
        .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val want = batches.flatten
        .groupBy(ev => (ev.user_id, ev.event_type)).view
        .mapValues(_.size.toLong).toMap
      assert(got == want && want.size == 4, s"histogram: $got vs $want")
      // the cross-batch accumulation was real, not per-batch counts
      assert(got((1L, "click")) == 3L)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("E15: the statestore reader inspects a stopped checkpoint " +
      "offline — per-user running state matches what the stream " +
      "accumulated, without replaying anything") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("e15_ckpt").toString
    def e(id: Long, uid: Long, v: Double) =
      Event(id, Timestamp.valueOf("2024-01-01 10:00:00"), uid, "click", v)
    val mem = MemoryStream[Event]
    val q = EventStreams.runningUserStats(mem.toDS()).writeStream
      .format("memory").queryName("e15")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update()).start()
    mem.addData(Seq(e(1, 1, 1.0), e(2, 1, 2.0), e(3, 2, 5.0)))
    q.processAllAvailable()
    mem.addData(Seq(e(4, 1, 3.0)))
    q.processAllAvailable()
    q.stop()
    // the checkpoint IS the state: read it back as a DataFrame.
    // Leaf-flatten key/value rather than pinning the wrapper nesting
    // (mapGroupsWithState values arrive wrapped, e.g.
    // value.groupState.<fields>) — the CONTENT is the contract here
    def leaves(v: Any): Seq[Any] = v match {
      case r: org.apache.spark.sql.Row => r.toSeq.flatMap(leaves)
      case x => Seq(x)
    }
    def readState(opts: Map[String, String]): Map[Long, (Long, Double)] =
      EventStreams.checkpointState(spark, ckpt, opts)
        .select("key", "value").collect().map { r =>
          val k = leaves(r.getStruct(0)).head.asInstanceOf[Long]
          val vs = leaves(r.getStruct(1))
          (k, (vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Double]))
        }.toMap
    val got = readState(Map.empty)
    assert(got == Map(1L -> ((3L, 6.0)), 2L -> ((1L, 5.0))),
      s"offline state read diverged: $got")
    // point-in-time: after batch 0 only, user 1 had seen 2 events
    val atBatch0 = readState(Map("batchId" -> "0"))
    assert(atBatch0 == Map(1L -> ((2L, 3.0)), 2L -> ((1L, 5.0))),
      s"batchId=0 state read diverged: $atBatch0")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
  }

  test("E15: the statestore reader also opens a transformWithState " +
      "store by stateVarName (E14's named ValueState)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("e15tws_ckpt").toString
    try {
      def e(id: Long, uid: Long, v: Double) =
        Event(id, Timestamp.valueOf("2024-01-01 10:00:00"), uid, "click", v)
      val mem = MemoryStream[Event]
      val q = EventStreams.runningUserStatsTws(mem.toDS()).writeStream
        .format("memory").queryName("e15tws")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update()).start()
      mem.addData(Seq(e(1, 1, 1.0), e(2, 1, 2.0), e(3, 2, 5.0)))
      q.processAllAvailable()
      mem.addData(Seq(e(4, 1, 3.0)))
      q.processAllAvailable()
      q.stop()
      def leaves(v: Any): Seq[Any] = v match {
        case r: org.apache.spark.sql.Row => r.toSeq.flatMap(leaves)
        case x => Seq(x)
      }
      val got = EventStreams
        .checkpointState(spark, ckpt, Map("stateVarName" -> "stats"))
        .select("key", "value").collect().map { r =>
          val k = leaves(r.getStruct(0)).head.asInstanceOf[Long]
          val vs = leaves(r.getStruct(1))
          (k, (vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Double]))
        }.toMap
      assert(got == Map(1L -> ((3L, 6.0)), 2L -> ((1L, 5.0))),
        s"TWS state read diverged: $got")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("E15: the statestore reader opens an E14 ListState store by " +
      "stateVarName — the exact bounded window is recovered, one row " +
      "per element (flattened collection read)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("e15list_ckpt").toString
    try {
      // the E14-List fixture: 4 events for user 1 across two batches,
      // k=3 → the stored window is the 3 most recent
      def e(id: Long, uid: Long, t: String, v: Double) =
        Event(id, Timestamp.valueOf(t), uid, "click", v)
      val mem = MemoryStream[Event]
      val q = EventStreams.recentEventsTws(mem.toDS(), k = 3).writeStream
        .format("memory").queryName("e15list")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update()).start()
      mem.addData(Seq(e(1, 1, "2024-01-01 10:00:00", 1.0),
        e(2, 1, "2024-01-01 10:00:10", 2.0)))
      q.processAllAvailable()
      mem.addData(Seq(e(3, 1, "2024-01-01 10:00:20", 4.0),
        e(4, 1, "2024-01-01 10:00:30", 8.0)))
      q.processAllAvailable()
      q.stop()
      // value-wrapping convention (recorded like the r14 ValueState
      // read): with the default flattenCollectionTypes=true a ListState
      // store reads back one row PER ELEMENT in a `list_element`
      // column — leaf-flatten key/element rather than pinning nesting
      def leaves(v: Any): Seq[Any] = v match {
        case r: org.apache.spark.sql.Row => r.toSeq.flatMap(leaves)
        case x => Seq(x)
      }
      val got = EventStreams
        .checkpointState(spark, ckpt, Map("stateVarName" -> "recent"))
        .select("key", "list_element").collect().map { r =>
          val k = leaves(r.getStruct(0)).head.asInstanceOf[Long]
          val el = leaves(r.get(1))
          (k, (el(0).asInstanceOf[Long], el(1).asInstanceOf[Long],
            el(2).asInstanceOf[Double]))
        }.toSeq.sortBy(_._2)
      def ms(t: String) = Timestamp.valueOf(t).getTime
      assert(got == Seq(
        (1L, (ms("2024-01-01 10:00:10"), 2L, 2.0)),
        (1L, (ms("2024-01-01 10:00:20"), 3L, 4.0)),
        (1L, (ms("2024-01-01 10:00:30"), 4L, 8.0))),
        s"ListState read diverged (the evicted event must be GONE " +
          s"from the store, not just from the emissions): $got")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("E15: the statestore reader opens an E14 MapState store by " +
      "stateVarName — every (user, sub-key) cell is recovered " +
      "(flattened user_map_key/user_map_value read)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("e15map_ckpt").toString
    try {
      // the E14-Map fixture: two batches of (user, type) events
      def e(id: Long, uid: Long, t: String) =
        Event(id, Timestamp.valueOf("2024-01-01 10:00:00"), uid, t, 0.0)
      val batches = Seq(
        Seq(e(1, 1, "click"), e(2, 1, "view"), e(3, 2, "click")),
        Seq(e(4, 1, "click"), e(5, 1, "click"), e(6, 2, "view")))
      val mem = MemoryStream[Event]
      val q = EventStreams.typeCountsTws(mem.toDS()).writeStream
        .format("memory").queryName("e15map")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update()).start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      // MapState reads back one row per (grouping key, SUB-key) with
      // the sub-key/value in user_map_key/user_map_value columns —
      // exactly the "which sub-keys exist" question an operator
      // inspecting a histogram store asks
      def leaves(v: Any): Seq[Any] = v match {
        case r: org.apache.spark.sql.Row => r.toSeq.flatMap(leaves)
        case x => Seq(x)
      }
      val got = EventStreams
        .checkpointState(spark, ckpt, Map("stateVarName" -> "type_counts"))
        .select("key", "user_map_key", "user_map_value").collect().map { r =>
          ((leaves(r.get(0)).head.asInstanceOf[Long],
            leaves(r.get(1)).head.asInstanceOf[String]),
            leaves(r.get(2)).head.asInstanceOf[Long])
        }.toMap
      val want = batches.flatten
        .groupBy(ev => (ev.user_id, ev.event_type)).view
        .mapValues(_.size.toLong).toMap
      assert(got == want, s"MapState read diverged: $got vs $want")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("E08: streaming latest-per-key CDC state == q89's batch collapse") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // replay the EXACT change log q89 collapses, in seq order split
    // across micro-batches (earlier ops arrive in earlier batches, the
    // cross-key interleave within a batch is arbitrary — both realistic)
    val log = graft.queries.Incremental
      .changeLog(graft.queries.Incremental.ordersBaseFor(spark, dir))
      .as[Change].collect().sortBy(c => (c.seq, c.key)).toSeq
    val batches = log.grouped(math.max(1, log.length / 3)).toSeq
    val mem = MemoryStream[Change]
    val q = EventStreams.latestKeyState(mem.toDS()).writeStream
      .format("memory").queryName("e08").outputMode(OutputMode.Update()).start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    // update mode re-emits a key on every touching batch; its final
    // state is the highest-seq emission
    val got = spark.table("e08").as[Change].collect()
      .groupBy(_.key).map(_._2.maxBy(_.seq)).toSet
    val want = EventStreams.latestKeyState(log.toDS()).collect().toSet
    assert(got == want && got.nonEmpty)
    // and the state machine agrees with q89's declarative max_by: every
    // key's surviving op/price matches the applied snapshot's semantics
    val applied = graft.queries.Incremental.q89(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    got.foreach { c =>
      c.op match {
        case "D" => assert(!applied.contains(c.key), s"deleted ${c.key} present")
        case "U" =>
          assert(applied(c.key)._2 == c.price.get, s"key ${c.key}")
          // a status-bearing update must have moved the applied row
          c.status.foreach(st => assert(applied(c.key)._1 == st, s"key ${c.key}"))
        case "I" => assert(applied(c.key) == (("NEW", c.price.get)), s"key ${c.key}")
        case other => fail(s"unexpected op $other")
      }
    }
    assert(got.exists(c => c.op == "U" && c.status.isDefined),
      "no status-bearing update survived — group migration untested")
  }

  test("E08 duplicate seqs: every micro-batch interleaving converges to " +
      "the same (seq, tiebreak)-max state (VERDICT r4 #7)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // three changes per key with DUPLICATE top seq and different
    // payloads — round 4's arrival-order tie-keeping made the winner
    // depend on the batch split; the explicit tiebreak must not
    val changes = (0L until 8L).flatMap { k =>
      Seq(
        Change(k, "I", Some(1.0), None, 1L),
        Change(k, "U", Some(2.0 + k), Some("x"), 5L),
        Change(k, "U", Some(9.0 + k), Some("y"), 5L)) // dup seq 5
    }
    // deterministic expectation, computed independently of the operator
    def tb(c: Change) = s"${c.op}|${c.price}|${c.status}"
    val want = changes.groupBy(_.key)
      .map { case (_, cs) => cs.maxBy(c => (c.seq, tb(c))) }.toSet

    val rng = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      val shuffled = rng.shuffle(changes)
      val batches = shuffled.grouped(1 + rng.nextInt(6)).toSeq
      val mem = MemoryStream[Change]
      val name = s"e08tb$trial"
      val q = EventStreams.latestKeyState(mem.toDS()).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      // final state per key = the last emission that carries the
      // winning (seq, tiebreak) — reconstruct it the way a downstream
      // materialization would (highest resolution order wins)
      val got = spark.table(name).as[Change].collect()
        .groupBy(_.key).map(_._2.maxBy(c => (c.seq, tb(c)))).toSet
      assert(got == want, s"trial $trial (split ${batches.map(_.size)})")
    }
  }

  test("file source: readStream over parquet events == batch twin (end-to-end)") {
    import spark.implicits._
    // stage the events table as a streaming source directory, with the
    // same ns→µs handling the batch loader applies
    val src = java.nio.file.Files.createTempDirectory("stream_src").toString
    val sink = java.nio.file.Files.createTempDirectory("stream_sink").toString
    val chk = java.nio.file.Files.createTempDirectory("stream_chk").toString
    val batchEvents = sf0001Events
    batchEvents.write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(batchEvents.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val q = EventStreams.tumblingWithWatermark(stream).writeStream
      .format("parquet").option("path", sink)
      .option("checkpointLocation", chk)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode emits exactly the windows closed by the final watermark
    // (max ts − 1 h); everything later stays in state. Compare emitted
    // rows against the batch twin restricted to those windows.
    val maxTs = batchEvents.agg(max($"ts")).collect().head.getTimestamp(0)
    val wmMillis = maxTs.getTime - 3600 * 1000L
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val expected = EventStreams.tumblingWithWatermark(batchEvents)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .filter { case (ws, _, _) => fmt.parse(ws).getTime + 3600 * 1000L <= wmMillis }
      .toSet
    val got = spark.read.parquet(sink).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(expected.nonEmpty)
    assert(got == expected)
  }

  test("foreachBatch sink: per-micro-batch writes land with batch ids") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("febatch").toString
    val mem = MemoryStream[Event]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = mem.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Event], id: Long) =>
        seen.synchronized { seen += ((id, batch.count())) }
        batch.write.mode("append").parquet(s"$out/batch_$id")
        ()
      }
      .start()
    def e(id: Long) = Event(id, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0)
    mem.addData(Seq(e(1), e(2)))
    q.processAllAvailable()
    mem.addData(Seq(e(3)))
    q.processAllAvailable()
    q.stop()
    assert(seen.map(_._2).sum == 3)
    val total = seen.map(_._1).map(id =>
      spark.read.parquet(s"$out/batch_$id").count()).sum
    assert(total == 3)
  }

  // the two flagship surfaces composed: a streaming query whose
  // micro-batch outputs are template-renamed by the commit protocol —
  // the reference's capability (FM1–FM9) applied to a streaming sink
  test("foreachBatch + file mover: each micro-batch output is template-renamed") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    graft.filemover.MoveFilesCommitProtocol.register(spark)
    val out = java.nio.file.Files.createTempDirectory("movestream").toString
    try {
      val mem = MemoryStream[Event]
      val q = mem.toDS().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Event], id: Long) =>
          batch.coalesce(1).write.mode("overwrite")
            .option(graft.filemover.MoveFilesCommitProtocol.MOVE_FILES_OPTION,
              "$outputDirectory/batch_" + id + ".csv")
            .csv(s"$out/b$id")
          ()
        }
        .start()
      def e(id: Long) = Event(id, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0)
      mem.addData(Seq(e(1), e(2)))
      q.processAllAvailable()
      mem.addData(Seq(e(3)))
      q.processAllAvailable()
      q.stop()
      for (id <- Seq(0, 1)) {
        val f = java.nio.file.Paths.get(s"$out/b$id/batch_$id.csv")
        assert(java.nio.file.Files.isRegularFile(f), s"missing renamed $f")
      }
    } finally {
      spark.conf.unset(graft.filemover.MoveFilesCommitProtocol.COMMIT_PROTOCOL_CLASS)
    }
  }

  test("E07: the stateless doc pipeline (score+redact+split) streams == batch") {
    // The LLM-ops transforms are plain column expressions, so the SAME
    // function object runs as a micro-batch stream and as batch — the
    // composition proof that the text pipeline is streaming-ready
    // (stateless ops need no watermark; per-corpus ops like dedup are
    // the stateful E02-family instead).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    // the PRODUCTION expressions, not test-local copies: the shared
    // quality-score builder (q41/q79), q70's email regex, q62's split
    val pipeline: DataFrame => DataFrame = df => df
      .withColumn("toks", split($"text", " "))
      .select($"doc_id",
        graft.queries.LlmOps2.qualityScore("toks").as("quality_score"),
        length(regexp_replace($"text",
          graft.queries.LlmOps4.EmailRe, "[EMAIL]")).as("red_len"),
        (graft.functions.RollingHash.rollingHash($"text", 64) % 100 < 80).as("is_train"))
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = pipeline(mem.toDF().toDF("doc_id", "text")).writeStream
      .format("memory").queryName("e07").outputMode(OutputMode.Append()).start()
    docs.grouped(40).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    val got = canon(spark.table("e07"))
    val want = canon(pipeline(
      graft.Tables(spark, "/root/testdata/sf0.001", "documents")
        .select($"doc_id", $"text")))
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("E02: dropDuplicatesWithinWatermark dedups within the watermark") {
    val batches = Seq(
      Seq(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:30"),
        ev(2, "2024-01-01 10:01:00")),
      Seq(ev(1, "2024-01-01 10:02:00"), ev(3, "2024-01-01 10:03:00")))
    val got = runStream(EventStreams.dedupWithinWatermark, batches,
      OutputMode.Append(), "e02")
    val ids = got.collect().map(_.getAs[Long]("event_id")).toSeq.sorted
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("E08 TTL: idle keys are evicted on event-time TTL, late stragglers " +
      "are dropped, fresh changes reinstate with empty state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def tc(key: Long, seq: Long, t: String): TimedChange =
      TimedChange(key, "U", Some(seq.toDouble), None, seq, Timestamp.valueOf(t))
    val mem = MemoryStream[TimedChange]
    // TTL 30 min of event time, watermark delay 10 min
    val q = EventStreams
      .latestKeyStateTtl(mem.toDS(), ttlMinutes = 30,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("e08ttl")
      .outputMode(OutputMode.Update()).start()
    def stateRows: Long = {
      val p = q.lastProgress
      p.stateOperators(0).numRowsTotal
    }
    def emitted: Set[(Long, Long)] = spark.table("e08ttl")
      .as[TimedChange].collect().map(c => (c.key, c.seq)).toSet

    // batch 1: keys A=1 (seq 10) and B=2 (seq 1) at 12:00
    mem.addData(tc(1, 10, "2024-01-01 12:00:00"), tc(2, 1, "2024-01-01 12:00:00"))
    q.processAllAvailable()
    assert(emitted == Set((1L, 10L), (2L, 1L)))
    assert(stateRows == 2, "both keys live")

    // batch 2: B advances to 13:30 → watermark after this batch is
    // 13:20, past A's TTL deadline (12:00 + 30 min)
    mem.addData(tc(2, 2, "2024-01-01 13:30:00"))
    q.processAllAvailable()
    // batch 3: timeouts fire against the advanced watermark → A evicted
    // silently (no tombstone emission), state bounded by LIVE keys
    mem.addData(tc(2, 3, "2024-01-01 13:35:00"))
    q.processAllAvailable()
    assert(stateRows == 1, s"A not evicted: $stateRows state rows")
    assert(!emitted.exists(e => e._1 == 1L && e._2 != 10L))

    // batch 4: straggler for evicted A at 12:05 — far below the
    // watermark (~13:25) — must be dropped, not resurrect the key
    mem.addData(tc(1, 99, "2024-01-01 12:05:00"))
    q.processAllAvailable()
    assert(!emitted.contains((1L, 99L)), "late change resurrected an evicted key")
    assert(stateRows == 1)

    // batch 5: FRESH change for A with seq 5 — LOWER than the
    // pre-eviction seq 10. Accepted ⇒ the old state is provably gone
    // (latestKeyState without TTL would have kept seq 10)
    mem.addData(tc(1, 5, "2024-01-01 13:40:00"))
    q.processAllAvailable()
    assert(emitted.contains((1L, 5L)), "fresh change did not reinstate the key")
    assert(stateRows == 2, "reinstated key missing from state")
    q.stop()
  }

  test("E08 TTL: duplicate-seq changes differing only in ts resolve " +
      "deterministically (ts is part of the default tiebreak)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // identical (op, price, status) at the same seq but different ts:
    // without ts in the tiebreak the retained state (and so the TTL
    // eviction clock) depended on arrival order across micro-batches
    def tcAt(t: String): TimedChange =
      TimedChange(1L, "U", Some(1.0), None, 5L, Timestamp.valueOf(t))
    val early = tcAt("2024-01-01 12:00:00")
    val late = tcAt("2024-01-01 12:05:00")
    def lastTs(order: Seq[TimedChange], name: String): Timestamp = {
      val mem = MemoryStream[TimedChange]
      val q = EventStreams
        .latestKeyStateTtl(mem.toDS(), ttlMinutes = 300,
          watermarkDelay = "10 hours")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      order.foreach { c => mem.addData(c); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[TimedChange].collect().last.ts
    }
    val a = lastTs(Seq(early, late), "e08tie_a")
    val b = lastTs(Seq(late, early), "e08tie_b")
    assert(a == b, s"arrival order changed the resolved state: $a vs $b")
    assert(a == late.ts, "the (seq, tiebreak) max should retain the later ts")
  }
}
