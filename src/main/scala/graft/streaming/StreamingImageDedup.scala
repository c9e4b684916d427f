package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.{Compaction, Dedup, HammingJoin, HammingStore}

/** E18 — STREAMING image dedup: the ingest-time composition of the
  * round's pieces (dHash fingerprints → [[HammingStore]] probe →
  * greedy min-id retention) as an exactly-once-retained `foreachBatch`
  * sink — the image twin of [[StreamingNearDup.matchesWithReconcile]],
  * with the persisted Hamming store playing the signature store's
  * role from batch one (no capped-stream half: a 64-bit fingerprint
  * probe is cheap enough to run per batch, so the stream/batch split
  * the text pipeline needs collapses into one store-backed path).
  *
  * Per micro-batch of arriving media:
  *
  *  1. fingerprint the batch ([[Multimodal.imageFingerprints]] —
  *     `image/fake` and undecodable payloads drop, never fail);
  *  2. REPLAY GUARD: drop ids at or below the `seen_ids` ledger's MAX
  *     id (ids are strictly increasing across batches, so that
  *     watermark is exactly "already ledgered" — read from the O(1)
  *     cache file, falling back to one ledger column aggregate only in
  *     recovery; never an anti-join shuffle of the corpus-sized
  *     ledger). A Structured Streaming restart re-delivers the whole
  *     last batch, and a re-probed doc would re-emit its pairs toward
  *     the store's copy of itself (the store-side id guard makes that
  *     harmless, but the watermark keeps replays no-ops). A batch
  *     MIXING watermarked and new ids is an upstream contract bug and
  *     is made LOUD: WARN by default, throw under `strictIds`;
  *  3. probe the store with the surviving delta (all pairs with ≥1 end
  *     new — `HammingStore.probe`; the FIRST batch self-joins via
  *     [[HammingJoin.selfJoin]] and builds the store instead), append
  *     the pairs to the `pairs` log;
  *  4. append the delta's band rows to the store;
  *  5. append the delta's ids (+fingerprints) to `seen_ids` — LAST.
  *
  * CRASH-SAFE ORDERING (each window spec'd with an injected crash):
  * pairs land durably BEFORE the store ledgers the delta, and the
  * ledger lands after the store — so a crash anywhere re-runs the
  * batch with every outcome converging:
  *
  *  - crash before the pairs write: nothing happened; replay is the
  *    first attempt;
  *  - crash between pairs write and store append: replay re-probes the
  *    same delta — the SAME pairs append again and the read-side
  *    `distinct` drops them (duplicates, never losses; the reverse
  *    order would lose a ledgered-but-unprobed delta's pairs FOREVER);
  *  - crash between store append and seen-ids append: replay re-probes
  *    a delta whose rows are already stored — the store-side
  *    `p.id =!= i.id` guard keeps self-pairs out, real pairs duplicate
  *    and dedupe, and the store carries ONE duplicate set of band rows
  *    for that batch (bounded bloat: probes stay correct through their
  *    `distinct`; a [[HammingStore.compact]] rewrites but does not
  *    dedupe them — rebuild if byte-purity ever matters).
  *
  * Preconditions (the [[Multimodal.imageDedupDelta]] contract):
  * `doc_id` unique across the stream, STRICTLY INCREASING across
  * batches — retention keeps the earliest copy, so an id must never be
  * smaller than an already-retained near-dup's.
  *
  * Scale posture: per-batch work is the delta fingerprint job + a
  * statically pruned store scan (family 10b: flat across a 16× corpus
  * at drip size) + three append-only parquet writes; nothing ever
  * re-reads or re-shuffles the corpus. State is all in parquet —
  * no streaming state store at all, so restarts are pure file reads.
  * The replay watermark itself is O(1) (round 16): the ledger's max id
  * is cached in a one-line text file rewritten after every ledger
  * append, so the steady-state guard reads ZERO ledger rows — the
  * full `max(doc_id)` column scan (~80 GB per trigger at 10B images)
  * survives only as the recovery fallback when the cache is absent,
  * torn, or pre-dates this round. A crash between the ledger append
  * and the cache rewrite leaves the cache one batch STALE — the safe
  * direction: the replay re-probes that batch (duplicate pairs dedupe,
  * one bounded store-bloat set), never skips an unledgered one. (A
  * torn cache write is also safe: a truncated decimal prefix of a
  * positive long is always ≤ the original.)
  *
  * Recovery stall bound (ADVICE r15): store mutations take the
  * maintenance lease with `leaseStaleMs` (default 5 min) instead of
  * the 1 h maintenance default — per-batch appends are short and
  * single-writer, so if the process dies INSIDE a store append (not
  * between the sink's durable steps), the restart's replay is refused
  * by the dead holder's lease for at most `leaseStaleMs`, then breaks
  * it and converges as usual. Live holders are never broken (the
  * lease heartbeats every `leaseStaleMs / 3`); size it well above the
  * worst GC-pause/heartbeat-hiccup, not above batch duration. */
object StreamingImageDedup {

  /** Default [[graft.operators.MaintenanceLease]] staleness for the
    * per-batch store mutations — see the class-doc stall bound. */
  val DefaultLeaseStaleMs: Long = 5L * 60 * 1000

  /** Test seam (the [[graft.operators.Compaction.pauseHook]] /
    * CrashPointConf spirit): the crash-window specs must kill a batch
    * BETWEEN the sink's durable steps. Fires with `"post-pairs"` after
    * the pairs append and `"post-store"` after the store append. None
    * (no-op) in production. */
  @volatile private[streaming] var crashHook: Option[String => Unit] = None
  private def pause(p: String): Unit = crashHook.foreach(_(p))

  /** Test seam + production WARN for strictly-increasing-id contract
    * violations (round 16): invoked with (droppedCount, newCount) when
    * a batch MIXES already-watermarked ids with new ones — an upstream
    * id-ordering bug that previously shrank the corpus silently (a
    * pure replay is all-old and stays a silent no-op). */
  @volatile private[streaming] var violationHook:
    Option[(Long, Long) => Unit] = None

  /** Diagnostic counter: ledger-scan fallbacks taken by the watermark
    * guard — steady state is ZERO (the O(1) cache file serves every
    * batch); each unit is one recovery-path full-column scan. */
  private[streaming] val ledgerScans =
    new java.util.concurrent.atomic.AtomicLong

  private def exists(s: SparkSession, p: String): Boolean =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(p))

  private def fsOf(s: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  private def watermarkPath(workDir: String) = s"$workDir/seen_ids.max"

  /** The replay watermark: the O(1) cache file when present and
    * parseable, else the ledger scan (recovery fallback — absent cache,
    * torn write, or a pre-r16 state). A stale/torn cache only ever
    * UNDER-reports (see the class doc), which replays convergently. */
  private def readWatermark(s: SparkSession, workDir: String,
      seenP: String): Option[Long] = {
    import s.implicits._
    val fs = fsOf(s, workDir)
    val wp = new org.apache.hadoop.fs.Path(watermarkPath(workDir))
    val cached: Option[Long] =
      if (!fs.exists(wp)) None
      else scala.util.Try(Compaction.readSmall(fs, wp).trim.toLong).toOption
    cached.orElse {
      if (!exists(s, seenP)) None
      else {
        ledgerScans.incrementAndGet()
        Option(s.read.parquet(seenP).agg(max($"doc_id")).head.get(0))
          .map(_.asInstanceOf[Long])
      }
    }
  }

  /** Fold ONE batch of media into the dedup state under `workDir` —
    * extracted so the crash-recovery spec can drive it directly; the
    * streaming sink calls exactly this per micro-batch. */
  private[streaming] def foldBatch(batch: Dataset[Multimodal.MediaRecord],
      workDir: String, maxDist: Int,
      strictIds: Boolean = false,
      leaseStaleMs: Long = DefaultLeaseStaleMs): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    val storeDir = s"$workDir/hamstore"
    val seenP = s"$workDir/seen_ids"
    // one fingerprint job per batch — checkpointed BEFORE the guard so
    // the contract counts below are driver aggregates over a local
    // frame, not repeated fingerprint jobs
    val fps = Multimodal.imageFingerprints(batch).toDF()
      .localCheckpoint(true)
    // replay guard via the id WATERMARK, not an anti-join: ids are
    // strictly increasing across batches (the class-doc contract), so
    // "already ledgered" ≡ "≤ the ledger's max id" — and the watermark
    // itself is the O(1) cache file (class doc), never a per-batch
    // ledger shuffle or scan. A re-delivered batch filters to empty.
    // Note the watermark tracks FINGERPRINTED ids only —
    // fingerprint-less rows never enter the ledger, and their replay
    // costs nothing either way.
    val maxSeen: Option[Long] = readWatermark(s, workDir, seenP)
    val (total, old) = maxSeen match {
      case None => (fps.count(), 0L)
      case Some(m) =>
        val r = fps.agg(count(lit(1)),
          count(when($"doc_id" <= m, lit(1)))).head
        (r.getLong(0), r.getLong(1))
    }
    // loudness (round 16): old ids MIXED with new ones means the
    // upstream id contract broke — the old rows are dropped either way
    // (the monotone reading of undefined behavior), but silently
    // shrinking the corpus turned an upstream bug into missing data.
    // A pure replay (old == total) stays a silent no-op by design.
    if (old > 0 && old < total) {
      violationHook.foreach(_(old, total - old))
      val msg = s"strictly-increasing-id contract violated: batch " +
        s"mixes $old already-watermarked id(s) (≤ ${maxSeen.get}) with " +
        s"${total - old} new one(s) — the old rows are DROPPED; fix the " +
        "upstream id assignment"
      if (strictIds) throw new IllegalStateException(msg)
      org.apache.log4j.Logger.getLogger(getClass).warn(msg)
    }
    if (total == old) return // empty batch or pure replay
    val delta = maxSeen.fold(fps)(m => fps.filter($"doc_id" > m))
    if (HammingStore.exists(s, storeDir)) {
      HammingStore.probe(s, storeDir, delta) // eager — strictly pre-append
        .write.mode("append").parquet(s"$workDir/pairs")
      pause("post-pairs")
      HammingStore.append(s, storeDir, delta, staleMs = leaseStaleMs)
    } else {
      // first batch: the delta-internal sweep is the complete pair set
      HammingJoin.selfJoin(delta, "doc_id", "fp", maxDist, bits = 64)
        .write.mode("append").parquet(s"$workDir/pairs")
      pause("post-pairs")
      HammingStore.build(delta, storeDir, "doc_id", "fp", maxDist,
        bits = 64, staleMs = leaseStaleMs)
    }
    pause("post-store")
    // the ledger lands LAST (see ordering note in the class doc) …
    delta.write.mode("append").parquet(seenP)
    // … and the O(1) watermark cache after IT (a crash between the two
    // leaves the cache stale — the convergent direction; class doc)
    val newMax = delta.agg(max($"doc_id")).head.getLong(0)
    val out = fsOf(s, workDir).create(
      new org.apache.hadoop.fs.Path(watermarkPath(workDir)), true)
    try out.write(newMax.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The streaming sink: call `.option("checkpointLocation", …)
    * .start()` on the result. `workDir` accumulates `pairs`,
    * `seen_ids`, and the `hamstore` tables; read the current answer
    * with [[retained]] / [[pairs]] at any batch boundary. */
  def sink(media: Dataset[Multimodal.MediaRecord], workDir: String,
      maxDist: Int = 10,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      strictIds: Boolean = false,
      leaseStaleMs: Long = DefaultLeaseStaleMs)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        Multimodal.MediaRecord] = {
    val w = media.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch {
        (batch: Dataset[Multimodal.MediaRecord], _: Long) =>
          foldBatch(batch, workDir, maxDist, strictIds, leaseStaleMs)
      }
    trigger.fold(w)(w.trigger)
  }

  /** Every near-dup pair ingested so far — (doc_id_a < doc_id_b,
    * hamming), distinct (the append-only log may carry crash-replay
    * duplicates; see the class doc). */
  def pairs(spark: SparkSession, workDir: String): DataFrame = {
    val p = s"$workDir/pairs"
    if (!exists(spark, p))
      spark.range(0).select(col("id").as("doc_id_a"),
        col("id").as("doc_id_b"), col("id").cast("int").as("hamming"))
    else spark.read.parquet(p).distinct()
  }

  /** The retained corpus so far: every ingested (decodable) doc minus
    * greedy near-dup drops — row-for-row what `Graft.imageDedup` keeps
    * on the same corpus, restricted to docs with fingerprints
    * (fingerprint-less rows never enter the ledger; retain them
    * upstream, the batch facade's rule). Returns (doc_id, fp). */
  def retained(spark: SparkSession, workDir: String): DataFrame = {
    val seenP = s"$workDir/seen_ids"
    if (!exists(spark, seenP))
      spark.range(0).select(col("id").as("doc_id"), col("id").as("fp"))
    else
      Dedup.greedyRetain(spark.read.parquet(seenP).distinct(),
        pairs(spark, workDir), "doc_id", "doc_id_b")
  }
}
