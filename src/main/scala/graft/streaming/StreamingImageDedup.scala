package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.{Dedup, HammingJoin, HammingStore}

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
  *     watermark is exactly "already ledgered" — one single-column
  *     aggregate, never an anti-join shuffle of the corpus-sized
  *     ledger). A Structured Streaming restart re-delivers the whole
  *     last batch, and a re-probed doc would re-emit its pairs toward
  *     the store's copy of itself (the store-side id guard makes that
  *     harmless, but the watermark keeps replays no-ops);
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
  * no streaming state store at all, so restarts are pure file reads. */
object StreamingImageDedup {

  /** Test seam (the [[graft.operators.Compaction.pauseHook]] /
    * CrashPointConf spirit): the crash-window specs must kill a batch
    * BETWEEN the sink's durable steps. Fires with `"post-pairs"` after
    * the pairs append and `"post-store"` after the store append. None
    * (no-op) in production. */
  @volatile private[streaming] var crashHook: Option[String => Unit] = None
  private def pause(p: String): Unit = crashHook.foreach(_(p))

  private def exists(s: SparkSession, p: String): Boolean =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(p))

  /** Fold ONE batch of media into the dedup state under `workDir` —
    * extracted so the crash-recovery spec can drive it directly; the
    * streaming sink calls exactly this per micro-batch. */
  private[streaming] def foldBatch(batch: Dataset[Multimodal.MediaRecord],
      workDir: String, maxDist: Int): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    val storeDir = s"$workDir/hamstore"
    val seenP = s"$workDir/seen_ids"
    val fps = Multimodal.imageFingerprints(batch).toDF()
    // replay guard via the id WATERMARK, not an anti-join: ids are
    // strictly increasing across batches (the class-doc contract), so
    // "already ledgered" ≡ "≤ the ledger's max id" — one single-column
    // aggregate over the ledger instead of shuffling it under an
    // anti-join every batch (at corpus scale the ledger is
    // corpus-sized; the batch is not). A re-delivered batch filters to
    // empty; a contract-violating out-of-order id is dropped (the
    // monotone reading of undefined behavior). Note the watermark
    // tracks FINGERPRINTED ids only — fingerprint-less rows never
    // enter the ledger, and their replay costs nothing either way.
    val maxSeen: Option[Long] =
      if (!exists(s, seenP)) None
      else Option(s.read.parquet(seenP).agg(max($"doc_id")).head.get(0))
        .map(_.asInstanceOf[Long])
    val delta = maxSeen.fold(fps)(m => fps.filter($"doc_id" > m))
      .localCheckpoint(true) // one fingerprint job per batch
    if (delta.isEmpty) return
    if (HammingStore.exists(s, storeDir)) {
      HammingStore.probe(s, storeDir, delta) // eager — strictly pre-append
        .write.mode("append").parquet(s"$workDir/pairs")
      pause("post-pairs")
      HammingStore.append(s, storeDir, delta)
    } else {
      // first batch: the delta-internal sweep is the complete pair set
      HammingJoin.selfJoin(delta, "doc_id", "fp", maxDist, bits = 64)
        .write.mode("append").parquet(s"$workDir/pairs")
      pause("post-pairs")
      HammingStore.build(delta, storeDir, "doc_id", "fp", maxDist,
        bits = 64)
    }
    pause("post-store")
    // the ledger lands LAST (see ordering note in the class doc)
    delta.write.mode("append").parquet(seenP)
  }

  /** The streaming sink: call `.option("checkpointLocation", …)
    * .start()` on the result. `workDir` accumulates `pairs`,
    * `seen_ids`, and the `hamstore` tables; read the current answer
    * with [[retained]] / [[pairs]] at any batch boundary. */
  def sink(media: Dataset[Multimodal.MediaRecord], workDir: String,
      maxDist: Int = 10,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        Multimodal.MediaRecord] = {
    val w = media.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch {
        (batch: Dataset[Multimodal.MediaRecord], _: Long) =>
          foldBatch(batch, workDir, maxDist)
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
