package graft.streaming

import graft.queries.{CorpusPipeline, CorpusPipelineDelta}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** E10: the Structured-Streaming twin of the incremental corpus
  * pipeline — micro-batches of arriving documents fold into the
  * persisted pipeline state ([[CorpusPipelineDelta]]) through a
  * `foreachBatch` sink with END-TO-END EXACTLY-ONCE semantics.
  *
  * Why this composes correctly: Structured Streaming does not commit a
  * batch's offsets until `foreachBatch` returns, so after ANY crash the
  * restarted stream REPLAYS the in-flight batch — always the same
  * `batchId` with the same rows. The fold, for its part, journals every
  * state mutation ([[CorpusPipelineDelta.recoverFold]]) and records the
  * batch tag in `meta.last_batch` atomically WITH the increment's
  * commit marker. The two compose into a complete case split over the
  * crash windows:
  *
  *   - crash BEFORE the fold's commit marker → `recoverFold` rolls the
  *     partial writes back ([[CorpusPipelineDelta.RolledBack]]); the
  *     replayed batch re-applies them — nothing lost, nothing doubled;
  *   - crash AFTER the marker but before the stream commits its offsets
  *     → `recoverFold` completes the staged swaps
  *     ([[CorpusPipelineDelta.Completed]]) and the replayed batch's id
  *     now equals `meta.last_batch` — the sink SKIPS it (re-folding
  *     would throw the strictly-increasing-id precondition; the skip is
  *     the exactly-once path, not an optimization). The skip first
  *     verifies the replay's id bounds and row count against the
  *     recorded fold's (`meta.batch_lo/hi/n`) — a foreign checkpoint
  *     colliding at exactly `last_batch` must fail loudly, not lose
  *     its rows;
  *   - crash after the offset commit → the batch is never redelivered
  *     and `meta.last_batch` already records it.
  *
  * Contract inherited from the fold (scaladoc there): ids strictly
  * increase ACROSS micro-batches (the natural ingest-sequence shape),
  * external `cfg.evalDocs` required. Cadence guidance: each fold is a
  * full pipeline day (~25 jobs at fixture scale), so trigger in
  * MINUTES-to-hours, or `Trigger.AvailableNow` for a scheduled daily
  * drain — not sub-second micro-batches. Output shards are published
  * by calling [[CorpusPipelineDelta.refreshOutput]] on whatever slower
  * cadence the corpus is actually consumed (the fold/refresh split).
  *
  * MEDIA (round 16 — E19's streaming twin): when `mediaCols` names the
  * stream's (media_type, payload) columns, each micro-batch's rows
  * with a non-null payload ALSO fold as that increment's attached
  * images ([[CorpusPipelineDelta.foldIncrement]]'s media table, keyed
  * by the same `cfg.idCol`) — deduped through the persisted Hamming
  * store under the SAME fold journal, commit marker and batch tag. No
  * new crash window opens: the case split above already covers both
  * modalities because the journal does — a pre-commit crash rolls the
  * media appends back with the text's and the replay re-applies both;
  * a post-commit replay is SKIPPED whole, so the media half is
  * exactly-once for free (spec'd: the media ledger row count is pinned
  * across a post-commit crash + replay). One stream, one checkpoint,
  * one id space — the multimodal training-record shape
  * (doc_id, text, lang, source, media_type, payload) rides a single
  * replayable source instead of two streams whose offsets could
  * commit independently. */
object StreamingCorpusPipeline {

  /** The sink body, exposed for direct use (and for the specs to drive
    * the crash/replay seams without a running stream): recover any
    * crashed fold, skip an already-applied batch, fold otherwise.
    * `triggerIntervalMs` (when [[sink]] was given a processing-time
    * trigger) arms the cadence guard: a fold is a full pipeline day, and
    * one that runs LONGER than the trigger interval means every interval
    * accrues more work than it retires — the backlog grows without
    * bound. That misconfiguration is loud (a WARN per lagging batch),
    * not silent. */
  def foldBatch(stateDir: String, cfg: CorpusPipeline.Config,
      storeCells: Int = 64, triggerIntervalMs: Option[Long] = None,
      mediaCols: Option[(String, String)] = None, mediaMaxDist: Int = 10)(
      delta: DataFrame, batchId: Long): Unit = {
    val s = delta.sparkSession
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    val t0 = System.nanoTime()
    CorpusPipelineDelta.recoverFold(s, stateDir) match {
      case CorpusPipelineDelta.RolledBack(tok) =>
        log.warn(s"rolled back crashed fold '$tok' at $stateDir; the " +
          "replayed batch re-applies it")
      case CorpusPipelineDelta.Completed(tok) =>
        log.warn(s"completed crashed fold '$tok' at $stateDir")
      case CorpusPipelineDelta.Clean => ()
    }
    val info = CorpusPipelineDelta.lastBatchInfo(s, stateDir)
    val last = info.batch
    if (last.exists(_ > batchId))
      // a correct replay only ever redelivers batchId == last_batch (the
      // one in-flight batch whose offsets never committed). batchId <
      // last_batch means the checkpoint does not belong to this state —
      // a fresh or foreign checkpoint restarts ids at 0, and treating
      // that as "already folded" would silently SKIP every arriving
      // batch until its ids catch up: the worst failure mode is data
      // loss that looks like success (r12 sweep)
      throw new IllegalStateException(
        s"micro-batch $batchId arrived at $stateDir whose last_batch is " +
          s"${last.get} — this checkpoint does not belong to this state " +
          "dir. Pair the checkpoint and state dir for life; a new " +
          "checkpoint needs a new state dir (or fold the backlog " +
          "non-streaming via CorpusPipelineDelta.foldIncrement)")
    else if (last.contains(batchId)) {
      // verify the replay IS the recorded batch before skipping (r13):
      // batchId == last_batch is the legitimate-replay signature, but a
      // FOREIGN checkpoint colliding at exactly last_batch would wear
      // it too, and skipping would drop its rows silently. A true
      // replay redelivers the same rows (the replayable-source
      // contract), so the recorded fold's delta id bounds must match.
      // Unverifiable records (pre-r13 state, empty tagged batch) skip
      // as before.
      (info.lo, info.hi, info.n) match {
        case (Some(lo), Some(hi), n) =>
          import org.apache.spark.sql.functions.{col, count, max, min}
          val b = delta.agg(min(col(cfg.idCol).cast("long")).as("lo"),
            max(col(cfg.idCol).cast("long")).as("hi"),
            count(col(cfg.idCol)).as("n")).collect().head
          if (b.isNullAt(0) || b.getLong(0) != lo || b.getLong(1) != hi ||
              n.exists(_ != b.getLong(2)))
            throw new IllegalStateException(
              s"micro-batch $batchId claims to be a replay of the " +
                s"already-folded batch $batchId at $stateDir, but its id " +
                s"bounds/count [${if (b.isNullAt(0)) "∅" else b.getLong(0)}" +
                s", ${if (b.isNullAt(1)) "∅" else b.getLong(1)}] × " +
                s"${b.getLong(2)} do not match the recorded fold's " +
                s"[$lo, $hi] × ${n.getOrElse(-1L)} — this checkpoint " +
                "does not belong to this state dir. Pair the checkpoint " +
                "and state dir for life; a new checkpoint needs a new " +
                "state dir")
        case _ => ()
      }
      log.info(s"batch $batchId already folded into $stateDir — " +
        "replay skipped (exactly-once)")
    } else {
      if (last.isEmpty && batchId > 0)
        // the mirror image of the mismatch above: an EXISTING checkpoint
        // pointed at a fresh state dir — this checkpoint's batches
        // 0..batchId-1 were committed somewhere that is not here. Not a
        // hard error only because an engine path that skips a no-data
        // batch 0 can legitimately deliver its first rows under a later
        // id; anything else is silent under-ingestion, so say it loudly
        log.warn(s"state $stateDir is at genesis but the stream's first " +
          s"delivered batch is $batchId — if this checkpoint previously " +
          "committed batches into a different state dir, those batches " +
          "are NOT in this corpus")
      // the media half rides the SAME fold (journal, commit marker,
      // batch tag): rows with a payload become the increment's media
      // table, keyed by the pipeline's own id column — media ids then
      // inherit the stream's strictly-increasing contract for free
      val media = mediaCols.map { case (typeCol, payloadCol) =>
        import org.apache.spark.sql.functions.{coalesce, col, lit}
        import s.implicits._
        delta.filter(col(payloadCol).isNotNull)
          .select(col(cfg.idCol).cast("long").as("doc_id"),
            coalesce(col(typeCol), lit("application/octet-stream"))
              .as("media_type"),
            col(payloadCol).as("payload"))
          .as[graft.multimodal.Multimodal.MediaRecord]
      }
      CorpusPipelineDelta.foldIncrement(delta, stateDir, cfg, storeCells,
        batchTag = Some(batchId), media = media,
        mediaMaxDist = mediaMaxDist)
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    triggerIntervalMs.filter(_ < elapsedMs).foreach { iv =>
      log.warn(s"fold of batch $batchId took $elapsedMs ms — longer " +
        s"than the $iv ms trigger interval; the backlog grows every " +
        "trigger. Raise the interval (folds are pipeline DAYS — trigger " +
        "in minutes-to-hours) or drain on a schedule with " +
        "Trigger.AvailableNow.")
    }
  }

  /** Start the exactly-once corpus-fold sink over `increments` (a
    * streaming frame with the pipeline's idCol/textCol/langCol/
    * sourceCol). The stream's checkpoint and the pipeline state are
    * separate dirs with separate roles: the checkpoint replays, the
    * journal recovers — see the class doc for why that pair is
    * exactly-once.
    *
    * `trigger` (optional) is applied to the stream; a
    * `Trigger.ProcessingTime` interval also arms [[foldBatch]]'s
    * cadence guard. For the scheduled-daily-drain shape prefer
    * {{{
    * StreamingCorpusPipeline.sink(increments, state, ckpt, cfg,
    *   trigger = Some(Trigger.AvailableNow()))
    * }}}
    * — process everything available, then stop, rerun on tomorrow's
    * schedule; the checkpoint + journal pair keeps the restarts
    * exactly-once. */
  def sink(increments: DataFrame, stateDir: String, checkpointDir: String,
      cfg: CorpusPipeline.Config, storeCells: Int = 64,
      trigger: Option[Trigger] = None,
      mediaCols: Option[(String, String)] = None,
      mediaMaxDist: Int = 10): StreamingQuery = {
    val intervalMs = trigger.collect {
      case t: org.apache.spark.sql.execution.streaming.ProcessingTimeTrigger =>
        t.intervalMs
    }
    val w = increments.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(
        foldBatch(stateDir, cfg, storeCells, intervalMs, mediaCols,
          mediaMaxDist) _)
    trigger.fold(w)(w.trigger).start()
  }
}
