package graft.operators

import java.io.IOException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Writer-mutual-exclusion lease for the persisted-artifact maintenance
  * surfaces ([[NearDupSignatureStore]], [[IvfIndex]]). Both stores'
  * `compact` commits through a rename-pair swap; an `append` racing a
  * `compact` can land its files in the directory the swap is about to
  * rename aside — the increment's rows silently vanish when the
  * `…__old` copy is deleted. The scaladocs said "the maintenance window
  * is the caller's"; this enforces it (VERDICT r9 task 3).
  *
  * Mechanics: one lease FILE beside the guarded directory
  * (`<dir>__lease` — beside, not inside: `compact` swaps the whole
  * directory, and a lease inside it would be renamed away mid-hold).
  * Acquisition is create-fails-if-exists (atomic on HDFS;
  * check-then-create on the local filesystem — the usual
  * metastore-less-table compromise); the file body names the holder and
  * the acquisition time, so a refused caller's error says WHO holds it.
  * A crash leaves the file behind — a lease older than `staleMs` is
  * presumed dead and broken by the next acquirer. A LIVE holder beats
  * every `staleMs / 3` from a daemon heartbeat thread (VERDICT r11
  * task 2), so staleness means DEAD, not SLOW: a fold/compact that
  * outruns `staleMs` keeps its exclusion — at 100 TB a genesis fold's
  * wall clock is unknowable in advance, and "size staleMs above your
  * longest job" was not an operable contract. `staleMs` now only
  * bounds how long a CRASHED holder blocks its successors.
  *
  * The beat is OBJECT-STORE-SAFE (VERDICT r12 task 1): each tick
  * re-CREATES a sidecar file (`<dir>__lease.beat`) naming the holder
  * with a monotone counter — file creation refreshes the mtime on
  * every filesystem, where the previous mtime-only `fs.setTimes`
  * touch is unsupported or a no-op on common object-store adapters
  * (a live holder was then observed stale at exactly the scale where
  * object stores are the norm). `setTimes` on the lease file itself
  * is still attempted as a best-effort secondary so mtime-only
  * observers stay accurate, but nothing depends on it. Staleness is
  * judged on the FRESHEST of the lease's mtime and its matching
  * beat's evidence, and the single-winner break re-checks the beat
  * after capturing the lease: a beat that changed (or appeared)
  * since the staleness observation means a live holder raced the
  * window — the break restores and refuses. The beat body names the
  * holder, so a beat landing beside a successor's lease is
  * detectable (holder mismatch) instead of silently masking the
  * successor's own death. Residual check-then-touch race (ADVICE r12):
  * between a tick's ownership read and its best-effort `setTimes`, a
  * rival can break and recreate the lease, and the stray touch then
  * refreshes the RIVAL's lease mtime once — at most one extension of
  * perceived liveness, bounded by `staleMs`. The beat sidecar is
  * immune (its body names the beating holder, so a stray beat reads
  * as a mismatch and is ignored), and the holder's next tick sees the
  * rival's lease and stops. Remaining operational caveat: on a store
  * that serves reads but fails CREATES for longer than `staleMs`,
  * liveness evidence stops flowing entirely (no beat, no mtime) and a
  * rival can break a live holder — the heartbeat WARNs when
  * consecutive beat writes span that window; on such a store size
  * `staleMs` above the longest plausible write outage.
  *
  * Readers (probe/query/stats) take no lease — the swap protocol
  * already makes a torn read loud (no live dir), never silent. */
object MaintenanceLease {

  /** Presumed-dead threshold. With the holder heartbeat this no longer
    * needs to exceed the longest job — it is purely the
    * crashed-holder-blocks-successors window (heartbeats keep a live
    * holder's mtime fresh indefinitely). 1 h is conservative; lower it
    * where faster takeover after a hard kill matters more than
    * tolerance for heartbeat hiccups. */
  val DefaultStaleMs: Long = 60L * 60 * 1000

  private def leasePath(dir: String): Path = new Path(s"${dir}__lease")

  /** Sidecar the heartbeat re-creates per tick; BESIDE the lease so a
    * break's rename of the lease never moves the beat with it. */
  private[operators] def beatPath(lease: Path): Path =
    new Path(s"$lease.beat")

  /** The holder token of a lease body (`"<holder> acquired_ms=…"`);
    * hand-written lease files (tests, operator tooling) carry no
    * timestamp and are their own holder token. */
  private def holderOf(leaseText: String): String = {
    val i = leaseText.indexOf(" acquired_ms=")
    if (i < 0) leaseText else leaseText.substring(0, i)
  }

  /** `body` could be a TORN read of `holder`'s beat: a strict prefix
    * cut inside (or at the end of) the holder token. On stores whose
    * create-overwrite is not atomic a reader can observe a
    * partially-written beat body; a torn body must count as
    * UNCONFIRMABLE evidence (refuse/retry), never as "names someone
    * else" — misreading it as foreign would let a rival break a live
    * holder whose beats are perfectly fresh (r13 seed, pinned in
    * MaintenanceLeaseSpec). A body truncated AFTER `"<holder> "`
    * already passes the normal startsWith match and is caught
    * byte-wise by the break's changed-body comparison. */
  private def tornPrefixOf(holder: String, body: String): Boolean =
    holder.nonEmpty && body.length <= holder.length + 1 &&
      (holder + " ").startsWith(body)

  /** The beat sidecar's (mtime, body) iff it exists, is readable AND
    * names `holder` — a residue beat from a different holder is not
    * liveness evidence for this lease. */
  private def readBeat(fs: org.apache.hadoop.fs.FileSystem, lease: Path,
      holder: String): Option[(Long, String)] = {
    val bp = beatPath(lease)
    try {
      // body BEFORE mtime (r13 review finding): a tick re-creating the
      // file between the two reads then yields the NEWER mtime — the
      // conservative (looks-fresher, refuse-the-break) direction. The
      // old order paired a pre-tick mtime with a post-tick body, and a
      // heartbeat resuming exactly in that gap could be broken over.
      // Anchored on the trailing space: a holder string that is a
      // strict PREFIX of another (nanotime suffixes vary in length)
      // must not claim its beats. The empty holder (unreadable lease)
      // matches any beat, and a TORN read of this holder's own beat —
      // a strict prefix of the token, or the EMPTY body a reader sees
      // between a non-atomic create-overwrite's create and its write —
      // also counts as evidence: refusing on unconfirmable evidence is
      // the safe direction (a fresh-but-torn beat must keep the lease
      // looking live, not stale).
      val body = readLeaseOpt(fs, bp)
        .filter(t => holder.isEmpty || t.startsWith(holder + " ") ||
          tornPrefixOf(holder, t) || t == "<empty lease file>")
      body.map((fs.getFileStatus(bp).getModificationTime, _))
    } catch { case _: IOException => None }
  }

  /** Per-JVM acquisition counter — the holder nonce's guaranteed-unique
    * component (see the note in [[defaultHolder]]). */
  private val acquisitionSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private def defaultHolder(op: String): String = {
    val host =
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "unknown-host" }
    // per-ACQUISITION nonce (ADVICE r11): op@host#pid alone repeats when
    // the same JVM re-acquires after outrunning staleMs — the overrun
    // job's own-lease release match (startsWith) would then hit the
    // SAME-OP successor's lease and evict it, the exact hazard the
    // own-lease rule exists to prevent
    // a process-local counter, not Thread.getId (deprecated-for-removal
    // on JDK 19+, its replacement threadId() absent on the JDK 17 this
    // builds against) and not identityHashCode (two threads CAN share an
    // identity hash — same-PID same-tick disambiguation would be
    // probabilistic; ADVICE r14): every acquisition in this JVM draws a
    // distinct sequence number, so uniqueness within a PID is
    // structural whatever the nanoTime tick
    s"$op@$host#pid${ProcessHandle.current.pid}" +
      s".a${acquisitionSeq.incrementAndGet()}" +
      s".n${java.lang.System.nanoTime}"
  }

  /** None on ANY read failure (missing file included) — callers must
    * distinguish "could not read" from "reads as someone else"
    * (ADVICE r12: the heartbeat treated the unreadable-sentinel as a
    * holder mismatch and permanently stopped on one transient read
    * hiccup, silently dropping the exclusion it existed to keep). */
  private def readLeaseOpt(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try {
        // loop until EOF (ADVICE r13): a single read() may legally
        // return short, and a body truncated mid-holder-token would
        // fail the startsWith(holder) matches — the heartbeat would
        // stop as 'force-broken' (exclusion silently lost) or release
        // would skip deleting its own lease
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(if (out.size == 0) "<empty lease file>"
             else new String(out.toByteArray, "UTF-8"))
      } finally in.close()
    } catch { case _: IOException => None }

  private def readLeaseText(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): String =
    readLeaseOpt(fs, p).getOrElse("<unreadable lease file>")

  /** Single-winner stale break (ADVICE r10): rename the lease ASIDE to a
    * breaker-unique tombstone, then verify by mtime that the file we
    * renamed is STILL the one observed stale — an unconditional
    * delete-then-create lets two rivals both break the same stale lease
    * (A deletes, A creates, B deletes A's FRESH lease, B creates; both
    * proceed — the exact hazard the lease exists to prevent, in its own
    * recovery path). Rename is atomic on HDFS, so of two rivals racing
    * the SAME stale file exactly one rename succeeds; and if the rename
    * instead captured a FRESH lease recreated in the window (mtime ≠
    * observed), it is renamed back and the break reports failure.
    * `observedBeat` is the beat sidecar's (mtime, body) as seen at the
    * staleness observation (None = absent/foreign): after capturing the
    * lease, the beat is RE-read, and any change — a new body (the
    * counter makes every tick distinct, covering coarse-mtime
    * filesystems) or a fresh appearance — proves a live heartbeat
    * raced the window, so the break restores and refuses. This is the
    * object-store analogue of the mtime-identity check, which a
    * `setTimes`-less holder can never refresh. Returns true iff the
    * stale lease is gone and the path is free to recreate. */
  private[operators] def breakIfStillStale(
      fs: org.apache.hadoop.fs.FileSystem, p: Path,
      observedMtime: Long,
      observedBeat: Option[(Long, String)] = None,
      staleMs: Long = DefaultStaleMs): Boolean = {
    val tomb = new Path(
      s"$p.broken.pid${ProcessHandle.current.pid}.${System.nanoTime}")
    val renamed = try fs.rename(p, tomb)
                  catch { case _: IOException => false }
    if (!renamed) {
      // source vanished: another breaker won, or the holder released.
      // Either way the path may now be free — let tryCreate decide.
      true
    } else {
      val leaseUnmoved =
        try fs.getFileStatus(tomb).getModificationTime == observedMtime
        catch { case _: IOException => false }
      // beat unmoved = absent now and at observation, or byte-identical
      // body (counter + ms make every real tick distinct). The re-read
      // is holder-matched against the CAPTURED lease, mirroring
      // readBeat (r13 review finding): a residue beat from a DIFFERENT
      // holder is not liveness evidence, and treating it as "appeared"
      // would refuse this break on every retry FOREVER — a residue
      // beat beside a stale lease would deadlock maintenance until a
      // manual break(). A beat/lease READ failure here is still
      // treated as changed (refuse): breaking on missing evidence
      // would re-admit the double-writer hazard.
      val tombHolder = readLeaseOpt(fs, tomb).map(holderOf)
      val beatNow =
        try {
          val bp = beatPath(p)
          if (!fs.exists(bp)) None
          else readLeaseOpt(fs, bp) match {
            case Some(t) =>
              val torn = t == "<empty lease file>" ||
                tombHolder.exists(h => tornPrefixOf(h, t))
              if (torn) {
                // a TORN read of the captured holder's own beat — a
                // prefix cut inside the token, or the empty body
                // between a non-atomic create and its write. A LIVE
                // heartbeat re-creates the beat every staleMs/3, so
                // the beat's OWN mtime splits the cases (r14 review):
                // fresh → a writer may be mid-write, unconfirmable,
                // refuse (treating it as foreign/absent would break a
                // live holder; r13 seed); already beyond staleMs → a
                // crash artifact that no live writer has touched —
                // pass the bytes through for the unchanged-evidence
                // comparison, else byte-identical hours-old residue
                // would deadlock maintenance behind a refuse-forever
                // sentinel with only the manual break() as escape.
                val bMtime =
                  try fs.getFileStatus(beatPath(p)).getModificationTime
                  catch { case _: IOException => Long.MaxValue }
                if (System.currentTimeMillis - bMtime > staleMs)
                  Some((0L, t))
                else Some((-1L, "<torn beat read>"))
              }
              else if (tombHolder.exists(h => !t.startsWith(h + " "))) None
              else Some((0L, t))
            case None => Some((-1L, "<unreadable beat file>"))
          }
        } catch { case _: IOException => Some((-1L, "<unreadable beat file>")) }
      val beatUnmoved = (observedBeat, beatNow) match {
        case (None, None) => true
        case (Some((_, was)), Some((_, is))) => was == is
        case _ => false
      }
      val sameFile = leaseUnmoved && beatUnmoved
      if (sameFile) {
        fs.delete(tomb, false)
        // holder-matched beat cleanup (ADVICE r13): delete the beat
        // only if it still names the BROKEN holder — a successor that
        // already recreated the lease at p in this window may have
        // written its own beat, and clobbering it (or its residue-clean
        // state) costs the successor a tick of liveness. A foreign
        // residue beat is left for the next acquisition's residue-clean
        // in tryCreate, which holder-matches against the NEW lease.
        try {
          if (readLeaseOpt(fs, beatPath(p)).exists(t =>
              tombHolder.exists(h =>
                t.startsWith(h + " ") || tornPrefixOf(h, t))))
            fs.delete(beatPath(p), false)
        } catch { case _: IOException => () }
        true
      } else {
        // we captured a lease RECREATED after our staleness check —
        // restore it and refuse. If the restore loses (a third writer
        // already recreated the path) the displaced lease is dropped:
        // its holder's release will then log the holder mismatch.
        if (!(try fs.rename(tomb, p) catch { case _: IOException => false }))
          fs.delete(tomb, false)
        false
      }
    }
  }

  /** Run `f` holding the lease on `dir`; released on every exit path (a
    * crashed PROCESS leaves a stale lease for mtime-breaking). Throws
    * `IllegalStateException` naming the current holder when the lease
    * is held and fresh. */
  def withLease[A](spark: SparkSession, dir: String, op: String,
      staleMs: Long = DefaultStaleMs)(f: => A): A = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = leasePath(dir)
    val holder = defaultHolder(op)

    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false)
        try out.write(
          s"$holder acquired_ms=${System.currentTimeMillis}".getBytes("UTF-8"))
        finally out.close()
        // clear a residue beat from a PREVIOUS holder (crash between a
        // release's lease-delete and beat-delete) so it can never read
        // as liveness evidence against a later stale lease
        try {
          if (readLeaseOpt(fs, beatPath(p))
              .exists(!_.startsWith(holder + " ")))
            fs.delete(beatPath(p), false)
        } catch { case _: IOException => () }
        true
      } catch { case _: IOException => false }

    if (!tryCreate()) {
      val observed =
        try Some(fs.getFileStatus(p).getModificationTime)
        catch { case _: IOException => None } // holder released mid-check
      // the lease's beat sidecar, matched to the lease's own holder —
      // on a setTimes-less filesystem the beat's mtime is the ONLY
      // freshness a live holder can produce. An unreadable lease body
      // matches ANY beat: refusing on unconfirmable evidence is the
      // safe direction (a wrong refusal retries later; a wrong break
      // admits a second writer).
      val obsBeat = readLeaseOpt(fs, p) match {
        case Some(txt) => readBeat(fs, p, holderOf(txt))
        case None => readBeat(fs, p, "")
      }
      val broken = observed match {
        case Some(mtime)
            if System.currentTimeMillis - math.max(mtime,
              obsBeat.map(_._1).getOrElse(Long.MinValue)) > staleMs =>
          breakIfStillStale(fs, p, mtime, obsBeat, staleMs)
        case Some(_) => false // fresh — refuse below
        case None => true     // released mid-check; retry create
      }
      // one retry covers both the stale break and a release race; a
      // second failure means a LIVE competing writer — refuse loudly
      if (!broken || !tryCreate())
        throw new IllegalStateException(
          s"maintenance lease on $dir is held by " +
            s"'${readLeaseText(fs, p)}' — concurrent append/compact " +
            s"refused; a lease untouched for ${staleMs} ms is presumed " +
            s"dead and will be broken")
    }
    // heartbeat (VERDICT r11 task 2, object-store-safe since r13):
    // every staleMs/3, while the lease still names THIS holder,
    // re-CREATE the beat sidecar (fresh mtime on every filesystem —
    // `setTimes` is unsupported/no-op on common object-store adapters)
    // naming the holder + a monotone counter, then best-effort touch
    // the lease's own mtime for mtime-only observers. The thread stops
    // itself only when the lease READS as someone else's (a
    // force-break): beating on would mask the successor's own death.
    // An UNREADABLE lease (transient store hiccup, or a breaker's
    // rename window) is NOT a mismatch — skip the tick and retry
    // (ADVICE r12: treating the unreadable sentinel as a mismatch
    // permanently dropped the heartbeat on one read hiccup).
    val beat = new Thread(() => {
      try {
        var mine = true
        var ticks = 0L
        var failedBeats = 0  // consecutive beat-WRITE failures
        var missedReads = 0  // consecutive unreadable/missing lease reads
        while (mine) {
          Thread.sleep(math.max(staleMs / 3, 10))
          readLeaseOpt(fs, p) match {
            case Some(txt) if txt.startsWith(holder + " ") =>
              missedReads = 0
              ticks += 1
              try {
                val out = fs.create(beatPath(p), true)
                try out.write(
                  s"$holder beat=$ticks ms=${System.currentTimeMillis}"
                    .getBytes("UTF-8"))
                finally out.close()
                failedBeats = 0
              } catch {
                case _: IOException => // transient; retry next tick —
                  // but once the failures span staleMs, liveness
                  // evidence has stopped flowing and a rival CAN now
                  // observe this live holder stale: say so (r13 review)
                  failedBeats += 1
                  if (failedBeats == 3 || failedBeats % 30 == 0)
                    org.slf4j.LoggerFactory.getLogger(getClass).warn(
                      s"lease heartbeat on $dir: $failedBeats consecutive " +
                        "beat writes failed — if the lease mtime is also " +
                        "not refreshing (object store), this live job can " +
                        "be observed stale and lose its exclusion once " +
                        s"the outage exceeds ${staleMs} ms")
              }
              try fs.setTimes(p, System.currentTimeMillis, -1)
              catch {
                case _: IOException => ()
                case _: UnsupportedOperationException => ()
              }
            case Some(_) =>
              mine = false
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"lease on $dir no longer names '$holder' — heartbeat " +
                  "stopped (force-broken? exclusion is lost)")
            case None =>
              // can't read — no evidence either way; retry. But a
              // PERMANENTLY missing lease (a manual break() against a
              // live holder, with no successor yet) was previously
              // indistinguishable from a transient hiccup FOREVER: no
              // beats, no warning, the holder silently running
              // unexcluded until a rival acquired. Mirror the
              // failedBeats pattern and say so (ADVICE r13).
              missedReads += 1
              if (missedReads == 3 || missedReads % 30 == 0)
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"lease on $dir unreadable or MISSING for $missedReads " +
                    "consecutive heartbeat ticks — if an operator " +
                    "force-broke it, this job is running unexcluded; no " +
                    "liveness evidence is being refreshed meanwhile")
          }
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-lease-heartbeat-$op")
    beat.setDaemon(true)
    beat.start()
    try f
    finally {
      // stop the heartbeat BEFORE releasing: a beat landing after the
      // delete could touch a successor's freshly created lease
      beat.interrupt()
      try beat.join(2000) catch { case _: InterruptedException => () }
      // release only OUR OWN lease (ADVICE r10): a job that outran
      // staleMs has had its lease broken and replaced — deleting
      // whatever sits at the path would evict the NEW holder and admit
      // a third concurrent writer.
      val text = readLeaseText(fs, p)
      if (text.startsWith(holder + " ")) {
        fs.delete(p, false)
        try fs.delete(beatPath(p), false) catch { case _: IOException => () }
      }
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"lease on $dir no longer held by '$holder' at release " +
          s"(current: '$text') — this job outran staleMs and lost its " +
          "exclusion; leaving the current holder's lease in place")
    }
  }

  /** Operator override: force-release the lease on `dir` regardless of
    * age — for the KNOWN-dead-holder case (a crashed compact otherwise
    * blocks maintenance until the stale threshold passes). Returns the
    * holder text that was evicted, if any. Never call it against a
    * holder that might still be alive: the next writer would race it. */
  def break(spark: SparkSession, dir: String): Option[String] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = leasePath(dir)
    readLeaseOpt(fs, p).flatMap { text => // EOF-looped read (ADVICE r13)
      try {
        fs.delete(p, false)
        try fs.delete(beatPath(p), false) catch { case _: IOException => () }
        Some(text)
      } catch { case _: IOException => None }
    }
  }
}
