package graft.operators

import java.util.concurrent.{SynchronousQueue, TimeUnit}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

object NorenameHook {
  /** Fires after every FILE copied by [[NoRenameFileSystem.rename]] —
    * the seam that lets a spec hold a rename MID-copy (a sleep cannot
    * pin that interleave; the Compaction.pauseHook rule). */
  @volatile var afterFileCopy: Option[Path => Unit] = None
}

/** Local filesystem under the OBJECT-STORE rename contract (SURVEY §4.3
  * row 6): `rename` is copy-every-file-then-delete — non-atomic, with
  * the destination tree VISIBLE mid-copy and the source tree deleted
  * only at the end. This is what S3A/GCS-style connectors actually do;
  * the wrapper follows the notimes://`/`flaky:// pattern (one degraded
  * contract per scheme, everything else RawLocal). */
class NoRenameFileSystem extends graft.filemover.FakeHdfsFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("norename://nn")
  override def getScheme: String = "norename"
  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) false
    else {
      val st = getFileStatus(src)
      if (st.isFile) {
        org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst, false,
          getConf)
        NorenameHook.afterFileCopy.foreach(_(dst))
        delete(src, false)
        true
      } else {
        mkdirs(dst)
        listStatus(src).foreach(c =>
          rename(c.getPath, new Path(dst, c.getPath.getName)))
        delete(src, true)
        true
      }
    }
  }
}

/** Object-store-safe swap protocol (VERDICT r13 task 1).
  *
  * Round 13 proved the rename-pair swap loud-or-correct under racing
  * readers — on a filesystem where rename is ATOMIC. On object stores
  * rename = copy+delete, and the first test below demonstrates the
  * exact forbidden outcome on such a filesystem: a reader listing a
  * directory mid-rename reads a PARTIAL tree silently (correct rows,
  * wrong row count, no error). [[Compaction.swapDir]] therefore
  * dispatches on [[Compaction.renameIsAtomic]]: rename-pair on
  * HDFS/local (unchanged fast path, all r13 specs still pin it),
  * POINTER INDIRECTION on copy-rename filesystems — the new tree lands
  * under a generation-unique sibling name and the commit is a
  * create-overwrite of one small pointer file, with readers resolving
  * through [[Compaction.resolveLive]] and the immediately-previous
  * generation kept as grace until the next swap. The racing tests here
  * re-run the r13 SwapRacingReaderSpec shapes on the copy-rename
  * filesystem and require every mid-maintenance probe to SUCCEED with
  * the correct rows — pointer mode has no no-live-dir window at all. */
class PointerSwapSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.hadoopConfiguration
      .set("fs.norename.impl", classOf[NoRenameFileSystem].getName)
    // the dispatch override: the wrapper's scheme is not in the
    // known-object-store list, so the spec declares its rename
    // non-atomic the way a deployment would for a custom store
    s.sparkContext.hadoopConfiguration
      .set("graft.swap.atomic-rename.norename", "false")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def fs =
    new Path("norename://nn/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def nr(prefix: String): String = s"norename://nn${tmp(prefix)}"

  private def sortedRows(d: DataFrame): Seq[String] =
    d.collect().map(_.mkString("|")).toSeq.sorted

  test("THE HAZARD, demonstrated: on a copy-rename filesystem a reader " +
      "listing mid-rename reads a PARTIAL tree with no error — the " +
      "silent torn read the rename-pair swap cannot prevent there") {
    val root = nr("norename_hazard")
    val src = s"$root/src"
    val dst = s"$root/dst"
    spark.range(400).selectExpr("id").repartition(4).write.parquet(src)
    assert(spark.read.parquet(src).count() == 400)
    val atCopy = new SynchronousQueue[String]()
    val resume = new SynchronousQueue[java.lang.Boolean]()
    @volatile var renameErr: Throwable = null
    var copied = 0
    NorenameHook.afterFileCopy = Some { p =>
      if (p.getName.startsWith("part-")) {
        copied += 1
        if (copied == 2) { atCopy.put(p.toString); resume.take(); () }
      }
    }
    try {
      val t = new Thread(() =>
        try fs.rename(new Path(src), new Path(dst))
        catch { case e: Throwable => renameErr = e })
      t.setDaemon(true)
      t.start()
      assert(atCopy.poll(60, TimeUnit.SECONDS) != null,
        "rename never reached the second file copy")
      // rename is paused with exactly 2 of 4 part files at dst: a
      // reader sees a directory that parses fine and answers WRONG
      val partial = spark.read.parquet(dst).count()
      assert(partial > 0 && partial < 400,
        s"expected a silent partial read mid-copy, got $partial of 400")
      resume.put(java.lang.Boolean.TRUE)
      t.join(60000)
      assert(!t.isAlive && renameErr == null, s"rename failed: $renameErr")
      assert(spark.read.parquet(dst).count() == 400)
    } finally NorenameHook.afterFileCopy = None
  }

  test("pointer swap protocol: gen-unique staging, one-file commit, " +
      "grace-kept predecessor, legacy tree collected on the SECOND " +
      "swap, fixed-name staging still accepted") {
    val dir = s"${nr("norename_ptr")}/table"
    def write(ids: Range, to: String): Unit = {
      import spark.implicits._
      ids.map(_.toLong).toDF("id").coalesce(1)
        .write.mode("overwrite").parquet(to)
    }
    def readIds(): Seq[Long] =
      spark.read.parquet(Compaction.resolveLive(fs, dir))
        .collect().map(_.getLong(0)).toSeq.sorted
    // v1 lives in place (the pre-pointer layout every store starts in)
    write(0 until 10, dir)
    assert(Compaction.resolveLive(fs, dir) == dir) // no pointer yet
    // dispatch rule: staging is generation-unique here, __compacting on
    // a rename-capable filesystem
    val stage1 = Compaction.stagingDir(fs, dir)
    assert(stage1.startsWith(s"${dir}__gen-"), stage1)
    val localFs = new Path("/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(Compaction.stagingDir(localFs, "/t/x") == "/t/x__compacting")
    // swap 1: pointer commits, v2 live, v1 in-place tree kept as grace
    write(100 until 110, stage1)
    Compaction.swapDir(spark, dir, stage1)
    assert(fs.exists(new Path(s"${dir}__ptr")), "pointer file not created")
    assert(Compaction.resolveLive(fs, dir) != dir)
    assert(readIds() == (100L until 110L))
    assert(fs.exists(new Path(dir)),
      "immediate predecessor (the legacy in-place tree) must be " +
        "grace-kept until the NEXT swap")
    // swap 2: v3 live, v1's in-place tree collected, gen1 grace-kept
    val stage2 = Compaction.stagingDir(fs, dir)
    write(200 until 210, stage2)
    Compaction.swapDir(spark, dir, stage2)
    assert(readIds() == (200L until 210L))
    assert(!fs.exists(new Path(dir)),
      "pre-pointer in-place tree not collected on the second swap")
    assert(fs.exists(new Path(stage1)), "immediate predecessor gen dropped")
    // swap 3 via a FIXED staging name (__next — the pipeline's staged
    // commit protocol): accepted, re-staged under a gen name
    val next = s"${dir}__next"
    write(300 until 310, next)
    Compaction.swapDir(spark, dir, next)
    assert(readIds() == (300L until 310L))
    assert(!fs.exists(new Path(next)), "fixed-name staging left behind")
    assert(!fs.exists(new Path(stage1)),
      "two-generations-old tree not collected")
    assert(fs.exists(new Path(stage2)), "immediate predecessor gen dropped")
    // recoverSwap on a pointer-mode dir: verifies and changes nothing
    Compaction.recoverSwap(spark, dir)
    assert(readIds() == (300L until 310L))
    // liveExists sees through the pointer (the in-place path is gone)
    assert(Compaction.liveExists(fs, dir))
  }

  test("a crash-orphaned generation (staged but never committed) is " +
      "collected by the next successful swap; a pointer naming a " +
      "MISSING generation fails LOUDLY at resolve") {
    val dir = s"${nr("norename_orphan")}/table"
    import spark.implicits._
    def write(ids: Range, to: String): Unit =
      ids.map(_.toLong).toDF("id").coalesce(1)
        .write.mode("overwrite").parquet(to)
    write(0 until 5, dir)
    // a compact wrote its staging tree and died before the flip
    val orphan = Compaction.stagingDir(fs, dir)
    write(50 until 55, orphan)
    // readers are unaffected (no pointer committed)
    Compaction.recoverSwap(spark, dir)
    assert(Compaction.resolveLive(fs, dir) == dir)
    // the next successful swap collects the orphan
    val stage = Compaction.stagingDir(fs, dir)
    write(100 until 105, stage)
    Compaction.swapDir(spark, dir, stage)
    assert(!fs.exists(new Path(orphan)), "orphan generation not collected")
    assert(spark.read.parquet(Compaction.resolveLive(fs, dir))
      .collect().map(_.getLong(0)).toSeq.sorted == (100L until 105L))
    // corruption is loud: a pointer whose generation was hand-deleted
    fs.delete(new Path(Compaction.resolveLive(fs, dir)), true)
    val e = intercept[IllegalArgumentException] {
      Compaction.resolveLive(fs, dir)
    }
    assert(e.getMessage.contains("missing generation"), e.getMessage)
  }

  test("a fixed-name staging (__next) survives a crash BEFORE the " +
      "pointer commit: pointer mode COPIES it instead of consuming it, " +
      "so the caller's '__next missing = already completed' retry " +
      "protocol stays sound and the retry finishes the swap (r14 " +
      "review: a pre-commit rename of __next silently lost a committed " +
      "increment — the restart reported done while the pointer still " +
      "served the old tree)") {
    import spark.implicits._
    val dir = s"${nr("norename_nextcrash")}/table"
    def write(ids: Range, to: String): Unit =
      ids.map(_.toLong).toDF("id").coalesce(1)
        .write.mode("overwrite").parquet(to)
    def readIds(): Seq[Long] =
      spark.read.parquet(Compaction.resolveLive(fs, dir))
        .collect().map(_.getLong(0)).toSeq.sorted
    write(0 until 5, dir)
    val next = s"${dir}__next"
    write(100 until 105, next)
    Compaction.pauseHook = Some { p =>
      if (p == "swap-mid") throw new RuntimeException("injected crash")
    }
    try intercept[RuntimeException](Compaction.swapDir(spark, dir, next))
    finally Compaction.pauseHook = None
    assert(fs.exists(new Path(next)),
      "staging was consumed before the pointer commit — a crash here " +
        "reads as 'swap already completed' and loses the increment")
    assert(readIds() == (0L until 5L), "pointer flipped before the commit")
    // the retry completes the swap, retires the staging, and collects
    // the crashed attempt's orphan generation
    Compaction.swapDir(spark, dir, next)
    assert(readIds() == (100L until 105L))
    assert(!fs.exists(new Path(next)), "staging not retired post-commit")
    val gens = fs.listStatus(new Path(dir).getParent)
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("table__gen-"))
    assert(gens.length == 1,
      s"crashed attempt's orphan gen not collected: ${gens.length}")
  }

  private def docs(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map(i =>
      (i, Seq("a", "b", s"t${i % 5}", s"u${i % 3}"))).toDF("doc_id", "toks")
  }

  /** The SwapRacingReaderSpec harness, with the pointer-mode contract:
    * every probe at every window must SUCCEED with the correct rows —
    * pointer indirection has no no-live-dir window, so (unlike rename
    * mode, where `swap-mid` is allowed to fail loudly) success is
    * required everywhere. */
  private def racePointerProbes(fires: Int, expected: Seq[String])(
      maintenance: => Unit)(probe: () => Seq[String]): Unit = {
    val atPause = new SynchronousQueue[String]()
    val resume = new SynchronousQueue[java.lang.Boolean]()
    Compaction.pauseHook = Some { p => atPause.put(p); resume.take(); () }
    @volatile var maintErr: Throwable = null
    val t = new Thread(() =>
      try maintenance catch { case e: Throwable => maintErr = e })
    t.setDaemon(true)
    t.start()
    try {
      for (i <- 1 to fires) {
        val point = atPause.poll(120, TimeUnit.SECONDS)
        assert(point != null, s"maintenance never reached pause $i of $fires")
        val rows = probe()
        assert(rows == expected,
          s"probe during pointer-swap window '$point' (fire $i) " +
            s"returned ${rows.size} rows vs expected ${expected.size} — " +
            "pointer mode must serve a complete tree in EVERY window")
        resume.put(java.lang.Boolean.TRUE)
      }
      t.join(180000)
      assert(!t.isAlive, "maintenance did not finish after the last window")
      assert(maintErr == null, s"maintenance failed: $maintErr")
    } finally Compaction.pauseHook = None
  }

  test("signature-store probe racing compact ON THE COPY-RENAME " +
      "FILESYSTEM: every probe through all four swap windows succeeds " +
      "with the correct rows (pointer mode), and the store is correct " +
      "and pointer-resolved after") {
    val dir = s"${nr("norename_store")}/store"
    NearDupSignatureStore.build(docs(60), dir, threshold = 0.5, cells = 4)
    NearDupSignatureStore.append(spark, dir, docs(60)
      .selectExpr("doc_id + 100 as doc_id", "toks"))
    val delta = docs(6).selectExpr("doc_id + 1000 as doc_id", "toks")
    val expected = sortedRows(NearDupSignatureStore.probe(spark, dir, delta))
    assert(expected.nonEmpty, "fixture: probe must actually find pairs")
    racePointerProbes(4, expected) {
      NearDupSignatureStore.compact(spark, dir, targetBytes = 1L << 30)
    } { () => sortedRows(NearDupSignatureStore.probe(spark, dir, delta)) }
    assert(sortedRows(NearDupSignatureStore.probe(spark, dir, delta))
      == expected, "probe diverged after the compaction")
    assert(fs.exists(new Path(s"$dir/sigs__ptr")) &&
      fs.exists(new Path(s"$dir/toksets__ptr")),
      "compact on the copy-rename filesystem did not commit via pointers")
    // appends keep landing in the RESOLVED generation after the swap
    NearDupSignatureStore.append(spark, dir,
      docs(4).selectExpr("doc_id + 2000 as doc_id", "toks"))
    val st = NearDupSignatureStore.stats(spark, dir)
    assert(st.toksetRows == 124, s"post-compact append lost rows: $st")
  }

  test("IVF query racing compact ON THE COPY-RENAME FILESYSTEM: both " +
      "assignment-swap windows succeed with the correct rows, index " +
      "correct after") {
    import spark.implicits._
    val dir = s"${nr("norename_ivf")}/ivf"
    val emb = (0L until 60L).map(i =>
      (i, Seq.tabulate(4)(d => ((i + d) % 7).toDouble + 0.5)))
      .toDF("vec_id", "v")
    IvfIndex.build(emb, dir, c = 4)
    IvfIndex.append(spark, dir, emb
      .selectExpr("vec_id + 100 as vec_id", "v"))
    val queries = (0L until 3L).map(i =>
      (i, Seq.tabulate(4)(d => ((i + d) % 7).toDouble + 0.4)))
      .toDF("query_id", "qv")
    val expected = sortedRows(IvfIndex.query(spark, dir, queries, k = 5))
    assert(expected.nonEmpty)
    racePointerProbes(2, expected) {
      IvfIndex.compact(spark, dir, targetBytes = 1L << 30)
    } { () => sortedRows(IvfIndex.query(spark, dir, queries, k = 5)) }
    assert(sortedRows(IvfIndex.query(spark, dir, queries, k = 5)) == expected,
      "query diverged after the compaction")
    assert(fs.exists(new Path(s"$dir/assignments__ptr")),
      "compact on the copy-rename filesystem did not commit via a pointer")
  }

  test("Hamming-store probe racing compact ON THE COPY-RENAME " +
      "FILESYSTEM: both band-swap windows succeed with the correct " +
      "pairs, store correct and pointer-resolved after") {
    import spark.implicits._
    val dir = s"${nr("norename_ham")}/hamstore"
    // clustered 64-bit fingerprints (the family-10 construction): runs
    // of 3 ids share a base with ≤1 bit flipped, so true pairs exist
    def fps(n: Int, idOffset: Long): DataFrame =
      (0 until n).map { i =>
        val id = i + idOffset
        val base = (7L ^ ((i / 3) * 0x9E3779B97F4A7C15L)) * 0xC2B2AE3D27D4EB4FL
        val rng = new scala.util.Random(7L ^ id)
        (id, if (rng.nextBoolean()) base ^ (1L << rng.nextInt(64)) else base)
      }.toDF("img_id", "fp")
    HammingStore.build(fps(60, 0), dir, "img_id", "fp", maxDist = 3,
      bits = 64, cells = 4)
    HammingStore.append(spark, dir, fps(30, 1000))
    val delta = fps(9, 100000)
    val expected = sortedRows(HammingStore.probe(spark, dir, delta))
    assert(expected.nonEmpty, "fixture: probe must actually find pairs")
    racePointerProbes(2, expected) {
      HammingStore.compact(spark, dir, targetBytes = 1L << 30)
    } { () => sortedRows(HammingStore.probe(spark, dir, delta)) }
    assert(sortedRows(HammingStore.probe(spark, dir, delta)) == expected,
      "probe diverged after the compaction")
    assert(fs.exists(new Path(s"$dir/bands__ptr")),
      "compact on the copy-rename filesystem did not commit via a pointer")
    // appends keep landing in the RESOLVED generation after the swap
    HammingStore.append(spark, dir, fps(6, 200000))
    val st = HammingStore.stats(spark, dir)
    assert(st.bandRows == (60 + 30 + 6) * 5L,
      s"post-compact append lost rows: $st")
  }

  test("the INCREMENTAL PIPELINE end-to-end on the copy-rename " +
      "filesystem: a 2-increment fold chain (with a mid-chain " +
      "compactState) equals the same chain on the local filesystem") {
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
    def chain(state: String): Seq[String] = {
      CorpusPipelineDelta.foldIncrement(docsDf(1 to 8), state, cfg)
      CorpusPipelineDelta.compactState(spark, state)
      CorpusPipelineDelta.foldIncrement(docsDf(11 to 16), state, cfg)
      sortedRows(CorpusPipelineDelta.refreshOutput(spark, state, cfg))
    }
    val onObjectStore = chain(s"${nr("norename_fold")}/state")
    val onLocal = chain(tmp("local_fold") + "/state")
    assert(onObjectStore.nonEmpty)
    assert(onObjectStore == onLocal,
      "fold chain diverged between the copy-rename and local filesystems")
  }
}
