package graft.filemover

import java.nio.file.{Files, Path => JPath, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

case class ExampleData(category: String, id: Int, value: String)

/** RawLocalFileSystem under an HDFS-like URI (scheme + authority):
  * stands in for the reference's MiniDFSCluster fixture (T:18-31),
  * whose jars are unavailable offline. Statuses are copied with eager
  * permissions because RawLocalFileSystem's lazy permission loader does
  * `new File(uri)`, which rejects any scheme but `file`. */
class FakeHdfsFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.{FileStatus, Path}
  import org.apache.hadoop.fs.permission.FsPermission

  override def getUri: java.net.URI = java.net.URI.create("fakehdfs://nn")
  override def getScheme: String = "fakehdfs"

  private def sanitize(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      FsPermission.getFileDefault, "graft", "graft", st.getPath)

  override def getFileStatus(f: Path): FileStatus =
    sanitize(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(sanitize)
}

/** Parity suite: the 8 observable behaviors of the reference
  * (MoveFilesOutputCommiterTest.scala:60-154), ported onto our
  * FileCommitProtocol-based mover over the local filesystem. */
class MoveFilesParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    MoveFilesCommitProtocol.register(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val baseData = Seq(
    ExampleData("data", 1, "foo"), ExampleData("data", 1, "fooagain"),
    ExampleData("data", 2, "bar"), ExampleData("info", 3, "baz"))

  private def tmpDir(): String =
    Files.createTempDirectory("mover").toFile.getAbsolutePath

  // markSuccess=false mirrors the reference write() helper, which pins
  // mapreduce.fileoutputcommitter.marksuccessfuljobs=false on every
  // write (T:54); default true also exercises our FM3 _SUCCESS filter.
  private def write(out: String, template: Option[String],
      partitionBy: Seq[String] = Nil, repartition: Int = 1,
      data: Seq[ExampleData] = baseData, markSuccess: Boolean = true): Unit = {
    import spark.implicits._
    var w = data.toDF().repartition(repartition).write.mode(SaveMode.Overwrite)
    template.foreach(t => w = w.option(MoveFilesCommitProtocol.MOVE_FILES_OPTION, t))
    if (!markSuccess)
      w = w.option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.csv(out)
  }

  private def listAll(dir: String): Seq[JPath] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Nil
    else Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_)).toSeq
  }

  // T:60-66 — multiple files mapping to one target → no move
  test("multiple output files trip the collision gate: nothing moves") {
    val out = tmpDir()
    write(s"$out/o", Some("$outputDirectory/single.csv"), repartition = 5)
    assert(!Files.exists(Paths.get(s"$out/o/single.csv")))
    assert(listAll(s"$out/o").exists(_.getFileName.toString.startsWith("part-")))
  }

  // T:68-74 — default template = "$outputDirectory" → all files map to
  // the output dir itself → collision → untouched layout
  test("template '$outputDirectory' with several files leaves layout untouched") {
    val out = tmpDir()
    write(s"$out/o", Some("$outputDirectory"), repartition = 3)
    assert(Files.isDirectory(Paths.get(s"$out/o")))
    assert(listAll(s"$out/o").exists(_.getFileName.toString.startsWith("part-")))
  }

  // T:75-82 — single file moved to <output>.csv
  test("single file is moved to the rendered target") {
    val out = tmpDir()
    write(s"$out/o", Some("$outputDirectory.csv"), repartition = 1)
    assert(Files.isRegularFile(Paths.get(s"$out/o.csv")))
  }

  // T:84-95 — partitioned write, per-partition naming, '_' not a var char
  test("partitioned move interpolates partition values per file") {
    val out = tmpDir()
    import spark.implicits._
    baseData.toDF().repartition($"category")
      .write.mode(SaveMode.Overwrite)
      .option(MoveFilesCommitProtocol.MOVE_FILES_OPTION,
        "$outputDirectory/cat_$category.csv")
      .partitionBy("category")
      .csv(s"$out/o")
    assert(Files.isRegularFile(Paths.get(s"$out/o/cat_data.csv")))
    assert(Files.isRegularFile(Paths.get(s"$out/o/cat_info.csv")))
  }

  // SURVEY §4.3 bypass row: dynamic partition overwrite must leave the
  // template unapplied (write succeeds, layout intact) — and a RE-write
  // must also succeed, which is why the bypass is explicit: moving under
  // dynamic mode would leave renders at the output root that crash the
  // next write's partition-value extraction after its data commit.
  test("dynamic partition overwrite bypasses the mover: no move, " +
      "layout intact, re-write succeeds") {
    val out = tmpDir()
    import spark.implicits._
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      def dynWrite(data: Seq[ExampleData]): Unit =
        data.toDF().repartition(1)
          .write.mode(SaveMode.Overwrite)
          .option(MoveFilesCommitProtocol.MOVE_FILES_OPTION,
            "$outputDirectory/cat_$category.csv")
          .partitionBy("category")
          .csv(s"$out/o")
      dynWrite(baseData)
      // no rendered targets; the hive-style partition layout survives
      assert(!Files.exists(Paths.get(s"$out/o/cat_data.csv")))
      assert(!Files.exists(Paths.get(s"$out/o/cat_info.csv")))
      assert(listAll(s"$out/o").exists(p =>
        p.toString.contains("category=data") &&
          p.getFileName.toString.startsWith("part-")))
      // second dynamic write over one partition: must not abort
      dynWrite(Seq(ExampleData("data", 9, "rewrite")))
      assert(listAll(s"$out/o").exists(_.toString.contains("category=info")))
      assert(!Files.exists(Paths.get(s"$out/o/cat_data.csv")))
      // and the same session moves again once back in static mode
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      dynWrite(baseData)
      assert(Files.isRegularFile(Paths.get(s"$out/o/cat_data.csv")))
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    }
  }

  // The LEGACY committer hook must also decline under dynamic mode: its
  // Hadoop-level commitJob runs BEFORE the protocol's staging moves, so
  // the listing contains .spark-staging files — renaming them out of
  // staging would strand the protocol's own rename step (lost data).
  // The shim detects staging in the listing (it has no protocol flag).
  test("legacy committer shim under dynamic overwrite: no move, write " +
      "succeeds, layout intact") {
    val out = tmpDir()
    import spark.implicits._
    // deregister the modern protocol; register the legacy shim instead
    spark.conf.unset(MoveFilesCommitProtocol.COMMIT_PROTOCOL_CLASS)
    spark.conf.set("spark.sql.sources.outputCommitterClass",
      classOf[MoveFilesOutputCommitterCompat].getName)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      baseData.toDF().repartition(1)
        .write.mode(SaveMode.Overwrite)
        .option(MoveFilesCommitProtocol.MOVE_FILES_OPTION,
          "$outputDirectory/cat_$category.csv")
        .partitionBy("category")
        .csv(s"$out/o")
      assert(!Files.exists(Paths.get(s"$out/o/cat_data.csv")),
        "shim moved files out of dynamic staging")
      assert(listAll(s"$out/o").exists(p =>
        p.toString.contains("category=data") &&
          p.getFileName.toString.startsWith("part-")),
        "dynamic layout corrupted")
      // back in static mode the shim still moves (its normal contract)
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      baseData.toDF().repartition(1)
        .write.mode(SaveMode.Overwrite)
        .option(MoveFilesCommitProtocol.MOVE_FILES_OPTION,
          "$outputDirectory/cat_$category.csv")
        .partitionBy("category")
        .csv(s"$out/o2")
      assert(Files.isRegularFile(Paths.get(s"$out/o2/cat_data.csv")))
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      spark.conf.unset("spark.sql.sources.outputCommitterClass")
      MoveFilesCommitProtocol.register(spark)
    }
  }

  // Deviation (documented at the mkdirs call): a multi-segment template
  // that introduces a NEW directory level works — the reference's
  // unchecked renames silently left such files unmoved (missing parent
  // ⇒ rename false ⇒ ignored, M:52); we create the parent instead.
  test("template introducing a new directory level creates it and moves") {
    val out = tmpDir()
    write(s"$out/o", Some("$outputDirectory/$category/data.csv"),
      partitionBy = Seq("category"))
    assert(Files.isRegularFile(Paths.get(s"$out/o/data/data.csv")))
    assert(Files.isRegularFile(Paths.get(s"$out/o/info/data.csv")))
  }

  // Reference split parity (M:25 uses default split, which drops
  // TRAILING empty segments): a trailing-slash template behaves exactly
  // like the same template without the slash, rather than rendering an
  // empty segment that Path construction rejects post-commit.
  test("trailing-slash template == template without the slash (M:25 " +
      "split parity)") {
    val out = tmpDir()
    write(s"$out/o", Some("$outputDirectory/"), repartition = 3)
    assert(Files.isDirectory(Paths.get(s"$out/o")))
    assert(listAll(s"$out/o").exists(_.getFileName.toString.startsWith("part-")))
  }

  // fix for a checked-rename regression: with template
  // "$outputDirectory" and ONE output file the target renders to the
  // output directory itself; the reference's unchecked fs.rename
  // silently returned false (file stays) — our checked renames must
  // SKIP the no-op instead of failing the job
  test("template '$outputDirectory' with a single file is a tolerated no-op") {
    val out = tmpDir()
    write(s"$out/o", Some("$outputDirectory"), repartition = 1)
    assert(Files.isDirectory(Paths.get(s"$out/o")))
    assert(listAll(s"$out/o").exists(_.getFileName.toString.startsWith("part-")))
  }

  // T:84-95 — two variables in one template segment: `$category_id_$id`
  // parses as var `category`, literal `_id_`, var `id` (variable names
  // are alphanumeric only). End-to-end over partitionBy("category","id").
  test("two-variable template segment interpolates both variables (T:89)") {
    val out = tmpDir()
    write(s"$out/o", Some("$outputDirectory/cat_$category_id_$id.csv"),
      partitionBy = Seq("category", "id"), repartition = 1,
      markSuccess = false)
    for ((cat, id) <- Seq(("data", 1), ("data", 2), ("info", 3)))
      assert(Files.isRegularFile(Paths.get(s"$out/o/cat_${cat}_id_$id.csv")),
        s"missing cat_${cat}_id_$id.csv")
  }

  // T:54 — the reference suppresses the _SUCCESS marker on every write;
  // the move must work identically with no marker present
  test("marksuccessfuljobs=false: no _SUCCESS marker, move still happens") {
    val out = tmpDir()
    write(s"$out/o", Some("$outputDirectory/no_marker.csv"),
      repartition = 1, markSuccess = false)
    assert(Files.isRegularFile(Paths.get(s"$out/o/no_marker.csv")))
    assert(!listAll(s"$out/o").exists(_.getFileName.toString == "_SUCCESS"))
  }

  // T:18-31 — the reference runs on a real MiniDFSCluster. Its jars are
  // unavailable offline, so the closest semantic probe is a local FS
  // exposed under a non-file scheme WITH an authority: exercises
  // fs.resolvePath/makeQualified behavior across URI schemes (the FM6
  // fold root and all plan targets render as fakehdfs://nn/... paths).
  test("move works end-to-end through a non-file URI scheme (HDFS-like)") {
    val out = tmpDir()
    spark.sparkContext.hadoopConfiguration
      .set("fs.fakehdfs.impl", classOf[FakeHdfsFileSystem].getName)
    write(s"fakehdfs://nn$out/o", Some("$outputDirectory/hdfs_like.csv"),
      repartition = 1)
    assert(Files.isRegularFile(Paths.get(s"$out/o/hdfs_like.csv")))
  }

  // T:96-104 — fixed target name, no partition columns
  test("fixed file name without partitions") {
    val out = tmpDir()
    write(s"$out/o", Some("$outputDirectory/fixed_name.csv"), repartition = 1)
    assert(Files.isRegularFile(Paths.get(s"$out/o/fixed_name.csv")))
  }

  // T:106-124 — partition values with space / underscore / dash
  test("special characters in partition values survive into file names") {
    val out = tmpDir()
    import spark.implicits._
    val data = Seq(ExampleData("data with space", 1, "foo"),
      ExampleData("data_with_underscore", 2, "bar"),
      ExampleData("data-with-dash", 3, "baz"))
    data.toDF().repartition($"category")
      .write.mode(SaveMode.Overwrite)
      .option(MoveFilesCommitProtocol.MOVE_FILES_OPTION,
        "$outputDirectory/cat_$category.csv")
      .partitionBy("category")
      .csv(s"$out/o")
    assert(Files.isRegularFile(Paths.get(s"$out/o/cat_data with space.csv")))
    assert(Files.isRegularFile(Paths.get(s"$out/o/cat_data_with_underscore.csv")))
    assert(Files.isRegularFile(Paths.get(s"$out/o/cat_data-with-dash.csv")))
  }

  // T:126-142 — empty and null partition values → __HIVE_DEFAULT_PARTITION__
  test("empty/null partition values render as the Hive default placeholder") {
    val out = tmpDir()
    import spark.implicits._
    val data = Seq(ExampleData("", 1, "foo"), ExampleData(null, 2, "bar"))
    data.toDF().repartition(1)
      .write.mode(SaveMode.Overwrite)
      .option(MoveFilesCommitProtocol.MOVE_FILES_OPTION,
        "$outputDirectory/cat_$category.csv")
      .partitionBy("category")
      .csv(s"$out/o")
    assert(Files.isRegularFile(
      Paths.get(s"$out/o/cat___HIVE_DEFAULT_PARTITION__.csv")))
  }

  // M:10 / R:18 — the legacy outputCommitterClass registration hook
  test("legacy outputCommitterClass hook moves files without the commit protocol") {
    val out = tmpDir()
    spark.conf.unset(MoveFilesCommitProtocol.COMMIT_PROTOCOL_CLASS)
    spark.conf.set("spark.sql.sources.outputCommitterClass",
      classOf[MoveFilesOutputCommitterCompat].getName)
    try {
      write(s"$out/o", Some("$outputDirectory/via_legacy_hook.csv"), repartition = 1)
      assert(Files.isRegularFile(Paths.get(s"$out/o/via_legacy_hook.csv")))
    } finally {
      spark.conf.unset("spark.sql.sources.outputCommitterClass")
      MoveFilesCommitProtocol.register(spark)
    }
  }

  // mid-migration: BOTH hooks registered → the compat committer moves,
  // the protocol detects it and must not re-run the move (which would
  // fail template rendering against already-moved files)
  test("both registration hooks active move files exactly once") {
    val out = tmpDir()
    spark.conf.set("spark.sql.sources.outputCommitterClass",
      classOf[MoveFilesOutputCommitterCompat].getName)
    try {
      // commitProtocolClass is still MoveFilesCommitProtocol (fixture)
      write(s"$out/o", Some("$outputDirectory/once.csv"), repartition = 1)
      assert(Files.isRegularFile(Paths.get(s"$out/o/once.csv")))
    } finally {
      spark.conf.unset("spark.sql.sources.outputCommitterClass")
    }
  }

  // deviation from the reference (checked renames): a refused rename
  // fails the job instead of silently leaving files behind (M:52
  // ignores the return value). Injected via a FileSystem stub — the
  // local FS auto-creates parents, so refusal can't be provoked
  // organically.
  test("failed renames abort the job instead of being silently ignored") {
    val out = tmpDir()
    Files.createDirectories(Paths.get(s"$out/o"))
    Files.writeString(Paths.get(s"$out/o/part-00000.csv"), "a,b\n")
    val conf = spark.sparkContext.hadoopConfiguration
    val failing = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def rename(src: org.apache.hadoop.fs.Path,
          dst: org.apache.hadoop.fs.Path): Boolean = false
    }
    failing.initialize(new java.net.URI("file:///"), conf)
    val e = intercept[java.io.IOException] {
      MoverCore.moveFiles(new org.apache.hadoop.fs.Path(s"file:$out/o"),
        conf, "$outputDirectory/moved.csv", Some(failing))
    }
    assert(e.getMessage.contains("renames failed"))
  }

  // T:144-154 — unknown template variable fails the write
  test("unknown template variable aborts the write with an exception") {
    val out = tmpDir()
    val e = intercept[Throwable] {
      write(s"$out/o", Some("$outputDirectory/cat_$nonexistent.csv"),
        repartition = 1)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.isInstanceOf[NoSuchElementException]
      || c.getMessage != null && c.getMessage.contains("nonexistent")))
  }
}
