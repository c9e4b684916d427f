package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The public facade is the advertised switch-over path for reference
  * users — every entry must actually work end-to-end, not just
  * delegate-compile. */
class GraftFacadeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("file mover via the facade: template rename applies on write") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_facade_").toString
    try {
      Graft.enableFileMover(spark)
      Seq(("a", 1), ("b", 2)).toDF("category", "value")
        .repartition(1)
        .write.mode("overwrite")
        .option(Graft.MoveFilesOption, "$outputDirectory/cat_$category.csv")
        .partitionBy("category")
        .csv(out)
      for (c <- Seq("a", "b")) {
        val f = java.nio.file.Paths.get(s"$out/cat_$c.csv")
        assert(java.nio.file.Files.isRegularFile(f), s"missing $f")
      }
    } finally {
      spark.conf.unset(filemover.MoveFilesCommitProtocol.COMMIT_PROTOCOL_CLASS)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("operators and columns via the facade work on real frames") {
    import spark.implicits._
    val df = Seq((1L, "g1", 3.0), (2L, "g1", 1.0), (3L, "g1", 2.0),
      (4L, "g2", 5.0)).toDF("id", "g", "score")
    val top = Graft.topKPerGroup(df, 2, Seq("g"),
      Seq(Graft.Order("score", desc = true), Graft.Order("id")))
    assert(top.filter($"g" === "g1").count() == 2)
    val cols = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0), "abc"))
      .toDF("a", "b", "t")
      .select(Graft.cosineSim($"a", $"b").as("cos"),
        Graft.rollingHash($"t", 64).as("h"),
        Graft.srpSignature($"a").as("sig"))
      .collect().head
    assert(math.abs(cols.getDouble(0) - 1.0) < 1e-12)
    assert(cols.getLong(1) > 0L)
    assert(cols.getLong(2) >= 0L && cols.getLong(2) < (1L << 16))
    val q = Seq(("x y x the", 1L)).toDF("text", "doc_id")
      .withColumn("toks", org.apache.spark.sql.functions.split($"text", " "))
      .select(Graft.qualityScore("toks").as("s")).collect().head.getLong(0)
    assert(q > 0L)
  }

  test("compaction via the facade: fewer files, same rows") {
    import spark.implicits._
    val in = RunTmp.dir("facade_compact_in")
    val out = RunTmp.dir("facade_compact_out")
    (1L to 1000L).toDF("id").repartition(16).write.mode("overwrite").parquet(in)
    val stats = Graft.compact(spark, in, out, targetBytes = 64L << 20)
    assert(stats.inFiles == 16 && stats.outFiles == 1)
    assert(spark.read.parquet(out).count() == 1000L)
  }

  // Graft.extensions (the installer function) is exercised end-to-end in
  // GraftExtensionsSpec, which builds a session with the extensions and
  // runs SQL through the injected functions and strategy.
}
