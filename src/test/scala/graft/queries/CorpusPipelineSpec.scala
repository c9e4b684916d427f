package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end corpus-pipeline capstone (VERDICT r9 task 2): the
  * composed daily shape is verified as a WHOLE — stage postconditions
  * on the assembled frame, the exact mover-renamed shard file names,
  * and the read-back contents — on top of the q106 DuckDB hash gate
  * the driver runs at sf0.01. */
class CorpusPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  private lazy val packed =
    CorpusPipeline.assemble(graft.Tables(spark, dir, "documents")).cache()

  test("stage postconditions: survivors respect the gates the pipeline " +
      "claims (quality, lang, exact-dup-free, near-dup-free, quotas)") {
    import spark.implicits._
    val cfg = CorpusPipeline.Config()
    val docs = graft.Tables(spark, dir, "documents")
    val out = packed.collect()
    assert(out.nonEmpty, "pipeline produced nothing — degenerate fixture")
    val survivors = docs.join(packed.select($"doc_id"), "doc_id").cache()
    try {
      // lang + quality gates
      val langs = survivors.select($"lang").distinct()
        .collect().map(_.getString(0)).toSet
      assert(langs.subsetOf(cfg.keepLangs.toSet), langs.toString)
      val qs = survivors
        .withColumn("__toks", split($"text", " "))
        .withColumn("__qs", LlmOps2.qualityScore("__toks"))
        .filter($"__qs" < cfg.minQuality).count()
      assert(qs == 0L, s"$qs sub-quality survivors")
      // exact-dup-free: texts unique among survivors
      assert(survivors.count() ==
        survivors.select($"text").distinct().count())
      // near-dup-free: re-running the pair operator on the survivors
      // finds nothing ≥ threshold — the singleton-components invariant
      // the oracle's degenerate split rule rests on
      val residualPairs = LlmOps.neardupPairs(
        survivors.select($"doc_id",
          array_distinct(split($"text", " ")).as("toks")),
        cfg.nearDupThreshold, sorted = false).count()
      assert(residualPairs == 0L,
        s"$residualPairs near-dup pairs among survivors")
      // quotas: only quota'd sources, each within its quota
      val bySource = packed.groupBy($"source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySource.keySet.subsetOf(cfg.quotas.keySet), bySource.toString)
      bySource.foreach { case (src, n) =>
        assert(n <= cfg.quotas(src), s"$src: $n > quota ${cfg.quotas(src)}")
      }
      // split rule: with singleton components the leakage-safe split
      // must equal the per-document hash rule exactly
      val wrongSplit = survivors
        .withColumn("__h",
          graft.functions.RollingHash.rollingHash($"text", 64) % 100)
        .withColumn("want",
          when($"__h" < 80, "train").when($"__h" < 90, "valid")
            .otherwise("test"))
        .join(packed.select($"doc_id", $"split"), "doc_id")
        .filter($"split" =!= $"want").count()
      assert(wrongSplit == 0L)
      // packing: bins within a (split, shard) are contiguous from 0 and
      // each bin except the last holds ≤ budget tokens... the bin ids
      // come from a prefix sum, so it suffices that bin 0 exists per
      // group and bins never decrease along doc_id order
      val binsOk = packed.orderBy($"split", $"shard", $"doc_id")
        .select($"split", $"shard", $"bin").collect()
        .groupBy(r => (r.getString(0), r.getLong(1)))
        .forall { case (_, rows) =>
          val bs = rows.map(_.getLong(2)).toSeq
          bs.head == 0L && bs.zip(bs.tail).forall { case (a, b) => a <= b }
        }
      assert(binsOk, "non-monotone or non-zero-based bins")
    } finally survivors.unpersist()
  }

  test("mover shards: exactly one renamed CSV per (split, lang), exact " +
      "file names, contents == the assembled frame (FM1-FM9 on real " +
      "pipeline output)") {
    import spark.implicits._
    val out = graft.RunTmp.dir("corpus_capstone")
    CorpusPipeline.writeShards(packed, out)
    val expectedNames = packed.select($"split", $"lang").distinct()
      .collect().map(r => s"shard_${r.getString(0)}_${r.getString(1)}.csv")
      .toSet
    val actualNames = new java.io.File(out).listFiles()
      .filter(_.isFile).map(_.getName).filter(_.startsWith("shard_")).toSet
    assert(actualNames == expectedNames,
      s"missing ${expectedNames -- actualNames}, " +
        s"unexpected ${actualNames -- expectedNames}")
    assert(expectedNames.size >= 2, "degenerate: fewer than 2 shards")
    // no unmoved part- files anywhere under the output tree
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).map(_.toSeq.flatMap(walk)).getOrElse(Nil)
    val leftovers = walk(new java.io.File(out))
      .filter(_.getName.startsWith("part-"))
    assert(leftovers.isEmpty, s"unmoved files: $leftovers")
    // read-back == assembled frame, row for row
    val back = CorpusPipeline.q106Backread(spark, out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6))).toSet
    val want = packed
      .select($"doc_id", $"source", $"n_tokens", $"shard", $"bin",
        $"split", $"lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6))).toSet
    assert(back == want)
  }

  test("LSH mode (the 100 TB near-dup path) produces the SAME pipeline " +
      "output as the exact mode on this corpus") {
    import spark.implicits._
    val docs = graft.Tables(spark, dir, "documents")
    def rows(cfg: CorpusPipeline.Config): Set[Seq[Any]] =
      CorpusPipeline.assemble(docs, cfg).collect().map(_.toSeq).toSet
    val exact = rows(CorpusPipeline.Config(useLsh = false))
    val lsh = rows(CorpusPipeline.Config(useLsh = true))
    assert(exact == lsh,
      s"LSH-mode diverged: only-exact ${(exact -- lsh).take(3)} " +
        s"only-lsh ${(lsh -- exact).take(3)}")
  }

  test("preflight: a duplicated doc_id fails fast BEFORE any pipeline " +
      "stage runs; default stays preflight-free") {
    import spark.implicits._
    val dup = Seq(
      (1L, "the a data value", "en", "src0", 16L),
      (1L, "another the a doc", "en", "src0", 17L),
      (2L, "the a data clean", "en", "src2", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e = intercept[IllegalStateException] {
      CorpusPipeline.assemble(dup, CorpusPipeline.Config(preflight = true))
        .count()
    }
    assert(e.getMessage.contains("unique_key(doc_id)=1"), e.getMessage)
    // without preflight the pipeline still runs (dedup semantics take
    // the min-id row; keyness violations are the caller's to care about)
    CorpusPipeline.assemble(dup).count()
  }

  test("q106 is registered with its oracle and returns rows at sf0.001") {
    assert(graft.SparkEntry.queries.contains("q106_corpus_pipeline"))
    assert(graft.SparkEntry.oracleSql.contains("q106_corpus_pipeline"))
    val n = CorpusPipeline.q106(spark, dir).count()
    assert(n > 0)
  }
}
