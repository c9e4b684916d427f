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

  test("dedup pipeline via the facade: exact dedup, pairs, greedy retention") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over dog"),
      (2L, "the quick brown fox jumps over dog"),  // exact dup of 1
      (3L, "the quick brown fox jumps over cat"),  // near-dup of 1 (6/8)
      (4L, "completely different text entirely here now")
    ).toDF("doc_id", "text")
    val deduped = Graft.dedupExact(docs, "text", "doc_id")
    assert(deduped.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L, 4L))
    // NULL texts form ONE dedup group (GROUP BY semantics): the min-id
    // null row survives — a plain digest equi-join dropped ALL of them
    // (NULL = NULL never matches)
    val withNulls = Seq((1L, Option("a")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("doc_id", "text")
    assert(Graft.dedupExact(withNulls, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L))
    val withToks = docs.withColumn("toks",
      org.apache.spark.sql.functions.array_distinct(
        org.apache.spark.sql.functions.split($"text", " ")))
    val pairs = Graft.nearDupPairs(withToks, threshold = 0.7)
    val got = pairs.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val kept = Graft.greedyRetain(docs, pairs, "doc_id")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 4L))
    // the LSH scale path agrees with the exact path on this corpus
    // (deterministic seedless hashes — no flake surface)
    val lsh = Graft.minHashNearDupPairs(withToks, threshold = 0.7)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == got, s"lsh $lsh vs exact $got")
  }

  test("fuzzy self-join via the facade finds distance-2 pairs") {
    import spark.implicits._
    val keys = Seq("grafting", "graftling", "grafXlinX", "other")
      .toDF("name")
    val got = Graft.fuzzySelfJoin(keys, "name", maxDist = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(("grafting", "graftling", 1),
      ("grafXlinX", "graftling", 2)))
  }

  test("CDC apply via the facade: delete, partial update, insert") {
    import spark.implicits._
    val base = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
      .toDF("k", "status", "price")
    val changes = Seq(
      (1L, "U", Some(11.0), None, 1L),          // price only; status kept
      (1L, "U", Some(12.0), Some("Z"), 2L),     // latest wins, both cols
      (2L, "D", None, None, 1L),                // delete
      (9L, "I", Some(90.0), Some("N"), 1L)      // insert
    ).toDF("k", "op", "price", "status", "seq")
      .select($"k", $"op", $"price", $"status", $"seq")
    val got = Graft.applyChanges(base, changes, "k").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)).getOrElse("-"),
        r.getDouble(1)))
      .sortBy(_._1).toSeq
    // payload order: price, status come before base-only columns; fetch
    // by name to stay order-independent
    val byName = Graft.applyChanges(base, changes, "k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("status"),
        r.getAs[Double]("price"))).sortBy(_._1).toSeq
    assert(byName == Seq((1L, "Z", 12.0), (3L, "C", 30.0), (9L, "N", 90.0)),
      s"got $byName (raw $got)")
  }

  test("interval join via the facade: pairs match the range predicate") {
    import spark.implicits._
    val intervals = Seq((1L, 100L, 200L), (2L, 150L, 1000L))
      .toDF("w_id", "w_start", "w_end")
    val points = Seq((10L, 99L), (11L, 100L), (12L, 180L), (13L, 999L))
      .toDF("p_id", "p_ts")
    val got = Graft.intervalJoin(intervals, points, "w_start", "w_end", "p_ts")
      .select("w_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 11L), (1L, 12L), (2L, 12L), (2L, 13L)))
    val shifts = Seq((7L, 120L, 500L)).toDF("s_id", "s_s", "s_e")
    val overlaps = Graft.intervalOverlapJoin(intervals, shifts,
        "w_start", "w_end", "s_s", "s_e")
      .select("w_id", "s_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(overlaps.sorted == Seq((1L, 7L), (2L, 7L))) // once each, no dups
  }

  test("LOCF resample via the facade fills gaps and leaves leading nulls") {
    import spark.implicits._
    val obs = Seq(
      ("a", "2024-01-01 10:15:00", 1.0),
      ("a", "2024-01-01 10:45:00", 2.0),  // later in same hour wins
      ("a", "2024-01-01 13:05:00", 9.0),  // hours 11,12 filled with 2.0
      ("b", "2024-01-01 12:10:00", 5.0)   // b: 10,11 stay null
    ).toDF("k", "ts_s", "v")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val got = Graft.resampleLocf(obs, "k", "ts", "v").collect()
      .map(r => (r.getAs[String]("k"),
        r.getAs[java.sql.Timestamp]("ts").toString.substring(11, 13),
        Option(r.getAs[java.lang.Double]("v")).map(_.toDouble)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      ("a", "10", Some(2.0)), ("a", "11", Some(2.0)), ("a", "12", Some(2.0)),
      ("a", "13", Some(9.0)),
      ("b", "10", None), ("b", "11", None), ("b", "12", Some(5.0)),
      ("b", "13", Some(5.0))), got.mkString(", "))
  }

  test("one-call dedup pipeline: exact dups collapse, near-dup chains " +
      "keep one survivor, originals untouched") {
    import spark.implicits._
    // chain 1-3-5 (1~3 and 3~5 near-dup, 1!~5 directly) must collapse
    // to doc 1 only — the transitive property a pairwise greedy drop
    // can't give; 2 is an exact dup of 1; 4 is unique
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),          // exact dup of 1
      (3L, "a b c d e f g x"),          // ~1 (7/9)
      (5L, "a b c d e f x y"),          // ~3 (7/9... via x), not ~1 (6/10)
      (4L, "totally different words here")
    ).toDF("doc_id", "text")
    for (lsh <- Seq(true, false)) {
      val kept = Graft.dedupPipeline(docs, "doc_id", "text", 0.7, useLsh = lsh)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(kept == Set((1L, "a b c d e f g h"),
        (4L, "totally different words here")), s"lsh=$lsh: $kept")
    }
  }

  test("IVF index and fuzzy lookup via the facade") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("facade_ivf").toString
    val rng = new scala.util.Random(5)
    val emb = (0L until 60L).map(i =>
      (i, Seq.fill(8)(rng.nextGaussian()))).toDF("vec_id", "v")
    Graft.buildIvfIndex(emb, idx, c = 4)
    val queries = emb.filter($"vec_id" === 0L)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val top = Graft.queryIvfIndex(spark, idx, queries, k = 5, nprobe = 2)
    assert(top.count() == 5)
    assert(top.filter($"vec_id" === 0L).count() == 0) // self excluded
    val hits = Graft.fuzzyLookup(Seq("spark", "sprak").toDF("q"), "q",
      Seq("spark", "spork", "flink").toDF("w"), "w", maxDist = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(hits == Set(("spark", "spark", 0), ("spark", "spork", 1),
      ("sprak", "spark", 2), ("sprak", "spork", 2)))
    val ham = Graft.hammingNearDupPairs(
      Seq((1L, 0b1011L), (2L, 0b1010L), (3L, 0b0101L)).toDF("id", "f"),
      "id", "f", maxDist = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ham == Set((1L, 2L, 1)))
  }

  test("signature store and IVF append via the facade: daily-increment " +
      "loop composes (build → probe → append → probe)") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("facade_store").toString
    val docs = Seq(
      (1L, Seq("a", "b", "c")), (2L, Seq("a", "b", "c")),
      (3L, Seq("x", "y", "z"))).toDF("doc_id", "toks")
    Graft.buildNearDupSignatureStore(docs, store)
    val d1 = Seq((10L, Seq("a", "b", "c"))).toDF("doc_id", "toks")
    val p1 = Graft.probeNearDupSignatureStore(spark, store, d1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 == Set((1L, 10L), (2L, 10L)))
    Graft.appendNearDupSignatureStore(spark, store, d1)
    // the appended doc is now corpus: a second identical increment must
    // pair against it too
    val d2 = Seq((20L, Seq("a", "b", "c"))).toDF("doc_id", "toks")
    val p2 = Graft.probeNearDupSignatureStore(spark, store, d2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 == Set((1L, 20L), (2L, 20L), (10L, 20L)))
    // maintenance surface: stats see the append's ledger growth, compact
    // reverses it, and the compacted store still probes identically
    Graft.appendNearDupSignatureStore(spark, store, d2)
    // ≥3: build + two appends each wrote ≥1 ledger file (more when the
    // input had several partitions — the growth compact reverses)
    assert(Graft.nearDupSignatureStoreStats(spark, store).toksetFiles >= 3)
    val cs = Graft.compactNearDupSignatureStore(spark, store)
    assert(cs.toksetFilesAfter == 1, cs.toString)
    val d3 = Seq((30L, Seq("a", "b", "c"))).toDF("doc_id", "toks")
    val p3 = Graft.probeNearDupSignatureStore(spark, store, d3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p3 == Set((1L, 30L), (2L, 30L), (10L, 30L), (20L, 30L)))

    val idx = java.nio.file.Files.createTempDirectory("facade_ivfapp").toString
    val rng = new scala.util.Random(7)
    val emb = (0L until 40L).map(i =>
      (i, Seq.fill(8)(rng.nextGaussian()))).toDF("vec_id", "v")
    Graft.buildIvfIndex(emb.filter($"vec_id" < 30L), idx, c = 4)
    Graft.appendIvfIndex(spark, idx, emb.filter($"vec_id" >= 30L))
    val queries = emb.filter($"vec_id" === 0L)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val top = Graft.queryIvfIndex(spark, idx, queries, k = 5, nprobe = 4)
    assert(top.count() == 5)
    Seq(store, idx).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
  }

  test("near-dup labels pipeline via the facade (materialize once)") {
    val dir = "/root/testdata/sf0.001"
    val labels = Graft.nearDupLabels(spark, dir)
    val sizes = Graft.clusterSizes(spark, labels)
    val kept = Graft.clusterCanonicals(spark, dir, labels)
    assert(sizes.count() > 0 && kept.count() > 0)
    // the frame-shaped variant over the same docs produces the same labels
    import org.apache.spark.sql.functions.{array_distinct, split}
    import spark.implicits._
    val docsWithToks = Tables(spark, dir, "documents")
      .select($"doc_id", array_distinct(split($"text", " ")).as("toks"))
    val labels2 = Graft.nearDupLabelsFor(docsWithToks)
    assert(labels2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("end-to-end composition: dedup → weighted thin → mixture quotas " +
      "→ leakage-safe split; the invariants compose (VERDICT r5 #8)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_distinct, col, split => fsplit}
    val dir = "/root/testdata/sf0.001"
    val base = Tables(spark, dir, "documents")
      .select($"doc_id", $"source", $"n_chars", $"text")

    // 1. dedup (exact near-dup path so the downstream theorem is exact)
    val ded = Graft.dedupPipeline(base, "doc_id", "text", useLsh = false)
    val dedRows = ded.collect()
    assert(dedRows.length > 0 && dedRows.length < base.count())
    // survivors carry no near-dup pair at the pipeline threshold
    val survToks = ded.select($"doc_id",
      array_distinct(fsplit($"text", " ")).as("toks"))
    assert(Graft.nearDupPairs(survToks).isEmpty,
      "dedup left a near-dup pair among survivors")

    // 2. weighted thinning — deterministic (content-hash decided), ⊆ input
    val thin = Graft.weightedSample(ded, "text", "n_chars")
    val thinIds = thin.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(thinIds.subsetOf(dedRows.map(_.getLong(0)).toSet))
    assert(thinIds == Graft.weightedSample(ded, "text", "n_chars")
      .select($"doc_id").collect().map(_.getLong(0)).toSet,
      "weighted sample must be a pure function of content")
    assert(thinIds.nonEmpty)

    // 3. mixture quotas over the thinned survivors: per-source counts
    // equal min(quota, available) — i.e. the quotas HOLD after dedup,
    // no source borrows from another
    val avail = thin.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val quotas = Map("src0" -> 2, "src1" -> 2, "src2" -> 2, "src3" -> 50)
    val mix = Graft.mixtureSample(thin, "source", "text", "doc_id", quotas)
    val mixBySource = mix.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mixBySource.keySet.subsetOf(quotas.keySet))
    for ((src, q) <- quotas if avail.getOrElse(src, 0L) > 0)
      assert(mixBySource.getOrElse(src, 0L) ==
        math.min(q.toLong, avail(src)), s"quota violated for $src")

    // 4. leakage-safe split last: every row labeled, and because the
    // SAME threshold deduped upstream, every component is a singleton —
    // the straddle guard holds by construction (cross-operator theorem)
    val sp = Graft.leakageSafeSplit(mix, "doc_id", "text")
    val spRows = sp.select($"doc_id", $"label", $"split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(spRows.length == mix.count())
    assert(spRows.forall { case (id, label, _) => id == label },
      "dedup upstream must make every split component a singleton")
    assert(spRows.map(_._3).toSet.subsetOf(Set("train", "valid", "test")))
  }

  test("leakage-safe split refuses an input that already has the emitted " +
      "column names") {
    import spark.implicits._
    val withLabel = Seq((1L, "a b", "x")).toDF("doc_id", "text", "label")
    val e1 = intercept[IllegalArgumentException] {
      Graft.leakageSafeSplit(withLabel, "doc_id", "text")
    }
    assert(e1.getMessage.contains("label"))
    val withSplit = Seq((1L, "a b", "x")).toDF("doc_id", "text", "split")
    intercept[IllegalArgumentException] {
      Graft.leakageSafeSplit(withSplit, "doc_id", "text")
    }
  }

  test("weighted sample keeps book-length weights (≥ 1e6) in range " +
      "instead of silently dropping them") {
    import spark.implicits._
    // One doc's weight dwarfs the rest: its keep probability caps at 1,
    // so it MUST be kept; under the old DECIMAL(6,0) cast the predicate
    // evaluated NULL and the row silently vanished.
    val docs = (0L until 20L).map(i => (i, s"doc body $i", 100L)) :+
      ((20L, "the enormous book", 50_000_000L))
    val kept = Graft.weightedSample(docs.toDF("doc_id", "text", "w"),
        "text", "w")
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(20L), "heavy row must survive the decimal cast")
  }

  test("leakage-safe split: near-dup components never straddle splits; " +
      "singletons follow q62's per-doc rule") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
      .select($"doc_id", $"text")
    val out = Graft.leakageSafeSplit(docs, "doc_id", "text")
    val rows = out.collect() // (doc_id, text, label, split)
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(rows.length == docs.count())
    // every component is wholly inside one split (no train/eval leak
    // through near-duplicates)
    val byLabel = rows.groupBy(_._2).values
    assert(byLabel.forall(_.map(_._3).distinct.size == 1))
    val multi = byLabel.filter(_.size > 1)
    assert(multi.nonEmpty) // the fixture really has near-dup components
    // and all three splits are populated at the component level
    val perLabelSplit = rows.groupBy(_._2).map(_._2.head._3).toSeq
    assert(perLabelSplit.toSet == Set("train", "valid", "test"))
    val trainFrac = perLabelSplit.count(_ == "train").toDouble /
      perLabelSplit.size
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train frac $trainFrac")
    // a near-dup pair from q36 is the straddle that a naive q62-style
    // per-doc split WOULD produce on this corpus: prove the guard binds
    val pair = graft.queries.LlmOps.q36(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .find { case (a, b) =>
        val ha = rows.find(_._1 == a).get
        val hb = rows.find(_._1 == b).get
        ha._2 == hb._2 // same component (always true for q36 pairs)
      }.get
    val sa = rows.find(_._1 == pair._1).get._3
    val sb = rows.find(_._1 == pair._2).get._3
    assert(sa == sb)
  }

  // Graft.extensions (the installer function) is exercised end-to-end in
  // GraftExtensionsSpec, which builds a session with the extensions and
  // runs SQL through the injected functions and strategy.
}
