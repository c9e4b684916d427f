package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class LlmOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("Q36 inverted-index fallback produces the same pair set as the bitmask path") {
    import spark.implicits._
    val d = graft.Tables(spark, dir, "documents")
      .select($"doc_id", array_distinct(split($"text", " ")).as("toks"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaMask = pairs(LlmOps.neardupPairs(d))
    val viaInverted = pairs(LlmOps.neardupPairs(d, forceInverted = true))
    assert(viaMask.nonEmpty)
    assert(viaMask == viaInverted)
  }

  test("Q36 dispatch falls back to the inverted index when distinct masks exceed the cap") {
    import spark.implicits._
    val d = graft.Tables(spark, dir, "documents")
      .select($"doc_id", array_distinct(split($"text", " ")).as("toks"))
    // the fixture vocabulary (31 tokens) is bitmask-encodable, but a cap
    // of 1 distinct mask forces the guard: dispatch must pick the
    // inverted-index plan (no BroadcastNestedLoopJoin) and still return
    // the identical pair set
    val guarded = LlmOps.neardupPairs(d, maxDistinctMasks = 1)
    guarded.collect()
    val p = guarded.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"guarded dispatch still took the pairwise mask comparison:\n$p")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(guarded) == pairs(LlmOps.neardupPairs(d)))
  }

  test("Q45 IVF-pruned path returns the exact pair set (verify step makes pruning safe)") {
    import spark.implicits._
    val emb = graft.Tables(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = pairs(LlmOps2.embedNeardupPairs(emb, 0.35))
    val ivf = pairs(LlmOps2.embedNeardupPairs(emb, 0.35, forceIvf = true))
    assert(exact.nonEmpty, "fixture should contain near-dup embedding pairs")
    assert(ivf == exact,
      s"IVF pruning lost ${(exact -- ivf).size} pairs / invented ${(ivf -- exact).size}")
  }

  test("Q45 cell bound prunes cross-cluster cell pairs on clustered data") {
    import spark.implicits._
    // three tight clusters around orthogonal axes: intra-cluster angles
    // are small, inter-cluster ≈ 90° — at threshold 0.9 (≈26°) the
    // triangle bound must eliminate all cross-cluster cell pairs
    val vecs = (0 until 60).map { i =>
      val axis = i % 3
      val base = Array.fill(8)(0.001 * ((i * 7) % 5))
      base(axis) = 1.0
      (i.toLong, base.toSeq)
    }
    val emb = vecs.toDF("vec_id", "v")
    val (_, cellPairs) = LlmOps2.ivfCells(emb, threshold = 0.9, c = 3)
    val kept = cellPairs.count()
    assert(kept < 9, s"expected cross-cluster cell pairs pruned, kept $kept/9")
    // and the pruned path still returns the exact pair set
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = pairs(LlmOps2.embedNeardupPairs(emb, 0.9))
    val ivf = pairs(LlmOps2.embedNeardupPairs(emb, 0.9, forceIvf = true, c = 3))
    assert(exact.nonEmpty)
    assert(ivf == exact)
  }

  test("pair queries leave no persistent storage behind") {
    graft.Hygiene.clearAll(spark) // other suites may share this session
    graft.SparkEntry.queries("q45_embed_neardup")(spark, dir).collect()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty, "q45 leaked persists")
    // q52 eager-cuts its band cache like q44/q47: only the small
    // checkpointed pair result may remain, nothing registered
    graft.SparkEntry.queries("q52_simhash_pairs")(spark, dir).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "q52 left its band cache registered")
    assert(spark.sparkContext.getPersistentRDDs.size <= 1,
      "q52 left more than its checkpointed result behind")
    graft.Hygiene.clearAll(spark)
    // q44 eager-cuts its trigram cache: after the call only the small
    // checkpointed pair result may remain in storage, never the
    // exploded trigram relation (whose cache entry is named by persist)
    graft.SparkEntry.queries("q44_ngram_jaccard")(spark, dir).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "q44 left its trigram cache registered")
    assert(spark.sparkContext.getPersistentRDDs.size <= 1,
      "q44 left more than its checkpointed result behind")
    // q47 and q79 eager-cut ALL their within-call caches (masks,
    // groups, bands / the score projection): after the call only the
    // checkpointed result may remain in storage, nothing registered
    // in the cache manager
    graft.Hygiene.clearAll(spark)
    for (q <- Seq("q47_minhash_lsh", "q79_select_quality")) {
      graft.SparkEntry.queries(q)(spark, dir).collect()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$q left cache entries registered")
      assert(spark.sparkContext.getPersistentRDDs.size <= 1,
        s"$q left more than its checkpointed result behind")
      graft.Hygiene.clearAll(spark)
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("tokenBitmasks ignores NULL tokens (matching the inverted path)") {
    import spark.implicits._
    // doc 0 has a null element in its token array; doc 1 is all-null.
    // The old fold nulled doc 0's entire mask (the doc then silently
    // vanished from every bitmask-path operator); the contract is to
    // ignore null tokens, as the inverted-index equi-join does.
    val df = Seq(
      (0L, Seq("a", null, "b")), (1L, Seq(null.asInstanceOf[String])),
      (2L, Seq("a", "b")), (3L, Seq("b"))).toDF("doc_id", "toks")
    val masks = LlmOps.tokenBitmasks(df).get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // vocab sorted: a→bit0, b→bit1
    assert(masks == Map(0L -> 3L, 1L -> 0L, 2L -> 3L, 3L -> 2L))
    // and the bitmask-path pair set matches the null-free equivalent
    val clean = Seq((0L, Seq("a", "b")), (1L, Seq.empty[String]),
      (2L, Seq("a", "b")), (3L, Seq("b"))).toDF("doc_id", "toks")
    val got = LlmOps.neardupPairs(df, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = LlmOps.neardupPairs(clean, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.contains((0L, 2L)))
    // greedy retention: empty-set docs pair with nothing, so ALL of
    // them survive (the generic path yields no pair to drop them by) —
    // while identical NON-empty sets still collapse to the min doc
    val withTwoEmpty = Seq(
      (0L, Seq("a", "b")), (1L, Seq(null.asInstanceOf[String])),
      (2L, Seq("a", "b")), (3L, Seq.empty[String])).toDF("doc_id", "toks")
    val survivors = LlmOps.greedySurvivors(withTwoEmpty, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(0L, 1L, 3L), s"got $survivors")
  }

  test("tokenBitmasks bit order is UTF8 binary order on non-BMP vocab") {
    import spark.implicits._
    // The one-job vocabulary probe (optimization r16) sorts the vocab
    // DRIVER-side; that sort must match what the old orderBy($"tok")
    // produced — UTF8String's unsigned-byte order — which diverges from
    // Java String (UTF-16 code-unit) order once supplementary characters
    // mix with U+E000..U+FFFF: U+E000 is EE 80 80 in UTF-8 (< the
    // emoji's F0 9F 98 80) but E000 in UTF-16 (> the surrogate D83D).
    val priv = "\uE000"
    val emoji = new String(Character.toChars(0x1F600))
    assert(priv.compareTo(emoji) > 0, "fixture must diverge in UTF-16")
    val df = Seq((0L, Seq(priv)), (1L, Seq(emoji)), (2L, Seq(priv, emoji)))
      .toDF("doc_id", "toks")
    val masks = LlmOps.tokenBitmasks(df).get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // UTF8 binary order: priv → bit 0, emoji → bit 1
    assert(masks == Map(0L -> 1L, 1L -> 2L, 2L -> 3L))
  }

  test("Q36 fallback handles a vocabulary too large for the bitmask path") {
    import spark.implicits._
    // 200-token vocabulary → tokenBitmasks returns None → inverted path
    // must be selected automatically and agree with a local brute force
    val docs = (0 until 60).map { i =>
      val toks = (0 until 12).map(j => s"w${(i * 7 + j * 11) % 200}").distinct
      (i.toLong, toks)
    }
    val df = docs.toDF("doc_id", "toks")
    val got = LlmOps.neardupPairs(df, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      inter = ta.toSet.intersect(tb.toSet).size.toDouble
      jac = inter / (ta.toSet ++ tb.toSet).size
      if jac >= 0.5
    } yield (a, b)).toSet
    assert(got == want)
    assert(want.nonEmpty, "test data should contain at least one near-dup pair")
  }
}
