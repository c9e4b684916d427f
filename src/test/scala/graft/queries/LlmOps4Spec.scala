package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class LlmOps4Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  /** Same portable content hash as RollingHash/q62 (base-31 fold mod
    * 1e9+7 over the first 64 BYTES — the production expression folds
    * UTF-8 bytes, so chars would diverge on non-ASCII text) — used to
    * predict split membership for handcrafted fixtures. */
  private def bucket(text: String): Long =
    text.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(64)
      .foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L) % 100

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_llmops4_").toString
    rows.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("q66 plan: profile join broadcasts, argmax is TopKPerGroupExec, no Window") {
    graft.Hygiene.clearAll(spark) // other suites may share this session
    val df = graft.SparkEntry.queries("q66_langid")(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("TopKPerGroup"), s"argmax not routed through the heap operator:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"profile join did not broadcast:\n$p")
    assert(!p.contains("Window"), s"plan still contains a Window:\n$p")
    // instance-level aggregation: no persist, no checkpoint, no residue
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("q66 classifies perfectly when the languages are actually separable") {
    // the sf fixtures draw every language from one shared vocabulary, so
    // accuracy there is chance by construction; this fixture gives each
    // language a disjoint character set, making trigram profiles fully
    // separable — every test-split doc must then be predicted correctly
    val docs = (0 until 100).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val text =
        if (lang == "aa") s"aqua$i aqua aqua" else s"zorb$i zorb zorb"
      (i.toLong, text, lang)
    }
    // precondition: the deterministic hash split must leave both langs
    // represented on both sides (fails loudly if the fixture degenerates)
    for (l <- Seq("aa", "bb")) {
      assert(docs.exists(d => d._3 == l && bucket(d._2) < 80), s"no $l train doc")
      assert(docs.exists(d => d._3 == l && bucket(d._2) >= 80), s"no $l test doc")
    }
    val tmp = writeDocs(docs)
    try {
      val out = LlmOps4.q66(spark, tmp).collect()
      val nTest = docs.count(d => bucket(d._2) >= 80)
      assert(out.length == nTest)
      out.foreach { r =>
        assert(r.getAs[String]("pred_lang") == r.getAs[String]("true_lang"),
          s"doc ${r.getAs[Long]("doc_id")} misclassified: $r")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("q68 plan: the eval n-gram side broadcasts") {
    val df = graft.SparkEntry.queries("q68_decontaminate")(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), s"eval side did not broadcast:\n$p")
  }

  test("q69 chunking covers every token with the declared stride and sizes") {
    // "a b c ... m" = 13 tokens; size 8, stride 6 → starts 1, 7, 13 with
    // lengths 8, 7, 1 — trailing chunks shorten, none are dropped
    val tmp = writeDocs(Seq(
      (1L, (0 until 13).map(i => ('a' + i).toChar.toString).mkString(" "), "en")))
    try {
      val rows = LlmOps4.q69(spark, tmp).collect()
        .map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Int]("start_tok"),
          r.getAs[Int]("n_chunk_tokens"), r.getAs[String]("chunk_text")))
      assert(rows.toSeq == Seq(
        (0L, 1, 8, "a b c d e f g h"),
        (1L, 7, 7, "g h i j k l m"),
        (2L, 13, 1, "m")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("q70 detects and masks PII-shaped spans on handcrafted text") {
    // the fixture corpus has no digits or '@' (so the oracle hash only
    // proves the no-op path); this pins the actual behavior
    val tmp = writeDocs(Seq(
      (1L, "contact bob.smith+x@example.co.uk or 192.168.0.1 now", "en"),
      (2L, "call +1 555-123-4567 or 555 9876 0000 today", "en"),
      (3L, "clean text with no sensitive spans", "en"),
      (4L, "999.999.999.999 is not an ip but 10.0.0.255 is", "en")))
    try {
      val rows = LlmOps4.q70(spark, tmp).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Int]("n_emails"), r.getAs[Int]("n_ipv4"),
            r.getAs[Int]("n_phones"), r.getAs[Int]("red_len"))).toMap
      assert(rows(1L)._1 == 1 && rows(1L)._2 == 1 && rows(1L)._3 == 0)
      // the lone "+1 " prefix survives: the match anchors at the first
      // 3-digit group, so the country-code fragment stays unmasked
      assert(rows(2L) == ((0, 0, 2,
        "call +1 [PHONE] or [PHONE] today".length)))
      assert(rows(3L) == ((0, 0, 0, 34)))
      // 999.* octets exceed 255 → not an IPv4; 10.0.0.255 is one. The
      // out-of-range blob stays untouched entirely: dots are not phone
      // separators and each run is only 3 digits, so PhoneRe skips it too
      assert(rows(4L)._2 == 1 && rows(4L)._3 == 0)
      // a doc with no matches must round-trip byte-identical
      val clean = LlmOps4.q70(spark, tmp).collect()
        .find(_.getAs[Long]("doc_id") == 3L).get.getAs[String]("red_digest")
      val expected = java.security.MessageDigest.getInstance("SHA-256")
        .digest("clean text with no sensitive spans".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(clean == expected)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("q75 quantization error is bounded by scale/254 and zero vectors are safe") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_q75_").toString
    try {
      (Seq((0L, Seq(0.5f, -0.25f, 0.125f)), (1L, Seq(0.0f, 0.0f, 0.0f))))
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
      // quantizeInt8 is the library API with real TINYINT code arrays;
      // q75 (the verified query) joins them to a string for the
      // pandas-based driver comparator
      val rows = LlmOps4.quantizeInt8(spark, tmp).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          (r.getAs[Double]("scale"),
            r.getSeq[Byte](r.fieldIndex("codes")).map(_.toInt).toList,
            r.getAs[Double]("max_err"))).toMap
      // codes scale to the max-abs element; half the step bounds the
      // error. floor(x+0.5) rounds halves toward +inf: -0.25 maps to
      // -63.5 -> -63 (identical in both engines — that's the contract)
      assert(rows(0L)._2 == List(127, -63, 32))
      assert(rows(0L)._3 <= rows(0L)._1 / 254.0 + 1e-6)
      // zero vector: zero codes, zero error, no NaN/ANSI cast failure
      assert(rows(1L) == ((0.0, List(0, 0, 0), 0.0)))
      // fixture-wide: the bound holds for every vector (+1e-6: max_err
      // is rounded to 6 dp in the output, which can round past the bound)
      val full = LlmOps4.q75(spark, dir).collect()
      assert(full.nonEmpty)
      full.foreach { r =>
        assert(r.getAs[Double]("max_err") <=
          r.getAs[Double]("scale") / 254.0 + 1e-6, s"bound violated: $r")
      }
      // the verified q75 surface carries the same codes, comma-joined
      val joined = LlmOps4.q75(spark, tmp).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("codes_str")).toMap
      assert(joined(0L) == "127,-63,32" && joined(1L) == "0,0,0")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("q67 flags repetitive documents and keeps diverse ones") {
    // doc 1: 10 distinct tokens -> 9 distinct bigrams, top frac 1/9 ≈ .111
    // doc 2: "x y" * 5           -> 9 bigrams, 2 distinct, dup frac 7/9 ≈ .778
    val tmp = writeDocs(Seq(
      (1L, "a b c d e f g h i j", "en"),
      (2L, "x y x y x y x y x y", "en")))
    try {
      val rows = LlmOps4.q67(spark, tmp).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_distinct"),
            r.getAs[Double]("dup_bigram_frac"), r.getAs[Int]("keep"))).toMap
      assert(rows(1L) == ((9L, 9L, 0.0, 1)))
      assert(rows(2L)._1 == 9L && rows(2L)._2 == 2L && rows(2L)._4 == 0)
      assert(math.abs(rows(2L)._3 - 0.7778) < 1e-9)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}
