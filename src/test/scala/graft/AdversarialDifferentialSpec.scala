package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** One adversarial document row (top-level so the Dataset encoder can
  * instantiate it without an outer-scope reference). */
private[graft] case class AdvDoc(doc_id: Long, text: Option[String],
    lang: String, source: String, n_chars: Option[Long])

/** Adversarial-data differential harness (VERDICT r8 task 2): the
  * dedup/text-family hash queries run engine-vs-DuckDB over corpora no
  * fixture contains — empty strings, null text, 1–2-token documents,
  * multibyte/CJK/emoji text, a multi-thousand-token document, plus a
  * planted-near-dup bulk so the pair queries produce pairs — because
  * the r8 oracle latent (sub-3-token trigram divergence, NOTES_r8) was
  * found by READING, not by any test: no sf fixture reaches the
  * degenerate-document semantics end-to-end.
  *
  * Mechanics: per seed, write an adversarial `documents.parquet` into a
  * temp sf-dir (other tables symlinked from sf0.001 so every view
  * resolves), dump each query's result exactly as `graft.Verify` does,
  * and run the DRIVER-SHAPED comparator (`tools/check.py`, DuckDB) on
  * it. Cancels (not fails) when the driver-side python/duckdb stack is
  * absent — the harness borrows it for the oracle only; the library
  * itself never depends on it. */
class AdversarialDifferentialSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** The dedup/text family — every documents-table hash-gated query
    * whose semantics touch tokenization, n-grams, or text length. */
  private val Queries = Seq(
    "q35_dedup_exact", "q36_neardup_jaccard", "q38_token_stats",
    "q39_tfidf", "q41_text_quality", "q42_token_count",
    "q43_fingerprint", "q44_ngram_jaccard", "q56_normalize",
    "q66_langid", "q67_repetition", "q68_decontaminate",
    "q69_chunking", "q70_pii_redact", "q104_winnow_passages",
    "q105_neardup_delta", "q108_line_dedup", "q109_char_entropy",
    "q111_zipf_slope", "q113_source_overlap", "q116_boilerplate_strip")

  private def duckdbAvailable: Boolean =
    try {
      import scala.sys.process._
      Seq("python3", "-c", "import duckdb, pyarrow, pandas").! == 0
    } catch { case _: Throwable => false }

  /** Seeded adversarial corpus: rows 0–13 are the degenerate block
    * (identical across seeds — these ARE the test); the bulk is a
    * seeded planted-near-dup corpus in the sf vocabulary so the pair
    * and winnowing queries have real work. */
  private def corpus(seed: Int): Seq[AdvDoc] = {
    val rng = new scala.util.Random(seed)
    val langs = Seq("en", "es", "zh", "de", "fr")
    def doc(id: Long, text: String): AdvDoc =
      AdvDoc(id, Some(text), langs((id % langs.size).toInt),
        s"src${id % 4}", Some(text.length.toLong))
    val huge = (0 until 3000).map(i => s"tok${i % 37}").mkString(" ")
    val degenerate = Seq(
      AdvDoc(0L, None, "en", "src0", None), // null text
      doc(1L, ""), // empty
      doc(2L, " "), // whitespace only
      doc(3L, "a"), // 1 token
      doc(4L, "a b"), // 2 tokens — the r8 trigram-latent shape
      doc(5L, "东京 大阪"), // CJK, 2 tokens
      doc(6L, "東京大阪名古屋"), // CJK, no spaces
      doc(7L, "🚀 🙂 🚀"), // emoji (surrogates)
      doc(8L, huge), // multi-thousand-token document
      doc(9L, "naïve café naïve café"), // combining-free accents
      doc(10L, huge), // exact dup of the huge doc
      doc(11L, "naïve café naïve café"), // exact dup
      doc(12L, "a b"), // exact dup of the 2-token doc
      doc(13L, "东京 大阪 京都"), // near-dup of doc 5
      // control characters (found q85's line-model divergence and
      // q76's null-toks drop): embedded/trailing/lone newlines, quotes,
      // commas, tabs, backslashes
      doc(14L, "line one\nline two"),
      doc(15L, "ends with newline\n"),
      doc(16L, "a \"quoted\" token, with comma"),
      doc(17L, "tab\tseparated\ttokens"),
      doc(18L, "back\\slash and 'single'"),
      doc(19L, "\n"))
    val vocab = Seq("the", "fast", "key", "order", "sort", "table",
      "scan", "merge", "part", "window", "small", "hash", "join",
      "batch", "stream", "spark", "dup", "group", "query", "row",
      "data", "slow", "filter", "customer", "line", "value", "agg",
      "column", "big", "vector", "a")
    val bases = (0 until 6).map(_ =>
      rng.shuffle(vocab).take(8 + rng.nextInt(8)))
    val bulk = (20L until 140L).map { id =>
      val b = bases(rng.nextInt(bases.size))
      val mutated = b.filter(_ => rng.nextInt(8) > 0) ++
        rng.shuffle(vocab).take(rng.nextInt(3))
      // repetition matters for q67/q104: sample WITH replacement so
      // grams repeat within documents
      val toks = (0 until 3 + rng.nextInt(40)).map(_ =>
        mutated(rng.nextInt(mutated.size)))
      doc(id, toks.mkString(" "))
    }
    degenerate ++ bulk
  }

  private[graft] def debugFixture(seed: Int): String = writeFixture(seed)

  /** Adversarial EVENTS fixture: degenerate timestamps/values/props
    * WITHIN the declared schema domains — `event_id` is a key (dup-id
    * handling is the dedup surface's job, and the oracle idioms assume
    * keyness), `value` is money (DECIMAL(18,4)-castable: no NaN/±Inf,
    * |v| < 1e14 — DuckDB ERRORS casting NaN to DECIMAL where Spark
    * yields NULL, so NaN is out-of-domain by the oracle's own word),
    * and ts spans stay small enough that per-minute/hour grid queries
    * are feasible (a 1970→2100 outlier makes BOTH engines generate a
    * ~69M-row spine — a cost wall, not a divergence). In-domain
    * degenerates: null ts, same-ts ties, null event_type, null and
    * MALFORMED props JSON, sub-second boundary timestamps, negative /
    * zero / near-decimal-max values. */
  private def writeEventsFixture(seed: Int): String = {
    import spark.implicits._
    val adv = java.nio.file.Files
      .createTempDirectory(s"adv_ev_$seed").toString
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001")
    java.nio.file.Files.list(src).forEach { p =>
      val name = p.getFileName.toString
      if (name.endsWith(".parquet") && name != "events.parquet")
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(adv, name), p)
      ()
    }
    val rng = new scala.util.Random(seed)
    val types = Seq("click", "view", "purchase", "signup", "error")
    val degenerate = Seq(
      (0L, null.asInstanceOf[String], 1L, "click", 1.0, """{"k": 1}"""),
      (1L, "2023-12-30 00:00:00", 1L, "click", 2.0, """{"k": 2}"""),
      (2L, "2024-01-02 23:59:59.999999", 1L, "view", 3.0, """{"k": 3}"""),
      (3L, "2024-01-01 00:00:00", 2L, null.asInstanceOf[String], 4.0, """{"k": 4}"""),
      (4L, "2024-01-01 00:00:00", 2L, "click", 7.5, """{"k": 5}"""),
      (5L, "2024-01-01 00:00:01", 2L, "view", -1.5, null.asInstanceOf[String]),
      (6L, "2024-01-01 00:00:01", 2L, "view", 0.0, "not json"),
      (7L, "2024-01-01 00:00:01", 3L, "purchase", 9.9e12, """{"k": -7}"""),
      (9L, "2024-01-01 00:00:01", 3L, "purchase", 9.9e12, """{"k": -7}"""),
      (8L, "2024-01-01 00:00:01.000001", 3L, "error", 0.001, """{"k": 0}"""))
    val bulk = (100L until 300L).map { id =>
      val m = rng.nextInt(300)
      (id, f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:${rng.nextInt(60)}%02d",
        (id % 7) + 1, types(rng.nextInt(types.size)),
        math.rint(rng.nextDouble() * 1000) / 100.0,
        s"""{"k": ${rng.nextInt(100)}}""")
    }
    val tmp = s"$adv/__ev_tmp"
    (degenerate ++ bulk)
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      // TIMESTAMP_NTZ: the driver fixture's physical layout (micros,
      // isAdjustedToUTC=false) — what graft.Tables and the DuckDB views
      // both read as wall-clock instants
      .selectExpr("event_id", "CAST(ts_s AS TIMESTAMP_NTZ) AS ts",
        "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(adv, "events.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    adv
  }

  /** Adversarial EMBEDDINGS fixture: zero vector (also as a QUERY
    * vector — q37/q48 query ids 0–2), null embedding, null element,
    * NaN component, huge-but-finite components — all at the declared
    * 64 dims (shorter vectors are out-of-domain: the oracles index a
    * fixed dimension, as any real embedding store does). */
  private def writeEmbeddingsFixture(seed: Int): String = {
    import spark.implicits._
    val adv = java.nio.file.Files
      .createTempDirectory(s"adv_emb_$seed").toString
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001")
    java.nio.file.Files.list(src).forEach { p =>
      val name = p.getFileName.toString
      if (name.endsWith(".parquet") && name != "embeddings.parquet")
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(adv, name), p)
      ()
    }
    val rng = new scala.util.Random(seed)
    def unit(): Seq[java.lang.Float] = {
      val v = Seq.fill(64)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => java.lang.Float.valueOf((x / n).toFloat))
    }
    val zeros = Seq.fill(64)(java.lang.Float.valueOf(0f))
    val degenerate: Seq[(Long, Seq[java.lang.Float], Int)] = Seq(
      (2L, zeros, 0), // zero-norm QUERY vector: ranks nothing
      (10L, zeros, 1),
      (11L, null.asInstanceOf[Seq[java.lang.Float]], 2),
      (12L, unit().updated(7, null.asInstanceOf[java.lang.Float]), 3),
      (13L, unit().updated(3, java.lang.Float.valueOf(Float.NaN)), 4),
      (14L, Seq.fill(64)(java.lang.Float.valueOf(1e30f)), 5))
    val normal = (Seq(0L, 1L) ++ (20L until 70L)).map(id =>
      (id, unit(), (id % 8).toInt))
    val tmp = s"$adv/__emb_tmp"
    (degenerate ++ normal)
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(adv, "embeddings.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    adv
  }

  private def writeFixture(seed: Int): String = {
    import spark.implicits._
    val adv = java.nio.file.Files
      .createTempDirectory(s"adv_sf_$seed").toString
    // every non-documents table resolves to sf0.001 (check.py creates a
    // view per table; the doc-family queries never read them, but the
    // views must exist)
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001")
    java.nio.file.Files.list(src).forEach { p =>
      val name = p.getFileName.toString
      if (name.endsWith(".parquet") && name != "documents.parquet")
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(adv, name), p)
      ()
    }
    // single parquet FILE named documents.parquet, as the driver writes
    val tmp = s"$adv/__docs_tmp"
    corpus(seed).toDF().coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(adv, "documents.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    adv
  }

  private def runSeed(seed: Int, queryNames: Seq[String],
      fixture: Int => String = writeFixture): Unit = {
    val adv = fixture(seed)
    val out = java.nio.file.Files
      .createTempDirectory(s"adv_out_$seed").toString
    try {
      queryNames.foreach { name =>
        try SparkEntry.queries(name)(spark, adv).coalesce(1)
          .write.mode("overwrite").parquet(s"$out/$name")
        finally Hygiene.clearAll(spark)
      }
      val json = SparkEntry.oracleSql
        .filter(kv => queryNames.contains(kv._1))
        .map { case (k, v) =>
          s"${Verify.jsonQuote(k)}: ${Verify.jsonQuote(v)}" }
        .mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/oracle_sql.json"), json)
      import scala.sys.process._
      val log = new StringBuilder
      val code = Process(Seq("python3", "tools/check.py", adv, out),
          new java.io.File("/root/repo"))
        .!(ProcessLogger(l => { log.append(l).append('\n'); () },
          l => { log.append(l).append('\n'); () }))
      assert(code == 0,
        s"seed $seed: engine-vs-oracle divergence on adversarial " +
          s"data:\n$log")
      assert(log.toString.contains(s"== ${queryNames.size} pass"),
        s"seed $seed: comparator did not cover all queries:\n$log")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(adv))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("dedup/text-family queries match the DuckDB oracle on " +
      "adversarial corpora (empty/null/1-token/multibyte/huge docs), " +
      "3 seeds") {
    assume(duckdbAvailable, "driver-side python/duckdb stack not present")
    Seq(101, 202, 303).foreach(runSeed(_, Queries))
  }

  test("EVERY hash-gated query matches the DuckDB oracle on an " +
      "adversarial corpus — the full-surface sweep that caught the " +
      "null-ordering family (q63/q64/q84/q103), the x38 null-text NPE, " +
      "the x49 identity-nulling worker, and q49's null-boolean artifact") {
    assume(duckdbAvailable, "driver-side python/duckdb stack not present")
    // non-documents tables resolve to sf0.001 via the symlinks, so the
    // relational surface re-verifies on real data as a side effect;
    // the documents-reading queries are the adversarial subjects
    runSeed(404, SparkEntry.oracleSql.keys.toSeq.sorted)
  }

  test("EVERY hash-gated query matches the DuckDB oracle on an " +
      "adversarial EVENTS corpus (null/tied timestamps, null types, " +
      "malformed props) — the sweep that caught the null-event-time " +
      "window family, the SCD2/window null-ordering family, and q31's " +
      "NULL_MAP_KEY job failure") {
    assume(duckdbAvailable, "driver-side python/duckdb stack not present")
    runSeed(707, SparkEntry.oracleSql.keys.toSeq.sorted, writeEventsFixture)
  }

  test("EVERY hash-gated query matches the DuckDB oracle on an " +
      "adversarial EMBEDDINGS corpus (zero/null/NaN vectors) — the " +
      "sweep that caught the ANSI DIVIDE_BY_ZERO job failures " +
      "(q37/q78/x78), the k-means NPE on a null embedding (q48), the " +
      "UDF NPE (x37), and the NaN-quantization oracle error (q75)") {
    assume(duckdbAvailable, "driver-side python/duckdb stack not present")
    runSeed(909, SparkEntry.oracleSql.keys.toSeq.sorted,
      writeEmbeddingsFixture)
  }
}
