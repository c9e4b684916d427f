package graft.queries

import graft.Tables
import graft.filemover.MoveFilesCommitProtocol
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The end-to-end corpus-pipeline capstone (VERDICT r9 task 2): every
  * stage of the real daily training-data shape, composed from the
  * individually verified operators, ending in shards written THROUGH
  * the file-mover commit protocol (FM1–FM9) with a `$split`/`$lang`
  * template — the reference's capability exercised on real pipeline
  * output rather than a fixture write.
  *
  *   ingest → quality/langid gate (q41's exact-integer score) →
  *   exact dedup (q35, digest-first) → near-dup greedy drop
  *   (q36 pairs + q76 retention) → decontaminate (q68's shared-trigram
  *   rule) → mixture sample (q103 quotas) → leakage-safe split →
  *   sequence packing (q64's sharded contiguous fill) → mover-renamed
  *   CSV shards.
  *
  * Every stage is deterministic and RNG-free (content-hash membership
  * throughout), so the WHOLE composition — including the bytes read
  * back from the renamed shard files — hash-matches a single DuckDB
  * oracle statement at sf0.01 (q106). The leakage-safe split stage
  * calls the REAL component-based operator
  * ([[graft.Graft.leakageSafeSplit]]); because greedy retention has
  * already dropped every ≥-threshold pair, its components are provably
  * singletons and the oracle's per-document hash rule is exact — the
  * operator runs its full clustering machinery, the SQL twin needs
  * none.
  *
  * 100 TB posture: each stage keeps its own documented scale shape
  * (digest-keyed dedup shuffle, inverted-index pair generation,
  * broadcast eval-gram join, per-source quota windows, per-(split,
  * shard) packing windows — no global order anywhere); the final write
  * is one hash repartition on the shard key so each (split, lang)
  * partition is exactly one file and the mover's all-or-nothing
  * collision gate passes. */
object CorpusPipeline {

  /** Pipeline knobs. Defaults are the q106 contract values (part of
    * the declared output, like q64's shard count). */
  final case class Config(
      idCol: String = "doc_id",
      textCol: String = "text",
      langCol: String = "lang",
      sourceCol: String = "source",
      minQuality: Long = 4000L,
      keepLangs: Seq[String] = Seq("en", "de", "fr"),
      nearDupThreshold: Double = 0.7,
      quotas: Map[String, Int] = DefaultQuotas,
      packBudget: Int = 512,
      packShards: Int = 8,
      /** `true` swaps the near-dup stage onto the MinHash-LSH path —
        * the 100 TB shape (banded candidates + exact verify, q47's
        * plan) instead of the exact inverted-index join. Same output
        * contract; banding recall applies, so the oracle-gated q106
        * keeps `false`. Spec asserts LSH-mode == exact-mode end to end
        * on the sf fixtures (where the derived banding finds every
        * pair). */
      useLsh: Boolean = false,
      /** `true` runs the declared-domain preflight the pipeline's own
        * stages assume before anything else: `idCol` must be a KEY
        * (dedup's min-id survivor, the pair orientation rule and the
        * quota tiebreak all lean on it). Fail-fast via
        * [[graft.operators.DomainCheck.requireClean]]. */
      preflight: Boolean = false,
      /** EXTERNAL benchmark suite to decontaminate against (VERDICT r10
        * task 3): a frame with `textCol`, typically ALSO `idCol` —
        * benchmark-sized (its distinct grams broadcast, q68's shape).
        * When set, the decon stage drops every doc sharing ≥1 distinct
        * word trigram with ANY eval doc; the internal h≥98 rule — the
        * self-contained-oracle stand-in where the corpus's own
        * content-hash slice plays the benchmark — is bypassed, and no
        * corpus docs are h-sliced away (the eval docs were never in the
        * corpus). This is what a real training-data pipeline does, and
        * it is the ONLY decon rule the incremental pipeline can honor:
        * the internal slice GROWS with the corpus, so an eval doc in a
        * future increment could retroactively contaminate already-
        * emitted output (see [[CorpusPipelineDelta]]). */
      evalDocs: Option[DataFrame] = None)

  /** q106's mixture slice: quotas over the even-numbered sources (odd
    * sources quota 0 → dropped — the quota-gate path is exercised). */
  val DefaultQuotas: Map[String, Int] = Map(
    "src0" -> 10, "src2" -> 12, "src4" -> 6, "src6" -> 10,
    "src8" -> 4, "src10" -> 12, "src12" -> 8, "src14" -> 10)

  /** Run the pipeline over `docs` (needs `idCol`, `textCol`, `langCol`,
    * `sourceCol`). Returns one row per surviving document:
    * (idCol, sourceCol, n_tokens, shard, bin, split, langCol) —
    * `shard`/`bin` are the q64 packing coordinates, `split` the
    * leakage-safe train/valid/test assignment. Unordered (callers sort
    * or write). */
  def assemble(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // 0. opt-in preflight: one aggregation pass, then either a clean
    // drop proceeds or nothing downstream runs at all
    if (cfg.preflight)
      graft.operators.DomainCheck.requireClean(docs,
        Seq(graft.operators.DomainCheck.UniqueKey(cfg.idCol)))
    // 1. quality + language gate. The exact-integer q41 score shared
    // with q79's selector; a null-text doc scores null and the >=
    // comparison drops it (both engines agree on null comparison).
    val quality = docs
      .withColumn("__toks", split(col(cfg.textCol), " "))
      .withColumn("__qs", LlmOps2.qualityScore("__toks"))
      .filter(col("__qs") >= cfg.minQuality &&
        col(cfg.langCol).isin(cfg.keepLangs.map(x => x: Any): _*))
    // 2. exact dedup: digest-keyed min-id survivor (q35's operator —
    // the shuffle carries 32-byte digests, never text)
    val exact = graft.operators.Dedup.dedupExact(quality, cfg.textCol, cfg.idCol)
    // 3. near-dup greedy drop: exact Jaccard pairs over whitespace
    // token sets (q36's adaptive plan; the LSH path swaps in above
    // fixture scale with the same output contract) + q76's retention
    val withToks = exact.select(col(cfg.idCol).as("doc_id"),
      array_distinct(col("__toks")).as("toks"))
    val pairs =
      if (cfg.useLsh) ApproxOps.minhashNearDupPairs(withToks,
        cfg.nearDupThreshold, sorted = false)
      else LlmOps.neardupPairs(withToks, cfg.nearDupThreshold,
        sorted = false)
    // eager cut: `retained` (and its pair anti-join) feeds FOUR
    // downstream consumers (eval grams, train grams, decon, and —
    // through the mixture — the split/pack tail); without the cut each
    // re-evaluates the pair generation (r10 sweep finding)
    val retained = graft.Hygiene.eagerCut(graft.operators.Dedup
      .greedyRetain(exact, pairs, cfg.idCol)
      .withColumn("__h",
        graft.functions.RollingHash.rollingHash(col(cfg.textCol), 64) % 100))
    // 4. decontaminate (q68's rule): every remaining doc sharing ≥1
    // distinct word trigram with ANY eval doc is contaminated and
    // dropped. Internal mode (evalDocs = None, the q106 contract): the
    // h≥98 content-hash slice plays the held-out eval set and its docs
    // leave the training corpus too. External mode: the benchmark frame
    // supplies the grams and no corpus docs are h-sliced away. Eval
    // grams are benchmark-sized → broadcast; see q68Bloom for the
    // pre-prune that slots in when they are not.
    val decon = cfg.evalDocs match {
      case None =>
        val grams = retained
          .filter(size(col("__toks")) >= 3)
          .select(col(cfg.idCol).as("__gid"), col("__h"),
            explode(wordTrigrams("__toks")).as("ng"))
        val evalGrams = grams.filter(col("__h") >= 98)
          .select(col("ng")).distinct()
        val contaminated = grams.filter(col("__h") < 98)
          .join(broadcast(evalGrams), "ng")
          .select(col("__gid").as(cfg.idCol)).distinct()
        retained.filter(col("__h") < 98)
          .join(contaminated, Seq(cfg.idCol), "left_anti")
      case Some(ev) =>
        externalDecon(retained, "__toks", ev, cfg)
    }
    // 5. mixture sample: per-source quotas, smallest content hash first
    // (q103's RNG-free window)
    // cut again post-quota (the frame is now quota-bounded and cheap to
    // pin): leakageSafeSplit consumes its input three times (token
    // sets, canonical text, final join)
    val mixed = graft.Hygiene.eagerCut(
      LlmOps6.mixtureSample(decon, cfg.sourceCol, cfg.textCol,
        cfg.idCol, cfg.quotas).drop("rnk"))
    tailSplitPack(mixed.drop("__toks", "__qs", "__h"), cfg)
  }

  /** Distinct word trigrams of the token-array column `toksCol` — the
    * q68 gram rule shared by both decon modes and the delta pipeline.
    * Apply after a `size(toksCol) >= 3` filter. */
  private def wordTrigrams(toksCol: String) =
    array_distinct(expr(
      s"transform(sequence(1, size($toksCol) - 2), " +
        s"i -> concat_ws(' ', slice($toksCol, i, 3)))"))

  /** External-benchmark decontamination (VERDICT r10 task 3): drop
    * every row of `docs` (which carries the token-array `toksCol`)
    * sharing ≥1 distinct word trigram with any row of `evalDocs`
    * (needs `cfg.textCol`). Per-doc decision against a FIXED gram set —
    * the property that makes this the decon rule the incremental
    * pipeline can honor. Eval grams broadcast (benchmark-sized). */
  private[graft] def externalDecon(docs: DataFrame, toksCol: String,
      evalDocs: DataFrame, cfg: Config): DataFrame = {
    // fused WordNGrams pass: the eval side derives grams FRESH from
    // user-provided text with no checkpoint boundary in between — the
    // one gram site the r16 audit's latent-quadratic finding (inlined
    // split under an explode consumer, NOTES_r16) could still reach.
    // Bit-equal: <3-word and null-text docs yield no gram rows either
    // way (empty-array/null explode == the old size filter).
    val evalGrams = evalDocs
      .select(explode(graft.functions.WordNGrams
        .wordNGrams(col(cfg.textCol), 3)).as("ng")).distinct()
    val contaminated = docs
      .filter(size(col(toksCol)) >= 3)
      .select(col(cfg.idCol).as("__gid"),
        explode(wordTrigrams(toksCol)).as("ng"))
      .join(broadcast(evalGrams), "ng")
      .select(col("__gid").as(cfg.idCol)).distinct()
    docs.join(contaminated, Seq(cfg.idCol), "left_anti")
  }

  /** Stages 6–7, shared with the delta pipeline (which re-materializes
    * this quota-bounded tail per increment):
    *
    * 6. leakage-safe split — the REAL component-based operator. After
    * greedy retention no two surviving docs form a ≥-threshold pair
    * (any such pair's doc_b was dropped), so every component is a
    * singleton and the assignment provably equals the per-document
    * hash rule — which is what lets the whole pipeline keep a single
    * SQL oracle while still driving the clustering machinery.
    *
    * 7. sequence packing (q64's rule, per (split, shard) so packing
    * never crosses a split boundary): contiguous fill of
    * `packBudget`-token bins in doc_id order within content-hash
    * shards — embarrassingly parallel, no global order. */
  private[graft] def tailSplitPack(mixed: DataFrame,
      cfg: Config): DataFrame = {
    val split6 = graft.Graft.leakageSafeSplit(
      mixed, cfg.idCol, cfg.textCol, cfg.nearDupThreshold).drop("label")
    split6
      .withColumn("n_tokens",
        size(split(col(cfg.textCol), " ")).cast("long"))
      .withColumn("shard",
        graft.functions.RollingHash.rollingHash(col(cfg.textCol), 64)
          % cfg.packShards)
      .withColumn("bin",
        expr(s"(sum(n_tokens) over (partition by split, shard " +
          s"order by ${cfg.idCol} rows between unbounded preceding and " +
          s"current row) - 1) div ${cfg.packBudget}"))
      .select(col(cfg.idCol), col(cfg.sourceCol), col("n_tokens"),
        col("shard"), col("bin"), col("split"), col(cfg.langCol))
  }

  /** The shard template — `$split`/`$lang` are the partition variables
    * (alphanumeric grammar: `_` terminates a name, as in S01). */
  val ShardTemplate = "$outputDirectory/shard_$split_$lang.csv"

  /** Write an [[assemble]] result as mover-renamed CSV shards: one
    * file per (split, lang) — the hash repartition on exactly the
    * partition columns puts each group in one task, so each partition
    * directory holds ONE file and every rename target is unique (the
    * all-or-nothing collision gate passes). Payload columns, in order:
    * (id, source, n_tokens, shard, bin). */
  def writeShards(packed: DataFrame, outDir: String,
      idCol: String = "doc_id", sourceCol: String = "source",
      langCol: String = "lang"): Unit = {
    val s = packed.sparkSession
    MoveFilesCommitProtocol.register(s)
    packed
      .select(col(idCol), col(sourceCol), col("n_tokens"), col("shard"),
        col("bin"), col("split"), col(langCol).as("lang"))
      .repartition(col("split"), col("lang"))
      .write.mode("overwrite")
      .option(MoveFilesCommitProtocol.MOVE_FILES_OPTION, ShardTemplate)
      .partitionBy("split", "lang")
      .csv(outDir)
  }

  private val shardSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("n_tokens", LongType),
    StructField("shard", LongType),
    StructField("bin", LongType)))

  /** Q106: the full pipeline at the table's scale factor, shards
    * written through the mover, then READ BACK from the renamed files
    * (split/lang recovered from the file names the templates
    * produced — the rename is part of what the oracle verifies). */
  def q106(s: SparkSession, dir: String): DataFrame = {
    val out = graft.RunTmp.dir("q106")
    writeShards(assemble(Tables(s, dir, "documents")), out)
    q106Backread(s, out)
  }

  /** Read mover-renamed shards back, recovering split/lang from the
    * file names the templates produced. */
  private[graft] def q106Backread(s: SparkSession, out: String): DataFrame = {
    import s.implicits._
    // pathGlobFilter over the DIRECTORY, not a glob in the path: a glob
    // path makes FileStreamSink.hasMetadata probe the glob as a literal
    // dir and log a FileNotFoundException WARN per run (VERDICT r10 nit)
    s.read.schema(shardSchema).option("pathGlobFilter", "shard_*.csv")
      .csv(out)
      .withColumn("split", regexp_extract(input_file_name(),
        "shard_([a-z]+)_([a-z]+)\\.csv", 1))
      .withColumn("lang", regexp_extract(input_file_name(),
        "shard_([a-z]+)_([a-z]+)\\.csv", 2))
      .orderBy($"doc_id")
  }

  val q106Sql: String =
    """WITH base AS (
      |  SELECT doc_id, text, lang, source, string_split(text, ' ') AS toks,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(generate_series(1, least(len(text), 64)),
      |                       i -> CAST(ascii(text[i]) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) AS rh
      |  FROM documents WHERE text IS NOT NULL),
      |quality AS (
      |  SELECT *, CAST((4000 * len(list_distinct(toks)) + 3000 *
      |      len(list_filter(toks, t -> t IN ('the','a','data','value','table'))))
      |      // len(toks) + 30 * least(len(toks), 100) AS BIGINT) AS qs
      |  FROM base),
      |kept AS (
      |  SELECT * FROM quality
      |  WHERE qs >= 4000 AND lang IN ('en','de','fr')),
      |exact AS (
      |  SELECT * FROM kept
      |  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1),
      |ts AS (SELECT doc_id, list_distinct(toks) AS t FROM exact),
      |tk AS (SELECT doc_id, len(t) AS n, unnest(t) AS tok FROM ts
      |       WHERE len(t) > 0),
      |pairs AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db
      |  FROM tk a JOIN tk b ON a.tok = b.tok AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id, a.n, b.n
      |  HAVING CAST(COUNT(*) AS DOUBLE) / (a.n + b.n - COUNT(*)) >= 0.7),
      |retained AS (
      |  SELECT *, rh % 100 AS h FROM exact
      |  WHERE doc_id NOT IN (SELECT db FROM pairs)),
      |grams AS (
      |  SELECT doc_id, h, unnest(list_distinct(list_transform(
      |      generate_series(1, len(toks) - 2),
      |      i -> list_aggregate(toks[i:i+2], 'string_agg', ' ')))) AS ng
      |  FROM retained WHERE len(toks) >= 3),
      |contam AS (
      |  SELECT DISTINCT t.doc_id FROM grams t JOIN grams e
      |  ON t.ng = e.ng AND t.h < 98 AND e.h >= 98),
      |decon AS (
      |  SELECT * FROM retained WHERE h < 98
      |  AND doc_id NOT IN (SELECT doc_id FROM contam)),
      |mix AS (
      |  SELECT * FROM (
      |    SELECT *, CASE source WHEN 'src0' THEN 10 WHEN 'src2' THEN 12
      |        WHEN 'src4' THEN 6 WHEN 'src6' THEN 10 WHEN 'src8' THEN 4
      |        WHEN 'src10' THEN 12 WHEN 'src12' THEN 8 WHEN 'src14' THEN 10
      |        ELSE 0 END AS quota,
      |      ROW_NUMBER() OVER (PARTITION BY source
      |                         ORDER BY rh NULLS LAST, doc_id) AS rnk
      |    FROM decon)
      |  WHERE quota > 0 AND rnk <= quota),
      |sp AS (
      |  SELECT *,
      |    CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'valid'
      |         ELSE 'test' END AS split,
      |    rh % 8 AS shard,
      |    CAST(len(toks) AS BIGINT) AS n_tokens
      |  FROM mix)
      |SELECT doc_id, source, n_tokens, shard,
      |  CAST((SUM(n_tokens) OVER (PARTITION BY split, shard ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) // 512
      |    AS BIGINT) AS bin,
      |  split, lang
      |FROM sp ORDER BY doc_id""".stripMargin
}
