package graft.queries

import graft.Tables
import graft.operators.{Compaction, Dedup, NearDupSignatureStore}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The INCREMENTAL corpus pipeline (VERDICT r10 task 1) — the shape a
  * 100 TB training-data pipeline actually runs daily: yesterday's
  * corpus is never re-read; today's increment flows through the same
  * stage contract as the batch [[CorpusPipeline.assemble]], with every
  * corpus-scale stage replaced by its delta-vs-state form:
  *
  *   - exact dedup      → delta anti-joined against a persisted DIGEST
  *     ledger (the corpus side is scanned with a broadcast semi-join,
  *     never shuffled);
  *   - near-dup pairs   → [[NearDupSignatureStore.probe]] (partition-
  *     and discovery-pruned scan ⋈ broadcast delta signatures), then
  *     `append` folds the increment into the store;
  *   - decontamination  → the same per-doc external-benchmark rule
  *     ([[CorpusPipeline.externalDecon]]), delta rows only;
  *   - mixture quotas   → a persisted per-source TOP-QUOTA state
  *     (≤ Σ quotas rows — top-k under a fixed total order is
  *     incrementally maintainable from the top-k alone: a row outside
  *     it is dominated forever);
  *   - split + packing  → re-materialized over the refreshed mixed set
  *     each increment. This tail is QUOTA-BOUNDED, so rewriting it
  *     daily is O(Σ quotas), not O(corpus) — the expensive stages
  *     above are the delta-only ones.
  *
  * The returned frame is the refreshed FULL pipeline output, equal —
  * row for row — to running the batch pipeline on the union of every
  * increment so far (asserted across a 3-increment chain in
  * CorpusPipelineDeltaSpec, and hash-gated against the batch DuckDB
  * oracle as q107).
  *
  * Preconditions the equality leans on (each enforced or documented):
  *
  *   - `idCol` strictly increases across increments (checked against
  *     the persisted max id; throws). Batch exact-dedup and greedy
  *     retention both keep the MIN id, so "first arrival survives"
  *     only coincides with the batch answer when arrival order is id
  *     order — the natural shape for ingest sequence numbers.
  *   - Decontamination must be against an EXTERNAL benchmark
  *     (`cfg.evalDocs` required; throws otherwise): the internal h≥98
  *     self-slice GROWS with the corpus, so a future increment's eval
  *     doc could retroactively contaminate already-emitted output — no
  *     append-only pipeline can honor that rule.
  *   - Near-dup recall is the store's banding recall (threshold-derived
  *     bands + exact verify — recall 1.0 at every measured density;
  *     the batch twin's exact mode is `useLsh = false`). The spec
  *     asserts chain == batch on fixtures where banding provably finds
  *     every pair, same regime as the q106 LSH-mode equality.
  *   - Increments are applied EXACTLY ONCE: state writes are not
  *     transactional across the four artifacts (store, digests, mix,
  *     meta), so a mid-increment crash needs the increment re-run into
  *     a FRESH state rebuilt from the increments' union — same class
  *     as the store's own documented probe-then-append ordering.
  *
  * State layout under `stateDir`:
  *   `store/`   — [[NearDupSignatureStore]] over every exact-survivor
  *                token set seen (retained or near-dup-dropped: batch
  *                pairs are generated over ALL exact survivors);
  *   `digests/` — append-only parquet ledger of distinct SHA-256 text
  *                digests (32 bytes/doc — the q35 shuffle-key rule);
  *   `mix/`     — the per-source top-quota survivors
  *                (idCol, sourceCol, langCol, textCol; ≤ Σ quotas
  *                rows), swapped atomically per increment;
  *   `meta/`    — one row: the max id applied so far. */
object CorpusPipelineDelta {
  import CorpusPipeline.Config

  private def storeDir(stateDir: String) = s"$stateDir/store"
  private def digestsDir(stateDir: String) = s"$stateDir/digests"
  private def mixDir(stateDir: String) = s"$stateDir/mix"
  private def metaDir(stateDir: String) = s"$stateDir/meta"

  private def fsOf(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def readMaxId(s: SparkSession, stateDir: String): Option[Long] = {
    val p = metaDir(stateDir)
    if (!fsOf(s, p).exists(new Path(p))) None
    else Some(s.read.parquet(p).collect().head.getLong(0))
  }

  /** Apply one increment to the pipeline state at `stateDir` and return
    * the refreshed full output ([[foldIncrement]] + [[refreshOutput]]).
    * Same schema as [[CorpusPipeline.assemble]]: idCol, sourceCol,
    * n_tokens, shard, bin, split, langCol — unordered. */
  def applyIncrement(delta: DataFrame, stateDir: String,
      cfg: Config = Config(), storeCells: Int = 64): DataFrame = {
    foldIncrement(delta, stateDir, cfg, storeCells)
    refreshOutput(delta.sparkSession, stateDir, cfg)
  }

  /** Fold one increment into the pipeline state WITHOUT re-materializing
    * the output — the cheap daily shape when shards are only published
    * on a slower cadence: fold increments as they arrive, call
    * [[refreshOutput]] (or [[applyIncrement]] on the last fold) when the
    * refreshed corpus is actually wanted. State after a fold is
    * identical to [[applyIncrement]]'s. `storeCells` sizes the signature
    * store's partition grain at first-increment build time (raise with
    * corpus size; see [[NearDupSignatureStore.build]]). */
  def foldIncrement(delta: DataFrame, stateDir: String,
      cfg: Config = Config(), storeCells: Int = 64): Unit = {
    val s = delta.sparkSession
    import s.implicits._
    val evalDocs = cfg.evalDocs.getOrElse(throw new IllegalArgumentException(
      "corpusPipelineDelta needs cfg.evalDocs (an EXTERNAL benchmark " +
        "table): the internal h-slice decon rule grows with the corpus " +
        "and cannot be honored append-only — see CorpusPipelineDelta " +
        "scaladoc"))
    if (cfg.preflight)
      graft.operators.DomainCheck.requireClean(delta,
        Seq(graft.operators.DomainCheck.UniqueKey(cfg.idCol)))
    val fs = fsOf(s, stateDir)
    // single-writer exclusion over the WHOLE state (digests/mix/meta
    // are not individually leased like the store is): two concurrent
    // folds would interleave their ledger appends and quota swaps into
    // a state neither computed. Same lease mechanics as the store's
    // maintenance surface; nests fine with the store's own lease (a
    // different file, beside `stateDir` vs beside `stateDir/store`).
    graft.operators.MaintenanceLease.withLease(s, stateDir, "fold") {

    // 0. id-ordering precondition: one delta-scale agg (driver scalar)
    val bounds = delta.agg(min(col(cfg.idCol)).as("lo"),
      max(col(cfg.idCol)).as("hi")).collect().head
    val prevMax = readMaxId(s, stateDir)
    if (!bounds.isNullAt(0))
      prevMax.filter(_ >= bounds.getLong(0)).foreach(m =>
        throw new IllegalArgumentException(
          s"increment ids must be strictly greater than every id " +
            s"already applied (state max $m, increment min " +
            s"${bounds.getLong(0)}): batch equality leans on min-id " +
            "survivors coinciding with first arrival"))

    // 1. quality + language gate — the batch stage verbatim
    val quality = delta
      .withColumn("__toks", split(col(cfg.textCol), " "))
      .withColumn("__qs", LlmOps2.qualityScore("__toks"))
      .filter(col("__qs") >= cfg.minQuality &&
        col(cfg.langCol).isin(cfg.keepLangs.map(x => x: Any): _*))

    // 2. exact dedup: within-delta min-id per digest (the q35 rule),
    // then cross-increment anti-join against the digest ledger. The
    // ledger side is corpus-sized and must never shuffle: probe it with
    // a BROADCAST semi-join on the delta's digests, then anti-join the
    // (delta-bounded) hit set back — two broadcast joins, zero corpus
    // shuffle.
    val withDigest = quality.withColumn("__digest",
      coalesce(sha2(col(cfg.textCol), 256), lit("")))
    val keep = withDigest.groupBy(col("__digest"))
      .agg(min(col(cfg.idCol)).as(cfg.idCol))
    val within = withDigest.join(keep, Seq("__digest", cfg.idCol))
    val dPath = digestsDir(stateDir)
    val exactNew0 =
      if (!fs.exists(new Path(dPath))) within
      else {
        // materialized unconditionally (NOT via the audit-switchable
        // eagerCut): step 7 APPENDS to the ledger this scan reads, and
        // the append's plan must never still reference the path
        val hits = s.read.parquet(dPath)
          .join(broadcast(within.select(col("__digest")).distinct()),
            "__digest")
          .select(col("__digest")).distinct()
          .localCheckpoint(eager = true)
        within.join(broadcast(hits), Seq("__digest"), "left_anti")
      }
    // consumed by four stages (store ops, retention, decon, digest
    // append) — cut once, like the batch pipeline's `retained`
    val exactNew = graft.Hygiene.eagerCut(exactNew0)

    // 3. near-dup pairs via the signature store. GENESIS (no store
    // yet — typically the big day-0 corpus): within-increment pairs
    // come from the INLINE banded operator (q47's broadcast-free
    // self-join plan — the probe instead BROADCASTS its delta
    // signatures, a shape sized for daily increments, not a 100 TB
    // day 0), then the store is built from the same survivors. Later
    // increments run the fused probe+append: pairs against the
    // strictly pre-increment store + within-delta, with the increment
    // signed ONCE (the separate probe/append calls each ran the
    // signature job); the relaxed crash window the fusion trades away
    // is covered by this pipeline's exactly-once contract (scaladoc
    // above). Identical pair sets either way — same threshold-derived
    // banding, probe == inline spec'd on the store.
    val withToks = exactNew.select(col(cfg.idCol).as("doc_id"),
      array_distinct(col("__toks")).as("toks"))
    val stPath = storeDir(stateDir)
    val pairs =
      if (!NearDupSignatureStore.exists(s, stPath)) {
        if (withToks.isEmpty)
          Seq.empty[(Long, Long, Double)].toDF("doc_a", "doc_b", "jaccard")
        else {
          val p = ApproxOps.minhashNearDupPairs(withToks,
            cfg.nearDupThreshold, sorted = false)
          NearDupSignatureStore.build(withToks, stPath,
            cfg.nearDupThreshold, storeCells)
          p
        }
      } else
        NearDupSignatureStore.probeThenAppend(s, stPath, withToks)

    // 4. greedy retention, delta side: ids increase, so every pair's
    // doc_b (the GREATER id) is a delta doc — exactly the batch rule
    // "drop b iff ∃ a<b with jac ≥ t" restricted to the rows it can
    // still affect. EAGER-CUT like the batch pipeline's `retained`
    // (r10 sweep rule): decon reads this twice and the mix once more,
    // and on the GENESIS path `pairs` is the lazy inline banded
    // operator — without the cut the full pair job re-runs per
    // consumer (r11 sweep finding, caught pre-commit)
    val retainedDelta = graft.Hygiene.eagerCut(
      Dedup.greedyRetain(exactNew, pairs, cfg.idCol))

    // 5. external decon — per-doc decision against the fixed benchmark
    val deconDelta = CorpusPipeline.externalDecon(retainedDelta,
      "__toks", evalDocs, cfg)

    // 6. mixture quotas: merge the delta's survivors into the persisted
    // top-quota state and re-rank (the batch operator over
    // state ∪ delta — ≤ Σ quotas + |delta| rows)
    val candCols =
      Seq(cfg.idCol, cfg.sourceCol, cfg.langCol, cfg.textCol).map(col)
    val mPath = mixDir(stateDir)
    Compaction.recoverSwap(s, mPath) // a crashed prior swap restores
    val cands =
      if (!fs.exists(new Path(mPath))) deconDelta.select(candCols: _*)
      else s.read.parquet(mPath)
        .unionByName(deconDelta.select(candCols: _*))
    val mixed = LlmOps6.mixtureSample(cands, cfg.sourceCol, cfg.textCol,
      cfg.idCol, cfg.quotas).drop("rnk")
    // persist state via write-next + atomic swap — NEVER overwrite the
    // dir the plan is reading (and a crash between the renames is loud
    // and recoverable, not silent state loss)
    val next = s"${mPath}__next"
    fs.delete(new Path(next), true)
    mixed.coalesce(1).write.mode("overwrite").parquet(next)
    if (fs.exists(new Path(mPath))) Compaction.swapDir(s, mPath, next)
    else require(fs.rename(new Path(next), new Path(mPath)),
      s"initial mix-state rename failed: $next -> $mPath")

    // 7. ledger + meta updates (delta-sized appends / one-row rewrite)
    exactNew.select(col("__digest")).distinct()
      .write.mode("append").parquet(dPath)
    if (!bounds.isNullAt(1)) {
      val newMax = math.max(bounds.getLong(1), prevMax.getOrElse(Long.MinValue))
      val metaNext = s"${metaDir(stateDir)}__next"
      fs.delete(new Path(metaNext), true)
      Seq(newMax).toDF("max_id").coalesce(1)
        .write.mode("overwrite").parquet(metaNext)
      if (fs.exists(new Path(metaDir(stateDir))))
        Compaction.swapDir(s, metaDir(stateDir), metaNext)
      else require(fs.rename(new Path(metaNext), new Path(metaDir(stateDir))),
        "initial meta rename failed")
    }
    } // fold lease
  }

  /** The quota-bounded tail (leakage-safe split + packing), materialized
    * over the CURRENT mix state — O(Σ quotas) work regardless of corpus
    * size. EAGER-CUT at return: the plan reads the mutable mix state,
    * and a later increment's swap would otherwise invalidate every
    * previously returned frame (FILE_NOT_EXIST at collect time) — the
    * output must be detached from the state it was refreshed from. */
  def refreshOutput(s: SparkSession, stateDir: String,
      cfg: Config = Config()): DataFrame =
    graft.Hygiene.eagerCut(
      CorpusPipeline.tailSplitPack(s.read.parquet(mixDir(stateDir)), cfg))

  /** Q107: the incremental-pipeline chain on the documents table, hash-
    * gated against the BATCH pipeline's DuckDB oracle on the unioned
    * corpus — external-benchmark decon included (the `doc_id % 97 = 0`
    * slice plays the benchmark suite and never enters the corpus). The
    * oracle knows nothing about the increment boundaries: it computes
    * the batch answer, which is the delta chain's declared contract.
    * Bench-honest sizing, adjudicated: the chain's wall clock is the
    * SUM of its per-increment pipeline runs, and each run's floor at
    * fixture scale is ~25 small sequential jobs (probe, state writes,
    * tail), not data volume — measured stage-by-stage in NOTES_r11. So
    * q107 runs the MINIMUM chain that exercises every cross-increment
    * path (genesis fold, then probe/append against existing state with
    * quota displacement) on the EVEN-id half of the table (the
    * fixture's 41% dup density makes pair-candidate volume quadratic
    * in corpus size; the halved slice still drops 85 near-dups at
    * sf0.01). The ≥3-increment equality lives in
    * CorpusPipelineDeltaSpec, at full fixture width. */
  def q107(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    val eval = docs.filter($"doc_id" % 97 === 0)
      .select($"doc_id", $"text")
    val corpus = docs.filter($"doc_id" % 97 =!= 0 && $"doc_id" % 2 === 0)
    val cfg = Config(evalDocs = Some(eval))
    val state = graft.RunTmp.dir("q107_state")
    // repeated executions in one JVM (TimeQuery runs, Bench) must each
    // start from genesis — the chain is the thing being measured
    fsOf(s, state).delete(new Path(state), true)
    val maxId = corpus.agg(max($"doc_id")).collect().head.getLong(0)
    foldIncrement(corpus.filter($"doc_id" <= maxId / 2), state, cfg)
    applyIncrement(corpus.filter($"doc_id" > maxId / 2), state, cfg)
      .orderBy($"doc_id")
  }

  val q107Sql: String =
    """WITH base AS (
      |  SELECT doc_id, text, lang, source, string_split(text, ' ') AS toks,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(generate_series(1, least(len(text), 64)),
      |                       i -> CAST(ascii(text[i]) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) AS rh
      |  FROM documents
      |  WHERE text IS NOT NULL AND doc_id % 97 <> 0 AND doc_id % 2 = 0),
      |egrams AS (
      |  SELECT DISTINCT unnest(list_distinct(list_transform(
      |      generate_series(1, len(etoks) - 2),
      |      i -> list_aggregate(etoks[i:i+2], 'string_agg', ' ')))) AS ng
      |  FROM (SELECT string_split(text, ' ') AS etoks FROM documents
      |        WHERE doc_id % 97 = 0 AND text IS NOT NULL)
      |  WHERE len(etoks) >= 3),
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
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |      generate_series(1, len(toks) - 2),
      |      i -> list_aggregate(toks[i:i+2], 'string_agg', ' ')))) AS ng
      |  FROM retained WHERE len(toks) >= 3),
      |contam AS (
      |  SELECT DISTINCT g.doc_id FROM grams g JOIN egrams e USING (ng)),
      |decon AS (
      |  SELECT * FROM retained
      |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
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
