package graft.queries

import graft.Tables
import graft.functions.{CosineSimilarity, SumOfProducts}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extension-API surface (SURVEY.md §2.C.11): three queries re-expressed
  * through the engine's extension points. Each hash-matches the oracle of
  * its builtin twin — that equality IS the test.
  */
object Extensions {

  /** Q37 twin: cosine top-k through the custom codegen Expression
    * (registered in the session function registry) instead of HOFs. */
  def q37Expr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CosineSimilarity.register(s)
    val emb = Tables(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val q = emb.filter($"vec_id".isin(0, 1, 2))
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val scored = emb.join(broadcast(q), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        // Expression stays IEEE-pure; the query maps NaN to NULL so
        // ill-formed vectors never rank (r9 contract, cosineGuard)
        round(LlmOps.cosineGuard(
          CosineSimilarity.cosineSim($"qv", $"v")), 6).as("score"))
    LlmOps.topKByScore(scored, 10)
  }

  /** Q37 twin #2: plain Scala `udf()` reference version — the slowest
    * tier of the extension ladder (SURVEY §7.3: builtin HOFs → codegen
    * Expression → udf): every row deserializes both arrays into JVM
    * objects. Exists to prove all three tiers agree bit-for-bit; the
    * loop is the same sequential reduction. */
  def q37Udf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // boxed element type + null returns: the r9 ill-formed-vector
    // contract (null/NaN/zero-norm → NULL score, never an NPE'd job —
    // the primitive-Seq form NPE'd on the first null embedding)
    val cosUdf = udf { (a: Seq[java.lang.Double], b: Seq[java.lang.Double]) =>
      if (a == null || b == null || a.contains(null) || b.contains(null)) {
        null.asInstanceOf[java.lang.Double]
      } else {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) {
          dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        val r = dot / (math.sqrt(na) * math.sqrt(nb))
        if (r.isNaN) null else java.lang.Double.valueOf(r)
      }
    }
    val emb = Tables(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val q = emb.filter($"vec_id".isin(0, 1, 2))
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val scored = emb.join(broadcast(q), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        round(cosUdf($"qv", $"v"), 6).as("score"))
    LlmOps.topKByScore(scored, 10)
  }

  /** Q43 twin: document fingerprint through the codegen RollingHash
    * Expression instead of the nested-HOF formulation. */
  def q43HashExpr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", $"n_chars",
        graft.functions.RollingHash.rollingHash($"text", 64).as("fingerprint"))
      .orderBy($"doc_id")
  }

  /** Q13 twin through the SQL-string API: temp views + `spark.sql`,
    * proving the engine's surface is reachable from pure SQL exactly as
    * from the DataFrame DSL (same Catalyst plan underneath). */
  def q13Sql(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))) / COUNT(*), 4) AS DOUBLE) AS avg_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) / COUNT(*), 4) AS DOUBLE) AS avg_price,
        |  CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,4))) / COUNT(*), 4) AS DOUBLE) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** Q13 twin: the sum-of-products revenue column computed by the typed
    * Aggregator (exact decimal buffer) instead of builtin sum. */
  def q13Aggregator(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sumProducts = udaf(SumOfProducts)
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(round(sumProducts($"l_extendedprice", $"l_discount"), 2)
        .cast("double").as("sum_disc_price"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  val q13AggregatorSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q22 twin: top-3 per group through the custom TopKPerGroup
    * logical/physical operator (bounded per-group heaps + partial
    * pre-shuffle pass) instead of the window formulation. */
  def q22TopKPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables(s, dir, "orders")
      .select($"o_orderstatus", $"o_orderkey", $"o_totalprice")
    graft.plans.GraftOps.topKPerGroup(orders, 3,
      Seq("o_orderstatus"),
      Seq(graft.plans.GraftOps.Order("o_totalprice", desc = true),
        graft.plans.GraftOps.Order("o_orderkey")), rankName = "rn")
      .select($"o_orderstatus", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderstatus", $"rn")
  }

  /** Q49 twin through the Arrow-batched interop surface
    * (graft.multimodal.ArrowInterop): documents travel as serialized
    * Arrow record batches through a columnar worker — the
    * mapInPandas/mapInArrow execution shape with the Python process
    * replaced by an in-JVM Arrow worker. Hash-matches the q49 digest
    * oracle, proving the batch round-trip is lossless. */
  def q49Arrow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
    val tz = s.conf.get("spark.sql.session.timeZone")
    graft.multimodal.ArrowInterop.mapInArrowBatches(
        media, graft.multimodal.ArrowInterop.DigestSchema, 128)(
        graft.multimodal.ArrowInterop.digestWorker(media.schema, tz))
      .orderBy($"doc_id")
  }
  val q49ArrowSql: String =
    """SELECT doc_id, octet_length(encode(text)) AS byte_len, sha256(text) AS digest
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Q38 twin: tokenizer as a typed flatMap (UDTF-style one-row→many)
    * instead of explode(split(...)). */
  def q38FlatMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = Tables(s, dir, "documents")
      .select($"lang", $"text").as[(String, String)]
      // limit -1: keep trailing empty tokens, matching Spark's split()
      // and the DuckDB oracle (Scala's default drops them)
      // null text contributes no tokens — the explode(split(...))
      // twin's semantics; without the guard the typed path NPEs on the
      // first null document (adversarial-harness finding)
      .flatMap { case (lang, text) =>
        if (text == null) Iterator.empty
        else text.split(" ", -1).iterator.map(t => (lang, t)) }
      .toDF("lang", "token")
    val counts = tok.groupBy($"lang", $"token").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy($"lang")
      .agg(sum($"n").as("total_tokens"), count(lit(1)).as("distinct_tokens"))
    val w = Window.partitionBy($"lang").orderBy($"n".desc, $"token")
    counts.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
      .join(totals, "lang")
      .select($"lang", $"rnk", $"token", $"n", $"total_tokens", $"distinct_tokens")
      .orderBy($"lang", $"rnk")
  }

  // ---- x58: Count-Min heavy hitters ----------------------------------
  // The third mergeable sketch next to x15 (HLL) and x53 (percentile):
  // a seeded Count-Min sketch over l_partkey — one map-side-combined
  // agg whose binary state merges by counter addition, so per-shard
  // sketches compose exactly (asserted in IncrementalSpec) — probed
  // for the exact top-10 keys. CMS guarantees est ≥ true and
  // est ≤ true + ε·N with ε = 1e-4 here; both bounds spec-asserted.
  // Collecting the sketch (one row) and the k probe keys is bounded
  // driver work, not data-sized. No oracle (sketch internals aren't
  // SQL-portable); rows-only + spec.
  def q58Cms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
    val bytes = li.agg(
      expr("count_min_sketch(l_partkey, CAST(0.0001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val top = li.groupBy($"l_partkey").agg(count(lit(1)).as("exact_n"))
      .orderBy($"exact_n".desc, $"l_partkey").limit(10).collect()
      .map(r => (r.getLong(0), r.getLong(1), cms.estimateCount(r.getLong(0))))
    s.createDataFrame(top.toSeq).toDF("l_partkey", "exact_n", "est_n")
      .orderBy($"l_partkey")
  }
}
