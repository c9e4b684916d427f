package graft.queries

import org.apache.spark.sql.SparkSession
import graft.Hygiene
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of q47 (delete before shipping if unused). */
object Q47Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    for (pass <- 1 to 2) {
    println(s"[q47prof] ===== pass $pass =====")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q47prof] $name%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val P = 2147483647L
    val d = graft.Tables(spark, dir, "documents")
      .select($"doc_id", array_distinct(split($"text", " ")).as("toks"))
    val tok = d.select($"doc_id", explode($"toks").as("tok"))
    val masks = t("masks") { val m = LlmOps.tokenBitmasks(tok).get.persist(); m.count(); m }
    val groups = t("groups") { val g = masks.groupBy($"mask")
      .agg(min($"doc_id").as("rep"), sort_array(collect_list($"doc_id")).as("ids")).persist(); g.count(); g }
    val repTok = groups.select($"rep".as("doc_id")).join(tok, "doc_id")
    val tokHash = tok.select($"tok").distinct()
      .withColumn("th", expr(
        """aggregate(
           transform(sequence(1, length(tok)), i -> ascii(substring(tok, i, 1))),
           0L, (acc, x) -> (acc * 131 + x) % 2147483647)"""))
    val minhashes = t("minhashes") { val m = repTok.join(broadcast(tokHash), "tok")
      .select($"doc_id", $"th", explode(sequence(lit(0), lit(47))).as("i"))
      .withColumn("hv", expr(s"pmod(xxhash64(th, i), $P)"))
      .groupBy($"doc_id", $"i").agg(min($"hv").as("mh")).persist(); m.count(); m }
    val bands = t("bands") { val b = minhashes
      .withColumn("band", expr("i div 3"))
      .withColumn("contrib", expr(s"mh * CAST(pow(31, i % 3) AS BIGINT) % $P"))
      .groupBy($"doc_id", $"band").agg(expr(s"sum(contrib) % $P").as("sig")).persist(); b.count(); b }
    val candidates = t("candidates") { val c = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.sig" === $"y.sig" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("ra"), $"y.doc_id".as("rb")); println(s"  n=${c.count()}"); c }
    val verified = t("verify+distinct") { val v = candidates
      .join(masks.select($"doc_id".as("ra"), $"mask".as("ma")), "ra")
      .join(masks.select($"doc_id".as("rb"), $"mask".as("mb")), "rb")
      .withColumn("inter", bit_count($"ma".bitwiseAND($"mb")).cast("double"))
      .withColumn("jac", $"inter" / (bit_count($"ma") + bit_count($"mb") - $"inter"))
      .filter($"jac" >= 0.7).select($"ra", $"rb", $"jac").distinct().persist(); println(s"  n=${v.count()}"); v }
    t("expand+sort") {
      val crossGroup = verified
        .join(groups.select($"rep".as("ra"), $"ids".as("ia")), "ra")
        .join(groups.select($"rep".as("rb"), $"ids".as("ib")), "rb")
        .select(explode($"ia").as("a"), $"ib", $"jac")
        .select($"a", explode($"ib").as("b"), $"jac")
        .select(least($"a", $"b").as("doc_a"), greatest($"a", $"b").as("doc_b"), round($"jac", 6).as("jaccard"))
      val intraGroup = groups.filter(size($"ids") > 1)
        .select(explode($"ids").as("a"), $"ids")
        .select($"a", explode($"ids").as("b")).filter($"a" < $"b")
        .select($"a".as("doc_a"), $"b".as("doc_b"), lit(1.0).as("jaccard"))
      crossGroup.unionAll(intraGroup).orderBy($"doc_a", $"doc_b").count()
    }
    Hygiene.clearAll(spark)
    }
    spark.stop()
  }
}
