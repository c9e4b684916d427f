package graft.queries

import graft.Tables
import graft.functions.CosineSimilarity
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate scale-path variants of the exact similarity operators
  * (SURVEY.md §2.C.10 "scale path"). These are the plans you would run
  * at 100 TB, where the exact all-pairs formulations (Q36/Q45) and the
  * brute-force top-k (Q37) stop being feasible:
  *
  *  - Q47: MinHash+LSH banding for Jaccard near-dup — candidates only
  *    where a hash band collides, so the join volume tracks the true
  *    near-dup density instead of n².
  *  - Q48: IVF-style partitioned ANN — vectors are assigned to the
  *    nearest of C coarse centroids (one broadcast join), queries probe
  *    only `nprobe` cells; scoring volume drops by ~C/nprobe.
  *
  * Both are verified by bounded recall against their exact twins in
  * ApproxOpsSpec (SURVEY rule §2.C.0.6 — approximate operators are
  * never hash-matched).
  */
object ApproxOps {

  /** Q47 ≈: near-dup candidate pairs via MinHashLSH (seeded,
    * deterministic), exact-Jaccard-scored on the hashed feature sets. */
  def q47(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables(s, dir, "documents")
      .select($"doc_id", array_distinct(split($"text", " ")).as("toks"))
    val tf = new HashingTF().setInputCol("toks").setOutputCol("features")
      .setNumFeatures(4096).setBinary(true)
    val feat = tf.transform(d).filter(expr("size(toks) > 0"))
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(feat)
    // join threshold is looser than the 0.7 target: feature hashing can
    // nudge a borderline pair's jaccard slightly, and candidates are
    // cheap to keep — the consumer re-scores exactly anyway.
    model.approxSimilarityJoin(feat, feat, 0.35, "jaccard_dist")
      .select(col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"),
        round(lit(1.0) - col("jaccard_dist"), 6).as("jaccard"))
      .filter($"doc_a" < $"doc_b")
      .orderBy($"doc_a", $"doc_b")
  }

  /** Q48 ≈: IVF top-k ANN. Coarse centroids are the first C vectors
    * (deterministic); every vector joins its nearest centroid, queries
    * probe the `nprobe` nearest cells only. */
  def q48(s: SparkSession, dir: String, k: Int = 10, c: Int = 16,
      nprobe: Int = 4): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val cents = emb.filter($"vec_id" < c)
      .select($"vec_id".as("cent_id"), $"v".as("cv"))
    // assign every vector to its nearest centroid (broadcast join + argmax)
    val wAssign = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cent_id")
    val assigned = emb.join(broadcast(cents))
      .withColumn("sim", CosineSimilarity.cosineSim($"v", $"cv"))
      .withColumn("rn", row_number().over(wAssign))
      .filter($"rn" === 1)
      .select($"vec_id", $"v", $"cent_id")
    // queries probe their nprobe nearest cells
    val wProbe = Window.partitionBy($"query_id").orderBy($"sim".desc, $"cent_id")
    val probes = emb.filter($"vec_id".isin(0, 1, 2))
      .select($"vec_id".as("query_id"), $"v".as("qv"))
      .join(broadcast(cents))
      .withColumn("sim", CosineSimilarity.cosineSim($"qv", $"cv"))
      .withColumn("rn", row_number().over(wProbe))
      .filter($"rn" <= nprobe)
      .select($"query_id", $"qv", $"cent_id")
    // score only vectors in probed cells
    val wTop = Window.partitionBy($"query_id").orderBy($"score".desc, $"vec_id")
    probes.join(assigned, "cent_id")
      .filter($"vec_id" =!= $"query_id")
      .withColumn("score", round(CosineSimilarity.cosineSim($"qv", $"v"), 6))
      .withColumn("rnk", row_number().over(wTop))
      .filter($"rnk" <= k)
      .select($"query_id", $"rnk", $"vec_id", $"score")
      .orderBy($"query_id", $"rnk")
  }
}
