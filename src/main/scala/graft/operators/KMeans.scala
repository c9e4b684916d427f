package graft.operators

import graft.functions.CosineSimilarity
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic spherical k-means (Lloyd's) for IVF coarse quantizers.
  *
  * Every source of nondeterminism in the textbook algorithm is removed
  * so the same input produces the same centroids on any cluster layout:
  *
  *  - init is farthest-first traversal (Gonzalez): the lowest-id vector,
  *    then repeatedly the vector angularly farthest from every chosen
  *    seed, ties by id — no RNG, and unlike "first c ids" it cannot put
  *    all seeds inside one cluster when ids correlate with geometry;
  *  - assignment is argmax cosine through the bounded-heap TopKPerGroup
  *    operator with a total tie order (sim desc, cent_id asc);
  *  - per-cell means are computed from DECIMAL component sums — float
  *    addition is not associative, so a double `sum()` would make
  *    centroids depend on partition order; decimal sums are exact and
  *    therefore partition-order-free (same trick as q59's moments);
  *  - iteration count is fixed (`iters`), not a convergence test on a
  *    float tolerance.
  *
  * Scale shape: centroids are c·d values — bounded by CONFIG, not data —
  * so they round-trip through the driver each iteration (the standard
  * big-data k-means layout: broadcast centroids out, aggregate
  * per-component sums back). Each iteration is one broadcast join, one
  * partial-heap argmax, and one map-side-combined aggregation over
  * (cell, component) keys; nothing ever shuffles the vectors themselves.
  * Init costs c−1 further linear passes; at 100 TB you fit the quantizer
  * on a deterministic hash-sampled subset (pass the filtered frame in —
  * the fit is whatever-frame-you-give-it) and assign the full data once.
  * Empty cells keep their previous centroid.
  */
object KMeans {

  /** Fit on a `(idCol: Long, vecCol: Array[Double])` frame; returns a
    * local `(cent_id: Long, cv: Array[Double])` frame with `cent_id` in
    * `0..c-1` (dense ids, unlike the raw seed vectors). Returns fewer
    * than `c` centroids only when the input has fewer rows than `c`. */
  def fit(emb: DataFrame, c: Int, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    require(c > 0, s"c must be positive, got $c")
    require(iters >= 0, s"iters must be non-negative, got $iters")
    val spark = emb.sparkSession
    import spark.implicits._
    import graft.plans.GraftOps

    def centsDF(cs: Array[Array[Double]]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          cs.zipWithIndex.toIndexedSeq.map { case (v, i) =>
            Row(i.toLong, v.toSeq)
          }, 1),
        StructType(Seq(StructField("cent_id", LongType, nullable = false),
          StructField("cv", ArrayType(DoubleType, containsNull = false)))))

    // farthest-first seeds: each step picks the vector minimizing its
    // best cosine to the chosen set (i.e. angularly farthest), ties by
    // id; already-chosen ids are excluded so degenerate (e.g. collinear)
    // data still yields c distinct seed points while they exist
    val seeds = scala.collection.mutable.ArrayBuffer(
      emb.orderBy(col(idCol)).limit(1).select(col(idCol), col(vecCol))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray): _*)
    var exhausted = seeds.isEmpty
    while (!exhausted && seeds.size < c) {
      val next = emb
        .filter(!col(idCol).isin(seeds.map(_._1).toSeq: _*))
        .join(broadcast(centsDF(seeds.map(_._2).toArray)))
        .select(col(idCol).as("id"), col(vecCol).as("v"),
          CosineSimilarity.cosineSim(col(vecCol), $"cv").as("sim"))
        .groupBy($"id")
        // v is constant per id, so first() is deterministic here
        .agg(max($"sim").as("best"), first($"v").as("v"))
        .orderBy($"best".asc, $"id".asc)
        .limit(1).select($"id", $"v").collect()
      if (next.isEmpty) exhausted = true // fewer distinct rows than c
      else seeds += next.head.getLong(0) -> next.head.getSeq[Double](1).toArray
    }
    var cents: Array[Array[Double]] = seeds.map(_._2).toArray

    for (_ <- 0 until iters if cents.nonEmpty) {
      val assigned = GraftOps.topKPerGroup(
          emb.join(broadcast(centsDF(cents)))
            .select(col(idCol), col(vecCol).as("v"), $"cent_id",
              CosineSimilarity.cosineSim(col(vecCol), $"cv").as("sim")),
          1, Seq(idCol),
          Seq(GraftOps.Order("sim", desc = true),
            GraftOps.Order("cent_id")))
      // exact per-(cell, component) sums; c·d result rows by construction
      val stats = assigned
        .select($"cent_id", posexplode($"v").as(Seq("pos", "x")))
        .groupBy($"cent_id", $"pos")
        .agg(sum($"x".cast(DecimalType(38, 15))).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone()) // empty cells keep their centroid
      stats.foreach { r =>
        val mean = r.getDecimal(2).doubleValue() / r.getLong(3)
        next(r.getLong(0).toInt)(r.getInt(1)) = mean
      }
      cents = next
    }
    centsDF(cents)
  }
}
