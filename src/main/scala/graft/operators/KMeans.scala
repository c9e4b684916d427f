package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic spherical k-means (Lloyd's) for IVF coarse quantizers.
  *
  * The fit follows the shape every large-scale IVF build uses: the
  * quantizer is trained on a BOUNDED sample (coarse centroids describe
  * the broad geometry — a config-sized sample pins them as well as the
  * full data does), and only the final nearest-centroid ASSIGNMENT runs
  * over the full distributed frame (in the callers, q45/q48). The
  * sample is collected to the driver and trained locally: c, d, and
  * `sampleCap` are all configuration, so nothing here grows with the
  * data — and a local fit replaces ~c + iters sequential Spark jobs
  * with one top-k collect.
  *
  * Every source of nondeterminism in the textbook algorithm is removed
  * so the same input yields the same centroids on any cluster layout:
  *
  *  - the sample is the `sampleCap` lowest rows of a deterministic
  *    multiplicative-hash pseudo-shuffle of the ids (no RNG, unbiased
  *    w.r.t. id order, and a `TakeOrderedAndProject` — never a full
  *    sort — at any scale);
  *  - init is farthest-first traversal (Gonzalez): the lowest-id sample
  *    vector, then repeatedly the sample vector angularly farthest from
  *    every chosen seed, ties by id — unlike "first c ids" it cannot
  *    put all seeds inside one cluster when ids correlate with
  *    geometry;
  *  - assignment uses argmax cosine with a total tie order (sim desc,
  *    cent_id asc); iteration count is fixed, means accumulate in id
  *    order — single-threaded, so float sums are order-stable;
  *  - empty cells keep their previous centroid.
  */
object KMeans {

  /** Number of [[fit]] invocations in this JVM — test instrumentation
    * for "this path runs no k-means" assertions (IvfIndexSpec pins the
    * incremental append to zero refits). */
  private[graft] val fitCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Fit on a `(idCol: Long, vecCol: Array[Double])` frame; returns a
    * local `(cent_id: Long, cv: Array[Double])` frame with `cent_id` in
    * `0..c-1` (dense ids, unlike the raw seed vectors). Returns fewer
    * than `c` centroids only when the input has fewer rows than `c`. */
  def fit(emb: DataFrame, c: Int, iters: Int = 5, sampleCap: Int = 4096,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    require(c > 0, s"c must be positive, got $c")
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(sampleCap >= c, s"sampleCap $sampleCap must be >= c ($c)")
    fitCount.incrementAndGet()
    val spark = emb.sparkSession

    // deterministic pseudo-shuffled sample, id-sorted for stable sums
    val sample: Array[(Long, Array[Double])] = emb
      .select(col(idCol).cast(LongType).as("id"), col(vecCol).as("v"))
      // inner pmod first: id * 2654435761 overflows Long for ids past
      // ~3.5e9, which is a runtime ARITHMETIC_OVERFLOW under ANSI mode;
      // reducing the id mod 2^31-1 first keeps the product ≤ ~5.7e18
      .withColumn("sk",
        expr("pmod(pmod(id, 2147483647) * 2654435761, 2147483647)"))
      .orderBy(col("sk"), col("id"))
      .limit(sampleCap)
      .select(col("id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)

    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0) 0.0 else dot / d
    }

    // farthest-first seeds: each step takes the sample vector minimizing
    // its best cosine to the chosen set (angularly farthest), ties by id
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (sample.nonEmpty) {
      chosen += 0 // sample is id-sorted: index 0 is the lowest id
      val best = Array.fill(sample.length)(-2.0)
      while (chosen.size < math.min(c, sample.length)) {
        val last = sample(chosen.last)._2
        var argmin = -1; var minBest = Double.MaxValue
        var i = 0
        while (i < sample.length) {
          if (!chosen.contains(i)) {
            val s = cosine(sample(i)._2, last)
            if (s > best(i)) best(i) = s
            if (best(i) < minBest) { minBest = best(i); argmin = i }
          }
          i += 1
        }
        chosen += argmin
      }
    }
    var cents: Array[Array[Double]] = chosen.map(i => sample(i)._2.clone()).toArray

    for (_ <- 0 until iters if cents.nonEmpty) {
      val sums = Array.fill(cents.length)(new Array[Double](cents(0).length))
      val counts = new Array[Long](cents.length)
      sample.foreach { case (_, v) =>
        var bestC = 0; var bestS = -2.0
        var j = 0
        while (j < cents.length) { // tie order: sim desc, cent_id asc
          val s = cosine(v, cents(j))
          if (s > bestS) { bestS = s; bestC = j }
          j += 1
        }
        var k = 0
        while (k < v.length) { sums(bestC)(k) += v(k); k += 1 }
        counts(bestC) += 1
      }
      cents = cents.zipWithIndex.map { case (old, j) =>
        if (counts(j) == 0) old // empty cells keep their centroid
        else sums(j).map(_ / counts(j))
      }
    }

    spark.createDataFrame(
      spark.sparkContext.parallelize(
        cents.zipWithIndex.toIndexedSeq.map { case (v, i) =>
          Row(i.toLong, v.toSeq)
        }, 1),
      StructType(Seq(StructField("cent_id", LongType, nullable = false),
        StructField("cv", ArrayType(DoubleType, containsNull = false)))))
  }
}
