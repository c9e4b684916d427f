package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Randomized oracle test for the general LOCF resample: random sparse
  * observation sets vs an independent in-memory reference fold. Pins
  * the grid bounds (global min..max over ALL keys), latest-in-cell by
  * raw timestamp, forward fill, and NULL-before-first semantics. */
class ResampleProps extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val HourMs = 3600L * 1000L
  private val T0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime

  private def reference(obs: Seq[(String, Long, Double)])
      : Map[(String, Long), Option[Double]] = {
    val hours = obs.map(_._2 / HourMs)
    val (mn, mx) = (hours.min, hours.max)
    val keys = obs.map(_._1).distinct
    val latestInCell = obs.groupBy(o => (o._1, o._2 / HourMs))
      .map { case (cell, os) => cell -> os.maxBy(_._2)._3 }
    (for (k <- keys) yield {
      var cur: Option[Double] = None
      (mn to mx).map { h =>
        cur = latestInCell.get((k, h)).map(Some(_)).getOrElse(cur)
        (k, h) -> cur
      }
    }).flatten.toMap
  }

  test("resampleLocf == reference fold on 25 random instances") {
    import spark.implicits._
    for (trial <- 0 until 25) {
      val rng = new scala.util.Random(500 + trial)
      val keys = (0 until 1 + rng.nextInt(3)).map(i => s"k$i")
      val span = 1 + rng.nextInt(48) // hours
      val obs = (0 until 1 + rng.nextInt(40)).map { _ =>
        (keys(rng.nextInt(keys.size)),
          T0 + rng.nextInt(span * 3600) * 1000L, // second granularity
          rng.nextInt(1000).toDouble)
      }.distinctBy(o => (o._1, o._2)) // same-instant ties would make
        // latest-in-cell value-nondeterministic on BOTH engines
      val want = reference(obs)
      val df = obs.map { case (k, ms, v) => (k, new Timestamp(ms), v) }
        .toDF("k", "ts", "v")
      val got = Resample.resampleLocf(df, "k", "ts", "v").collect()
        .map { r =>
          (r.getAs[String]("k"), r.getAs[Timestamp]("ts").getTime / HourMs) ->
            Option(r.getAs[java.lang.Double]("v")).map(_.toDouble)
        }.toMap
      assert(got == want, s"trial $trial: ${obs.take(5)}…")
    }
  }
}
