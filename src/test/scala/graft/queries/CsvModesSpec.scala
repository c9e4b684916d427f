package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Ingestion robustness: CSV parse modes. At 100 TB some rows WILL be
  * garbage; the engine must offer drop / quarantine / fail policies. */
class CsvModesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("v", DoubleType),
    StructField("_corrupt_record", StringType)))

  private def writeCsv(): String = {
    val dir = java.nio.file.Files.createTempDirectory("csvmodes").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.csv"),
      "1,1.5\n2,not_a_number\n3,3.5\nbroken\n4,4.5\n")
    dir
  }

  test("PERMISSIVE quarantines malformed rows into _corrupt_record") {
    val dir = writeCsv()
    val df = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(dir)
    val rows = df.collect()
    assert(rows.length == 5)
    val corrupt = rows.filter(!_.isNullAt(2)).map(_.getString(2))
    assert(corrupt.toSet == Set("2,not_a_number", "broken"))
    assert(rows.filter(_.isNullAt(2)).map(_.getInt(0)).toSet == Set(1, 3, 4))
  }

  test("DROPMALFORMED keeps only clean rows") {
    val dir = writeCsv()
    val df = spark.read
      .schema(StructType(schema.fields.take(2)))
      .option("mode", "DROPMALFORMED").csv(dir)
    assert(df.collect().map(_.getInt(0)).toSet == Set(1, 3, 4))
  }

  test("FAILFAST aborts on the first malformed row") {
    val dir = writeCsv()
    val e = intercept[Exception] {
      spark.read.schema(StructType(schema.fields.take(2)))
        .option("mode", "FAILFAST").csv(dir).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null))
  }
}
