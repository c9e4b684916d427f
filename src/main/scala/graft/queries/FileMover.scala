package graft.queries

import graft.Tables
import graft.filemover.MoveFilesCommitProtocol
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S01/S02 (SURVEY.md §2.C.1): the reference's file-relocation
  * capability exercised end-to-end through the public write API, with
  * the moved files read back so the DuckDB oracle can verify content.
  */
object FileMover {

  private val dataSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType)))

  /** S01: write `nation` partitioned by `n_regionkey`, template
    * `\$outputDirectory/region_\$n_regionkey.csv`; each region lands in
    * exactly one file (repartition on the partition column), so the
    * collision gate passes and every file is renamed. The result is the
    * moved files read back, region recovered from the file name. */
  def s01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    MoveFilesCommitProtocol.register(s)
    val out = graft.RunTmp.dir("s01")
    // Template variable names are alphanumeric only (reference grammar:
    // `$n_regionkey` would parse as var `n` + literal `_regionkey`), so
    // the partition column is exposed under an underscore-free alias.
    Tables(s, dir, "nation")
      .withColumnRenamed("n_regionkey", "regionkey")
      .repartition($"regionkey")
      .write.mode("overwrite")
      .option(MoveFilesCommitProtocol.MOVE_FILES_OPTION,
        "$outputDirectory/region_$regionkey.csv")
      .partitionBy("regionkey")
      .csv(out)
    s.read.schema(dataSchema).csv(s"$out/region_*.csv")
      .withColumn("n_regionkey",
        regexp_extract(input_file_name(), "region_(\\d+)\\.csv", 1).cast("int"))
      .orderBy($"n_nationkey")
  }
  val s01Sql: String =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"

  /** S02: 5 files all mapped to ONE target → all-or-nothing collision
    * gate trips, nothing is moved, and the original directory layout is
    * read back intact. */
  def s02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    MoveFilesCommitProtocol.register(s)
    val out = graft.RunTmp.dir("s02")
    val full = StructType(dataSchema.fields :+ StructField("n_regionkey", IntegerType))
    Tables(s, dir, "nation")
      .repartition(5)
      .write.mode("overwrite")
      .option(MoveFilesCommitProtocol.MOVE_FILES_OPTION, "$outputDirectory/all.csv")
      .csv(out)
    s.read.schema(full).csv(out).orderBy($"n_nationkey")
  }
  val s02Sql: String =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"
}
