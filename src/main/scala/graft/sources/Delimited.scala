package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File sources/sinks with the reference's surface: delimited records
  * with a configurable separator and fixed-width (positional) records.
  *
  * The reference routes change streams to separator-delimited file
  * targets (`dataTargetSeparator`, default tab — reference:
  * /root/reference/src/main/java/Main.java:118-124) and its script
  * fields carry POSITION/SEPARATOR attributes (SclScript.java). Here
  * both shapes are Spark readers/writers: delimited = the csv source
  * with options; fixed-width = a substring-projection over text lines
  * (codegen'd, no custom InputFormat needed).
  */
object Delimited {

  /** Read a separator-delimited file with an explicit schema. */
  def read(spark: SparkSession, path: String, schema: StructType,
      sep: String = "\t", header: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("sep", sep).option("header", header.toString)
      .csv(path)

  /** Write a frame as a separator-delimited target (the reference's
    * file-target shape). */
  def write(df: DataFrame, path: String, sep: String = "\t",
      header: Boolean = false): Unit =
    df.write.mode("overwrite")
      .option("sep", sep).option("header", header.toString)
      .csv(path)

  /** Fixed-width column spec: (name, startPosition1Based, width). */
  final case class FixedField(name: String, start: Int, width: Int)

  /** Parse fixed-width text lines (column `value`) into typed columns —
    * the positional-field shape of the reference's script fields. */
  def parseFixedWidth(lines: DataFrame, fields: Seq[FixedField]): DataFrame =
    lines.select(fields.map(f =>
      trim(substring(col("value"), f.start, f.width)).as(f.name)): _*)

  /** Format a frame into fixed-width lines (inverse of
    * [[parseFixedWidth]]; values padded/truncated to width). */
  def formatFixedWidth(df: DataFrame, fields: Seq[FixedField]): DataFrame =
    df.select(concat(fields.map(f =>
      rpad(coalesce(col(f.name).cast("string"), lit("")), f.width, " ")): _*)
      .as("value"))
}
