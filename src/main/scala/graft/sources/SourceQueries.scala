package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructType}
import graft.{QueryModule, Tables}

/** §2.10 file source/sink round-trips, driver-verified: data written
  * through the sink and read back must aggregate identically to the
  * original table (the oracle never sees the intermediate file). */
object SourceQueries extends QueryModule {

  // -------------------------------------- src_delimited_roundtrip
  /** TSV sink → source round-trip (the reference's delimited file
    * target, dataTargetSeparator='\t'), then aggregate. */
  def delimitedRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val tmp = Files.createTempDirectory("graft-tsv").toString
    Delimited.write(src, tmp, sep = "\t")
    val schema = StructType(src.schema.fields)
    Delimited.read(spark, tmp, schema, sep = "\t")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("total"))
      .orderBy("o_orderstatus")
  }

  val delimitedRoundtripSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------- src_fixedwidth_roundtrip
  /** Fixed-width (positional) format → parse round-trip, the SortCL
    * POSITION-field shape, done entirely with codegen'd substrings. */
  def fixedWidthRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val fields = Seq(
      Delimited.FixedField("n_nationkey", 1, 5),
      Delimited.FixedField("n_name", 6, 20),
      Delimited.FixedField("n_regionkey", 26, 5))
    val lines = Delimited.formatFixedWidth(
      Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey"),
      fields)
    Delimited.parseFixedWidth(lines, fields)
      .select(col("n_nationkey").cast("int").as("n_nationkey"),
        col("n_name"),
        col("n_regionkey").cast("int").as("n_regionkey"))
      .orderBy("n_nationkey")
  }

  val fixedWidthRoundtripSql: String =
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_delimited_roundtrip" -> (delimitedRoundtrip _),
    "src_fixedwidth_roundtrip" -> (fixedWidthRoundtrip _))

  val oracles: Map[String, String] = Map(
    "src_delimited_roundtrip" -> delimitedRoundtripSql,
    "src_fixedwidth_roundtrip" -> fixedWidthRoundtripSql)
}
