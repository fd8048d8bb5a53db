package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Embedding storage operators for 100 TB-scale vector corpora.
  *
  * Quantization is what makes a trillion-vector corpus storable and
  * scannable: per-vector affine int8 codes cut an fp32 embedding 4×
  * (plus two floats of scale metadata) while preserving ANN recall.
  * The op is a pure map pass — no shuffle, fully codegen-able
  * builtins — and the oracle recomputes codes bit-identically (floor
  * of identical IEEE doubles; no round(), whose half-even/half-up
  * split differs between engines).
  */
object EmbOps extends QueryModule {

  // -------------------------------------------------- emb_quantize
  /** Per-vector int8 quantization summary: the affine range, and the
    * exact integer checksum of the code vector (order-fixed fold —
    * ints are exact, so the whole code array is pinned by the oracle
    * without shipping 64 columns). A constant vector (mx == mn)
    * quantizes to all-zero codes. */
  def quantize(emb: DataFrame): DataFrame = {
    val mn = array_min(col("embedding")).cast("double")
    val mx = array_max(col("embedding")).cast("double")
    def code(x: Column): Column =
      least(floor((x.cast("double") - mn) / ((mx - mn) / 255.0)),
        lit(255.0)).cast("long")
    val codes = when(mx === mn,
        transform(col("embedding"), _ => lit(0L)))
      .otherwise(transform(col("embedding"), x => code(x)))
    emb.select(col("vec_id"), mn.as("qmin"), mx.as("qmax"),
      aggregate(codes, lit(0L), (acc, v) => acc + v).as("code_sum"))
  }

  def embQuantize(spark: SparkSession, dir: String): DataFrame =
    quantize(Tables.embeddings(spark, dir)).orderBy("vec_id")

  val embQuantizeSql: String =
    """SELECT vec_id,
      |  CAST(list_min(embedding) AS DOUBLE) AS qmin,
      |  CAST(list_max(embedding) AS DOUBLE) AS qmax,
      |  CAST(CASE WHEN CAST(list_max(embedding) AS DOUBLE) =
      |                 CAST(list_min(embedding) AS DOUBLE) THEN 0
      |    ELSE list_sum(list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(LEAST(FLOOR((x - CAST(list_min(embedding) AS DOUBLE)) /
      |        ((CAST(list_max(embedding) AS DOUBLE) -
      |          CAST(list_min(embedding) AS DOUBLE)) / 255.0)), 255.0) AS BIGINT)))
      |    END AS BIGINT) AS code_sum
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // -------------------------------------------------- sql_surface
  /** The pure-SQL user surface: the whole query is `spark.sql` TEXT
    * over a registered view, using the graft vector functions exactly
    * as a SQL-only user would after setting
    * `spark.sql.extensions=graft.expr.GraftExtensions`. Adjacent-id
    * cosine similarity, emitted as FLOOR(milli) — both engines compute
    * the same normalized doubles bit-for-bit (strict fold order), so
    * the truncation is portable. */
  def sqlSurface(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    Tables.embeddings(spark, dir).createOrReplaceTempView("graft_embeddings")
    // Degenerate vectors (zero norm, NaN/Inf components) are excluded
    // up front, mirroring Dedup.embeddingPairs: a NaN normalized dot
    // would hit Spark's non-ANSI CAST(FLOOR(NaN) AS BIGINT) = 0 while
    // DuckDB diverges. `> 0 AND < Infinity` rejects NaN in BOTH
    // engines (each orders NaN above Infinity).
    spark.sql(
      """WITH n AS (
        |  SELECT vec_id, graft_normalize(CAST(embedding AS ARRAY<DOUBLE>)) AS e
        |  FROM graft_embeddings
        |  WHERE graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                  CAST(embedding AS ARRAY<DOUBLE>)) > 0
        |    AND graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                  CAST(embedding AS ARRAY<DOUBLE>))
        |        < CAST('Infinity' AS DOUBLE))
        |SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  CAST(FLOOR(graft_dot(a.e, b.e) * 1000) AS BIGINT) AS sim_milli
        |FROM n a JOIN n b ON b.vec_id = a.vec_id + 1
        |ORDER BY id1""".stripMargin)
  }

  val sqlSurfaceSql: String =
    """WITH n AS (
      |  SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                     CAST(embedding AS DOUBLE[])))) AS e
      |  FROM embeddings
      |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                  CAST(embedding AS DOUBLE[])))
      |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0)
      |SELECT a.vec_id AS id1, b.vec_id AS id2,
      |  CAST(FLOOR(list_dot_product(a.e, b.e) * 1000) AS BIGINT) AS sim_milli
      |FROM n a JOIN n b ON b.vec_id = a.vec_id + 1
      |ORDER BY id1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_quantize" -> (embQuantize _),
    "sql_surface" -> (sqlSurface _))

  val oracles: Map[String, String] = Map(
    "emb_quantize" -> embQuantizeSql,
    "sql_surface" -> sqlSurfaceSql)
}
