package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every module's verified-query registry. Each entry has a
  * matching DuckDB oracle in [[oracleSql]] unless the operator is not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    ops.Relational,
    mask.MaskQueries,
    classify.ClassifyQueries,
    cdc.CdcQueries,
    streaming.EventStreams,
    dedup.Dedup,
    pipeline.CorpusPipeline,
    sim.Knn,
    sim.EmbOps,
    text.TextAnalysis,
    multimodal.BinaryPipeline,
    sources.SourceQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q05(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_.oracles).reduce(_ ++ _)
}

/** A module contributing verified queries + DuckDB oracles. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
