package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics by VALUE-HISTOGRAM selection — the
  * scale-safe alternative to ranking every row: pass 1 is a map-side-
  * combining (group, value) count, pass 2 locates the k-th ranks
  * inside the cumulative histogram, so windows only ever see the
  * aggregated histogram (|groups| × |distinct values| rows), never
  * the raw data. Exact for bounded value domains; a high-cardinality
  * value column takes a value-bucketing pre-pass and resolves the
  * k-th element within its bucket (same two-pass idea).
  *
  * Shared by `Relational.q27` and `CorpusPipeline.datasetCard` — one
  * implementation of the selection arithmetic, two verified callers.
  */
object OrderStats {

  /** Cumulative value histogram of `valueCol` per `groupCols`: one row
    * per (group, value) carrying `c` (the value's multiplicity),
    * `lo`/`hi` (the inclusive rank range its duplicates occupy) and
    * `n` (the group size). Every exact order statistic is then an
    * aggregate over rank-membership predicates ([[holdsRank]]). */
  def cumulativeHistogram(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("c"))
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    hist
      .withColumn("hi", sum(col("c")).over(byGroup.orderBy(valueCol)))
      .withColumn("lo", col("hi") - col("c") + 1L)
      .withColumn("n", max(col("hi")).over(byGroup))
  }

  /** Does this histogram row's rank range cover rank `k`? The selected
    * VALUE is tie-invariant: a row covers the whole [lo, hi] span of
    * its duplicates. */
  def holdsRank(k: Column): Column = col("lo") <= k && k <= col("hi")

  // Spark's `/` is true division even on longs — `div` floors.
  // midRank1 == midRank2 for odd n; for even n they bracket the
  // middle, so avg over the matching row(s) is the textbook median.
  def midRank1: Column = expr("(n + 1) div 2")
  def midRank2: Column = expr("(n + 2) div 2")
  def rank90: Column = ceil(col("n").cast("double") * 0.9)
}
