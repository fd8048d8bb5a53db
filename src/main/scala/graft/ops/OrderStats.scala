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

  /** Two-level variant of [[cumulativeHistogram]] for HIGH-cardinality
    * value domains (fine-grained amounts whose histogram approaches
    * the row count): identical (c, lo, hi, n) output, but the
    * cumulative count is decomposed so no window ever partitions by
    * the group alone. Shards are contiguous value ranges
    * (`value div shardWidth`), the running sum runs within
    * (group, shard) — parallel, bounded partitions — and shard
    * offsets come from an exclusive prefix sum over the aggregated
    * per-shard totals; `n` is a broadcast |groups|-row join, not a
    * whole-histogram max window. Requires a NON-NEGATIVE value domain
    * (truncating integer div would break shard contiguity across
    * zero). */
  def cumulativeHistogramSharded(df: DataFrame, groupCols: Seq[String],
      valueCol: String, shardWidth: Long = 1L << 20): DataFrame =
    weightedCumulativeHistogramSharded(
      df.groupBy((groupCols :+ valueCol).map(col): _*)
        .agg(count(lit(1)).as("c")),
      groupCols, valueCol, shardWidth)

  /** [[cumulativeHistogramSharded]] over a PRE-COUNTED (group, value,
    * `c`) histogram — the form a composed statistic reuses: a derived
    * histogram (e.g. MAD's |x − median| deviations) regroups an
    * existing value histogram instead of re-reading the corpus, so
    * the second selection pass costs |histogram| rows, not |rows|.
    * Values mapping to the same derived value merge their weights
    * here (the leading sum re-group). */
  def weightedCumulativeHistogramSharded(pre: DataFrame,
      groupCols: Seq[String], valueCol: String,
      shardWidth: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gCols = groupCols.map(col)
    val hist = pre.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(sum(col("c")).as("c"))
      .withColumn("_sh", expr(s"$valueCol div $shardWidth"))
    val offW = Window.partitionBy(gCols: _*).orderBy("_sh")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.groupBy((gCols :+ col("_sh")): _*)
      .agg(sum(col("c")).as("_sc"))
      .withColumn("_off", coalesce(sum(col("_sc")).over(offW), lit(0L)))
      .select(gCols :+ col("_sh") :+ col("_off"): _*)
    val totals = hist.groupBy(gCols: _*).agg(sum(col("c")).as("n"))
    val localW = Window.partitionBy(gCols :+ col("_sh"): _*)
      .orderBy(valueCol)
    hist.withColumn("_lc", sum(col("c")).over(localW))
      .join(offsets, groupCols :+ "_sh")
      .withColumn("hi", col("_off") + col("_lc"))
      .withColumn("lo", col("hi") - col("c") + 1L)
      .join(broadcast(totals), groupCols)
      .drop("_sh", "_lc", "_off")
  }

  /** Does this histogram row's rank range cover rank `k`? The selected
    * VALUE is tie-invariant: a row covers the whole [lo, hi] span of
    * its duplicates. */
  def holdsRank(k: Column): Column = col("lo") <= k && k <= col("hi")

  /** Exact median for HIGH-cardinality value domains, where the value
    * histogram itself would approach the row count: classic TWO-PASS
    * bucketed selection.
    *
    *   pass 0: per-group (n, min, max) — one tiny agg;
    *   pass 1: fixed `buckets`-way value-range histogram (map-side-
    *           combining count on (group, bucket)), cumulative counts
    *           locate which bucket holds each middle rank and the
    *           rank offset below it;
    *   pass 2: ONLY the located buckets' rows are ranked (window over
    *           (group, bucket) — partition size ≈ n/buckets, scale-
    *           tunable), rank-in-bucket + offset = global rank, and
    *           the middle values are selected exactly.
    *
    * No window ever partitions by the group alone, and no per-group
    * global sort exists. Equal values always land in the same bucket
    * (bucket is a pure function of the value), so ranks among ties
    * stay tie-invariant for the SELECTED value.
    *
    * Returns one row per group: (groupCols..., n, median_<valueCol>).
    */
  def bucketedMedian(df: DataFrame, groupCols: Seq[String],
      valueCol: String, buckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val base = df.select((groupCols.map(col) :+ v.as("_v")): _*)
    val stats = base.groupBy(g: _*).agg(
      count(lit(1)).as("n"), min(col("_v")).as("_mn"), max(col("_v")).as("_mx"))
    // constant-value groups (w == 0) collapse into bucket 0
    val w = (col("_mx") - col("_mn")) / buckets
    val bucket = when(col("_mx") === col("_mn"), lit(0L))
      .otherwise(least(floor((col("_v") - col("_mn")) / w),
        lit(buckets - 1L)).cast("long"))
    val withB = base.join(broadcast(stats), groupCols)
      .withColumn("_b", bucket)
    val hist = withB.groupBy((g :+ col("_b")): _*)
      .agg(count(lit(1)).as("_c"), max(col("n")).as("n"))
    val byG = Window.partitionBy(g: _*)
    val cum = hist
      .withColumn("hi", sum(col("_c")).over(byG.orderBy("_b")))
      .withColumn("lo", col("hi") - col("_c") + 1L)
    // buckets holding either middle rank, with the rank offset below
    val targets = cum
      .filter(holdsRank(midRank1) || holdsRank(midRank2))
      .select((g :+ col("_b") :+ (col("lo") - 1L).as("_off")): _*)
    val inBucket = withB.join(broadcast(targets), groupCols :+ "_b")
    val rankInB = Window.partitionBy((g :+ col("_b")): _*).orderBy("_v")
    inBucket
      .withColumn("_gr", row_number().over(rankInB).cast("long") + col("_off"))
      .filter(col("_gr") === midRank1 || col("_gr") === midRank2)
      .groupBy(g: _*)
      .agg(max(col("n")).as("n"),
        avg(col("_v")).as(s"median_$valueCol"))
  }

  /** Exact TYPE-1 (lower) median for NON-NEGATIVE LONG value domains
    * by fixed-width radix selection — the shape whose every shuffle is
    * bounded by the VALUE DOMAIN, never the corpus:
    *
    *   pass 1: map-side-combining count on (group, value >> shift) —
    *           at most domain/2^shift bucket rows per group reach the
    *           exchange; a plain per-group cumulative window over that
    *           bucket histogram locates the bucket holding the lower-
    *           median rank k = ⌈n/2⌉ and the rank offset below it;
    *   pass 2: ONLY the located bucket's rows re-aggregate, and they
    *           aggregate to at most 2^shift DISTINCT values per group
    *           (the bucket's value range), so the in-bucket cumulative
    *           window is domain-bounded too — even a maximally skewed
    *           corpus puts ≤ 2^shift rows in a window partition.
    *
    * Two corpus scans, zero corpus-sized exchanges: unlike the
    * full-value-histogram path ([[cumulativeHistogramSharded]]), whose
    * (group, value) exchange approaches the row count when values are
    * near-unique, both exchanges here carry histogram rows capped by
    * the domain split. That cap is what survives a 100 TB corpus.
    *
    * Returns one row per group: (groupCols..., n, median) where
    * `median` is the smallest value whose cumulative count reaches
    * ⌈n/2⌉ (the tie-invariant lower median).
    */
  def radixLowerMedian(vals: DataFrame, groupCols: Seq[String],
      valueCol: String, shift: Int = 12): DataFrame =
    radixLowerMedianWeighted(vals, groupCols, valueCol, lit(1L), shift)

  /** WEIGHTED lower median by the same radix selection: the smallest
    * value whose cumulative WEIGHT reaches ⌈W/2⌉ (row weights from
    * `weight`, e.g. a quantity column — the repeat-count reading).
    * Identical scale bounds: both exchanges carry domain-capped
    * histogram rows, weights merge map-side. `n` in the output is the
    * total weight W. */
  def radixLowerMedianWeighted(vals: DataFrame, groupCols: Seq[String],
      valueCol: String, weight: Column, shift: Int = 12): DataFrame =
    radixRankSelect(vals, groupCols, valueCol,
        Seq("median" -> midRank1), weight, shift)
      .select(groupCols.map(col) :+ col("n")
        :+ col("sel_value").as("median"): _*)

  /** The GENERAL radix selection: every named rank (an expression over
    * the group total `n`, e.g. `(n+3) div 4` for Q1) is located in the
    * same two passes — one (group, value >> shift) bucket histogram
    * shared by all ranks, then one in-bucket pass over the UNION of
    * the rank-holding buckets (a bucket holding two ranks is probed
    * once per rank via the exploded rank list — ≤ |ranks| target rows
    * per group). Returns one row per (group, rank name):
    * (groupCols..., n, sel, sel_value), where sel_value is the
    * smallest value whose cumulative weight reaches the rank. Same
    * domain-capped exchange bounds as the median special case. */
  def radixRankSelect(vals: DataFrame, groupCols: Seq[String],
      valueCol: String, ranks: Seq[(String, Column)],
      weight: Column = lit(1L), shift: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val withB = vals.withColumn("_w", weight)
      .withColumn("_b", shiftright(col(valueCol), shift))
    val bhist = withB.groupBy(g :+ col("_b"): _*)
      .agg(sum(col("_w")).as("c"))
    val byG = Window.partitionBy(g: _*)
    val rankArr = array(ranks.map { case (nm, rk) =>
      struct(lit(nm).as("nm"), rk.as("k")) }: _*)
    val target = bhist
      .withColumn("hi", sum(col("c")).over(byG.orderBy("_b")))
      .withColumn("lo", col("hi") - col("c") + 1L)
      .withColumn("n", max(col("hi")).over(byG))
      .withColumn("_r", explode(rankArr))
      .filter(col("lo") <= col("_r.k") && col("_r.k") <= col("hi"))
      .select(g :+ col("_b") :+ (col("lo") - 1L).as("_off") :+ col("n")
        :+ col("_r.nm").as("sel") :+ col("_r.k").as("_k"): _*)
    val bySel = Window.partitionBy(g :+ col("sel"): _*)
    withB.join(broadcast(target), groupCols :+ "_b")
      .groupBy(g :+ col("sel") :+ col(valueCol): _*)
      .agg(sum(col("_w")).as("c"), max(col("_off")).as("_off"),
        max(col("n")).as("n"), max(col("_k")).as("_k"))
      .withColumn("hi", col("_off") + sum(col("c")).over(
        bySel.orderBy(valueCol)))
      .withColumn("lo", col("hi") - col("c") + 1L)
      .filter(col("lo") <= col("_k") && col("_k") <= col("hi"))
      .select(g :+ col("n") :+ col("sel")
        :+ col(valueCol).as("sel_value"): _*)
  }

  /** EXACT global (or per-group) RUNNING SUM — and, with `weight =
    * 1`, the exact unique-order ROW RANK — without any
    * corpus-proportional window partition: the two-level shard-rank
    * + exclusive-prefix-offset decomposition that `pipe_global_
    * shuffle` proved against a global ROW_NUMBER oracle, extracted
    * so every caller (mask_shuffle, mask_rank_swap, q62, q63) shares
    * ONE implementation of the shape.
    *
    *   level 1: rows land in contiguous shards (`shardCols` must be
    *            a MONOTONE COARSENING of `orderCols` — every row of
    *            an earlier shard precedes every row of a later one;
    *            e.g. the exact leading order value, or a contiguous
    *            `value div width` range, optionally sub-bucketed by
    *            a later tie-break key's range); a running sum of
    *            `weight` runs within each (group, shard) partition —
    *            parallel, shard-bounded;
    *   level 2: shard offsets come from an exclusive prefix sum over
    *            the AGGREGATED per-shard totals (≤ |groups×shards|
    *            rows). With no group columns the offsets window uses
    *            the non-foldable-constant partition key idiom
    *            (`pmod(_c, 1)`) so the deliberate single partition
    *            over the tiny aggregated frame doesn't read as an
    *            unpartitioned corpus window (PlanSpec pins
    *            partitionSpec non-empty everywhere).
    *
    * `orderCols` must be a TOTAL order (include a unique tie-break):
    * the local running sum uses a ROWS frame, so with a unique order
    * `weight = lit(1L)` yields exactly `row_number()`. Output: the
    * input columns plus `out` = the inclusive running sum of
    * `weight` in global (per-group) `orderCols` order. */
  def twoLevelRunningSum(df: DataFrame, groupCols: Seq[String],
      shardCols: Seq[Column], orderCols: Seq[Column], weight: Column,
      out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shNames = shardCols.indices.map(i => s"_sh$i")
    val base = shardCols.zip(shNames).foldLeft(
      df.withColumn("_w", weight)) {
      case (d, (c, nm)) => d.withColumn(nm, c)
    }
    val keyCols = (groupCols ++ shNames).map(col)
    val counts = base.groupBy(keyCols: _*).agg(sum(col("_w")).as("_c"))
    val partCols: Seq[Column] =
      if (groupCols.isEmpty) Seq(pmod(col("_c"), lit(1)))
      else groupCols.map(col)
    val pre = Window.partitionBy(partCols: _*)
      .orderBy(shNames.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_c")).over(pre), lit(0L)))
      .select(keyCols :+ col("_off"): _*)
    val local = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    base.withColumn("_ls", sum(col("_w")).over(local))
      .join(offsets, groupCols ++ shNames)
      .withColumn(out, col("_off") + col("_ls"))
      .drop(shNames :+ "_w" :+ "_ls" :+ "_off": _*)
  }

  /** EXACT STRICT-PREFIX RUNNING MIN — the min-monoid dual of
    * [[twoLevelRunningSum]], with an EXCLUSIVE frame: for each row,
    * `out` = MIN of `value` over all rows STRICTLY preceding it in
    * (per-group) `orderCols` order, NULL when no row precedes. The
    * strict frame is what dominance-style consumers (skyline / Pareto
    * frontier: "is there an earlier-x point with y ≤ mine?") need —
    * an inclusive min would let a point dominate itself.
    *
    * Same two-level decomposition, same monotone-coarsening contract
    * on `shardCols`: level 1 is a ROWS(unboundedPreceding, -1) min
    * within each (group, shard) partition; level 2 takes per-shard
    * min aggregates and an exclusive prefix min over that
    * |groups×shards|-row frame. `least` merges the two levels
    * (null-skipping, so shard-first rows inherit the offset alone) —
    * min is associative/commutative, so the split is exact. No
    * corpus-proportional window partition anywhere; the no-group
    * offsets window uses the same pmod constant-key idiom. */
  def twoLevelStrictPrefixMin(df: DataFrame, groupCols: Seq[String],
      shardCols: Seq[Column], orderCols: Seq[Column], value: Column,
      out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shNames = shardCols.indices.map(i => s"_sh$i")
    val base = shardCols.zip(shNames).foldLeft(
      df.withColumn("_v", value)) {
      case (d, (c, nm)) => d.withColumn(nm, c)
    }
    val keyCols = (groupCols ++ shNames).map(col)
    val mins = base.groupBy(keyCols: _*).agg(min(col("_v")).as("_m"))
    val partCols: Seq[Column] =
      if (groupCols.isEmpty) Seq(pmod(col("_m"), lit(1)))
      else groupCols.map(col)
    val pre = Window.partitionBy(partCols: _*)
      .orderBy(shNames.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = mins
      .withColumn("_off", min(col("_m")).over(pre))
      .select(keyCols :+ col("_off"): _*)
    val local = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.withColumn("_ls", min(col("_v")).over(local))
      .join(offsets, groupCols ++ shNames)
      .withColumn(out, least(col("_off"), col("_ls")))
      .drop(shNames :+ "_v" :+ "_ls" :+ "_off": _*)
  }

  // Spark's `/` is true division even on longs — `div` floors.
  // midRank1 == midRank2 for odd n; for even n they bracket the
  // middle, so avg over the matching row(s) is the textbook median.
  def midRank1: Column = expr("(n + 1) div 2")
  def midRank2: Column = expr("(n + 2) div 2")
  def rank90: Column = ceil(col("n").cast("double") * 0.9)
}
