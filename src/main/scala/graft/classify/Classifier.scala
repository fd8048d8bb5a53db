package graft.classify

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column classification over a DataFrame.
  *
  * Two layers, mirroring the reference's matching model (reference:
  * /root/reference/src/main/java/Main.java:351-365 — first matching
  * class wins, name match OR content match):
  *
  *  - name classification is metadata-only (driver-side, zero scan)
  *  - content classification is ONE aggregate pass computing the match
  *    rate of every (column, class) pair simultaneously — a single scan
  *    + partial aggregation regardless of how many pairs, which is the
  *    shape that survives 100 TB (never one job per column).
  */
final class Classifier(lib: DataClassLibrary) {

  /** First data class whose nameMatcher accepts the column name. */
  def classifyName(columnName: String): Option[DataClass] =
    lib.classes.find(_.nameMatcher.exists(Matchers.nameMatches(_, columnName)))

  /** (column → class) for every column the name layer can classify. */
  def classifySchema(df: DataFrame): Seq[(String, DataClass)] =
    df.schema.fieldNames.toSeq.flatMap(n => classifyName(n).map(n -> _))

  /** Match rate of each (column, pattern-class) pair in one scan.
    * Returns one row per pair: (column_name, data_class, match_rate). */
  def contentMatchRates(df: DataFrame, columns: Seq[String]): DataFrame = {
    val pairs = for {
      c <- columns
      dc <- lib.classes if dc.pattern.isDefined
    } yield (c, dc)
    if (pairs.isEmpty)
      return df.sparkSession.emptyDataFrame
        .select(lit("").as("column_name"), lit("").as("data_class"),
          lit(0.0).as("match_rate"))
        .limit(0)
    val aggs: Seq[Column] = pairs.map { case (c, dc) =>
      // coalesce: an empty table gives 0/0 = NULL — report rate 0.0, not NULL
      coalesce(
        sum(when(Matchers.contentMatches(col(c).cast("string"), dc.pattern.get), 1L)
          .otherwise(0L)).cast("double") / count(lit(1)).cast("double"),
        lit(0.0))
        .as(s"${c}__${dc.name}")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = pairs.map { case (c, dc) =>
      s"'$c', '${dc.name}', `${c}__${dc.name}`"
    }.mkString(s"stack(${pairs.size}, ", ", ", ") AS (column_name, data_class, match_rate)")
    wide.select(expr(stackExpr))
  }

  /** Full classification verdict per column: name match wins outright
    * (metadata, free); otherwise the content match-rate scan decides —
    * best pattern class with rate >= threshold. Mirrors the reference's
    * value-OR-name matching, lifted from per-event to per-table (one
    * scan for all columns). */
  def classifyTable(df: DataFrame, columns: Seq[String],
      threshold: Double = 0.6): Map[String, DataClass] = {
    val byName = columns.flatMap(c => classifyName(c).map(c -> _)).toMap
    val remaining = columns.filterNot(byName.contains)
    val byContent =
      if (remaining.isEmpty) Map.empty[String, DataClass]
      else contentMatchRates(df, remaining).collect()
        .filter(r => !r.isNullAt(2) && r.getDouble(2) >= threshold)
        .groupBy(_.getString(0))
        .flatMap { case (c, rows) =>
          val best = rows.maxBy(_.getDouble(2)).getString(1)
          lib.classes.find(_.name == best).map(c -> _)
        }
    byName ++ byContent
  }

  /** Set-membership counts per distinct value of a column, implemented
    * as an aggregation over an inlined set predicate. For set files too
    * large to inline, join a broadcast Dataset of entries instead. */
  def setMatchCounts(df: DataFrame, column: String, entries: Seq[String]): DataFrame =
    df.groupBy(col(column))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(Matchers.inSet(col(column), entries), 1L).otherwise(0L))
          .as("n_in_set"))
}
