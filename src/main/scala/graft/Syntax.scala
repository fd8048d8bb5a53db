package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Extension syntax shared by the query modules. */
object Syntax {
  /** `.reportSort(...)` — the deterministic sort tail for DIM-BOUNDED
    * report outputs (see [[Tables.reportSort]]): identical total order
    * to `.orderBy(...)`, zero range exchange and zero boundary-sample
    * job. Only for frames whose row count is fixed by a dimension —
    * corpus-proportional outputs keep the global `.orderBy`. */
  implicit class ReportSortOps(private val df: DataFrame) extends AnyVal {
    def reportSort(cols: Column*): DataFrame = Tables.reportSort(df, cols: _*)
    def reportSort(c: String, cs: String*): DataFrame =
      Tables.reportSort(df, (c +: cs).map(col): _*)
  }

  /** `.cut` / `.cutLazy` — strategy-injected lineage cuts (see
    * [[Tables.cut]]): executor-local by default, storage-backed
    * reliable checkpoints under `spark.graft.checkpoint.reliable`. */
  implicit class CheckpointOps(private val df: DataFrame) extends AnyVal {
    def cut: DataFrame = Tables.cut(df)
    def cutLazy: DataFrame = Tables.cut(df, eager = false)
  }
}
