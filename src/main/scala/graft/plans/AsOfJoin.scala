package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.unsafe.types.UTF8String

/** The as-of join as a FIRST-CLASS operator — the custom-operator path
  * the architecture reserves for semantics Spark's builtins can't
  * express as a single plan node: a custom `LogicalPlan` + `Strategy` +
  * `SparkPlan`, registered through `SparkSessionExtensions`
  * ([[graft.expr.GraftExtensions]] injects [[AsOfJoinStrategy]]).
  *
  * Semantics (inner, backward-looking): for every left row, the LAST
  * right row with the same key whose time is ≤ the left row's time —
  * ties on right time resolved by the largest tie-break. Identical to
  * the window form ([[graft.streaming.EventStreams.asofJoin]]) and the
  * state-array form (asofStateLookup); all three share one DuckDB
  * oracle.
  *
  * Why a physical operator beats both composed forms at scale: the
  * planner sees the REAL requirements — children clustered on the key
  * and sorted by (key, time) — so execution is one co-partitioned
  * streaming merge per partition: no per-event candidate explosion
  * (window form), no per-key state arrays materialized in memory
  * (lookup form). Memory per task is O(1): one buffered right row.
  * Exchanges/sorts around it are planned by EnsureRequirements like
  * any sort-merge join, reuse included.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (extension
  * strategies run before the built-ins). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned streaming-merge as-of join. Children are clustered
  * on their keys and sorted by (key, time[, tie]); each partition is
  * merged with one pass and one buffered right row — the shape a
  * 100 TB as-of needs (per-task memory does not grow with key history;
  * skew in the RIGHT side streams through instead of materializing).
  */
final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression) extends BinaryExecNode {

  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // the one live right row (storage reused by the child iterator)
        private var rRow: InternalRow = if (rIt.hasNext) rIt.next() else null
        // current left key (value copied out of row storage) + the best
        // (= latest-eligible) right row for it, copied when buffered
        private var curKey: Any = _
        private var haveKey = false
        private var best: InternalRow = _
        private var pending: InternalRow = _

        private def copyVal(v: Any): Any = v match {
          case u: UTF8String => UTF8String.fromBytes(u.getBytes)
          case x => x
        }
        private def rAdvance(): Unit =
          rRow = if (rIt.hasNext) rIt.next() else null

        private def findNext(): InternalRow = {
          while (lIt.hasNext) {
            val l = lIt.next()
            val lk = lkB.eval(l)
            val lt = ltB.eval(l)
            if (lk != null && lt != null) {
              if (!haveKey || keyOrd.compare(lk, curKey) != 0) {
                best = null
                // drop right rows before this key (or with null keys,
                // which sort first under Ascending)
                var dropping = true
                while (dropping && rRow != null) {
                  val rk = rkB.eval(rRow)
                  if (rk == null || keyOrd.compare(rk, lk) < 0) rAdvance()
                  else dropping = false
                }
                curKey = copyVal(lk)
                haveKey = true
              }
              // consume right rows for this key up to the left time;
              // the last one wins (sorted by time then tie-break)
              var consuming = true
              while (consuming && rRow != null) {
                val rk = rkB.eval(rRow)
                if (rk != null && keyOrd.compare(rk, lk) == 0) {
                  val rt = rtB.eval(rRow)
                  if (rt == null) rAdvance() // null times sort first; ineligible
                  else if (timeOrd.compare(rt, lt) <= 0) {
                    best = rRow.copy()
                    rAdvance()
                  } else consuming = false
                } else consuming = false
              }
              if (best != null) return proj(joined(l, best))
            }
          }
          null
        }

        override def hasNext: Boolean = {
          if (pending == null) pending = findNext()
          pending != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending
          pending = null
          r
        }
      }
    }
  }
}

/** Public surface: `AsOfJoin(events, orders, "user_id" -> "o_custkey",
  * "ts" -> "o_orderdate", tie = "o_orderkey")`. Left and right must
  * come from distinct sources (as-of self-joins would need attribute
  * dedup, like Spark's own join API performs). */
object AsOfJoin {

  /** Runtime registration for sessions not built with
    * `spark.sql.extensions=graft.expr.GraftExtensions` (idempotent —
    * mirrors [[graft.expr.VectorExprs.register]]). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  def apply(left: DataFrame, right: DataFrame,
      keys: (String, String), times: (String, String),
      tie: String): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
    org.apache.spark.sql.graft.Shim.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp,
        attr(lp, keys._1), attr(rp, keys._2),
        attr(lp, times._1), attr(rp, times._2), attr(rp, tie)))
  }
}
