package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two ArrayType(Double) columns.
  *
  * The higher-order `aggregate(zip_with(...))` formulation is
  * CodegenFallback (interpreted per row) — benchmarks showed it
  * dominating the embedding operators (~2M pairs × 64 dims). This
  * expression emits a tight primitive loop instead, preserving the
  * exact left-to-right accumulation order the DuckDB oracles reproduce
  * (`list_dot_product` on DOUBLE[]), so results stay bit-identical.
  *
  * Null handling: null array → null result; elements are assumed
  * non-null (embedding vectors), matching the HOF fold it replaces.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be ArrayType(DoubleType) — callers cast (ExpectsInputTypes
  // is private[sql], so misuse surfaces at eval, not analysis)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd intersection size of two SORTED ArrayType(Long) columns
  * (merge-scan, O(|a|+|b|)). Built for LSH candidate verification:
  * token sets become sorted hash arrays once, then every candidate
  * pair is verified with a primitive two-pointer loop instead of an
  * explode-join-aggregate.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0L
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $n++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd as-of lookup: index of the LAST element <= the probe value
  * in a sorted ArrayType(Long) column (binary search, 0-based; -1 when
  * every element is greater). The probe primitive behind the
  * state-lookup as-of join: the right side becomes one sorted
  * time-array per key, each left row probes it in O(log n).
  */
case class AsOfIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_asof_index"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[Long]
    var lo = 0
    var hi = arr.numElements() - 1
    var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getLong(mid) <= v) { res = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid"); val res = ctx.freshName("res")
      s"""
         |int $lo = 0; int $hi = $a.numElements() - 1; int $res = -1;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($a.getLong($mid) <= $b) { $res = $mid; $lo = $mid + 1; }
         |  else { $hi = $mid - 1; }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd adjacent-bigram builder over an ArrayType(String) column:
  * ["a","b","c"] → ["a b","b c"]. The HOF formulation
  * (`transform(sequence(...), element_at...)`) is CodegenFallback and
  * dominated the n-gram statistics operator; this emits one primitive
  * loop concatenating neighbors. Elements are assumed non-null (they
  * come from `split`), matching the HOF it replaces.
  */
case class Bigrams(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_bigrams"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = if (n > 1) n - 1 else 0
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.concat(x.getUTF8String(i), space, x.getUTF8String(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val arr = ctx.freshName("arr")
      val spaceRef = ctx.addReferenceObj("space", space,
        classOf[UTF8String].getName)
      s"""
         |int $n = $a.numElements();
         |int $m = $n > 1 ? $n - 1 : 0;
         |Object[] $arr = new Object[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $arr[$i] = org.apache.spark.unsafe.types.UTF8String.concat(
         |    $a.getUTF8String($i), $spaceRef, $a.getUTF8String($i + 1));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExprs {
  val dotName = "graft_dot"
  val intersectName = "graft_intersect_size"
  val asofName = "graft_asof_index"
  val bigramsName = "graft_bigrams"

  /** (identifier, info, builder) triple for
    * SparkSessionExtensions.injectFunction (see [[GraftExtensions]]). */
  val dotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(dotName),
    new ExpressionInfo(classOf[DotProduct].getName, dotName),
    (children: Seq[Expression]) => DotProduct(children.head, children(1)))

  val intersectDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(intersectName),
    new ExpressionInfo(classOf[SortedIntersectSize].getName, intersectName),
    (children: Seq[Expression]) => SortedIntersectSize(children.head, children(1)))

  val asofDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(asofName),
    new ExpressionInfo(classOf[AsOfIndex].getName, asofName),
    (children: Seq[Expression]) => AsOfIndex(children.head, children(1)))

  val bigramsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(bigramsName),
    new ExpressionInfo(classOf[Bigrams].getName, bigramsName),
    (children: Seq[Expression]) => Bigrams(children.head))

  /** Idempotent direct registration for sessions built without the
    * extensions config (Verify/Bench/tests). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      dotName, children => DotProduct(children.head, children(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      intersectName,
      children => SortedIntersectSize(children.head, children(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      asofName, children => AsOfIndex(children.head, children(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      bigramsName, children => Bigrams(children.head), "built-in")
  }
}

/** Session extension entry point: set
  * `spark.sql.extensions=graft.expr.GraftExtensions` and the vector
  * functions resolve like builtins in any SQL or DataFrame plan. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorExprs.dotDescriptor)
    ext.injectFunction(VectorExprs.intersectDescriptor)
    ext.injectFunction(VectorExprs.asofDescriptor)
    ext.injectFunction(VectorExprs.bigramsDescriptor)
  }
}
