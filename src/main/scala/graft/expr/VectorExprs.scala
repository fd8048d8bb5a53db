package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

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

/** Codegen'd POSITIONAL MATCH MASK over two ArrayType(Long) columns:
  * bit i of the result is set iff left(i) == right(i) (up to 64
  * positions; the shorter length bounds the loop). One tight compiled
  * loop replaces dozens of per-element comparison expressions in the
  * hot path of signature-sweep joins — bit_count and block tests over
  * the mask are then pure integer ops.
  */
case class MatchMask(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_match_mask"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(64, math.min(x.numElements(), y.numElements()))
    var i = 0; var m = 0L
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) m |= (1L << i)
      i += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      s"""
         |int $n = java.lang.Math.min(64,
         |  java.lang.Math.min($a.numElements(), $b.numElements()));
         |long $m = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $m |= (1L << $i);
         |}
         |${ev.value} = $m;
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

/** Codegen'd Jaccard similarity of two SORTED ArrayType(Long) columns:
  * j = |A∩B| / (|A|+|B|-|A∩B|), with the intersection from one
  * two-pointer merge and set sizes from the array lengths. Exists
  * because the composed form `i / (n1+n2-i)` references the
  * intersection twice and projection collapsing re-evaluates it per
  * reference; this computes it once. The division is exact-int →
  * IEEE double, identical to the oracle's
  * CAST(i AS DOUBLE)/CAST(n1+n2-i AS DOUBLE).
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

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
    n.toDouble / (x.numElements().toLong + y.numElements() - n).toDouble
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
         |${ev.value} = (double) $n /
         |  (double) ((long) $a.numElements() + $b.numElements() - $n);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd MinHash BAND signatures over a SORTED ArrayType(Long)
  * column of 32-bit non-negative token hashes: one primitive pass
  * computes all k permutation minima AND folds them into `bands`
  * 64-bit band signatures (polynomial mix over each band's minima).
  * Permutation i is the portable mix
  *   perm_i(h) = ((h * (2i+1)) & 0xFFFFFFFF) XOR (h >> (i mod 16))
  * chosen because every step is reproducible in ANSI SQL on BIGINT
  * without overflow (h < 2^32, k <= 64 → products < 2^38), so the
  * oracle engine recomputes identical minima; the band COMBINE is an
  * equality key between Spark rows only (it never crosses the oracle
  * boundary), so a 64-bit polynomial mix is fine.
  *
  * Emitting the bands (not the raw minima) from ONE expression is
  * deliberate: projection collapsing inlines a non-trivial expression
  * into every `element_at` consumer — a k-wide select over the minima
  * array re-ran the whole O(tokens·k) pass k times per row (measured
  * 66 inlined copies in the optimized plan).
  * `numHashes` and `bands` must be foldable integer literals.
  */
case class MinHashBands(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private def intLit(e: Expression, what: String): Int = e.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"graft_minhash_bands $what must be an int literal, got $other")
  }
  private lazy val k: Int = intLit(second, "numHashes")
  private lazy val nBands: Int = intLit(third, "bands")
  private lazy val rpb: Int = {
    require(k % nBands == 0,
      s"graft_minhash_bands: numHashes ($k) must be divisible by bands " +
        s"($nBands) — trailing hashes would be silently dropped")
    k / nBands
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val h = x.getLong(t)
      var i = 0
      while (i < k) {
        val m = ((h * (2L * i + 1)) & 4294967295L) ^ (h >> (i % 16))
        if (m < mins(i)) mins(i) = m
        i += 1
      }
      t += 1
    }
    val out = new Array[Any](nBands)
    var bI = 0
    while (bI < nBands) {
      var sig = 1125899906842597L
      var r = 0
      while (r < rpb) { sig = sig * 31L + mins(bI * rpb + r); r += 1 }
      out(bI) = sig
      bI += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val r = ctx.freshName("r")
      val bI = ctx.freshName("bI")
      val sig = ctx.freshName("sig")
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $t = 0; $t < $n; $t++) {
         |  long $h = $a.getLong($t);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $m = (($h * (2L * $i + 1)) & 4294967295L) ^ ($h >> ($i % 16));
         |    if ($m < $mins[$i]) $mins[$i] = $m;
         |  }
         |}
         |Object[] $out = new Object[$nBands];
         |for (int $bI = 0; $bI < $nBands; $bI++) {
         |  long $sig = 1125899906842597L;
         |  for (int $r = 0; $r < $rpb; $r++) {
         |    $sig = $sig * 31L + $mins[$bI * $rpb + $r];
         |  }
         |  $out[$bI] = (Object) $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Codegen'd L2 normalization of a float/double array into a double
  * array: out[i] = x[i] / sqrt(Σ x[i]²), with the same left-to-right
  * accumulation order as [[DotProduct]] (oracle engines reproduce it as
  * `x / sqrt(list_dot_product(e, e))` on DOUBLE[]). Replaces the
  * interpreted `transform(cast)` + HOF-dot normalization pass — the
  * last CodegenFallback in the embedding hot paths. A zero vector
  * yields IEEE x/0 entries (NaN), exactly what the SQL form computes.
  * Elements are assumed non-null (embedding vectors).
  */
case class NormalizeArray(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, FloatType}

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (childIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    var s = 0.0
    i = 0
    while (i < n) { s += v(i) * v(i); i += 1 }
    // Overflowed-but-finite norms (components ~1e155+) are still
    // mathematically normalizable: pre-scale by the max-abs component
    // (|u_i| ≤ 1, so Σ u² ∈ [1, n]) and normalize the scaled copy.
    // The rescue runs ONLY when s overflowed, so finite-norm inputs
    // keep the plain left-to-right accumulation bit-for-bit (the
    // DuckDB `x / sqrt(list_dot_product(x, x))` parity contract). An
    // infinite COMPONENT survives as Inf/Inf = NaN in the scaled
    // copy, landing in the NaN branch below.
    if (s == Double.PositiveInfinity) {
      var m = 0.0
      i = 0
      while (i < n) { m = math.max(m, math.abs(v(i))); i += 1 }
      i = 0
      while (i < n) { v(i) = v(i) / m; i += 1 }
      s = 0.0
      i = 0
      while (i < n) { s += v(i) * v(i); i += 1 }
    }
    // remaining degenerate input (zero vector, NaN anywhere, an
    // infinite component) → ALL-NaN output, which makes normalize
    // idempotent for EVERY input class (normalize of an all-NaN array
    // is again all-NaN) — the contract GraftRules.NormalizeIdempotence
    // relies on. Every oracle-checked operator excludes degenerate
    // vectors before normalizing, so DuckDB parity is untouched.
    val norm = if (s > 0.0 && s < Double.PositiveInfinity)
      math.sqrt(s) else Double.NaN
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = if (java.lang.Double.isNaN(norm)) Double.NaN
      else v(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val s = ctx.freshName("s")
      val nm = ctx.freshName("nm")
      val out = ctx.freshName("out")
      val get =
        if (childIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $v = new double[$n];
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $v[$i] = $get; }
         |for (int $i = 0; $i < $n; $i++) { $s += $v[$i] * $v[$i]; }
         |if ($s == Double.POSITIVE_INFINITY) {
         |  double ${s}m = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${s}m = java.lang.Math.max(${s}m, java.lang.Math.abs($v[$i]));
         |  }
         |  $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $v[$i] = $v[$i] / ${s}m;
         |    $s += $v[$i] * $v[$i];
         |  }
         |}
         |double $nm = ($s > 0.0 && $s < Double.POSITIVE_INFINITY)
         |  ? java.lang.Math.sqrt($s) : Double.NaN;
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (Object) (Double.isNaN($nm)
         |    ? Double.NaN : ($v[$i] / $nm));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd adjacent-bigram builder over an ArrayType(String) column:
  * ["a","b","c"] → ["a b","b c"]. The HOF formulation
  * (`transform(sequence(...), element_at...)`) is CodegenFallback and
  * dominated the n-gram statistics operator; this emits one primitive
  * loop concatenating neighbors. A null element null-propagates into
  * the bigrams that would contain it (the output declares
  * containsNull=true) — `split` never produces nulls, but the function
  * is registered session-wide, so the contract must hold for any input.
  */
case class Bigrams(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = true)
  override def prettyName: String = "graft_bigrams"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = if (n > 1) n - 1 else 0
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) =
        if (x.isNullAt(i) || x.isNullAt(i + 1)) null
        else UTF8String.concat(x.getUTF8String(i), space, x.getUTF8String(i + 1))
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
         |  $arr[$i] = ($a.isNullAt($i) || $a.isNullAt($i + 1)) ? null :
         |    org.apache.spark.unsafe.types.UTF8String.concat(
         |      $a.getUTF8String($i), $spaceRef, $a.getUTF8String($i + 1));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd sliding word-n-gram builder over an ArrayType(String)
  * column: (["a","b","c","d"], 3) → ["a b c","b c d"]. Generalizes
  * [[Bigrams]] for contamination checks and n-gram statistics where
  * n > 2; the HOF `transform(sequence(...), slice...)` formulation is
  * CodegenFallback and re-evaluates the slice per element. `n` must be
  * a foldable positive integer. A null element null-propagates into
  * every gram whose window covers it. */
case class NGrams(child: Expression, n: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def left: Expression = child
  override def right: Expression = n
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = true)
  override def prettyName: String = "graft_ngrams"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!n.foldable || n.dataType != org.apache.spark.sql.types.IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable integer gram size")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val k = b.asInstanceOf[Int]
    val len = x.numElements()
    val m = if (k > 0 && len >= k) len - k + 1 else 0
    val out = new Array[Any](m)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i < m) {
      var hasNull = false
      var j = 0
      while (j < k) {
        if (x.isNullAt(i + j)) hasNull = true
        else parts(j) = x.getUTF8String(i + j)
        j += 1
      }
      out(i) = if (hasNull) null else UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val len = ctx.freshName("len")
      val m = ctx.freshName("m")
      val arr = ctx.freshName("arr")
      val parts = ctx.freshName("parts")
      val hasNull = ctx.freshName("hasNull")
      val spaceRef = ctx.addReferenceObj("space", space,
        classOf[UTF8String].getName)
      s"""
         |int $k = (int) $b;
         |int $len = $a.numElements();
         |int $m = ($k > 0 && $len >= $k) ? $len - $k + 1 : 0;
         |Object[] $arr = new Object[$m];
         |org.apache.spark.unsafe.types.UTF8String[] $parts =
         |  new org.apache.spark.unsafe.types.UTF8String[$k];
         |for (int $i = 0; $i < $m; $i++) {
         |  boolean $hasNull = false;
         |  for (int $j = 0; $j < $k; $j++) {
         |    if ($a.isNullAt($i + $j)) { $hasNull = true; }
         |    else { $parts[$j] = $a.getUTF8String($i + $j); }
         |  }
         |  $arr[$i] = $hasNull ? null :
         |    org.apache.spark.unsafe.types.UTF8String.concatWs($spaceRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, n = newRight)
}

/** Codegen'd element-wise ⌊x·k⌋ over a double/float array — the
  * integer quantizer the two-stage re-rank shortlist scores with
  * (values stay DoubleType but integer-valued, so the codegen dot
  * product consumes them directly and the arithmetic is exact in any
  * engine). The HOF formulation (`transform(e, x -> floor(x*k))`) is
  * CodegenFallback — interpreted per row — which is exactly the
  * non-codegen hot-path §3 forbids; this emits one primitive loop. */
case class FloorScale(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, FloatType}

  private def leftIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def elementsNullable: Boolean = left.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  // null elements propagate (matching the transform() HOF this
  // replaces), so the output is element-nullable iff the input is
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = elementsNullable)
  override def prettyName: String = "graft_floor_scale"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    left.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _)
          if right.dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double|float>, double), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, k: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val s = k.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) out(i) = null
      else {
        val v = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
        out(i) = math.floor(v * s)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val get =
        if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $a.isNullAt($i) ? null :
         |    (Object) java.lang.Math.floor($get * $k);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd Unicode NFC normalization (UAX #15 canonical
  * composition) — the text-hygiene primitive Spark has no builtin
  * for: decomposed sequences (e + U+0301) compose to their canonical
  * form (é), so fingerprints/dedup keys/equality see ONE
  * representation of visually identical text. Delegates to the JDK's
  * `java.text.Normalizer` (the same UAX #15 algorithm DuckDB's
  * nfc_normalize implements, which is what makes the audit oracle
  * exact). Fast path: already-normalized strings (the overwhelming
  * majority in real corpora) return the INPUT UTF8String — no second
  * allocation. */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(a: Any): Any = {
    val in = a.asInstanceOf[UTF8String]
    val s = in.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) in
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $a.toString();
         |${ev.value} = java.text.Normalizer.isNormalized(
         |    $s, java.text.Normalizer.Form.NFC) ? $a :
         |  org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Gear-hash content-defined-chunking cut points over a BINARY column
  * — the production rolling hash behind `dedup_chunks` /
  * `mm_chunk_dedup` (the md5-per-byte-position form stays as the slow
  * verification mode): one primitive pass per blob, a table lookup +
  * shift + add per byte, returning the 1-based byte positions where a
  * new chunk starts (interior cuts only; callers prepend position 1).
  *
  * Cut rule: gear state h = ((h << 1) + G[b]) & 63 over the byte
  * stream; a cut opens at position p+1 whenever h == 0 after
  * consuming byte p (1-based p ≥ 6, cut ≤ len). Expected chunk length
  * = 64 bytes (P[h=0] = 1/64), the same operating point as the md5
  * form.
  *
  * Two properties make this the 100 TB shape:
  *  - O(1) ALU work per byte — no digest per position (the md5 form
  *    pays a full md5 at every offset, a ~100× constant factor).
  *  - Because the modulus is 2⁶, bytes older than 6 positions have
  *    shifted out of the masked state, so the cut decision at p
  *    depends ONLY on bytes p−5..p: the cut set is positionally
  *    computable — a blob split across tasks with a 6-byte overlap
  *    chunks identically (no sequential scan dependency), and a SQL
  *    oracle replays it as a closed form over the last 6 bytes.
  *
  * The gear table is content-derived and engine-portable:
  * G[b] = first byte of md5 of the decimal string of b — DuckDB
  * replays it as ('0x'||substr(md5(CAST(b AS VARCHAR)),1,2))::INT. */
case class GearCuts(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_gear_cuts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    val n = bytes.length
    val out = new java.util.ArrayList[Object](math.max(8, n / 48))
    val g = GearCuts.table
    var h = 0
    var p = 0
    while (p < n) {
      h = ((h << 1) + g(bytes(p) & 0xff)) & 63
      if (p >= 5 && h == 0 && p < n - 1)
        out.add(Integer.valueOf(p + 2))
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      val out = ctx.freshName("out")
      val gRef = ctx.addReferenceObj("gearTable", GearCuts.table,
        "int[]")
      s"""
         |int $n = $a.length;
         |java.util.ArrayList<Object> $out =
         |  new java.util.ArrayList<Object>(java.lang.Math.max(8, $n / 48));
         |int $h = 0;
         |for (int $p = 0; $p < $n; $p++) {
         |  $h = (($h << 1) + $gRef[$a[$p] & 0xff]) & 63;
         |  if ($p >= 5 && $h == 0 && $p < $n - 1) {
         |    $out.add(java.lang.Integer.valueOf($p + 2));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GearCuts {
  /** G[b] = first byte of md5(decimal string of b) — 256 one-time
    * digests at class init, uniform low bits, portable to any engine
    * with md5. */
  val table: Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(256) { b =>
      md.reset()
      md.digest(b.toString.getBytes("US-ASCII"))(0) & 0xff
    }
  }
}

/** Winnowing selections (Schleimer et al. 2003, k=8 char-grams,
  * window w=4) emitted DIRECTLY from the normalized string — one
  * map-only pass replacing the per-position explode + per-doc ordered
  * window the selection frame otherwise needs (the [[GearCuts]] play
  * applied to winnowing: at corpus scale the explode/sort was the
  * whole build cost of the fingerprint layout).
  *
  * Semantics are pinned to the DuckDB oracle bit for bit: positions
  * are 1-based CODE-POINT positions (Spark `substring`/DuckDB
  * `substr` both count code points — Java's UTF-16 units would split
  * surrogate pairs, the `dedup_char_jaccard` advice finding), the
  * per-gram hash is the portable md5 prefix
  * (`conv(substr(md5(gram),1,8),16,10)` — first 4 digest bytes,
  * big-endian unsigned), the packed key is h·2²⁰ + (2²⁰−1 − pos)
  * (rightmost-min tie-break), and one selection is emitted per
  * window position pos ≥ w (duplicates kept — the per-window
  * multiset the density audit counts). Strings shorter than
  * k + w − 1 code points yield an empty array. */
case class WinnowSelect(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_sel"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(a: Any): Any =
    WinnowSelect.compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.WinnowSelect.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSelect {
  private val K = 8
  private val W = 4

  /** Static helper shared by eval and codegen (the md5 loop is too
    * stateful to inline; a static call keeps the surrounding plan in
    * WholeStageCodegen). Works directly on the UTF-8 bytes: gram
    * digests are md5 over byte SLICES bounded by code-point offsets —
    * identical bytes to md5(substring) (UTF-8 of a code-point
    * substring IS the byte slice), with zero per-gram String/copy
    * allocation — and the result rides an UnsafeArrayData (a ~3.5k-
    * element boxed array per doc was most of the layout build cost). */
  def compute(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // code-point start offsets: positions must match Spark substring/
    // DuckDB substr (code points), not Java's UTF-16 units
    val offs = new Array[Int](s.numChars() + 1)
    var nc = 0
    var bi = 0
    while (bi < nb) {
      offs(nc) = bi
      bi += org.apache.spark.unsafe.types.UTF8String
        .numBytesForFirstByte(bytes(bi))
      nc += 1
    }
    offs(nc) = nb
    val p = nc - K + 1 // number of grams
    if (p < W)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.empty[Long])
    val md = java.security.MessageDigest.getInstance("MD5")
    val ring = new Array[Long](W)
    val out = new Array[Long](p - W + 1)
    var pos = 1
    while (pos <= p) {
      md.reset()
      md.update(bytes, offs(pos - 1), offs(pos - 1 + K) - offs(pos - 1))
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      ring((pos - 1) % W) = h * 1048576L + (1048575L - pos)
      if (pos >= W) {
        var mn = ring(0)
        var i = 1
        while (i < W) { if (ring(i) < mn) mn = ring(i); i += 1 }
        out(pos - W) = mn
      }
      pos += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** Codegen'd SORTED-DISTINCT xxhash64 set of code-point character
  * k-grams over a string column — the whole char-shingling pipeline
  * of `dedup_char_jaccard` in one primitive pass. Bit-identical to
  * the interpreted form it replaces,
  * `sort_array(array_distinct(transform(graft_ngrams(
  *   regexp_extract_all(text, '(?s).', 0), k), x -> xxhash64(x))))`
  * — which was CodegenFallback end-to-end (`transform` is a HOF) and
  * additionally paid one regex match + one string allocation PER
  * CHARACTER: each k-gram here hashes the SAME bytes Spark's
  * xxhash64 hashes on the space-joined gram string (code points
  * joined by 0x20, seed 42), walked directly off the UTF-8 encoding
  * (first-byte length table — a 4-byte sequence, i.e. a surrogate
  * pair in UTF-16 terms, is ONE code point, exactly like the
  * `(?s).` regex). `k` must be a foldable positive integer. */
case class CharGramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_char_gram_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input")
    else if (!right.foldable ||
        right.dataType != org.apache.spark.sql.types.IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable integer gram size")
    else right.eval() match {
      // the doc contract says "foldable POSITIVE integer" — reject
      // k <= 0 / null at analysis instead of silently returning
      // empty/null arrays (r12 ADVICE)
      case k: Int if k > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a positive gram size")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CharGramHashes.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.CharGramHashes.compute($a, (int) $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharGramHashes {
  import org.apache.spark.unsafe.Platform
  import org.apache.spark.unsafe.types.UTF8String

  /** Shared by interpreted and generated paths so they cannot drift. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // code-point start offsets (one extra slot = end-of-string)
    val offs = new Array[Int](nb + 1)
    var ncp = 0
    var p = 0
    while (p < nb) {
      offs(ncp) = p
      ncp += 1
      p += UTF8String.numBytesForFirstByte(bytes(p))
    }
    offs(ncp) = nb
    val m = if (k > 0 && ncp >= k) ncp - k + 1 else 0
    if (m <= 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(new Array[Long](0))
    val out = new Array[Long](m)
    // gram buffer: k code points (≤ 4 bytes each) + k−1 separators
    val buf = new Array[Byte](4 * k + (k - 1))
    var i = 0
    while (i < m) {
      var w = 0
      var j = 0
      while (j < k) {
        if (j > 0) { buf(w) = 0x20; w += 1 }
        var q = offs(i + j)
        val e = offs(i + j + 1)
        while (q < e) { buf(w) = bytes(q); w += 1; q += 1 }
        j += 1
      }
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, w, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    var d = 0
    var r = 0
    while (r < m) {
      if (d == 0 || out(r) != out(d - 1)) { out(d) = out(r); d += 1 }
      r += 1
    }
    val res = if (d == m) out else java.util.Arrays.copyOf(out, d)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(res)
  }
}

object VectorExprs {
  val dotName = "graft_dot"
  val floorScaleName = "graft_floor_scale"
  val nfcName = "graft_nfc"
  val intersectName = "graft_intersect_size"
  val asofName = "graft_asof_index"
  val bigramsName = "graft_bigrams"
  val normName = "graft_normalize"
  val minhashName = "graft_minhash_bands"
  val jaccardName = "graft_jaccard"
  val ngramsName = "graft_ngrams"
  val matchMaskName = "graft_match_mask"
  val gearCutsName = "graft_gear_cuts"
  val winnowSelName = "graft_winnow_sel"
  val charGramHashesName = "graft_char_gram_hashes"

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

  val normDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(normName),
    new ExpressionInfo(classOf[NormalizeArray].getName, normName),
    (children: Seq[Expression]) => NormalizeArray(children.head))

  val jaccardDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(jaccardName),
    new ExpressionInfo(classOf[SortedJaccard].getName, jaccardName),
    (children: Seq[Expression]) => SortedJaccard(children.head, children(1)))

  val ngramsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(ngramsName),
    new ExpressionInfo(classOf[NGrams].getName, ngramsName),
    (children: Seq[Expression]) => NGrams(children.head, children(1)))

  val minhashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(minhashName),
    new ExpressionInfo(classOf[MinHashBands].getName, minhashName),
    (children: Seq[Expression]) =>
      MinHashBands(children.head, children(1), children(2)))

  val floorScaleDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(floorScaleName),
    new ExpressionInfo(classOf[FloorScale].getName, floorScaleName),
    (children: Seq[Expression]) => FloorScale(children.head, children(1)))

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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      normName, children => NormalizeArray(children.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      minhashName,
      children => MinHashBands(children.head, children(1), children(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      jaccardName,
      children => SortedJaccard(children.head, children(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ngramsName,
      children => NGrams(children.head, children(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      floorScaleName,
      children => FloorScale(children.head, children(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      nfcName, children => NfcNormalize(children.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      matchMaskName,
      children => MatchMask(children.head, children(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      gearCutsName, children => GearCuts(children.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      winnowSelName, children => WinnowSelect(children.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      charGramHashesName,
      children => CharGramHashes(children.head, children(1)), "built-in")
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
    ext.injectFunction(VectorExprs.normDescriptor)
    ext.injectFunction(VectorExprs.minhashDescriptor)
    ext.injectFunction(VectorExprs.jaccardDescriptor)
    ext.injectFunction(VectorExprs.ngramsDescriptor)
    ext.injectFunction(VectorExprs.floorScaleDescriptor)
    // the custom-operator path: as-of join as a first-class plan node
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // optimizer rung: algebraic simplifications of the graft exprs
    ext.injectOptimizerRule(_ => GraftRules.NormalizeIdempotence)
  }
}
