package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr._

/** Seeded-fuzz checks of every custom codegen expression against a
  * straightforward Scala reference implementation — 200 random cases
  * each, evaluated directly through the interpreted `eval` path (the
  * codegen path is pinned equal to it by ExprSpec over DataFrames).
  * Deterministic seed: failures reproduce. */
class ExprFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def dblArray(n: Int): Array[Double] =
    Array.fill(n)(rnd.nextDouble() * 20 - 10)

  private def sortedLongs(n: Int): Array[Long] =
    Array.fill(n)(rnd.nextInt(1 << 16).toLong).distinct.sorted

  private def litArr(a: Array[Double]): Literal =
    Literal.create(a.toSeq, ArrayType(DoubleType))
  private def litArrL(a: Array[Long]): Literal =
    Literal.create(a.toSeq, ArrayType(LongType))

  private def longs(a: Any): Seq[Long] = {
    val d = a.asInstanceOf[ArrayData]
    (0 until d.numElements()).map(d.getLong)
  }
  private def dbls(a: Any): Seq[Double] = {
    val d = a.asInstanceOf[ArrayData]
    (0 until d.numElements()).map(d.getDouble)
  }

  test("DotProduct matches a left-to-right fold on random vectors") {
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(96)
      val (a, b) = (dblArray(n), dblArray(n))
      val got = DotProduct(litArr(a), litArr(b)).eval(null)
      var exp = 0.0
      var i = 0
      while (i < n) { exp += a(i) * b(i); i += 1 }
      assert(got == exp)
    }
  }

  test("SortedIntersectSize matches set intersection on random sorted arrays") {
    (1 to 200).foreach { _ =>
      val a = sortedLongs(1 + rnd.nextInt(60))
      val b = sortedLongs(1 + rnd.nextInt(60))
      val got = SortedIntersectSize(litArrL(a), litArrL(b)).eval(null)
      assert(got == a.toSet.intersect(b.toSet).size.toLong)
    }
  }

  test("SortedJaccard matches |A∩B|/|A∪B| on random sorted arrays") {
    (1 to 200).foreach { _ =>
      val a = sortedLongs(1 + rnd.nextInt(60))
      val b = sortedLongs(1 + rnd.nextInt(60))
      val got = SortedJaccard(litArrL(a), litArrL(b)).eval(null)
      val i = a.toSet.intersect(b.toSet).size
      val exp = i.toDouble / (a.length + b.length - i).toDouble
      assert(got == exp)
    }
  }

  test("AsOfIndex matches a linear scan on random sorted arrays") {
    (1 to 200).foreach { _ =>
      val a = sortedLongs(rnd.nextInt(40))
      val v = rnd.nextInt(1 << 16).toLong
      val got = AsOfIndex(litArrL(a), Literal(v)).eval(null)
      assert(got == a.lastIndexWhere(_ <= v))
    }
  }

  test("NormalizeArray matches x/sqrt(Σx²) elementwise") {
    (1 to 200).foreach { _ =>
      val a = dblArray(1 + rnd.nextInt(96))
      val got = dbls(NormalizeArray(litArr(a)).eval(null))
      var s = 0.0
      var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      val norm = math.sqrt(s)
      assert(got == a.map(_ / norm).toSeq)
    }
  }

  test("FloorScale matches floor(x*k) elementwise on random vectors") {
    (1 to 200).foreach { _ =>
      val a = dblArray(1 + rnd.nextInt(96))
      val k = (rnd.nextInt(512) + 1).toDouble
      val got = dbls(FloorScale(litArr(a), Literal(k)).eval(null))
      assert(got == a.map(x => math.floor(x * k)).toSeq)
    }
  }

  test("MinHashBands matches a reference minima+polynomial-mix build") {
    (1 to 200).foreach { _ =>
      val hs = Array.fill(1 + rnd.nextInt(80))(
        rnd.nextLong().abs % 4294967296L).distinct.sorted
      val got = longs(MinHashBands(litArrL(hs),
        Literal(32), Literal(4)).eval(null))
      val mins = Array.fill(32)(Long.MaxValue)
      hs.foreach { h =>
        (0 until 32).foreach { i =>
          val m = ((h * (2L * i + 1)) & 4294967295L) ^ (h >> (i % 16))
          if (m < mins(i)) mins(i) = m
        }
      }
      val exp = (0 until 4).map { b =>
        (0 until 8).foldLeft(1125899906842597L)((s, r) =>
          s * 31L + mins(b * 8 + r))
      }
      assert(got == exp)
    }
  }

  test("Bigrams matches sliding-pair concatenation") {
    (1 to 200).foreach { _ =>
      val words = Seq.fill(rnd.nextInt(12))(
        rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
      val got = {
        val d = Bigrams(Literal.create(words, ArrayType(StringType)))
          .eval(null).asInstanceOf[ArrayData]
        (0 until d.numElements()).map(i => d.getUTF8String(i).toString)
      }
      val exp = if (words.size < 2) Seq.empty
        else words.sliding(2).map(_.mkString(" ")).toSeq
      assert(got == exp)
    }
  }

  test("NGrams matches sliding-window concatenation for n in 1..6") {
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(6)
      val words = Seq.fill(rnd.nextInt(15))(
        rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
      val got = {
        val d = NGrams(Literal.create(words, ArrayType(StringType)),
          Literal(n)).eval(null).asInstanceOf[ArrayData]
        (0 until d.numElements()).map(i => d.getUTF8String(i).toString)
      }
      val exp = if (words.size < n) Seq.empty
        else words.sliding(n).map(_.mkString(" ")).toSeq
      assert(got == exp)
    }
  }

  test("NormalizeArray is idempotent for every input class") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def normOnce(a: Array[Double]) =
      dbls(NormalizeArray(litArr(a)).eval(null))
    def normTwice(a: Array[Double]) =
      dbls(NormalizeArray(NormalizeArray(litArr(a))
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression]
        match { case e => e }).eval(null))
    // degenerate classes must produce ALL-NaN on both applications —
    // the contract GraftRules.NormalizeIdempotence relies on
    for (a <- Seq(Array(0.0, 0.0),
        Array(Double.PositiveInfinity, 1.0), Array(Double.NaN, 2.0))) {
      assert(normOnce(a).forall(_.isNaN), s"single on ${a.toSeq}")
      assert(normTwice(a).forall(_.isNaN), s"double on ${a.toSeq}")
    }
    // large-but-FINITE vectors whose squared norm overflows are
    // rescued by the max-abs pre-scale: still unit-sphere, still
    // idempotent (r9 — the old answer was all-NaN, and before that a
    // broken [NaN, 0, …])
    for (a <- Seq(Array(1e200, 1e200), Array(1e308, -1e308, 5e307),
        Array(-1e160, 1e160, 1e160, 1e160))) {
      val one = normOnce(a)
      val exp = {
        val m = a.map(math.abs).max
        val u = a.map(_ / m)
        val s = math.sqrt(u.map(x => x * x).sum)
        u.map(_ / s)
      }
      one.zip(exp).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 4 * math.ulp(y),
          s"overflow rescue drifted on ${a.toSeq}: $x vs $y") }
      assert(math.abs(one.map(x => x * x).sum - 1.0) < 1e-12,
        s"rescued vector not unit-norm on ${a.toSeq}")
      normOnce(a).zip(normTwice(a)).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 4 * math.ulp(x),
          s"overflow rescue broke idempotence: $x vs $y") }
    }
    // regular vectors: double-normalize differs from single by a
    // few ulps per element (the rule's documented trade: the inner
    // norm is 1 ± ulp and the rescale by 1/sqrt of it compounds)
    (1 to 100).foreach { _ =>
      val a = dblArray(1 + rnd.nextInt(64))
      val one = normOnce(a)
      val two = normTwice(a)
      one.zip(two).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 4 * math.ulp(x),
          s"double-normalize drifted past 4 ulps: $x vs $y")
      }
    }
  }
}
