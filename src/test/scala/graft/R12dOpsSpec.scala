package graft

import org.apache.spark.sql.functions._

/** Round-12d pins: engine-independent laws for the fourth r12 batch —
  * largest-remainder apportionment (budget exactness + quota bound),
  * Mann–Whitney pairwise U (the U₁+U₂ = n₁n₂ identity + a naive
  * recount), the Wald–Wolfowitz runs test vs a direct replay of the
  * daily sign sequence, and the Lindley queue depth vs the literal
  * sequential recursion. */
class R12dOpsSpec extends SparkSpec {

  test("q72_apportionment: seats sum to exactly 1000 and every " +
      "nation is within one seat of its real-valued quota") {
    val rows = ops.Relational.q72(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("seats")).sum === 1000L)
    rows.foreach { r =>
      val seats = r.getAs[Long]("seats")
      val quotaMilli = r.getAs[Long]("quota_milli")
      // floor(quota) <= seats <= floor(quota) + 1
      assert(seats >= quotaMilli / 1000)
      assert(seats <= quotaMilli / 1000 + 1)
      assert(r.getAs[Long]("err_milli") === seats * 1000 - quotaMilli)
    }
  }

  test("cls_mann_whitney: doubled U recounts from a naive pooled " +
      "pass and U1 + U2 = n1*n2 holds on the doubled scale") {
    val rows = classify.ClassifyQueries
      .clsMannWhitney(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val v = Tables.events(spark, sfDir)
      .select(col("event_type"), floor(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val (gLo, gHi) = (r.getAs[String]("g_lo"), r.getAs[String]("g_hi"))
      val a = v.filter(_._1 == gLo).map(_._2)
      val b = v.filter(_._1 == gHi).map(_._2)
      // naive doubled U1: wins count 2, ties count 1
      val u2 = a.map(x => 2L * b.count(_ < x) + b.count(_ == x)).sum
      assert(r.getAs[Long]("n1") === a.length.toLong)
      assert(r.getAs[Long]("n2") === b.length.toLong)
      assert(r.getAs[Long]("u2_lo") === u2)
      val n1n2x2 = 2L * a.length * b.length
      assert(u2 >= 0L && u2 <= n1n2x2) // U2 = n1n2*2 - u2 >= 0
      assert(r.getAs[Long]("rb_pm") ===
        1000L - u2 * 1000L / (a.length.toLong * b.length))
    }
  }

  test("cls_runs_test: runs/n1/n2 replay from the literal daily " +
      "sign sequence and the closed-form moments match") {
    val rows = classify.ClassifyQueries.clsRunsTest(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val g = r.getAs[String]("grp")
      val days = daily.keys.filter(_._1 == g).map(_._2).toSeq.sorted
      val signs = days.zip(days.tail).flatMap { case (d0, d1) =>
        val (a, b) = (daily((g, d0)), daily((g, d1)))
        if (a == b) None else Some(if (b > a) 1 else -1)
      }
      val runs = if (signs.isEmpty) 0
        else 1 + signs.zip(signs.tail).count { case (x, y) => x != y }
      val n1 = signs.count(_ == 1).toLong
      val n2 = signs.count(_ == -1).toLong
      assert(r.getAs[Long]("n1") === n1)
      assert(r.getAs[Long]("n2") === n2)
      assert(r.getAs[Long]("runs") === runs.toLong)
      val nn = n1 + n2
      assert(r.getAs[Long]("e_runs_milli") ===
        1000L + 2000L * n1 * n2 / nn)
      if (n1 > 0 && n2 > 0 && 2 * n1 * n2 != nn) {
        val num = runs * nn - nn - 2 * n1 * n2
        assert(r.getAs[Long]("z2_milli") ===
          num * num * (nn - 1) * 1000L / (2 * n1 * n2 * (2 * n1 * n2 - nn)))
      } else assert(r.isNullAt(r.fieldIndex("z2_milli")))
    }
  }

  test("str_queue_depth: the scan decomposition equals the literal " +
      "sequential Lindley recursion per event type") {
    val rows = streaming.EventStreams.strQueueDepth(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 1000"),
        col("event_id"),
        (floor(col("value") * 100) * 200).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { r =>
      val g = r.getAs[String]("grp")
      val seq = ev.filter(_._1 == g).sortBy(e => (e._2, e._3))
      var w = 0L
      val ws = scala.collection.mutable.ArrayBuffer(0L)
      seq.sliding(2).filter(_.length == 2).foreach { p =>
        val (_, t0, _, s0) = p(0)
        val (_, t1, _, _) = p(1)
        w = math.max(0L, w + s0 - (t1 - t0)); ws += w
      }
      assert(r.getAs[Long]("n") === seq.length.toLong)
      assert(r.getAs[Long]("w_max_ms") === ws.max)
      assert(r.getAs[Long]("w_mean_ms") === ws.sum / ws.length)
      assert(r.getAs[Long]("busy_pm") ===
        ws.count(_ > 0) * 1000L / ws.length)
      val sorted = ws.sorted
      assert(r.getAs[Long]("w_p95_ms") ===
        sorted((19 * ws.length + 19) / 20 - 1))
    }
  }
}
