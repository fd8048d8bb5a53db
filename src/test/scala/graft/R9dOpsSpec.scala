package graft

import org.apache.spark.sql.functions._

/** Brute-force agreement + invariant pins for the round-9 follow-on
  * operators (bigram surprisal, Gopher rule battery, rate-limit
  * audit, NOT-IN null-semantics audit). */
class R9dOpsSpec extends SparkSpec {

  private def docTokens(): Seq[(Long, String, String, Seq[String])] =
    Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "text").collect()
      .map { r =>
        (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3).trim.toLowerCase.split("\\s+").toSeq
            .filter(_.nonEmpty))
      }.toSeq

  test("txt_bigram_surprisal equals the driver-side whole-bit LM") {
    val docs = docTokens()
    def bitlen(x: Long): Int = java.lang.Long.toBinaryString(x).length
    val uni = docs.flatMap(_._4).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val bigrams = docs.flatMap { case (_, _, _, w) =>
      w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val cb = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val perDoc = docs.map { case (_, _, src, w) =>
      val bs = w.zip(w.drop(1)).map { case (a, b) =>
        (bitlen(uni(a)) - bitlen(cb(s"$a $b"))).toLong
      }
      (src, bs.size.toLong, bs.sum)
    }
    val expected = perDoc.groupBy(_._1).map { case (src, rows) =>
      val nt = rows.map(_._2).sum
      val ts = rows.map(_._3).sum
      val high = rows.count(r => r._3 * 1000 / r._2 >= 3000)
      (src, rows.size.toLong, nt, ts, high.toLong, ts * 1000 / nt)
    }.toSeq.sortBy(_._1)
    val got = text.TextAnalysis.txtBigramSurprisal(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // conditional surprisal must be cheaper than unigram surprisal
    // overall: knowing w1 can only shrink the candidate set
    val uniBits = text.TextAnalysis.txtSurprisal(spark, sfDir)
      .agg(sum("surprisal_bits"), sum("n_tokens")).collect().head
    val bigSum = expected.map(_._4).sum
    val bigN = expected.map(_._3).sum
    assert(bigSum.toDouble / bigN <
      uniBits.getLong(0).toDouble / uniBits.getLong(1))
  }

  test("pipe_gopher_rules matches per-doc rule replay") {
    val docs = docTokens()
    val perDoc = docs.map { case (_, lang, _, w0) =>
      // the operator splits the RAW text (no lowercasing) — fixture
      // text is already lowercase so the token streams agree
      val w = w0
      val n = w.size.toLong
      val counts = w.groupBy(identity).view.mapValues(_.size.toLong)
      val sumLen = w.map(_.length.toLong).sum
      val r1 = n >= 30 && n <= 120
      val r2 = sumLen >= 3 * n && sumLen <= 5 * n
      val r3 = w.exists(t => t == "the" || t == "a")
      val r4 = counts.size.toLong * 2 >= n
      val r5 = counts.values.max * 5 <= n
      (lang, r1, r2, r3, r4, r5)
    }
    val expected = perDoc.groupBy(_._1).map { case (lang, rs) =>
      (lang, rs.size.toLong,
        rs.count(!_._2).toLong, rs.count(!_._3).toLong,
        rs.count(!_._4).toLong, rs.count(!_._5).toLong,
        rs.count(!_._6).toLong,
        rs.count(r => r._2 && r._3 && r._4 && r._5 && r._6).toLong)
    }.toSeq.sortBy(_._1)
    val got = pipeline.CorpusPipeline.pipeGopherRules(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    assert(got == expected)
    // the battery must actually discriminate on the fixture
    assert(expected.map(_._8).sum > 0)
    assert(expected.map(_._8).sum < expected.map(_._2).sum)
  }

  test("str_rate_limit equals a sorted per-user replay") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val win = 86399999999L
    val perEvent = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      sorted.map { case (_, et, us) =>
        // RANGE frame: peers (equal us) included regardless of order
        val c = sorted.count(r => r._3 >= us - win && r._3 <= us)
        (et, c.toLong)
      }
    }
    val expected = perEvent.groupBy(_._1).map { case (et, rs) =>
      (et, rs.size.toLong, rs.count(_._2 > 5).toLong, rs.map(_._2).max)
    }.toSeq.sortBy(_._1)
    val got = streaming.EventStreams.strRateLimit(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("q53 null-semantics: NOT IN poisons, anti-join does not") {
    val rows = ops.Relational.q53(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val notExists = r.getLong(2)
      val notIn = r.getLong(3)
      val repaired = r.getLong(4)
      val nNull = r.getLong(5)
      assert(nNull > 0)            // the probe really is poisoned
      assert(notIn == 0L)          // three-valued logic zeroes NOT IN
      assert(repaired == notExists) // null repair restores parity
      assert(r.getLong(6) == (if (notIn != notExists) 1L else 0L))
    }
    // at least one region has customers with no orders (else the
    // audit distinguishes nothing)
    assert(rows.map(_.getLong(2)).sum > 0)
  }
}
