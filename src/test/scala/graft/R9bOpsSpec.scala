package graft

import org.apache.spark.sql.functions._

/** Brute-force agreement + property pins for the late-round-9
  * operators: the rewritten/sketched forms must equal their naive
  * formulations on data small enough to compute directly. */
class R9bOpsSpec extends SparkSpec {

  test("q44 eager aggregation equals the naive join-then-aggregate") {
    val naive = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_mktsegment"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("total_cents"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val eager = ops.Relational.q44(spark, sfDir).collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("total_cents"))).toMap
    assert(eager == naive)
  }

  test("q45 count-min estimates dominate truth and match the " +
      "hand-built sketch") {
    def cell(r: Int, k: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$k".getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 512L).toInt
    }
    val keys = Tables.lineitem(spark, sfDir)
      .select("l_partkey").collect().map(_.getLong(0))
    val sketch = Array.fill(4, 512)(0L)
    keys.foreach(k => (0 until 4).foreach(r => sketch(r)(cell(r, k)) += 1))
    val truth = keys.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val got = ops.Relational.q45(spark, sfDir).collect()
    assert(got.length == 10)
    got.foreach { row =>
      val k = row.getAs[Long]("l_partkey")
      val t = row.getAs[Long]("true_count")
      val e = row.getAs[Long]("est_count")
      assert(t == truth(k))
      assert(e >= t, s"count-min must overestimate: key=$k est=$e true=$t")
      val expected = (0 until 4).map(r => sketch(r)(cell(r, k))).min
      assert(e == expected, s"sketch min mismatch for key=$k")
    }
  }

  test("cls_cramers_v scaled-integer chi2 tracks the float chi2") {
    val cells = Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("obs"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = cells.map(_._3).sum.toDouble
    val rt = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val ct = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val chi2 = cells.map { case (r, c, o) =>
      val exp = rt(r) * ct(c) / n
      (o - exp) * (o - exp) / exp
    }.sum
    val row = classify.ClassifyQueries.clsCramersV(spark, sfDir)
      .collect().head
    val chi2Micro = row.getAs[Long]("chi2_micro")
    assert(math.abs(chi2Micro / 1e6 - chi2) <= math.max(1e-3, chi2 * 1e-3),
      s"chi2_micro=$chi2Micro float=$chi2")
    val dof = row.getAs[Long]("dof")
    assert(dof == math.min(rt.size, ct.size) - 1)
    val v2 = row.getAs[Long]("v2_ppm")
    assert(v2 >= 0 && v2 <= 1000000L)
  }

  test("cdc_before_chain finds exactly the corrupted-before updates") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"),
        expr("cast(floor(value * 1000) as long)").as("vm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    var checked = 0L
    var breaks = 0L
    ev.groupBy(_._2).foreach { case (_, rows) =>
      val seq = rows.sortBy(r => (r._4, r._1))
      seq.indices.drop(1).foreach { i =>
        val (id, _, typ, _, _) = seq(i)
        val op = typ match {
          case "signup" => "c"; case "error" => "d"; case _ => "u" }
        if (op == "u") {
          checked += 1
          val expected = seq(i - 1)._5
          val provided: Option[Long] =
            if (id % 97 == 0) (if (i >= 2) Some(seq(i - 2)._5) else None)
            else Some(expected)
          if (!provided.contains(expected)) breaks += 1
        }
      }
    }
    val got = cdc.CdcQueries.beforeChain(spark, sfDir)
      .agg(sum("n_checked"), sum("n_breaks")).collect().head
    assert(got.getLong(0) == checked)
    assert(got.getLong(1) == breaks)
  }

  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
  }

  /** Brute winnowing selection: distinct (pos, hash) fingerprints of
    * the normalized text (k=8, w=4, rightmost-min tie-break). */
  private def bruteWinnow(norm: String): Seq[(Int, Long)] =
    if (norm.length < 11) Seq.empty
    else {
      val hashes = (1 to norm.length - 7).map(p =>
        p -> h32(norm.substring(p - 1, p + 7)))
      (4 to hashes.length).map { end =>
        hashes.slice(end - 4, end).minBy { case (p, h) => (h, -p) }
      }.distinct
    }

  test("txt_winnowing equals the brute-force MOSS selection") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        regexp_replace(trim(lower(col("text"))), "\\s+", " ").as("norm"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, norm) =>
      val sels = bruteWinnow(norm)
      if (sels.isEmpty) None
      else Some(id -> (norm.length - 10L, sels.length.toLong,
        sels.map(_._2).distinct.length.toLong))
    }.toMap
    val got = text.TextAnalysis.txtWinnowing(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_fps"),
          r.getAs[Long]("n_hashes"))).toMap
    assert(got == expected)
  }

  test("txt_code_ratio flags match the per-doc recomputation") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(_._2.nonEmpty)
    val codeSet = "{}()[];=<>".toSet
    val bysrc = docs.groupBy(_._1).map { case (src, ds) =>
      val flags = ds.map { case (_, t) =>
        val codePm = t.count(codeSet) * 1000L / t.length
        val lines = t.split("\n", -1)
        val indPm = lines.count(l => l.startsWith(" ") ||
          l.startsWith("\t")) * 1000L / lines.length
        codePm >= 30 || indPm >= 400
      }
      src -> (ds.length.toLong, flags.count(identity).toLong)
    }
    val got = text.TextAnalysis.txtCodeRatio(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_code_docs"))).toMap
    assert(got == bysrc)
  }

  test("dedup_winnow_pairs equals the brute-force shared-fp count " +
      "under the posting cap") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        regexp_replace(trim(lower(col("text"))), "\\s+", " ").as("norm"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val fps = docs.map { case (id, norm) =>
      id -> bruteWinnow(norm).map(_._2).distinct.toSet }.toMap
    val posting = fps.toSeq.flatMap { case (id, hs) => hs.map(_ -> id) }
      .groupBy(_._1).filter { case (_, ds) =>
        ds.size >= 2 && ds.size <= 50 }
    val counts = scala.collection.mutable.Map[(Long, Long), Long]()
    posting.values.foreach { ds =>
      val ids = ds.map(_._2).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length)
        counts(ids(i) -> ids(j)) = counts.getOrElse(ids(i) -> ids(j), 0L) + 1
    }
    val qualifying = counts.filter(_._2 >= 3)
    val expected = qualifying.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(50)
      .map { case ((a, b), n) =>
        (a, b, n, n * 1000 / math.min(fps(a).size, fps(b).size)) }
    val got = dedup.Dedup.dedupWinnowPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_shared"), r.getAs[Long]("containment_pm")))
      .toSeq
    assert(got == expected)
  }

  test("knn_mrr equals the hand-computed reciprocal-rank sum and is " +
      "bounded by recall") {
    val brute = sim.Knn.knnBrute(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("nid")))
    val top1 = brute.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
    def mrrOf(rows: Array[(Long, Int, Long)]): (Long, Long) = {
      val rr = top1.toSeq.map { case (q, n) =>
        rows.find(r => r._1 == q && r._3 == n)
          .map(r => 60L / r._2).getOrElse(0L)
      }
      (rr.count(_ > 0).toLong, rr.sum)
    }
    val cen = sim.Knn.knnCentroid(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("nid")))
    val lsh = sim.Knn.knnLsh(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("nid")))
    val expected = Map("centroid" -> mrrOf(cen), "lsh" -> mrrOf(lsh))
    val got = sim.Knn.knnMrr(spark, sfDir).collect()
      .map(r => r.getAs[String]("method") ->
        (r.getAs[Long]("n_found"), r.getAs[Long]("rr60_sum"))).toMap
    assert(got == expected)
    sim.Knn.knnMrr(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("mrr_pm") <= 1000L)
      assert(r.getAs[Long]("rr60_sum") <= 60L * r.getAs[Long]("n_queries"))
    }
  }

  test("mm_image_histogram: real codec output equals the gradient " +
      "formula for every seed") {
    (0L until 256L).foreach { m =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(
          multimodal.BinaryPipeline.encodeGradientPng(m)))
      val w = 8 + (m % 32).toInt
      val h = 8 + ((m * 7) % 32).toInt
      assert(img.getWidth == w && img.getHeight == h)
      val decoded = new Array[Long](16)
      val formula = new Array[Long](16)
      for (y <- 0 until h; x <- 0 until w) {
        decoded((img.getRGB(x, y) & 0xff) / 16) += 1
        formula(((m + x + y) % 256).toInt / 16) += 1
      }
      assert(decoded.toSeq == formula.toSeq, s"seed=$m")
    }
  }

  test("q46 cumulative distinct equals the naive expanding recount") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))" +
          " div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = rows.map(_._2).distinct.sorted
    val expected = days.map { d =>
      d -> rows.filter(_._2 <= d).map(_._1).distinct.length.toLong
    }.toMap
    val got = ops.Relational.q46(spark, sfDir).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Long]("cum_distinct"))
      .toMap
    assert(got == expected)
  }

  test("mask_winsorize caps at the exact type-1 order statistics") {
    val rows = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"),
        (col("c_acctbal").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getLong(1)))
    val expected = rows.groupBy(_._1).map { case (nk, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      val lo = sorted((n + 19) / 20 - 1)
      val hi = sorted((19 * n + 19) / 20 - 1)
      nk -> (n.toLong, sorted.count(_ < lo).toLong,
        sorted.count(_ > hi).toLong,
        sorted.map(v => math.max(math.min(v, hi), lo)).sum)
    }
    val got = graft.mask.MaskQueries.maskWinsorize(spark, sfDir).collect()
      .map(r => r.getAs[Number]("c_nationkey").longValue() ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_low"),
          r.getAs[Long]("n_high"), r.getAs[Long]("sum_after"))).toMap
    assert(got == expected)
  }

  test("str_conversion_lag equals the brute per-user first-pair scan") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val gaps = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val signups = rows.filter(_._2 == "signup").map(_._3)
      if (signups.isEmpty) None
      else {
        val s = signups.min
        val buys = rows.filter(r => r._2 == "purchase" && r._3 > s)
          .map(_._3)
        if (buys.isEmpty) None
        else Some((s / 86400000000L, (buys.min - s) / 1000000L))
      }
    }
    val expected = gaps.groupBy(_._1).flatMap { case (day, gs) =>
      val sorted = gs.map(_._2).sorted
      val n = sorted.length
      Seq((day, "p50", sorted((n + 1) / 2 - 1)),
        (day, "p90", sorted((9 * n + 9) / 10 - 1)))
    }.toSet
    val got = streaming.EventStreams.strConversionLag(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("cohort_day"),
        r.getAs[String]("quantile"), r.getAs[Long]("gap_s"))).toSet
    assert(got == expected)
  }

  test("pipe_mix_temperature flattens toward uniform without " +
      "reordering sources") {
    val rows = pipeline.CorpusPipeline.pipeMixTemperature(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("tokens"),
        r.getAs[Long]("raw_pm"), r.getAs[Long]("smoothed_pm"),
        r.getAs[Long]("boost_pm")))
    // shares are per-mille distributions (floor rounding loses <1 per
    // source); smoothing preserves the token ordering
    assert(math.abs(rows.map(_._3).sum - 1000L) <= rows.length)
    assert(math.abs(rows.map(_._4).sum - 1000L) <= rows.length)
    assert(rows.forall(r => r._5 == r._4 - r._3))
    val byTokens = rows.sortBy(_._2)
    assert(byTokens.map(_._4).sorted.sameElements(byTokens.map(_._4)),
      "smoothed shares must be monotone in tokens")
    // sqrt smoothing boosts the smallest source and shrinks the
    // largest (strictly, unless already uniform)
    if (byTokens.head._2 < byTokens.last._2) {
      assert(byTokens.head._5 >= 0)
      assert(byTokens.last._5 <= 0)
    }
    // exact-integer weight recomputation
    val tw = rows.map(r => math.floor(math.sqrt(r._2.toDouble) * 1000)
      .toLong).sum
    rows.foreach { r =>
      val w = math.floor(math.sqrt(r._2.toDouble) * 1000).toLong
      assert(r._4 == w * 1000 / tw)
    }
  }

  test("q47 gains table equals the sort-based decile recount") {
    val cents = Tables.orders(spark, sfDir)
      .select((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long"))
      .collect().map(_.getLong(0))
    val sorted = cents.sorted
    val n = sorted.length
    val bnds = (1 to 9).map(i => sorted((i * n + 9) / 10 - 1))
    val deciles = cents.groupBy(c => 1 + bnds.count(_ < c))
    val tot = cents.sum
    val expected = deciles.map { case (d, vs) =>
      d.toLong -> (vs.length.toLong, vs.sum) }
    val got = ops.Relational.q47(spark, sfDir).collect()
      .map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("revenue_cents")))
      .toMap
    assert(got == expected)
    // cumulative share is monotone and ends at ~1000 per-mille
    val cums = ops.Relational.q47(spark, sfDir).collect()
      .map(_.getAs[Long]("cum_share_pm"))
    assert(cums.sorted.sameElements(cums))
    assert(math.abs(cums.last - 1000L) <= 1, s"tot=$tot")
  }

  test("src_sidecar_checksum: every staged shard validates") {
    val rows = sources.SourceQueries.srcSidecarChecksum(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("count_ok") == 1L,
        s"count mismatch on ${r.getAs[String]("o_orderpriority")}")
      assert(r.getAs[Long]("checksum_ok") == 1L,
        s"checksum mismatch on ${r.getAs[String]("o_orderpriority")}")
      assert(r.getAs[Long]("n_expected") == r.getAs[Long]("n_read"))
    }
  }

  test("q48 semi-additive closing equals the sort-based last-per-" +
      "key-month") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))" +
          " div 86400000000").as("day"),
        col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = rows.groupBy(r => (r._1, r._2 / 30)).toSeq
      .map { case ((_, month), vs) =>
        month -> vs.maxBy(v => (v._2, v._3))._4 }
      .groupBy(_._1).map { case (m, cs) =>
        m -> (cs.size.toLong, cs.map(_._2).sum, cs.map(_._2).max) }
    val got = ops.Relational.q48(spark, sfDir).collect()
      .map(r => r.getAs[Long]("month") ->
        (r.getAs[Long]("n_accounts"), r.getAs[Long]("closing_total_cents"),
          r.getAs[Long]("max_closing_cents"))).toMap
    assert(got == expected)
  }

  test("cls_key_discovery: orderkey is the only key; ratios recompute") {
    val got = classify.ClassifyQueries.clsKeyDiscovery(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("candidate") ->
        (r.getAs[Long]("n_distinct"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("is_key"))).toMap
    assert(got("o_orderkey")._3 == 1L, "primary key must be discovered")
    assert(got("o_custkey")._3 == 0L)
    got.foreach { case (cand, (nd, nr, isKey)) =>
      assert(nd <= nr, cand)
      assert((isKey == 1L) == (nd == nr), cand)
    }
    // composite dominates its parts
    assert(got("o_custkey,o_orderdate")._1 >= got("o_custkey")._1)
    assert(got("o_custkey,o_orderdate")._1 >= got("o_orderdate")._1)
  }

  test("str_active_users sweep equals the naive trailing distinct") {
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000")
          .as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val days = ud.map(_._2)
    val expected = (days.min to days.max).map { d =>
      d -> (
        ud.filter(_._2 == d).map(_._1).distinct.length.toLong,
        ud.filter(u => u._2 >= d - 6 && u._2 <= d)
          .map(_._1).distinct.length.toLong,
        ud.filter(u => u._2 >= d - 29 && u._2 <= d)
          .map(_._1).distinct.length.toLong)
    }.toMap
    val got = streaming.EventStreams.strActiveUsers(spark, sfDir)
      .collect().map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
          r.getAs[Long]("mau"))).toMap
    assert(got == expected)
    got.values.foreach { case (d, w, m) =>
      assert(d <= w && w <= m, "windows must nest")
    }
  }

  test("cdc_resurrection counts exactly the delete-then-create " +
      "adjacencies") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    def op(t: String) =
      t match { case "signup" => "c"; case "error" => "d"; case _ => "u" }
    var res = 0L
    ev.groupBy(_._2).foreach { case (_, rows) =>
      val ops = rows.sortBy(r => (r._4, r._1)).map(r => op(r._3))
      res += ops.sliding(2).count(p =>
        p.length == 2 && p(0) == "d" && p(1) == "c")
    }
    val got = cdc.CdcQueries.resurrection(spark, sfDir)
      .agg(sum("n_resurrections"), sum("n_creates")).collect().head
    assert(got.getLong(0) == res)
    assert(got.getLong(1) == ev.count(r => op(r._3) == "c"))
  }

  test("q49 bloom-pruned join is lossless and the filter genuinely " +
      "prunes") {
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_size") >= 48),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("revenue_cents"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val got = ops.Relational.q49(spark, sfDir).collect()
      .map(r => r.getAs[String]("p_brand") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("revenue_cents"))).toMap
    assert(got == plain, "bloom pruning must not change the join result")
    // rebuild the filter and show it rejects most non-matching keys
    def h32(s: String, off: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.slice(off * 4, off * 4 + 4).map("%02x".format(_)).mkString, 16)
    }
    val dimKeys = Tables.part(spark, sfDir).filter(col("p_size") >= 48)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val bits = new Array[Long](256)
    dimKeys.foreach { k =>
      (0 until 3).foreach { i =>
        val p = (h32(k.toString, i) % 8192L).toInt
        bits(p / 32) |= (1L << (p % 32))
      }
    }
    def pass(k: Long): Boolean = (0 until 3).forall { i =>
      val p = (h32(k.toString, i) % 8192L).toInt
      ((bits(p / 32) >> (p % 32)) & 1L) == 1L
    }
    val factKeys = Tables.lineitem(spark, sfDir)
      .select("l_partkey").collect().map(_.getLong(0))
    val passed = factKeys.count(pass)
    assert(factKeys.forall(k => !dimKeys.contains(k) || pass(k)),
      "no false negatives")
    assert(passed < factKeys.length / 2,
      s"filter must prune: $passed of ${factKeys.length} passed")
  }

  test("txt_surprisal equals the whole-bit recomputation; bit bounds " +
      "hold") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        regexp_replace(trim(lower(col("text"))), "\\s+", " ").as("norm"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.flatMap { case (id, src, norm) =>
      norm.split(" ").filter(_.nonEmpty).map(t => (id, src, t)) }
    val cnt = toks.groupBy(_._3).map { case (t, v) => t -> v.length.toLong }
    val n = cnt.values.sum
    def bl(x: Long) = java.lang.Long.toBinaryString(x).length
    val perDoc = toks.groupBy(d => (d._1, d._2)).map { case ((_, src), v) =>
      (src, v.length.toLong, v.map(t => (bl(n) - bl(cnt(t._3))).toLong).sum)
    }
    val expected = perDoc.groupBy(_._1).map { case (src, ds) =>
      src -> (ds.size.toLong, ds.map(_._2).sum, ds.map(_._3).sum,
        ds.count(d => d._3 * 1000 / d._2 >= 9000).toLong)
    }
    val got = text.TextAnalysis.txtSurprisal(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("surprisal_bits"), r.getAs[Long]("n_high_docs")))
      .toMap
    assert(got == expected)
    // surprisal bounds: 0 for a token that is the whole corpus,
    // len(bin(n))-1 for a singleton
    cnt.values.foreach { c =>
      val s = bl(n) - bl(c)
      assert(s >= 0 && s <= bl(n) - 1)
    }
  }

  test("src_tar_archive: ustar block arithmetic holds for every " +
      "archive") {
    val rows = sources.SourceQueries.srcTarArchive(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_entries"),
        r.getAs[Long]("payload_bytes"), r.getAs[Long]("archive_bytes")))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, payload, archive) =>
      assert(n == 2 + id % 3)
      assert(archive % 512 == 0, "tar archives are block-aligned")
      // headers + terminator + padded payload reconstruct the size
      assert(archive >= 512 * n + 1024 + payload)
      assert(archive < 512 * n + 1024 + payload + 512 * n)
    }
  }

  test("emb_matryoshka_recall: recall grows with prefix width and is " +
      "bounded by k") {
    val rows = sim.EmbOps.embMatryoshkaRecall(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("trunc_dims"), r.getAs[Long]("n_queries"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("min_hits")))
      .sortBy(_._1)
    assert(rows.map(_._1).sameElements(Array(8, 16, 32)))
    rows.foreach { case (_, nq, hits, minh) =>
      assert(hits <= 5 * nq)
      assert(minh >= 0 && minh <= 5)
    }
    // wider prefixes can only see more of the full-width structure
    // (not strictly monotone in theory, but 8 -> 32 must not collapse)
    val byDim = rows.map(r => r._1 -> r._3).toMap
    assert(byDim(32) >= byDim(8),
      s"recall collapsed: 8-dim ${byDim(8)} vs 32-dim ${byDim(32)}")
  }

  test("str_attribution equals the per-purchase scan of candidate " +
      "clicks") {
    val week = 7L * 86400000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    var purchases = 0L
    var attributed = 0L
    var agree = 0L
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val seq = rows.sortBy(r => (r._4, r._2))
      seq.indices.foreach { i =>
        val (_, _, typ, pus) = seq(i)
        if (typ == "purchase") {
          purchases += 1
          val lastClick = seq.take(i).reverse
            .find(_._3 == "click").map(_._4)
          // range frame: clicks at the same timestamp also qualify
          val firstIn7d = seq.filter(r => r._3 == "click" &&
            r._4 >= pus - week && r._4 <= pus).map(_._4).minOption
          val attr = lastClick.exists(_ >= pus - week)
          if (attr) {
            attributed += 1
            if (firstIn7d == lastClick) agree += 1
          }
        }
      }
    }
    val got = streaming.EventStreams.strAttribution(spark, sfDir)
      .agg(sum("n_purchases"), sum("n_attributed"), sum("n_models_agree"))
      .collect().head
    assert(got.getLong(0) == purchases)
    assert(got.getLong(1) == attributed)
    assert(got.getLong(2) == agree)
  }

  test("str_ewma_smooth equals the sequential dyadic fold") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"),
        expr("cast(floor(value * 1000) as long)").as("vm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val acc = scala.collection.mutable.Map[String, (Long, Long, Long)]()
    ev.groupBy(_._2).foreach { case (_, rows) =>
      val seq = rows.sortBy(r => (r._4, r._1))
      seq.indices.foreach { i =>
        val window = (0 until 32).flatMap { j =>
          if (i - j >= 0) Some((seq(i - j)._5, 1L << (31 - j))) else None
        }
        val s = window.map { case (v, w) => v * w }.sum
        val wt = window.map(_._2).sum
        val e = s / wt
        val typ = seq(i)._3
        val (n0, s0, m0) = acc.getOrElse(typ, (0L, 0L, Long.MinValue))
        acc(typ) = (n0 + 1, s0 + e, math.max(m0, e))
      }
    }
    val got = streaming.EventStreams.strEwmaSmooth(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("ewma_milli_sum"),
          r.getAs[Long]("ewma_milli_max"))).toMap
    assert(got == acc.toMap)
  }
}
