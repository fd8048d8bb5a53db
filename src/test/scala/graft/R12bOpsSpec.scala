package graft

import org.apache.spark.sql.functions._

/** Round-12b pins: engine-independent laws for the second r12 batch —
  * skyline minimality vs the naive dominance definition, tau-b vs a
  * from-scratch recount of the same cell frame, k-map's sample-vs-
  * population orderings, and the mboxrd munge/unmunge inverse on
  * hostile inputs the fixture corpus can't produce. */
class R12bOpsSpec extends SparkSpec {

  test("q71_skyline: frontier equals the naive NOT-EXISTS dominance " +
      "definition and no frontier point dominates another") {
    val rows = ops.Relational.q71(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // recompute the frontier from first principles on the collapsed
    // (brand, price, min size) frame
    val pts = Tables.part(spark, sfDir)
      .select(col("p_brand").as("b"),
        (col("p_retailprice").cast("decimal(18,2)") * 100)
          .cast("long").as("pc"),
        col("p_size").cast("long").as("sz"))
      .groupBy("b", "pc").agg(min("sz").as("ms"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val naive = pts.filter { case (b, pc, ms) =>
      !pts.exists { case (b2, pc2, ms2) =>
        b2 == b && pc2 <= pc && ms2 <= ms &&
          (pc2 < pc || ms2 < ms)
      }
    }.map { case (b, pc, ms) => (b, pc, ms) }.toSet
    val got = rows.map(r => (r.getAs[String]("brand"),
      r.getAs[Long]("price_cents"), r.getAs[Long]("min_size"))).toSet
    assert(got === naive, "two-level frontier must equal the naive one")
    // internal minimality: the frontier is an antichain
    for (a <- got; c <- got if a != c && a._1 == c._1)
      assert(!(c._2 <= a._2 && c._3 <= a._3 &&
        (c._2 < a._2 || c._3 < a._3)),
        s"$c dominates $a inside the frontier")
    // n_parts counts the parts sitting exactly on the frontier point
    val cellCount = Tables.part(spark, sfDir)
      .select(col("p_brand").as("b"),
        (col("p_retailprice").cast("decimal(18,2)") * 100)
          .cast("long").as("pc"),
        col("p_size").cast("long").as("sz"))
      .groupBy("b", "pc", "sz").count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    rows.foreach { r =>
      val key = (r.getAs[String]("brand"), r.getAs[Long]("price_cents"),
        r.getAs[Long]("min_size"))
      assert(r.getAs[Long]("n_parts") === cellCount(key))
    }
  }

  test("twoLevelStrictPrefixMin: equals the naive strict-prefix window " +
      "min at several shard widths") {
    import spark.implicits._
    val df = (1 to 500).map(i =>
      ((i * 37) % 13, (i * 101) % 997L, (i * 71) % 50L))
      .toDF("g", "ord", "v")
      // make ord unique per group for a total order
      .groupBy("g", "ord").agg(min("v").as("v"))
    val naive = df.withColumn("m",
      min(col("v")).over(org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy("ord")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)))
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    for (w <- Seq(1L, 8L, 64L, 1024L)) {
      val got = ops.OrderStats.twoLevelStrictPrefixMin(df, Seq("g"),
        Seq(expr(s"ord div $w")), Seq(col("ord")), col("v"), "m")
        .collect().map(r => (r.getInt(0), r.getLong(1)) ->
          Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      assert(got === naive, s"shard width $w diverges from the window")
    }
  }

  test("cls_kendall_tau: published stats equal a from-scratch recount " +
      "and tau_b lies in [-1000, 1000] with the gamma sign") {
    val rows = classify.ClassifyQueries.clsKendallTau(spark, sfDir)
      .collect()
    assert(rows.length === 3)
    val gamma = classify.ClassifyQueries.clsGammaAssoc(spark, sfDir)
      .collect().map(r => r.getAs[String]("pair") ->
        r.getAs[Long]("gamma_pm")).toMap
    // rebuild the cell frame once, recount everything in Scala
    val cells = Tables.lineitem(spark, sfDir)
      .select(floor(col("l_quantity")).cast("long").as("q"),
        floor(col("l_discount") * 1000).cast("long").as("d"),
        floor(col("l_tax") * 1000).cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def recount(xy: ((Long, Long, Long)) => (Long, Long)):
        (Long, Long, Long, Long, Long) = {
      val m = cells.groupBy(xy).view.mapValues(_.length.toLong).toMap
      val ks = m.keys.toArray
      var c = 0L; var d = 0L
      for (i <- ks.indices; j <- ks.indices if ks(j)._1 > ks(i)._1) {
        if (ks(j)._2 > ks(i)._2) c += m(ks(i)) * m(ks(j))
        else if (ks(j)._2 < ks(i)._2) d += m(ks(i)) * m(ks(j))
      }
      val n = m.values.sum
      val tx = m.groupBy(_._1._1).values
        .map(g => { val s = g.values.sum; s * (s - 1) / 2 }).sum
      val ty = m.groupBy(_._1._2).values
        .map(g => { val s = g.values.sum; s * (s - 1) / 2 }).sum
      (c, d, tx, ty, n)
    }
    val expect = Map(
      "qty_vs_disc" -> recount(r => (r._1, r._2)),
      "qty_vs_tax" -> recount(r => (r._1, r._3)),
      "disc_vs_tax" -> recount(r => (r._2, r._3)))
    rows.foreach { r =>
      val pair = r.getAs[String]("pair")
      val (c, d, tx, ty, n) = expect(pair)
      assert(r.getAs[Long]("c_pairs") === c)
      assert(r.getAs[Long]("d_pairs") === d)
      assert(r.getAs[Long]("tie_x") === tx)
      assert(r.getAs[Long]("tie_y") === ty)
      val n0 = n * (n - 1) / 2
      val num = BigInt(c - d) * BigInt(c - d) * 1000000
      val den = BigInt(n0 - tx) * BigInt(n0 - ty)
      val want = (c - d).sign *
        math.sqrt((num / den).toDouble).floor.toLong
      val tau = r.getAs[Long]("tau_b_pm")
      assert(tau === want, s"$pair tau recount")
      assert(tau >= -1000 && tau <= 1000)
      // gamma and tau-b share the (C - D) numerator → same sign
      assert(tau.sign * gamma(pair).sign >= 0, s"$pair sign vs gamma")
    }
  }

  test("mask_k_map: population k dominates sample k, totals conserve " +
      "the released sample") {
    val rows = graft.mask.MaskQueries.maskKMap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val sampleN = Tables.customer(spark, sfDir)
      .filter(pmod(graft.mask.MaskFunctions.portableHash(
        col("c_custkey")), lit(10)) === 0)
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[String]("c_mktsegment")).toSet ===
      sampleN.keySet)
    rows.foreach { r =>
      val seg = r.getAs[String]("c_mktsegment")
      val released = r.getAs[Long]("n_released")
      assert(released === sampleN(seg), "released rows conserve")
      val su = r.getAs[Long]("n_sample_unique")
      val pu = r.getAs[Long]("n_pop_unique")
      val pr = r.getAs[Long]("n_pop_risk")
      val fa = r.getAs[Long]("n_false_alarm")
      // the sample is a subset: pop_k >= samp_k, so every
      // population-unique released row is sample-unique too
      assert(pu <= su, "population-unique ⊆ sample-unique")
      assert(pu <= pr, "k=1 rows are k<5 rows")
      assert(pr <= released)
      assert(fa <= su, "false alarms are sample-unique by definition")
      // sample-unique rows split exactly into pop-safe (false alarm)
      // and pop-risky ones — fa = su − (sample-unique ∧ pop_k < 5) ≥
      // su − pr
      assert(fa >= su - pr)
    }
  }

  test("src_mbox_ingest: roundtrip equals the source aggregate and the " +
      "mboxrd munge/unmunge pair inverts on hostile bodies") {
    import spark.implicits._
    val got = sources.SourceQueries.mboxIngest(spark, sfDir).collect()
    val want = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n_msgs"),
        sum("doc_id").as("sum_doc_id"),
        sum(length(col("text"))).as("sum_body_chars"))
      .orderBy("lang").collect()
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
    // the regex pair, on bodies the corpus can't produce: leading
    // From, quoted >From at every depth, From mid-line (untouched)
    val hostile = Seq(
      "From the start\nmid From line\n>From quoted\n>>From deeper",
      "From a\nFrom b\nFrom c",
      ">>>From x\n>not-a-from\nFrom ")
    val rt = hostile.toDF("b")
      .select(regexp_replace(regexp_replace(col("b"),
        "(?m)^(>*From )", ">$1"),
        "(?m)^>(>*From )", "$1").as("rt"), col("b"))
      .collect()
    rt.foreach(r => assert(r.getString(0) === r.getString(1),
      "unmunge(munge(x)) must equal x"))
    // and munging genuinely changes every hostile body (the writer
    // path is not a no-op where it matters)
    val munged = hostile.toDF("b")
      .select(regexp_replace(col("b"), "(?m)^(>*From )", ">$1"))
      .collect().map(_.getString(0))
    hostile.zip(munged).foreach { case (a, b) => assert(a != b) }
  }
}
