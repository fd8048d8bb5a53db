package graft

import org.apache.spark.sql.functions._
import graft.ops.{OrderStats, Relational}

/** Brute-force agreement + property pins for the round-9 operators:
  * every scale-shaped implementation (radix selection, prefix-max
  * skyline, bucketed band join, bounded triangle join) must equal the
  * naive formulation on data small enough to compute it. */
class R9OpsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(90)

  test("radixLowerMedian equals the sort-based lower median, any shift") {
    // groups of wildly different sizes and value ranges, duplicates
    // included; the lower median is the ⌈n/2⌉-th smallest
    val rows = (1 to 4).flatMap { g =>
      val n = g * g * 37 + rnd.nextInt(20)
      (1 to n).map(_ => (s"g$g", math.abs(rnd.nextLong()) % (g match {
        case 1 => 10L          // tiny domain, heavy ties
        case 2 => 100000L      // fits one bucket at shift 20
        case 3 => 1L << 40     // spans many buckets
        case _ => 3L
      })))
    }
    val df = rows.toDF("g", "v")
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      g -> (sorted.length.toLong, sorted(((sorted.length + 1) / 2) - 1))
    }
    for (shift <- Seq(4, 12, 20)) {
      val got = OrderStats.radixLowerMedian(df, Seq("g"), "v", shift)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n"), r.getAs[Long]("median"))).toMap
      assert(got == expected, s"shift=$shift")
    }
  }

  test("weighted radix median equals the repeat-expansion median") {
    val rows = (1 to 150).map(_ =>
      ("g", math.abs(rnd.nextLong()) % 5000L, 1L + rnd.nextInt(9)))
    val df = rows.toDF("g", "v", "w")
    val expanded = rows.flatMap { case (_, v, w) =>
      Seq.fill(w.toInt)(v) }.sorted
    val expected = expanded(((expanded.length + 1) / 2) - 1)
    val got = OrderStats.radixLowerMedianWeighted(
        df, Seq("g"), "v", col("w"), 8)
      .collect().head
    assert(got.getAs[Long]("median") == expected)
    assert(got.getAs[Long]("n") == expanded.length.toLong)
  }

  test("q40 skyline equals the brute-force dominance filter") {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_size"),
        (col("p_retailprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val brute = parts.filter { case (_, sz, c) =>
      !parts.exists { case (_, sz2, c2) =>
        c2 <= c && sz2 >= sz && (c2 < c || sz2 > sz) }
    }.map(_._1).toSet
    val got = Relational.q40(spark, sfDir)
      .collect().map(_.getAs[Long]("p_partkey")).toSet
    assert(got == brute)
  }

  test("q38 band join equals the naive theta join") {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"),
        (col("p_retailprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val naive = parts.groupBy(_._2).view.mapValues { ps =>
      val pairs = for {
        a <- ps; b <- ps
        if a._1 < b._1 && math.abs(a._3 - b._3) <= 50
      } yield math.abs(a._3 - b._3)
      (pairs.size.toLong, pairs.sum)
    }.toMap.filter(_._2._1 > 0)
    val got = Relational.q38(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("gap_cents_sum"))).toMap
    assert(got == naive)
  }

  test("q41 mode equals the brute-force frequency argmax") {
    val qs = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        floor(col("l_quantity")).cast("long").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val brute = qs.groupBy(_._1).map { case (g, vs) =>
      val counts = vs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val mc = counts.values.max
      g -> (counts.filter(_._2 == mc).keys.min, mc)
    }
    val got = Relational.q41(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("mode_qty"), r.getAs[Long]("mode_count"))).toMap
    assert(got == brute)
  }

  test("knn_triangles equals the brute-force census on the edge set") {
    val edges = graft.sim.Knn.knnGraph(spark, sfDir)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val brute = (for {
      (x, y) <- edges; (x2, z) <- edges
      if x2 == x && y < z && edges.contains((y, z))
    } yield (x, y, z)).size.toLong
    val deg = nodes.map(v =>
      v -> edges.count(e => e._1 == v || e._2 == v).toLong).toMap
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val row = graft.sim.Knn.knnTriangles(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_triangles") == brute)
    assert(row.getAs[Long]("n_wedges") == wedges)
    assert(row.getAs[Long]("n_nodes") == nodes.size.toLong)
    assert(row.getAs[Long]("n_edges") == edges.size.toLong)
  }

  test("mask_shuffle preserves each nation's value multiset exactly") {
    val orig = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"),
        (col("c_acctbal").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val shuffled = graft.mask.MaskQueries.maskShuffle(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Int]("c_nationkey"),
        r.getAs[Long]("shuffled_cents")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(shuffled == orig,
      "shuffling must permute values within the group, never alter them")
  }

  test("probe sweep recall is monotone in nProbe") {
    val rows = graft.sim.Knn.knnProbeSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("n_probe"))
    val hits = rows.map(_.getAs[Long]("n_hits"))
    assert(hits.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      s"recall regressed across probe counts: ${hits.toSeq}")
    assert(rows.last.getAs[Long]("n_hits") > 0)
  }

  test("txt_heaps: cumulative columns are monotone; final vocab exact") {
    val rows = graft.text.TextAnalysis.txtHeaps(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("decile"))
    for (c <- Seq("docs_n", "tokens_n", "vocab_n")) {
      val vs = rows.map(_.getAs[Long](c))
      assert(vs.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"$c not monotone")
    }
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .select("w").distinct().count()
    assert(rows.last.getAs[Long]("vocab_n") == vocab)
    assert(rows.last.getAs[Long]("docs_n") ==
      Tables.documents(spark, sfDir).count())
  }

  test("q42 quantile panel equals sort-based type-1 selection") {
    val cents = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = cents.groupBy(_._1).flatMap { case (g, vs) =>
      val s = vs.map(_._2).sorted
      val n = s.length.toLong
      def sel(k: Long) = s((k - 1).toInt)
      Seq(((g, "p25"), sel((n + 3) / 4)), ((g, "p50"), sel((n + 1) / 2)),
        ((g, "p75"), sel((3 * n + 3) / 4)),
        ((g, "p90"), sel((9 * n + 9) / 10)),
        ((g, "p99"), sel((99 * n + 99) / 100)))
    }.toMap
    val got = Relational.q42(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[String]("quantile")) ->
        r.getAs[Long]("cents")).toMap
    assert(got == expected)
  }

  test("str_interarrival quantiles equal sort-based gap selection") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val gaps = ev.groupBy(e => (e._2, e._1)).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._4, e._3)).toSeq.sliding(2).collect {
        case Seq(a, b) => (a._1, (b._4 - a._4) / 1000000L)
      }
    }
    val expected = gaps.groupBy(_._1).flatMap { case (t, gs) =>
      val s = gs.map(_._2).sorted
      val n = s.length.toLong
      Seq(((t, "p50"), s(((n + 1) / 2 - 1).toInt)),
        ((t, "p95"), s(((19 * n + 19) / 20 - 1).toInt)))
    }.toMap
    val got = graft.streaming.EventStreams.strInterarrival(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getAs[String]("quantile")) ->
        r.getAs[Long]("gap_s")).toMap
    assert(got == expected)
  }

  test("str_change_points: cusum telescopes to zero; peak is the argmax") {
    val rows = graft.streaming.EventStreams.strChangePoints(spark, sfDir)
      .orderBy("day_start").collect()
    // Σ(D·cᵢ − T) over the full spine is D·T − D·T = 0 exactly
    assert(rows.last.getAs[Long]("cusum") == 0L)
    val mx = rows.map(r => math.abs(r.getAs[Long]("cusum"))).max
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_peak") ==
        (math.abs(r.getAs[Long]("cusum")) == mx))
    }
    assert(rows.count(_.getAs[Boolean]("is_peak")) >= 1)
  }

  test("q43 histogram-product estimate IS the exact equi-join size") {
    val r = Relational.q43(spark, sfDir).collect().head
    val actual = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(r.getAs[Long]("est_rows") == actual,
      "Σ cA(k)·cB(k) must equal the executed join's row count")
    assert(r.getAs[Long]("n_common_keys") <=
      math.min(r.getAs[Long]("n_keys_left"), r.getAs[Long]("n_keys_right")))
  }

  test("src_zorder_layout: buckets partition the corpus into tight boxes") {
    val rows = graft.sources.SourceQueries.srcZorderLayout(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables.lineitem(spark, sfDir).count())
    // the z-key's top 8 bits fix the top 4 bits of EACH dimension, so
    // no bucket's bounding box can exceed a 4096x4096 cell
    rows.foreach { r =>
      assert(r.getAs[Long]("bbox_area") <= 4096L * 4096L,
        s"bucket ${r.getAs[Long]("bucket")} leaks past its z-cell")
    }
  }

  test("knn_cell_balance: mass identities and the Cauchy-Schwarz floor") {
    val r = graft.sim.Knn.knnCellBalance(spark, sfDir).collect().head
    val (cells, vecs) = (r.getAs[Long]("n_cells"), r.getAs[Long]("n_vectors"))
    assert(vecs == Tables.embeddings(spark, sfDir).count())
    assert(r.getAs[Long]("max_cell") >= r.getAs[Long]("min_cell"))
    assert(r.getAs[Long]("balance_pm") >= 1000,
      "max cell cannot sit below the mean")
    // Σm² ≥ (Σm)²/cells, equality iff perfectly balanced
    assert(r.getAs[Long]("sum_sq") * cells >= vecs * vecs)
  }

  test("mask_retention_sweep matches a direct recount of the policy") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), to_date(col("o_orderdate")).as("d"))
      .collect().map(r => (r.getString(0), r.getAs[java.sql.Date](1)))
    val anchor = rows.map(_._2.toLocalDate).max(
      Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    def ret(p: String) =
      if (p == "1-URGENT") 200L else if (p == "2-HIGH") 400L else 800L
    val exp = rows.groupBy(_._1).map { case (p, rs) =>
      p -> rs.count(r => anchor.toEpochDay - r._2.toLocalDate.toEpochDay
        > ret(p)).toLong
    }
    val got = graft.mask.MaskQueries.maskRetentionSweep(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_expired"))
      .toMap
    assert(got == exp)
  }

  test("str_topk_drift: overlap bounded by the top-k set algebra") {
    val rows = graft.streaming.EventStreams.strTopkDrift(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, np, sh) = (r.getAs[Long]("n_top"), r.getAs[Long]("n_prev"),
        r.getAs[Long]("n_shared"))
      assert(nt <= 5 && np <= 5 && sh <= math.min(nt, np))
      assert(r.getAs[Long]("overlap_pm") ==
        sh * 1000 / (nt + np - sh))
    }
  }

  test("cls_null_profile matches a direct recount of the sparsity masks") {
    val keys = Tables.orders(spark, sfDir).select("o_orderkey")
      .collect().map(_.getLong(0))
    val exp = Map(
      "o_custkey" -> keys.count(_ % 7 == 0).toLong,
      "o_totalprice" -> keys.count(_ % 13 == 0).toLong,
      "o_orderpriority" -> keys.count(_ % 5 == 0).toLong,
      "_rows_any_null" ->
        keys.count(k => k % 7 == 0 || k % 13 == 0 || k % 5 == 0).toLong)
    val got = graft.classify.ClassifyQueries.clsNullProfile(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_null")).toMap
    assert(got == exp)
  }

  test("knn_hubness: histogram mass equals edges and vectors exactly") {
    val rows = graft.sim.Knn.knnHubness(spark, sfDir).collect()
    val edgeMass = rows.map(r =>
      r.getAs[Long]("d") * r.getAs[Long]("n_nodes")).sum
    val nodeMass = rows.map(_.getAs[Long]("n_nodes")).sum
    assert(edgeMass == graft.sim.Knn.directedEdges(spark, sfDir).count(),
      "Σ d·n_nodes must equal the directed edge count")
    assert(nodeMass == Tables.embeddings(spark, sfDir).count(),
      "Σ n_nodes (orphans included) must equal the vector count")
  }

  test("pipe_shard_skew agrees with a direct fold of the manifest") {
    val m = graft.pipeline.CorpusPipeline.pipeShardManifest(spark, sfDir)
      .collect().map(_.getAs[Long]("n_tokens"))
    val r = graft.pipeline.CorpusPipeline.pipeShardSkew(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_shards") == m.length.toLong)
    assert(r.getAs[Long]("tokens_max") == m.max)
    assert(r.getAs[Long]("straggler_pm") ==
      m.max * m.length * 1000 / m.sum)
    assert(r.getAs[Long]("straggler_pm") >= 1000,
      "max cannot sit below the mean")
    assert(r.getAs[Long]("n_hot") ==
      m.count(t => t * 2 * m.length > m.sum * 3).toLong)
  }

  test("emb_dim_stats: uniform n, non-negative variance numerator, " +
      "sums match a direct per-dim fold") {
    val rows = graft.sim.EmbOps.embDimStats(spark, sfDir).collect()
    val ns = rows.map(_.getAs[Long]("n")).distinct
    assert(ns.length == 1, s"ragged dim counts: ${ns.toSeq}")
    rows.foreach(r => assert(r.getAs[Long]("var_num") >= 0L,
      s"Cauchy-Schwarz violated at dim ${r.getAs[Int]("dim")}"))
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).map(x => math.floor(x * 1000).toLong))
    val dims = vecs.head.length
    val expSum = Array.fill(dims)(0L)
    vecs.foreach(v => v.indices.foreach(i => expSum(i) += v(i)))
    val gotSum = rows.sortBy(_.getAs[Int]("dim"))
      .map(_.getAs[Long]("sum_milli"))
    assert(gotSum.toSeq == expSum.toSeq)
  }
}
