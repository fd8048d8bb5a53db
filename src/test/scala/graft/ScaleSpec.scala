package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Scale-mechanics specs: salting preserves join semantics while
  * spreading hot keys; bucketing removes the join shuffle entirely. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("heavy hitters: exact answer, and the MG guarantee holds on skew") {
    // adversarial skew: one value at 40%, one at 5%, rest unique
    val data = (Seq.fill(4000)(77L) ++ Seq.fill(500)(88L) ++
      (1L to 5500L).map(_ + 1000000L))
    val df = scala.util.Random.shuffle(data).toDF("v").repartition(8)
    val exact = df.groupBy("v").count()
      .filter(col("count") * 100 > data.length).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // the operator's answer must equal the plain groupBy+having
    val viaQuery = {
      // same machinery as q34, inlined on the synthetic frame
      val k = 100
      val candidates = df.as[Long].mapPartitions { it =>
        val counters = scala.collection.mutable.LongMap.empty[Long]
        it.foreach { v =>
          if (counters.contains(v)) counters(v) += 1L
          else if (counters.size < k - 1) counters(v) = 1L
          else counters.keys.toArray.foreach { key =>
            val c = counters(key)
            if (c == 1L) counters.remove(key) else counters(key) = c - 1L
          }
        }
        counters.keysIterator
      }.distinct()
      val cand = candidates.collect().toSet
      // MG guarantee: every true heavy value survives pass 1
      assert(exact.keySet.subsetOf(cand),
        s"MG lost heavy values: ${exact.keySet -- cand}")
      // candidate set stays bounded by partitions*(k-1)
      assert(cand.size <= 8 * (k - 1), s"candidate blow-up: ${cand.size}")
      df.join(broadcast(candidates.toDF("v")), "v")
        .groupBy("v").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * k > data.length)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    assert(viaQuery == exact)
    assert(exact.contains(77L) && exact.contains(88L))
  }

  test("salted join returns exactly the plain join's rows") {
    // pathological skew: 90% of the big side hits one key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val small = Seq((7L, "hot"), (10L, "a"), (20L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .as[(Long, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), col("v"), salts = 8)
      .select("k", "v", "name").as[(Long, Int, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 7L) == 1800)
  }

  test("salt is deterministic and spreads a hot key across buckets") {
    val df = (1 to 1000).map(i => (7L, i)).toDF("k", "v")
    val salts = df.select(Skew.salt(col("v"), 8).as("s"))
      .groupBy("s").count().as[(Int, Long)].collect().toMap
    assert(salts.keySet.subsetOf((0 until 8).toSet))
    assert(salts.size == 8, s"expected all 8 salt buckets used: $salts")
    // deterministic on recompute
    val again = df.select(Skew.salt(col("v"), 8).as("s"))
      .groupBy("s").count().as[(Int, Long)].collect().toMap
    assert(salts == again)
  }

  test("bucketed tables join without a shuffle (the 100 TB co-location path)") {
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("graft_orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("graft_lineitem_b")
    val joined = spark.table("graft_lineitem_b")
      .join(spark.table("graft_orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not introduce an Exchange: bucket layout
    // already co-locates both sides (only the final agg may shuffle)
    val joinPart = plan.split("HashAggregate").last
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join should be shuffle-free:\n$plan")
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
  }

  test("bucketed median equals the sort-based median exactly") {
    import graft.ops.OrderStats
    val rnd = new scala.util.Random(7)
    // random groups (odd + even sizes) plus a constant-value group
    // (bucket width 0) — the degenerate case the clamp handles
    val rows = (1 to 501).map(i => (s"g${i % 3}", rnd.nextDouble() * 1000)) ++
      Seq.fill(4)(("const", 5.0))
    val got = OrderStats.bucketedMedian(rows.toDF("g", "v"), Seq("g"), "v",
        buckets = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    for ((g, vs) <- rows.groupBy(_._1)) {
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      val expect = (sorted((n + 1) / 2 - 1) + sorted((n + 2) / 2 - 1)) / 2
      assert(got(g)._1 == n && got(g)._2 == expect,
        s"group $g: got ${got(g)}, want ($n, $expect)")
    }
  }

  test("two-level packing and interleave are shard-width-invariant") {
    // the two-level prefix-sum decomposition must produce bit-identical
    // output for ANY shard width — width 1 shard (≡ the single global
    // window it replaces) and two different sharded widths must agree
    import graft.pipeline.CorpusPipeline
    val docs = Tables.documents(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    val packGlobal = rows(CorpusPipeline.packSequences(docs, 2048, Long.MaxValue))
    assert(rows(CorpusPipeline.packSequences(docs, 2048, 64)) == packGlobal)
    assert(rows(CorpusPipeline.packSequences(docs, 2048, 7)) == packGlobal)
    val ilGlobal = rows(CorpusPipeline.interleave(docs, 20, hashShards = 1))
    assert(rows(CorpusPipeline.interleave(docs, 20, hashShards = 64)) == ilGlobal)
    assert(rows(CorpusPipeline.interleave(docs, 20, hashShards = 13)) == ilGlobal)
    val tbGlobal = rows(CorpusPipeline.tokenBudget(docs, 10000, hashShards = 1))
    assert(rows(CorpusPipeline.tokenBudget(docs, 10000, hashShards = 64)) == tbGlobal)
    assert(rows(CorpusPipeline.tokenBudget(docs, 10000, hashShards = 13)) == tbGlobal)
  }

  test("content-defined chunks re-synchronize after an insertion") {
    import graft.dedup.Dedup
    // doc 2 = doc 1 with 7 chars injected at the front. Content-chosen
    // boundaries must re-synchronize downstream of the edit, so most
    // of doc 2's chunks are fingerprint-identical to doc 1's — the
    // property fixed-stride blocking cannot have (every block after
    // the insertion point would shift and nothing would match).
    val rnd = new scala.util.Random(42)
    val s = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, s), (2L, "zqwerty" + s)).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, 8, 64).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((id, (n, dup)) <- out) {
      assert(n >= 10, s"doc $id: expected ~len/64 chunks, got $n")
      assert(dup * 2 >= n,
        s"doc $id: boundaries failed to re-sync ($dup of $n chunks shared)")
    }
    // and a doc with no shared content shares nothing
    val t = (1 to 2000).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
    val solo = Dedup.chunkDedup(
      Seq((1L, s), (2L, "zqwerty" + s), (3L, t)).toDF("doc_id", "text"),
      8, 64).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(solo(3L) == 0L, s"unrelated doc must share no chunks: $solo")
  }

  test("substring spans: exact island arithmetic, doc-bounded windows") {
    import graft.dedup.Dedup
    graft.expr.VectorExprs.register(spark)
    // doc 1 and 2 share a verbatim 20-token span at different offsets
    // inside otherwise globally-unique text; doc 3 is fully unique
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    def uniq(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, s"${uniq("a", 10)} $shared ${uniq("b", 5)}"),
      (2L, s"${uniq("c", 4)} $shared ${uniq("d", 9)}"),
      (3L, uniq("e", 40))).toDF("doc_id", "text")
    val out = Dedup.substringSpans(docs, 8, 16)
    out.collect() // finalize AQE before reading the plan
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // a 20-token shared span = 13 consecutive duplicated 8-grams;
    // span_tokens = 13 + 7 = 20, first position = the span's offset
    assert(got == Map(1L -> (1L, 20L, 10L), 2L -> (1L, 20L, 4L)),
      s"island arithmetic wrong: $got")
    // spans one token under the threshold must vanish entirely
    val shortShared = (1 to 15).map(i => s"t$i").mkString(" ")
    val short = Seq(
      (1L, s"${uniq("f", 10)} $shortShared"),
      (2L, s"${uniq("g", 10)} $shortShared")).toDF("doc_id", "text")
    assert(Dedup.substringSpans(short, 8, 16).collect().isEmpty)
    // shape: the island window partitions by doc_id (bounded
    // partitions), and nothing nested-loops or cartesians
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("hashpartitioning(doc_id"),
      s"island window must partition by doc_id:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"substring spans must stay equi-join only:\n$plan")
  }

  test("twoLevelRunningSum: shard-width-invariant and equal to the " +
      "global window it replaces (rank + weighted forms)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"),
        (col("c_acctbal").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
    // oracle: the per-nation global row_number the decomposition kills
    val want = c.withColumn("r", row_number().over(
        Window.partitionBy("c_nationkey")
          .orderBy("cents", "c_custkey")).cast("long"))
      .select("c_custkey", "r").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (w <- Seq(1L << 14, 1L << 20, 1L << 62)) {
      val got = graft.ops.OrderStats.twoLevelRunningSum(c,
          Seq("c_nationkey"), Seq(expr(s"(cents + 100000) div $w")),
          Seq(col("cents"), col("c_custkey")), lit(1L), "r")
        .select("c_custkey", "r").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"rank diverges at shard width $w")
    }
    // weighted form (q62's shape): running cents sum in value order,
    // composite exact-value + key-range shards included
    val wantSum = c.withColumn("s", sum(col("cents")).over(
        Window.orderBy(col("cents").desc, col("c_custkey"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select("c_custkey", "s").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (shards <- Seq(
        Seq(expr("(0 - cents) div 1048576")),
        Seq(lit(0L) - col("cents"), expr("c_custkey div 64")))) {
      val got = graft.ops.OrderStats.twoLevelRunningSum(c, Nil, shards,
          Seq(col("cents").desc, col("c_custkey")), col("cents"), "s")
        .select("c_custkey", "s").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == wantSum, s"running sum diverges for shards $shards")
    }
  }

  test("KS drift is shard-width-invariant (the decomposition is plumbing)") {
    val orders = Tables.orders(spark, sfDir)
    def run(w: Long) = graft.classify.ClassifyQueries.ksDrift(orders, w)
      .collect().map(_.toSeq).toSeq
    val base = run(1L << 20)
    assert(base == run(1L << 14), "narrow shards must not change the sup")
    assert(base == run(1L << 30), "one giant shard must not change the sup")
  }

  test("lateness audit is shard-width-invariant") {
    val events = Tables.events(spark, sfDir)
    def run(w: Long) = graft.streaming.EventStreams.latenessAudit(events, w)
      .collect().map(_.toSeq).toSeq
    val base = run(1024L)
    assert(base == run(16L), "narrow shards must not change running max")
    assert(base == run(1L << 40), "one giant shard must not change it")
  }

  test("concurrency sweep is shard-width-invariant") {
    val events = Tables.events(spark, sfDir)
    def run(w: Long) = graft.streaming.EventStreams.concurrency(events, w)
      .collect().map(_.toSeq).toSeq
    val base = run(3600000000L)
    assert(base == run(60000000L), "narrow time shards must not change peaks")
    assert(base == run(1L << 60), "one giant shard must not change peaks")
  }

  test("weighted sample is deterministic and weight-monotone") {
    // the deterministic integer race: same sample regardless of
    // physical partitioning (TakeOrdered is order-insensitive), and
    // selection is biased toward heavier docs — the sample's mean
    // weight must exceed the corpus mean (A-ES contract)
    val docs = Tables.documents(spark, sfDir)
    val got = graft.pipeline.CorpusPipeline
      .weightedSample(docs, 100).collect().map(_.toSeq).toSeq
    for (reshaped <- Seq(docs.repartition(7, col("lang")),
        docs.repartition(64), docs.coalesce(1))) {
      val again = graft.pipeline.CorpusPipeline
        .weightedSample(reshaped, 100).collect().map(_.toSeq).toSeq
      assert(got == again,
        "weighted sample must be partitioning-invariant")
    }
    val meanSample = got.map(_(3).asInstanceOf[Long].toDouble).sum /
      got.size
    val meanCorpus = docs.agg(avg(expr("1 + n_chars div 64")))
      .collect().head.getDouble(0)
    assert(meanSample > meanCorpus,
      f"weighted draw not biased to heavy docs: " +
        f"sample mean $meanSample%.1f vs corpus $meanCorpus%.1f")
  }

  test("LSH sweep sample mode: the S-curve is sampling-invariant " +
      "(sf0.1, gate=2)") {
    // the production contract behind `sampleGate`: the tuning table's
    // YIELD column — the number the banding decision reads — must
    // survive hash-sampling the corpus, while the candidate COUNT
    // (the cost column) genuinely shrinks ~k²-fold. Run both modes on
    // the big fixture: same configs, close yields, far fewer pairs.
    val dir = "/root/testdata/sf0.1"
    def sweep(gate: Int): Map[Long, (Long, Long, Long)] =
      graft.dedup.Dedup.dedupLshSweep(spark, dir, gate).collect()
        .map(r => r.getAs[Long]("bands") ->
          ((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_est_dup"),
            r.getAs[Long]("yield_pm")))).toMap
    val full = sweep(1)
    val sampled = sweep(2)
    assert(sampled.keySet == full.keySet,
      s"sampled sweep lost configs: ${full.keySet} vs ${sampled.keySet}")
    full.foreach { case (bands, (cand, _, y)) =>
      val (sc, _, sy) = sampled(bands)
      assert(sc * 2 < cand,
        s"bands=$bands: sampling did not thin the join ($sc vs $cand)")
      assert(math.abs(sy - y) <= 120,
        s"bands=$bands: S-curve moved under sampling — " +
          s"yield ${y}‰ full vs ${sy}‰ sampled")
    }
  }
}
