package graft

import org.apache.spark.sql.functions._

/** Round-10 pins: the Gear production rolling hash behind
  * content-defined chunking (expression vs a driver-side reference,
  * boundary re-sync under insertion on BOTH hash modes, and md5/gear
  * parity on the cut-point interface contract). */
class R10OpsSpec extends SparkSpec {

  import spark.implicits._
  import graft.dedup.Dedup

  /** Driver-side reference gear scan — independent of the codegen
    * path: same table, same 6-bit masked state, same cut domain. */
  private def refCuts(bytes: Array[Byte]): Seq[Int] = {
    val g = graft.expr.GearCuts.table
    var h = 0
    val out = Seq.newBuilder[Int]
    for (p <- bytes.indices) {
      h = ((h << 1) + g(bytes(p) & 0xff)) & 63
      if (p >= 5 && h == 0 && p < bytes.length - 1) out += (p + 2)
    }
    out.result()
  }

  test("r10 executed-plan pins: rank pushdown, map-only grams, " +
      "windowless gear chunking, no cartesian pair joins") {
    def plan(df: org.apache.spark.sql.DataFrame): String = {
      val qe = df.queryExecution
      qe.toRdd.count()
      qe.executedPlan.toString.split("== Initial Plan ==").head
    }
    // q56: the top-3 cut must push into the shuffle as a partial
    // WindowGroupLimit — the window never sorts more than k rows per
    // group per task
    val p56 = plan(ops.Relational.q56(spark, sfDir))
    assert(p56.contains("WindowGroupLimit") && p56.contains("Partial"),
      s"q56 must push the rank limit into the shuffle:\n$p56")
    // txt_compression_proxy: the gram sets are built and deduped in
    // place — no hash exchange anywhere (the only exchange is the
    // final presentation sort)
    val pcp = plan(text.TextAnalysis.txtCompressionProxy(spark, sfDir))
    assert(pcp.contains("graft_ngrams"))
    assert(!pcp.contains("Exchange hashpartitioning"),
      s"gram sets must never shuffle:\n$pcp")
    // gear chunking: cut points from the codegen expression, and the
    // old per-doc cut window is structurally gone
    val pgc = plan(multimodal.BinaryPipeline.mmChunkDedup(spark, sfDir))
    assert(pgc.contains("graft_gear_cuts"))
    assert(!pgc.contains("Window ["),
      s"gear chunking must not need a per-doc window:\n$pgc")
    // char-shingle dedup: candidates come from the prefix-posting
    // equi-join — no cartesian/nested-loop pair join survives
    val pcj = plan(dedup.Dedup.dedupCharJaccard(spark, sfDir))
    assert(pcj.contains("graft_intersect_size"))
    assert(!pcj.contains("CartesianProduct") &&
      !pcj.contains("BroadcastNestedLoop"),
      s"char dedup must never go all-pairs:\n$pcj")
  }

  test("gear table is the md5-derived permutation both engines replay") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (b <- 0 until 256) {
      md.reset()
      val expect = md.digest(b.toString.getBytes("US-ASCII"))(0) & 0xff
      assert(graft.expr.GearCuts.table(b) == expect)
    }
    // enough low-bit diversity that P[state=0] ~ 1/64 holds
    assert(graft.expr.GearCuts.table.map(_ & 63).distinct.length > 32)
  }

  test("graft_gear_cuts equals the driver-side reference scan") {
    graft.expr.VectorExprs.register(spark)
    val rnd = new scala.util.Random(7)
    val blobs = (1L to 40L).map { i =>
      val n = 1 + rnd.nextInt(800)
      val b = new Array[Byte](n); rnd.nextBytes(b); (i, b)
    }
    val got = blobs.toDF("doc_id", "bin")
      .select(col("doc_id"),
        call_function(graft.expr.VectorExprs.gearCutsName, col("bin"))
          .as("cs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    for ((id, bytes) <- blobs)
      assert(got(id) == refCuts(bytes), s"blob $id cut mismatch")
    // degenerate inputs: empty and sub-window blobs have no cuts
    assert(refCuts(Array.emptyByteArray).isEmpty)
    assert(got.values.forall(cs => cs == cs.sorted && cs.forall(_ >= 7)))
  }

  test("gear chunks re-synchronize after an insertion (production mode)") {
    // identical scenario to the md5-mode ScaleSpec pin: doc 2 = doc 1
    // with 7 chars injected at the front; content-chosen boundaries
    // must re-align downstream of the edit.
    val rnd = new scala.util.Random(42)
    val s = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val t = (1 to 2000).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, s), (2L, "zqwerty" + s), (3L, t))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
    val out = Dedup.gearChunkDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (id <- Seq(1L, 2L)) {
      val (n, dup) = out(id)
      assert(n >= 10, s"doc $id: expected ~len/64 chunks, got $n")
      assert(dup * 2 >= n,
        s"doc $id: gear boundaries failed to re-sync ($dup of $n shared)")
    }
    assert(out(3L)._2 == 0L, "unrelated doc must share no chunks")
  }

  test("knn directed edges persist as a layout: warm path is a scan") {
    import graft.sim.Knn
    // first call builds (or re-attaches) the session layout
    val first = Knn.directedEdges(spark, sfDir)
    assert(first.count() > 0)
    // second call must be a layout re-attach: in the default memo mode
    // the plan is a checkpointed-RDD scan, with NO centroid probe pass
    // (no dot-product, no seeds cross join) anywhere in it
    val warm = Knn.directedEdges(spark, sfDir)
    val plan = warm.queryExecution.executedPlan.toString
    assert(plan.contains("knn_edges_") || plan.contains("ExistingRDD"),
      s"warm path must scan the persisted edge layout:\n$plan")
    assert(!plan.contains("graft_dot") && !plan.toLowerCase.contains("cross"),
      s"warm path must not recompute the candidate pass:\n$plan")
    // schema contract survives the re-attach form
    assert(warm.columns.toSeq == Seq("qid", "rank", "nid"))
    // keyed layout: qid-keyed aggregation needs no exchange (memo mode
    // preserves the bucketCol hash partitioning through the checkpoint
    // exactly as the bucketed table's scan did)
    val agg = warm.groupBy("qid").count()
    val aggPlan = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!aggPlan.contains("Exchange hashpartitioning(qid"),
      s"qid-keyed consumers must ride the bucket layout:\n$aggPlan")
  }

  test("mask_encrypt per-column keys: same-column joins survive, " +
      "cross-column equality is gone") {
    import graft.mask.MaskQueries.columnKeySql
    val k1 = columnKeySql("customer.c_name")
    val k2 = columnKeySql("customer.c_address")
    val df = Seq(("alice", "alice"), ("bob", "bob")).toDF("a", "b")
      .select(
        expr(s"aes_encrypt(cast(a as binary), $k1, 'ECB', 'PKCS')").as("ct_a"),
        expr(s"aes_encrypt(cast(b as binary), $k1, 'ECB', 'PKCS')").as("ct_a2"),
        expr(s"aes_encrypt(cast(b as binary), $k2, 'ECB', 'PKCS')").as("ct_b"))
      .collect()
    df.foreach { r =>
      val (ca, ca2, cb) = (r.getAs[Array[Byte]](0),
        r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2))
      // same derived key, same plaintext → joinable ciphertext
      assert(ca.sameElements(ca2))
      // different column key → equality leak stops at the column
      assert(!ca.sameElements(cb))
    }
    // the driver key's audit column is true on every row
    val rows = graft.mask.MaskQueries.maskEncrypt(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(3)))
  }

  test("one prepended byte kills stride sharing but not gear sharing") {
    // the reason content-defined chunking exists: doc 2 = doc 1 with
    // one byte prepended. Fixed 64-byte blocks all shift (zero shared
    // blocks); gear cuts re-synchronize (most chunks shared).
    val rnd = new scala.util.Random(99)
    val s = (1 to 4000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val d1 = s.getBytes("UTF-8")
    val d2 = ("z" + s).getBytes("UTF-8")
    def strideBlocks(b: Array[Byte]): Set[String] =
      b.grouped(64).map(g => java.util.Arrays.hashCode(g).toString +
        ":" + g.length).toSet
    val sharedStride = strideBlocks(d1).intersect(strideBlocks(d2)).size
    assert(sharedStride <= 1, // at most the short tail block
      s"stride blocks should all shift under a prepend: $sharedStride")
    val gear = Dedup.gearChunkDedup(
        Seq((1L, s), (2L, "z" + s)).toDF("doc_id", "text")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    for ((id, (n, dup)) <- gear)
      assert(dup * 2 >= n,
        s"doc $id: gear must re-sync under a prepend ($dup of $n)")
  }

  test("gear and md5 modes agree on the cut-point interface contract") {
    // both modes: chunk count = interior cuts + 1, chunks partition
    // the document, per-doc rows sum to the corpus
    val rnd = new scala.util.Random(11)
    val docs = (1L to 12L).map { i =>
      (i, (1 to 300 + rnd.nextInt(800))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    }.toDF("doc_id", "text")
    val gear = Dedup.gearChunkDedup(
        docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("bin")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val md5m = Dedup.chunkDedup(docs, 8, 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gear.keySet == md5m.keySet)
    // same operating point (mask 64): chunk counts within 3x of each
    // other per doc — a structural guard, not value equality (the
    // hashes differ by design)
    for ((id, n) <- gear) {
      val m = md5m(id)
      assert(n >= 1 && m >= 1)
      assert(n <= 3 * m + 8 && m <= 3 * n + 8,
        s"doc $id: gear=$n vs md5=$m chunks diverge structurally")
    }
  }
}
