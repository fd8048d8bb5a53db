package graft

import org.apache.spark.sql.functions._

/** Invariant pins for the round-8 work: the iterated BPE trainer
  * actually merging ON merged symbols, the supersetSchema type-drift
  * fail-fast, FloorScale's null-element propagation, and the layout
  * fingerprint surviving a file that vanishes mid-read. */
class R8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("bpe train: round 2 merges the symbol round 1 created") {
    // a corpus of one word type "abcd": round 1 merges (a,b) (all
    // three pairs tie at the word count; (a,b) wins the x,y
    // tie-break), so round 2's pair table must contain the MERGED
    // symbol "ab" and merge (ab,c) — proving each round re-counts
    // over the previous round's encoding, not the original chars
    val docs = Seq(("en", "abcd abcd abcd")).toDF("lang", "text")
      .withColumn("doc_id", lit(1L))
    val out = graft.text.TextAnalysis.bpeTrain(docs, k = 3)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, "a", "b"), (2L, "ab", "c"), (3L, "abc", "d")),
      s"greedy merge chain wrong: ${out.toSeq}")
  }

  test("bpe train: left-to-right non-overlapping merge (aaa -> [aa, a])") {
    // "aaaa": round 1 merges (a,a); the replace must consume pairs
    // left-to-right non-overlapping, so "aaaa" encodes to [aa, aa]
    // and round 2's winning pair is (aa, aa) — an overlap-tolerant
    // merge would leave [aa, a, a]-style encodings and pick (aa, a)
    val docs = Seq(("en", "aaaa aaaa")).toDF("lang", "text")
      .withColumn("doc_id", lit(1L))
    val out = graft.text.TextAnalysis.bpeTrain(docs, k = 2)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, "a", "a"), (2L, "aa", "aa")),
      s"merge must be left-to-right non-overlapping: ${out.toSeq}")
  }

  test("supersetSchema fails fast on same-name different-type drift") {
    import org.apache.spark.sql.types._
    val v1 = StructType(Seq(StructField("id", LongType),
      StructField("amt", StringType)))
    val v2 = StructType(Seq(StructField("id", LongType),
      StructField("amt", DecimalType(10, 2)),
      StructField("note", StringType)))
    // add-column drift still merges
    val okV2 = StructType(Seq(StructField("id", LongType),
      StructField("amt", StringType), StructField("note", StringType)))
    val merged = graft.streaming.CdcStream.supersetSchema(
      Seq(1L -> v1, 2L -> okV2))
    assert(merged.fieldNames.toSeq == Seq("id", "amt", "note"))
    // type drift must not silently parse with the first-seen type
    val e = intercept[IllegalArgumentException] {
      graft.streaming.CdcStream.supersetSchema(Seq(1L -> v1, 2L -> v2))
    }
    assert(e.getMessage.contains("amt"))
  }

  test("floor-scale expression propagates null elements") {
    graft.expr.VectorExprs.register(spark)
    val df = Seq(Tuple1(Seq[java.lang.Double](1.5, null, -0.25)))
      .toDF("e")
      .select(call_function(graft.expr.VectorExprs.floorScaleName,
        col("e"), lit(4.0)).as("z"))
    val got = df.collect().head.getSeq[java.lang.Double](0)
    assert(got == Seq(6.0, null, -1.0),
      s"null element must stay null, not become 0: $got")
    // analysis-time rejection of a mistyped argument
    val bad = intercept[Exception] {
      Seq(Tuple1("nope")).toDF("e")
        .select(call_function(graft.expr.VectorExprs.floorScaleName,
          col("e"), lit(4.0))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("graft_floor_scale"))
  }

  test("layoutTag folds an unreadable file into the tag instead of throwing") {
    val dir = java.nio.file.Files.createTempDirectory("ltag").toFile
    val f = new java.io.File(dir, "a.parquet")
    java.nio.file.Files.write(f.toPath, Array.fill[Byte](9000)(3))
    val t1 = Tables.layoutTag(dir.getPath)
    // a dangling entry (deleted between list and open) must not kill
    // the caller; simulate by pointing at a file that disappears —
    // deletion changes the file LIST, so also pin that a vanished
    // file yields a tag, not an exception, via a broken symlink
    val link = new java.io.File(dir, "b.parquet").toPath
    java.nio.file.Files.createSymbolicLink(link,
      new java.io.File(dir, "gone").toPath)
    val t2 = Tables.layoutTag(dir.getPath)
    assert(t2 != t1, "the unreadable entry must still perturb the tag")
    java.nio.file.Files.delete(link)
    assert(Tables.layoutTag(dir.getPath) == t1,
      "back to the original listing, back to the original tag")
  }
}
