package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Stage-by-stage timing probe for the minhash pipeline (perf
  * debugging aid): times tokenize+sets, signatures, candidate join,
  * and the full verified pipeline independently at the given SF. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.VectorExprs.register(spark)
    val docs = Tables.documents(spark, sfDir)

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(f"$name%-28s rows=$n%-9d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val tokens = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), "\\s+"))).as("w"))
    val tokHash = conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long")
    val sets = tokens.groupBy("doc_id")
      .agg(sort_array(collect_set(tokHash)).as("hs"))
      .withColumn("n", size(col("hs")))
    time("tokenize+sets")(sets)
    val withSigs = sets.withColumn("bsigs",
      call_function("graft_minhash_bands", col("hs"), lit(32), lit(4)))
    time("sets+bsigs")(withSigs.select("doc_id", "bsigs"))
    val buckets = withSigs
      .select(col("doc_id"), col("n"), col("bsigs"),
        posexplode(col("bsigs")).as(Seq("band", "sig")))
    time("buckets")(buckets)
    println("graft_minhash occurrences in buckets plan: " +
      "graft_minhash".r.findAllIn(
        buckets.queryExecution.executedPlan.toString).length)
    val x = buckets.select(col("doc_id").as("d1"), col("n").as("n1"),
      col("bsigs").as("bsigs1"), col("band"), col("sig"))
    val y = buckets.select(col("doc_id").as("d2"), col("n").as("n2"),
      col("bsigs").as("bsigs2"), col("band").as("band2"), col("sig").as("sig2"))
    val firstBand = (0 until 3).map(bp =>
      col("band") <= bp ||
        element_at(col("bsigs1"), bp + 1) =!= element_at(col("bsigs2"), bp + 1))
      .reduce(_ && _)
    val cand = x.join(y,
      col("band") === col("band2") && col("sig") === col("sig2") &&
        col("d1") < col("d2") &&
        least(col("n1"), col("n2")).cast("double") >=
          greatest(col("n1"), col("n2")).cast("double") * 0.9 &&
        firstBand)
      .select(col("d1"), col("d2"))
    time("candidates (first-band)")(cand)
    println("graft_minhash occurrences in cand plan: " +
      "graft_minhash".r.findAllIn(
        cand.queryExecution.executedPlan.toString).length)
    val s1 = sets.select(col("doc_id").as("dd1"), col("hs").as("hs1"),
      col("n").as("sn1"))
    val s2 = sets.select(col("doc_id").as("dd2"), col("hs").as("hs2"),
      col("n").as("sn2"))
    val i = call_function("graft_intersect_size", col("hs1"), col("hs2"))
    val verified = cand.join(s1, col("d1") === col("dd1"))
      .join(s2, col("d2") === col("dd2"))
      .select(col("d1"), col("d2"),
        (i.cast("double") / (col("sn1") + col("sn2") - i).cast("double")).as("j"))
      .filter(col("j") >= 0.9)
    time("verified")(verified)
    time("verified+sort")(verified.orderBy("d1", "d2"))
    time("full operator")(graft.dedup.Dedup.dedupMinhash(spark, sfDir))
    spark.stop()
  }
}
