package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry.queries entry against
  * SPARK_GRAFT_SF_DIR and prints ONE compact JSON line.
  *
  * The driver captures only the last ~2000 chars of output, so the
  * line must stay short: seconds are rounded to 2 decimals and, if
  * the line would still overflow, the per-query map keeps only the
  * slowest entries (full precision always lands in BENCH_FULL.json).
  */
object Bench {
  // Locale.ROOT: a comma-decimal default locale would print "0,84" and
  // corrupt the JSON line.
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated key filter for targeted perf iteration
    // (driver runs always measure the full set)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Untimed warmup (the first measured query re-runs warm): the first
    // execution otherwise absorbs Spark's one-time costs — codegen
    // compiler, shuffle machinery, parquet footers. r1 showed the
    // alphabetically-first query taking ~5 s at sf0.01 vs ~0.8 s warm.
    try { sorted.head._2(spark, sfDir).queryExecution.toRdd.count() }
    catch { case _: Throwable => () }
    // toRdd.count() executes the query plan as written — a plain
    // df.count() would let the optimizer prune the very projections
    // (masks, scores, parsed structs) being measured.
    val outcomes = sorted.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case _: Throwable => false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Isolate measurements: drop cached relations and let the
      // ContextCleaner reap finished broadcasts/shuffles before the
      // next query — r2 showed accumulated broadcast/GC pressure
      // contaminating unrelated timings (mask_blur 2.1→11.0 s with no
      // plan change). The cleanup cost is deliberately OUTSIDE the
      // measured window.
      try {
        spark.catalog.clearCache()
        System.gc()
      } catch { case _: Throwable => () }
      (name, elapsed, ok)
    }
    val failed = outcomes.filter(!_._3).map(_._1)
    // A failed query must not masquerade as a fast success: its slot
    // carries -1 and its elapsed time is excluded from the total.
    val results = outcomes.map { case (n, t, ok) => n -> (if (ok) t else -1.0) }
    val total = outcomes.filter(_._3).map(_._2).sum
    val sfName = sfDir.split('/').last

    // Full-precision sidecar for humans/judges.
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // note: total sums SUCCESSFUL queries only; failed ones are listed
    // in "failed" and carry -1 in the per-query map.
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","total_excludes_failures":true,"failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},"queries":$fullQs,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter("BENCH_FULL.json")
      try w.println(fullLine) finally w.close()
    } catch { case _: Throwable => () }

    def line(qs: Seq[(String, Double)]): String = {
      val obj = qs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","shown":${qs.size},"of":${results.size},"failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},"queries":$obj,"sf":"$sfName"}"""
    }
    // Keep the printed line under the driver's capture window; drop the
    // fastest queries first if it would overflow.
    var keep = results
    while (line(keep).length > 1850 && keep.nonEmpty)
      keep = keep.sortBy(-_._2).dropRight(math.max(1, keep.size / 10)).sortBy(_._1)
    println(line(keep))
    spark.stop()
  }
}
