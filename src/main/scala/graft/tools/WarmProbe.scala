package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Warm-timing table for the heaviest bench keys — generated per
  * round so cold-run noise never has to be re-litigated by hand:
  * single cold runs on this machine swing ~2×, so the round doc pairs
  * every expensive key's official (cold) bench seconds with a warm
  * median from repeat runs in one JVM.
  *
  * Usage: runMain graft.tools.WarmProbe <bench.json> <out.md>
  *          [sfDir] [topK|tSECS] [runs]
  *
  * Reads the driver bench JSON (one line, `queries: {key: seconds}`),
  * probes the topK slowest keys — or, with a `t`-prefixed threshold
  * (e.g. `t2.0`), EVERY key whose cold seconds exceed it (the round-9
  * mode: noise regressions on mid-cost keys were indistinguishable
  * from real ones while only the top-12 had warm data) — `runs` times
  * each, and writes a markdown table (key, cold s, warm median s,
  * warm min s, spread).
  */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val benchJson = args.headOption.getOrElse(
      sys.error("usage: WarmProbe <bench.json> <out.md> [sfDir] [topK] [runs]"))
    val outMd = args.lift(1).getOrElse(sys.error("missing <out.md>"))
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val sel = args.lift(3).getOrElse("10")
    val runs = args.lift(4).map(_.toInt).getOrElse(3)

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.VectorExprs.register(spark)

    // the bench `queries` object: either the raw one-line Bench output
    // ({"metric":...,"queries":{...}}) or the driver's wrapper, whose
    // `tail` log text embeds that line
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(
      java.nio.file.Files.readString(java.nio.file.Path.of(benchJson)))
    val queriesNode = {
      def q(n: com.fasterxml.jackson.databind.JsonNode) =
        Option(n).map(_.get("queries")).filter(x => x != null && !x.isNull)
      q(root).orElse(q(root.get("parsed"))).getOrElse {
        val tail = Option(root.get("tail")).map(_.asText()).getOrElse(
          sys.error(s"$benchJson: no queries object found"))
        val i = tail.lastIndexOf("{\"metric\"")
        require(i >= 0, s"$benchJson: no embedded bench line in tail")
        val end = tail.indexOf('\n', i)
        val line = if (end < 0) tail.substring(i) else tail.substring(i, end)
        q(mapper.readTree(line)).getOrElse(
          sys.error(s"$benchJson: bench line has no queries object"))
      }
    }
    val cold = queriesNode.properties().iterator().asScala
      .map(e => e.getKey -> e.getValue.asDouble()).toMap
    val ranked = cold.toSeq.sortBy(-_._2)
    val targets =
      if (sel.startsWith("t")) ranked.takeWhile(_._2 > sel.drop(1).toDouble)
      else ranked.take(sel.toInt)

    val rows = targets.map { case (key, coldSec) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(key)(spark, dir)
          .queryExecution.toRdd.count()
        spark.catalog.clearCache()
        System.gc()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median = times(times.length / 2)
      println(f"$key%-24s cold=$coldSec%.2f warm_median=$median%.2f")
      (key, coldSec, median, times.head, times.last)
    }

    val sb = new StringBuilder
    sb ++= s"# Warm-probe deltas — ${targets.size} bench keys " +
      s"(selector: $sel)\n\n"
    sb ++= s"Source: `$benchJson` at `$dir`, $runs warm runs per key in "
    sb ++= "one JVM (codegen/JIT amortized). `spread` = warm max − min; "
    sb ++= "a cold/warm gap inside the spread is machine noise, not a "
    sb ++= "regression.\n\n"
    sb ++= "| key | cold s (bench) | warm median s | warm min s | spread s |\n"
    sb ++= "|---|---|---|---|---|\n"
    rows.foreach { case (k, c, med, mn, mx) =>
      sb ++= f"| `$k` | $c%.2f | $med%.2f | $mn%.2f | ${mx - mn}%.2f |\n"
    }
    java.nio.file.Files.write(java.nio.file.Path.of(outMd),
      sb.toString.getBytes("UTF-8"))
    println(s"wrote $outMd")
    spark.stop()
  }
}
