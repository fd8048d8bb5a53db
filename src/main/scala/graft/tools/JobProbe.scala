package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiler: times a key warm (run 2+) and counts
  * the Spark jobs / stages / tasks each execution schedules — the
  * fixed-overhead axis that dominates sub-second data at bench SF.
  * Usage: runMain graft.tools.JobProbe <key[,key...]> [sfDir] [n]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val keys = args.headOption.getOrElse(sys.error("usage: JobProbe <keys>"))
      .split(',').toSeq
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    // extra session confs for A/B probes: GRAFT_CONF="k=v;k=v"
    val extra = sys.env.getOrElse("GRAFT_CONF", "").split(';')
      .filter(_.contains('=')).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val b0 = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.VectorExprs.register(spark)
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    keys.foreach { key =>
      val fn = graft.SparkEntry.queries(key)
      (1 to n).foreach { i =>
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
        val t0 = System.nanoTime()
        fn(spark, dir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; give them a beat
        Thread.sleep(300)
        println(f"$key run $i: $wall%.2f s  jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} taskTime=${taskMs.get / 1e3}%.1f s")
        spark.catalog.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}
