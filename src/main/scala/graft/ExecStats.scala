package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev tool (r18 optimization round): NOISE-FREE plan-quality metrics for
  * one or more driver queries. Wall-clock on this VM swings 2-4× run to
  * run (BASELINE.md's storm history), so before/after comparisons of an
  * optimization use the deterministic counters instead: Spark jobs
  * launched, stages run, tasks run, shuffle bytes written/read, input
  * bytes read. A removed exchange, a de-duplicated subtree or an
  * avoided corpus re-scan shows up here identically in any host window.
  *
  * Usage: `runMain graft.ExecStats <sfDir> <query> [query...]` — each
  * query runs twice (rep 2 reported: AQE/codegen warm, and operator
  * caches like q50's bucketed tables already primed, so the counters
  * describe the steady state the bench measures). */
object ExecStats {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExecStats <sfDir> <query> [query...]")
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = core.Engine.session("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufW = new AtomicLong
    val shufR = new AtomicLong
    val input = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          input.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, SparkEntry.benchOnlyQueries(n))
      (1 to 2).foreach { rep =>
        // drain the async listener bus: wait until the task counter has
        // been stable for 400 ms (a fixed sleep can zero counters while
        // rep N's tail events are still in flight — exactly the
        // multi-thousand-task queries this tool measures)
        var last = -1
        while (tasks.get != last) { last = tasks.get; Thread.sleep(400) }
        jobs.set(0); stages.set(0); tasks.set(0)
        shufW.set(0); shufR.set(0); input.set(0)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400) // let queued listener events drain between reps
        if (rep == 2)
          println(f"[exec] $n jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} shuffleW=${shufW.get / 1024}KB shuffleR=${shufR.get / 1024}KB input=${input.get / 1024}KB wall=${secs}%.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
