package graft

/** Dev tool (r19 optimization): per-EXCHANGE byte/row metrics from the
  * FINAL adaptive plan of one or more driver queries. ExecStats gives
  * whole-query shuffle totals; this breaks them down by exchange node so a
  * restructure's claim ("the join exchange carries no strings now") can be
  * checked against the exact exchange it names — including whether AQE's
  * stage reuse actually deduplicated statically-duplicated subtrees
  * (ReusedExchange/ReusedSubquery references are printed as such).
  *
  * Usage: `runMain graft.ExchProbe <sfDir> <query> [query...]` — each query
  * runs twice, rep 2 reported (AQE/codegen warm, operator caches primed).
  */
object ExchProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExchProbe <sfDir> <query> [query...]")
    val dir = args(0)
    val spark = core.Engine.session("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive._
    import org.apache.spark.sql.execution.exchange._
    def walk(p: SparkPlan, out: scala.collection.mutable.ArrayBuffer[String],
             seen: java.util.IdentityHashMap[SparkPlan, Boolean]): Unit = {
      if (seen.containsKey(p)) return
      seen.put(p, true)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, out, seen)
        case q: QueryStageExec =>
          walk(q.plan, out, seen)
        case r: ReusedExchangeExec =>
          out += f"  REUSED -> ${r.child.getClass.getSimpleName} [${r.child.id}]"
        case e: ShuffleExchangeExec =>
          val ds = e.metrics.get("dataSize").map(_.value / 1024).getOrElse(-1L)
          val rows = e.metrics.get("numOutputRows").map(_.value)
            .orElse(e.metrics.get("shuffleRecordsWritten").map(_.value)).getOrElse(-1L)
          out += f"  ShuffleExchange[${e.id}] ${ds}%6d KB rows=$rows ${e.outputPartitioning}"
          e.children.foreach(walk(_, out, seen))
        case b: BroadcastExchangeExec =>
          val ds = b.metrics.get("dataSize").map(_.value / 1024).getOrElse(-1L)
          out += f"  BroadcastExchange[${b.id}] ${ds}%6d KB"
          b.children.foreach(walk(_, out, seen))
        case other => other.children.foreach(walk(_, out, seen))
      }
      p.subqueries.foreach(walk(_, out, seen))
    }
    args.drop(1).foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, SparkEntry.benchOnlyQueries(n))
      var qe: org.apache.spark.sql.execution.QueryExecution = null
      (1 to 2).foreach { _ =>
        // execute THIS QueryExecution (count() would plan a separate one
        // and leave this plan's metrics empty): toRdd materializes every
        // column of every row, the noop-sink statistic
        qe = fn(spark, dir).queryExecution
        qe.toRdd.count()
        spark.catalog.clearCache()
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      walk(qe.executedPlan, out,
        new java.util.IdentityHashMap[SparkPlan, Boolean]())
      println(s"[exch] $n")
      out.foreach(println)
    }
    spark.stop()
  }
}
