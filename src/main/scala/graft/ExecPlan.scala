package graft

/** Dev tool: run one driver query to completion and print its EXECUTED
  * (post-AQE) physical plan — the place runtime decisions like
  * ReusedExchange / skew-join splits / broadcast demotions show up, which
  * `Plans` (static `explain("formatted")`) cannot. Usage:
  * `runMain graft.ExecPlan <query> [sfDir]`. */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val spark = core.Engine.session("local[8]")
    val name = if (args.nonEmpty) args(0) else "d23_minhash_lsh"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    println(s"=== EXECUTED PLAN: $name ===")
    println(df.queryExecution.executedPlan.toString)
  }
}
