package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted physical plans for plan-quality review. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.session("local[8]", 8)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===== $n =====")
      try SparkEntry.queries(n)(spark, dir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: $e") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
