package graft

/** Dev tool: train the BPE merge list once and print it as a Scala literal
  * — the "publish the tokenizer artifact" step that t102's frozen merge
  * list came from. Usage: `runMain graft.BpeFreeze [sfDir] [numMerges]`. */
object BpeFreeze {
  def main(args: Array[String]): Unit = {
    val spark = core.Engine.session("local[8]", 8)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val n = if (args.length > 1) args(1).toInt else 64
    val docs = core.Tables.documents(spark, dir)
    val (merges, rounds) = ops.Bpe.trainBatched(docs, "text", n)
    println(s"// ${merges.length} merges in $rounds rounds from $dir")
    println(merges.map { case (a, b) => s"""("$a", "$b")""" }
      .grouped(4).map(_.mkString(", ")).mkString("Seq(\n  ", ",\n  ", ")"))
    spark.stop()
  }
}
