package graft.ops

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training-data preparation (beyond the reference
  * surface — agnes has no text machinery; its closest analog is the melt
  * reshaper, src/reshape.rs:1-60, which this generalizes to token windows).
  *
  * Splits each document into overlapping fixed-size token windows — the
  * standard pretraining prep step that turns a variable-length corpus into
  * model-context-sized rows.
  *
  * Scale design: the window starts and the chunk text are all built with
  * codegen'd array expressions (`sequence`/`transform`/`slice`) inside one
  * narrow projection, then a single `posexplode` — a stateless map-side
  * transform with ZERO shuffles at any corpus size. Output grows by
  * roughly `window/stride`× the token volume; downstream writers should
  * repartition on size, not here.
  */
object Chunking {

  /** Explode `textCol` into overlapping token windows of `window` tokens
    * every `stride` tokens (1-based starts 1, 1+stride, 1+2·stride, … while
    * the start lies inside the document; the tail chunk may be shorter).
    * Output: idCol, chunk_id (0-based), chunk (space-joined), n_tokens.
    */
  def tokenWindows(df: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, s"window=$window stride=$stride must be positive")
    val toks = TextFunctions.tokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(1), greatest(size(col("__toks")), lit(1)), lit(stride)),
          st => struct(
            array_join(slice(col("__toks"), st, lit(window)), " ").as("chunk"),
            size(slice(col("__toks"), st, lit(window))).cast("long").as("n_tokens")))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("col.chunk").as("chunk"), col("col.n_tokens").as("n_tokens"))
  }
}
