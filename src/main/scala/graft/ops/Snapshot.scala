package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the release-to-release change report a dataset
  * pipeline publishes when a new crawl/curation run lands (beyond the
  * reference surface; a single-node engine diffs files, a 100 TB corpus
  * needs a distributed diff).
  */
object Snapshot {

  /** Per-id change status between two snapshots: `added` (only in `b`),
    * `removed` (only in `a`), `changed` (in both, fingerprint differs).
    * Unchanged rows — the overwhelming bulk of any real release — are
    * omitted, so the output is change-sized, not corpus-sized.
    *
    * `fingerprint` is a caller-supplied Column (e.g.
    * `md5(concat_ws("|", text, lang))`) evaluated against each snapshot;
    * it must never evaluate to NULL (coalesce inputs first) or the row
    * would misread as added/removed.
    *
    * Scale shape: each snapshot is projected to (id, 32-hex fingerprint)
    * IN THE SCAN — the full-outer join exchanges only those ~40-byte rows,
    * never the document bodies, and a pushed column projection means the
    * scan reads only the fingerprint inputs. One narrow shuffle per side;
    * AQE handles skew. Output: (idCol, status). */
  def diff(a: DataFrame, b: DataFrame, idCol: String, fingerprint: Column): DataFrame = {
    val fa = a.select(col(idCol).as("__id"), fingerprint.as("fp_a"))
    val fb = b.select(col(idCol).as("__id"), fingerprint.as("fp_b"))
    fa.join(fb, Seq("__id"), "full_outer")
      .withColumn("status",
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed"))
      .filter(col("status").isNotNull)
      .select(col("__id").as(idCol), col("status"))
  }

  /** One-row release summary over [[diff]]'s semantics, unchanged included:
    * (n_added, n_removed, n_changed, n_unchanged). Same narrow-join shape,
    * one extra scalar aggregate. */
  def diffSummary(a: DataFrame, b: DataFrame, idCol: String, fingerprint: Column): DataFrame = {
    val fa = a.select(col(idCol).as("__id"), fingerprint.as("fp_a"))
    val fb = b.select(col(idCol).as("__id"), fingerprint.as("fp_b"))
    fa.join(fb, Seq("__id"), "full_outer")
      .agg(
        sum(when(col("fp_a").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("fp_b").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("fp_a").isNotNull && col("fp_b").isNotNull &&
          col("fp_a") =!= col("fp_b"), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("fp_a") === col("fp_b"), 1L).otherwise(0L)).as("n_unchanged"))
  }
}
