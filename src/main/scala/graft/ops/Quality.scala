package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the validation gate a
  * pipeline runs before a table feeds training or analytics (the
  * Great-Expectations/Deequ role, Spark-first). Every check yields one
  * (check, n_violations) row; 0 means the constraint HELD, so the report
  * is the complete, auditable contract — absence of a row is never
  * evidence.
  */
object Quality {

  /** Row-level predicate checks: `checks` maps a check name to the
    * predicate that must HOLD per row; a NULL predicate result counts as
    * a violation (SQL three-valued logic must not hide bad rows).
    *
    * Scale shape: ONE corpus scan computes every check simultaneously via
    * conditional aggregation (map-side combined — a scalar per check per
    * partition crosses the shuffle), then the 1-row result unpivots to
    * (check, n_violations) rows. Adding a check costs an expression, not
    * a pass. */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    // positional internal aliases, typed Columns throughout: check NAMES
    // are data (lit), never spliced into a parsed SQL string — a quote or
    // backtick in a user-supplied name cannot break (or inject into) the
    // plan. The explode of an array literal emits rows in array order,
    // exactly stack's row-major emission.
    val aggs = checks.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__c$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val kvs = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check"), col(s"__c$i").as("n_violations"))
    }
    one.select(explode(array(kvs: _*)).as("kv"))
      .select(col("kv.check").as("check"), col("kv.n_violations").as("n_violations"))
  }

  /** Key-uniqueness check: n_violations = rows in EXCESS of one per key
    * (a key seen k times contributes k−1). NULL keys group like values —
    * a NULL-keyed table fails loudly rather than vanishing from the
    * count. One map-side-combined aggregate on the key. */
  def uniqueCheck(df: DataFrame, keys: Seq[String],
                  name: String = "unique_key"): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("n_violations"))
      .select(lit(name).as("check"), col("n_violations"))

  /** Referential-integrity check: child rows whose `childKey` is non-null
    * and absent from `parent.parentKey` (NULL FKs are "optional" by SQL
    * convention — add a rowCheck for non-null if required). The parent
    * side is projected to its key column in the scan; AQE broadcasts
    * whichever side is small, and the anti join never carries payload
    * columns. */
  def fkCheck(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String,
              name: String = "foreign_key"): DataFrame =
    child.select(col(childKey)).filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check"), col("n_violations"))

  /** A full report: row checks + any number of pre-built check relations
    * (uniqueness, FK, …) unioned into one (check, n_violations) table. */
  def report(df: DataFrame, checks: Seq[(String, Column)],
             extra: Seq[DataFrame] = Nil): DataFrame =
    extra.foldLeft(rowChecks(df, checks))(_ unionByName _)
}
