package graft.ops

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for corpus-scale pipelines (beyond the reference
  * surface; agnes only has exact distinct-rows via `unique_values`,
  * src/view.rs:1083-1091).
  *
  * Scale design notes (these run on the full corpus, so every op is a
  * bounded number of shuffles):
  *  - exact: one hash-aggregate shuffle on the content key.
  *  - ngram-Jaccard: inverted-index self-join — shuffle on shingle, pair
  *    aggregation shuffle; `maxShingleDf` drops ultra-common shingles, the
  *    standard skew guard (a shingle appearing in k docs contributes k²
  *    candidate pairs).
  *  - MinHash-LSH: signature via one explode + hash-aggregate (flat,
  *    codegen-friendly), then a self-join on (band, bandSignature) buckets
  *    only — candidate generation never goes quadratic in corpus size, which
  *    is the whole point at 100 TB.
  *
  * All self-joins rename their key columns per side — never join a frame to
  * itself on same-named, same-lineage columns (Spark would degrade the
  * predicate to trivially-true).
  */
object Dedup {

  /** Exact dedup: one canonical row (minimum id) per distinct value of
    * `onCols`, plus the duplicate count. */
  def exact(df: DataFrame, idCol: String, onCols: Seq[String]): DataFrame =
    df.groupBy(onCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** (id, shingle) inverted index over distinct word-n-gram shingles. */
  def shingleIndex(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(array_distinct(TextFunctions.shingles(col(textCol), n))).as("shingle"))

  /** Exact n-gram Jaccard similarity pairs with sim >= `threshold`, via an
    * inverted shingle index (shuffle on shingle, then on the pair key).
    * `bandCols` restricts candidates to equal values of those columns (e.g.
    * language) — both a semantic guard and a fan-out reducer.
    * `maxShingleDf`: drop shingles appearing in more than this many docs
    * (0 = keep all, exact result).
    */
  def jaccardPairs(df0: DataFrame, idCol: String, textCol: String, n: Int,
                   threshold: Double, bandCols: Seq[String] = Nil,
                   maxShingleDf: Long = 0L): DataFrame = {
    val df = graft.core.Par.widen(df0)
    val sh0 = df.select(
      (col(idCol).as("id") +: bandCols.map(col)) :+
        explode(array_distinct(TextFunctions.shingles(col(textCol), n))).as("shingle"): _*)
    val shUnc = if (maxShingleDf > 0) {
      val dfreq = sh0.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxShingleDf).select("shingle")
      sh0.join(dfreq, "shingle")
    } else sh0
    // The inverted index feeds three consumers (both join sides + sizes);
    // persist it so the shingle-generation pass runs once, not three times.
    val sh = shUnc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val a = sh.toDF(sh.columns.map(_ + "_a").toIndexedSeq: _*)
    val b = sh.toDF(sh.columns.map(_ + "_b").toIndexedSeq: _*)
    val cond = bandCols.foldLeft(
      a("shingle_a") === b("shingle_b") && a("id_a") < b("id_b")) {
      (acc, c) => acc && (a(s"${c}_a") === b(s"${c}_b"))
    }
    // self-join both sides are corpus-sized: broadcast would serialize the
    // whole index through the driver — force a shuffle hash join on shingle
    val inter = a.hint("shuffle_hash").join(b, cond)
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash signatures as `numHashes` columns `h0..h{k-1}`, one row per id:
    * explode the shingle set once and take seeded-hash minima in a single
    * flat hash-aggregate (map-side partials, one shuffle on id). */
  def minHashSignatures(shingles: DataFrame, numHashes: Int): DataFrame = {
    // Hash the (variable-length) shingle string ONCE, then derive the k
    // seeded hashes by re-hashing the resulting fixed-width long — ~6x
    // cheaper than k string hashes per shingle.
    val hashed = shingles.select(col("id"), xxhash64(col("shingle")).as("h"))
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"h$i"))
    hashed.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * shingle(n) → `numHashes` minhashes → `bands` banded signatures →
    * self-join per (band, signature) bucket → distinct candidate pairs,
    * optionally verified with exact Jaccard (`verifyThreshold` > 0 joins the
    * shingle sets back and filters — the classic LSH + verify pipeline).
    * With b bands of r rows, P(candidate | J=s) = 1-(1-s^r)^b.
    */
  def minHashLsh(df0: DataFrame, idCol: String, textCol: String, n: Int = 3,
                 numHashes: Int = 64, bands: Int = 16,
                 verifyThreshold: Double = 0.0): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val df = graft.core.Par.widen(df0)
    val r = numHashes / bands
    // One materialization of the per-doc shingle sets serves signature
    // computation AND the verify-join below.
    val sets = df.select(col(idCol).as("id"),
        array_distinct(TextFunctions.shingles(col(textCol), n)).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shingles = sets.select(col("id"), explode(col("sh")).as("shingle"))
    val sig = minHashSignatures(shingles, numHashes)
    val banded = sig.select(
      col("id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64((0 until r).map(j => col(s"h${b * r + j}")): _*)
      }: _*)).as(Seq("band", "bsig"))) // columns: (id, band, bsig)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = banded.toDF("id_a", "band_a", "bsig_a")
    val rt = banded.toDF("id_b", "band_b", "bsig_b")
    val cand = l.hint("shuffle_hash").join(rt,
        l("band_a") === rt("band_b") && l("bsig_a") === rt("bsig_b") && l("id_a") < rt("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    if (verifyThreshold <= 0) cand
    else {
      cand
        .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
        .filter(col("jaccard") >= verifyThreshold)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    }
  }

  /** SimHash fingerprint (64-bit) per document: explode distinct tokens,
    * per-bit majority vote in one flat hash-aggregate (64 sum columns —
    * map-side combine, one shuffle on id), then assemble the fingerprint
    * with wrap-safe bitwise ops. Near-dups = small Hamming distance.
    * Returns (id, simhash). */
  def simHash(df0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val df = graft.core.Par.widen(df0)
    val toks = df.select(col(idCol).as("id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("tok"))
    val h = xxhash64(col("tok"))
    val aggs = (0 until 64).map { b =>
      sum(shiftright(h, b).bitwiseAND(1).cast("int") * 2 - 1).as(s"b$b")
    }
    val votes = toks.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    val fp = (0 until 64).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    votes.select(col("id"), fp.as("simhash"))
  }

  /** Hamming-distance pairs over simhash fingerprints within `maxDist`, using
    * 4 × 16-bit band buckets (any pair at distance ≤ 3 must share a band —
    * pigeonhole): linear bucketing instead of an all-pairs comparison. */
  def simHashPairs(sims: DataFrame, maxDist: Int = 3): DataFrame = {
    val banded = sims.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*)).as(Seq("band", "bsig")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = banded.toDF("id_a", "h_a", "band_a", "bsig_a")
    val r = banded.toDF("id_b", "h_b", "band_b", "bsig_b")
    l.hint("shuffle_hash")
      .join(r, l("band_a") === r("band_b") && l("bsig_a") === r("bsig_b") && l("id_a") < r("id_b"))
      .withColumn("dist", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist").dropDuplicates("id_a", "id_b")
  }
}
