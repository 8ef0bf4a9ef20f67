package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV dialect descriptor — what the reference's csv-sniffer infers
  * (agnes src/source/csv.rs:38-50: delimiter, preamble rows, header flag). */
case class CsvDialect(delimiter: Char = ',', preamble: Int = 0, header: Boolean = true)

/** CSV ingestion with dialect sniffing (agnes `CsvSource::new`,
  * src/source/csv.rs:38-50) re-expressed for Spark.
  *
  * Differences by design (SURVEY.md §2.1, §3.1):
  *  - ONE distributed scan for all columns — the reference re-reads the whole
  *    file once per column (csv.rs:144-176), an inefficiency we must not
  *    replicate.
  *  - sniffing reads only a driver-side sample of the head of the file; the
  *    bulk load is `spark.read.csv` over a text Dataset with the preamble
  *    dropped, fully parallel.
  *  - parse failure on a non-empty cell: the reference fails the load
  *    (csv.rs:163-168) → `failFast = true` maps to Spark FAILFAST mode;
  *    empty cell → NULL (reference: Value::Na, csv.rs:159-169) in both modes.
  */
object Csv {

  private val candidateDelims = Seq(',', ';', '\t', '|')

  /** Head sample of a file through the Hadoop FileSystem API — works for any
    * scheme the session's Hadoop conf knows (local, `file:`, hdfs, s3a, …),
    * not just the driver's local filesystem. Sniffing stays a driver-side
    * read of a bounded prefix; only the bulk load is distributed. */
  private def headBytes(path: String, maxBytes: Int): Array[Byte] = {
    val conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](maxBytes)
      var off = 0
      var n = 0
      while (off < maxBytes && { n = in.read(buf, off, maxBytes - off); n > 0 }) off += n
      java.util.Arrays.copyOf(buf, off)
    } finally in.close()
  }

  /** Sniff dialect from the first `sampleLines` physical lines. Preamble =
    * leading lines whose field count under the winning delimiter differs
    * from the dominant field count of the sample body. Header = first
    * post-preamble row has no cell parseable as a number while some later
    * row does. */
  def sniff(path: String, sampleLines: Int = 100): CsvDialect = {
    val sample = headBytes(path, 1 << 20)
    val all = new String(sample, java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.toVector
    // a full 1 MiB buffer may end mid-line; drop the possibly-partial tail
    val complete = if (sample.length == (1 << 20)) all.dropRight(1) else all
    val lines = complete.take(sampleLines)
    if (lines.isEmpty) return CsvDialect()
    def fieldCount(l: String, d: Char): Int = splitOutsideQuotes(l, d).length
    // Winning delimiter: the one whose trailing run of equal field counts
    // (>1 fields) is longest — data rows dominate the tail of the sample,
    // preamble/garbage sits at the head. Preamble = everything before that
    // consistent suffix.
    val scored = candidateDelims.map { d =>
      val counts = lines.map(fieldCount(_, d))
      val last = counts.last
      val suffixLen = counts.reverseIterator.takeWhile(_ == last).size
      (d, last, suffixLen)
    }.filter(_._2 > 1)
    val (delim, _, suffixLen) = scored
      .sortBy { case (_, cnt, len) => (-len, -cnt) }
      .headOption.getOrElse((',', 1, lines.length))
    val preamble = lines.length - suffixLen
    val body = lines.drop(preamble)
    def numericCell(s: String): Boolean = s.nonEmpty && scala.util.Try(s.trim.toDouble).isSuccess
    val header = body.headOption.exists { h =>
      val hs = splitOutsideQuotes(h, delim)
      !hs.exists(numericCell) &&
        body.drop(1).headOption.forall(r => splitOutsideQuotes(r, delim).exists(numericCell) || hs.forall(_.nonEmpty))
    }
    CsvDialect(delim, preamble, header)
  }

  /** Encoding sniff with the reference's fallback chain (agnes
    * src/source/decode.rs:9-21): strict UTF-8, else ISO-8859-1, else
    * WINDOWS-1252. Checks a head sample; pass the result as `encoding`
    * to [[load]]. */
  def sniffEncoding(path: String, sampleBytes: Int = 1 << 16): String = {
    val raw = headBytes(path, sampleBytes)
    // a full buffer may cut a multi-byte UTF-8 sequence at the boundary —
    // trim the incomplete tail so a valid UTF-8 file is not misdetected
    val buf = if (raw.length == sampleBytes) trimPartialUtf8Tail(raw) else raw
    def decodes(cs: String): Boolean = scala.util.Try {
      java.nio.charset.Charset.forName(cs).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(buf))
    }.isSuccess
    if (decodes("UTF-8")) "UTF-8"
    else if (decodes("ISO-8859-1")) "ISO-8859-1"
    else "WINDOWS-1252"
  }

  /** Drop a trailing incomplete UTF-8 sequence: scan back over at most 3
    * continuation bytes to the last lead byte; if its sequence extends past
    * the buffer end, cut the buffer at that lead byte. A complete tail (or
    * non-UTF-8 content, where the "lead" scan finds nothing meaningful to
    * cut) is returned unchanged. */
  private[io] def trimPartialUtf8Tail(b: Array[Byte]): Array[Byte] = {
    var i = b.length - 1
    var back = 0
    while (i >= 0 && back < 3 && (b(i) & 0xC0) == 0x80) { i -= 1; back += 1 }
    if (i < 0) return b
    val lead = b(i) & 0xFF
    val need =
      if (lead >= 0xF0) 4 else if (lead >= 0xE0) 3 else if (lead >= 0xC0) 2 else 1
    if (i + need > b.length) java.util.Arrays.copyOf(b, i) else b
  }

  /** Quote-aware split (double-quote quoting, doubled-quote escape). */
  private[io] def splitOutsideQuotes(line: String, delim: Char): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inQ = !inQ
      else if (c == delim && !inQ) { out += sb.toString(); sb.clear() }
      else sb.append(c)
      i += 1
    }
    out += sb.toString()
    out.toArray
  }

  /** Load a CSV with optional sniffing, preamble skip, explicit schema, and
    * reference-compatible error mode. Distributed end-to-end: the preamble is
    * dropped via a per-line filter on a zipWithIndex'd text read (cheap: the
    * preamble is by construction in the first partition). */
  def load(spark: SparkSession, path: String,
           dialect: Option[CsvDialect] = None,
           schema: Option[StructType] = None,
           failFast: Boolean = true,
           encoding: String = "UTF-8"): DataFrame = {
    val d = dialect.getOrElse(sniff(path))
    import spark.implicits._
    val reader = spark.read
      .option("header", d.header.toString)
      .option("delimiter", d.delimiter.toString)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("nullValue", "")
      .option("encoding", encoding)
    val withSchema = schema.map(reader.schema).getOrElse(reader.option("inferSchema", "true"))
    if (d.preamble == 0) withSchema.csv(path)
    else {
      val body: Dataset[String] = spark.read.textFile(path).rdd.zipWithIndex()
        .filter(_._2 >= d.preamble).map(_._1).toDS()
      withSchema.csv(body)
    }
  }

  def write(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  /** Load a CSV by URI: http(s) URIs are fetched to a local temp file first
    * (same buffering strategy as the reference, agnes src/source/file.rs:
    * 140-264 — download fully, then parse), `file:` / bare paths load
    * directly. The fetch is driver-side; the parse stays distributed. */
  def loadFromUri(spark: SparkSession, uri: String,
                  dialect: Option[CsvDialect] = None,
                  schema: Option[StructType] = None,
                  failFast: Boolean = true): DataFrame = {
    val u = java.net.URI.create(uri)
    u.getScheme match {
      case "http" | "https" =>
        val tmp = java.nio.file.Files.createTempFile("graft_dl", ".csv")
        val client = java.net.http.HttpClient.newBuilder()
          .followRedirects(java.net.http.HttpClient.Redirect.NORMAL).build()
        val req = java.net.http.HttpRequest.newBuilder(u).GET().build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofFile(tmp,
            java.nio.file.StandardOpenOption.WRITE,
            java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
        require(resp.statusCode() / 100 == 2, s"HTTP ${resp.statusCode()} fetching $uri")
        load(spark, tmp.toString, dialect, schema, failFast)
      case "file" => load(spark, java.nio.file.Paths.get(u).toString, dialect, schema, failFast)
      case _ => load(spark, uri, dialect, schema, failFast)
    }
  }
}
