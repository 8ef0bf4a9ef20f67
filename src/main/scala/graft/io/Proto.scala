package graft.io

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Protobuf source/sink — the last "Serialization formats" line of the
  * reference's FUTURE.md wishlist (reference FUTURE.md "Serialization
  * formats (Protobuf, …)"; agnes ships serde JSON only, src/view.rs:1093).
  *
  * This container carries no spark-protobuf jar, so the implementation is
  * a self-contained codec for the PUBLIC protobuf wire format
  * (https://protobuf.dev/programming-guides/encoding/): base-128 varints,
  * 64-bit fixed fields, and length-delimited records — the format is a
  * published open spec, and the golden-bytes spec pins this codec against
  * the spec's own canonical examples (field 1 = varint 150 ⇒ `08 96 01`).
  *
  * Message schema is derived positionally from the DataFrame schema:
  * column i ↦ field number i+1, with the standard scalar mappings
  *   LongType/IntegerType → int64/int32 (varint, two's complement)
  *   BooleanType          → bool (varint 0/1)
  *   DoubleType           → double (fixed64, IEEE-754 bits little-endian)
  *   FloatType            → float (fixed32)
  *   StringType           → string (length-delimited UTF-8)
  *   BinaryType           → bytes (length-delimited)
  * NULL columns are simply absent from the record (field-presence
  * semantics, proto3 `optional`/proto2 style) and decode back to NULL —
  * the reference's Value::Na survives the roundtrip exactly.
  *
  * Files are the standard length-delimited record stream (each record
  * prefixed by its varint byte length — java protobuf's
  * `writeDelimitedTo` framing), one `part-NNNNN.pb` per partition:
  *  - [[writeProto]] is a distributed `foreachPartition` sink — every
  *    executor streams its own partition straight to the target
  *    filesystem; nothing funnels through the driver.
  *  - [[readProto]] scans via Spark's `binaryFile` source and explodes
  *    each file's record stream — per-FILE parallelism, the granularity
  *    protobuf's framing allows (records are not splittable mid-file;
  *    at 100 TB the writer's partition count IS the reader's parallelism,
  *    so size write partitions like any other file-count decision).
  */
object Proto {

  private val SupportedTypes: Set[DataType] =
    Set(LongType, IntegerType, BooleanType, DoubleType, FloatType,
      StringType, BinaryType)

  private def checkSchema(schema: StructType): Unit =
    schema.fields.foreach { f =>
      require(SupportedTypes.contains(f.dataType),
        s"Proto codec: unsupported type ${f.dataType.simpleString} for column ${f.name}")
    }

  // ---------------------------------------------------------------- varint

  private[graft] def writeVarint(out: java.io.OutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt & 0x7f)
  }

  /** Reads a varint at `pos`; returns (value, bytesConsumed). */
  private[graft] def readVarint(b: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var i = pos
    while ({
      require(i < b.length && shift < 64, "Proto codec: truncated varint")
      val byte = b(i); i += 1
      v |= (byte & 0x7fL) << shift; shift += 7
      (byte & 0x80) != 0
    }) ()
    (v, i - pos)
  }

  // --------------------------------------------------------- record codec

  /** One row → one protobuf record (no length prefix). Field i+1 carries
    * column i; null columns are omitted. */
  private[graft] def encodeRow(row: Row, schema: StructType): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val field = i + 1
        schema.fields(i).dataType match {
          case LongType =>
            writeVarint(out, (field << 3) | 0); writeVarint(out, row.getLong(i))
          case IntegerType =>
            writeVarint(out, (field << 3) | 0); writeVarint(out, row.getInt(i).toLong)
          case BooleanType =>
            writeVarint(out, (field << 3) | 0); writeVarint(out, if (row.getBoolean(i)) 1L else 0L)
          case DoubleType =>
            writeVarint(out, (field << 3) | 1)
            val bits = java.lang.Double.doubleToLongBits(row.getDouble(i))
            var k = 0
            while (k < 8) { out.write(((bits >>> (8 * k)) & 0xff).toInt); k += 1 }
          case FloatType =>
            writeVarint(out, (field << 3) | 5)
            val bits = java.lang.Float.floatToIntBits(row.getFloat(i))
            var k = 0
            while (k < 4) { out.write((bits >>> (8 * k)) & 0xff); k += 1 }
          case StringType =>
            val b = row.getString(i).getBytes("UTF-8")
            writeVarint(out, (field << 3) | 2); writeVarint(out, b.length.toLong)
            out.write(b, 0, b.length)
          case BinaryType =>
            val b = row.getAs[Array[Byte]](i)
            writeVarint(out, (field << 3) | 2); writeVarint(out, b.length.toLong)
            out.write(b, 0, b.length)
          case dt => throw new IllegalArgumentException(s"unsupported $dt")
        }
      }
      i += 1
    }
    out.toByteArray
  }

  /** One protobuf record → one Row under `schema` (absent fields → null).
    * Unknown field numbers are SKIPPED by wire type — the spec's forward-
    * compatibility rule, so a reader with a narrower schema still works. */
  private[graft] def decodeRecord(b: Array[Byte], schema: StructType): Row = {
    val vals = new Array[Any](schema.length)
    var pos = 0
    while (pos < b.length) {
      val (tag, n1) = readVarint(b, pos); pos += n1
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val idx = field - 1
      def know = idx >= 0 && idx < schema.length
      wire match {
        case 0 =>
          val (v, n) = readVarint(b, pos); pos += n
          if (know) vals(idx) = schema.fields(idx).dataType match {
            case LongType => v
            case IntegerType => v.toInt
            case BooleanType => v != 0L
            case dt => throw new IllegalArgumentException(
              s"Proto codec: varint for non-integral column ${schema.fields(idx).name}: $dt")
          }
        case 1 =>
          require(pos + 8 <= b.length, "Proto codec: truncated fixed64")
          var bits = 0L; var k = 0
          while (k < 8) { bits |= (b(pos + k) & 0xffL) << (8 * k); k += 1 }
          pos += 8
          if (know) vals(idx) = java.lang.Double.longBitsToDouble(bits)
        case 5 =>
          require(pos + 4 <= b.length, "Proto codec: truncated fixed32")
          var bits = 0; var k = 0
          while (k < 4) { bits |= (b(pos + k) & 0xff) << (8 * k); k += 1 }
          pos += 4
          if (know) vals(idx) = java.lang.Float.intBitsToFloat(bits)
        case 2 =>
          val (len, n) = readVarint(b, pos); pos += n
          require(pos + len <= b.length, "Proto codec: truncated length-delimited field")
          val payload = java.util.Arrays.copyOfRange(b, pos, pos + len.toInt)
          pos += len.toInt
          if (know) vals(idx) = schema.fields(idx).dataType match {
            case StringType => new String(payload, "UTF-8")
            case BinaryType => payload
            case dt => throw new IllegalArgumentException(
              s"Proto codec: length-delimited for scalar column ${schema.fields(idx).name}: $dt")
          }
        case w => throw new IllegalArgumentException(s"Proto codec: unsupported wire type $w")
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(vals, schema)
  }

  /** Length-delimited framing of a whole partition's records. */
  private[graft] def frame(records: Iterator[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    records.foreach { r => writeVarint(out, r.length.toLong); out.write(r, 0, r.length) }
    out.toByteArray
  }

  /** Splits a length-delimited stream back into records. */
  private[graft] def unframe(b: Array[Byte]): Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private var pos = 0
    override def hasNext: Boolean = pos < b.length
    override def next(): Array[Byte] = {
      val (len, n) = readVarint(b, pos); pos += n
      require(pos + len <= b.length, "Proto codec: truncated record")
      val r = java.util.Arrays.copyOfRange(b, pos, pos + len.toInt)
      pos += len.toInt
      r
    }
  }

  // ------------------------------------------------------------ source/sink

  /** Distributed sink: one `part-NNNNN.pb` length-delimited record file per
    * partition, streamed executor-side through the Hadoop filesystem (no
    * driver funnel). Empty partitions write no file. A `_SUCCESS` marker
    * commits the layout, parquet-style — and [[readProto]] REQUIRES it,
    * so a half-written layout reads loudly, not as silent truncation.
    *
    * Task-commit protocol (r17 review): each attempt streams to an
    * attempt-unique `.…-attempt-N.pb.tmp` and RENAMES into place on
    * success — rename is the atomic primitive of every Hadoop committer,
    * so a speculative or zombie attempt of the same partition can never
    * interleave bytes into the final file; last completed rename wins
    * with a complete stream either way, and losing attempts' temp files
    * are cleaned best-effort. */
  def writeProto(df: DataFrame, path: String): Unit = {
    checkSchema(df.schema)
    val schema = df.schema
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(path)
    val fs0 = dirPath.getFileSystem(conf.value)
    if (fs0.exists(dirPath)) fs0.delete(dirPath, true)
    fs0.mkdirs(dirPath)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val fin = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.pb")
        val tmp = new org.apache.hadoop.fs.Path(path,
          f".part-$pid%05d-attempt-${tc.taskAttemptId()}.pb.tmp")
        val fs = fin.getFileSystem(conf.value)
        val out = fs.create(tmp, true)
        var committed = false
        try {
          // varint prefix written straight to the stream — no per-row
          // buffer; one framing implementation ([[frame]] is the
          // in-memory twin the specs pin against)
          rows.foreach { row =>
            val rec = encodeRow(row, schema)
            writeVarint(out, rec.length.toLong)
            out.write(rec)
          }
          out.close()
          if (fs.exists(fin)) fs.delete(fin, false)
          committed = fs.rename(tmp, fin)
          if (!committed)
            throw new java.io.IOException(s"Proto sink: rename $tmp -> $fin failed")
        } finally {
          if (!committed) {
            try out.close() catch { case _: Exception => () }
            try fs.delete(tmp, false) catch { case _: Exception => () }
          }
        }
      }
    }
    fs0.create(new org.apache.hadoop.fs.Path(dirPath, "_SUCCESS"), true).close()
  }

  /** Distributed source: `binaryFile`-scan of `part-*.pb` files, each
    * file's record stream decoded to rows under `schema`. Parallelism =
    * file count (protobuf streams are not splittable mid-file). Requires
    * the `_SUCCESS` marker [[writeProto]] commits (r17 review): a layout
    * whose write died mid-job must fail loudly here, not return the
    * surviving part files as a silently truncated dataset. */
  def readProto(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    checkSchema(schema)
    val dirPath = new org.apache.hadoop.fs.Path(path)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(dirPath, "_SUCCESS")),
      s"readProto: no _SUCCESS marker under $path — the layout was never committed " +
        "(write failed mid-job?); refusing to read a possibly-truncated record set")
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pb").load(path)
      .select("content")
    files.flatMap(r => unframe(r.getAs[Array[Byte]](0))
      .map(decodeRecord(_, schema)))(Encoders.row(schema))
  }
}
