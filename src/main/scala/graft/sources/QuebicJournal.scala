package graft.sources

import java.io.{ByteArrayInputStream, DataInputStream, EOFException}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.schema.{GraftSchema, GraftType}

/** C15: one-shot migration bridge off the reference's on-disk queue —
  * a decoder for the quebic journal byte format into the C4 parquet
  * envelope, so a user holding real `.qbj`/queue files can move their
  * data into [[graft.queue.ParquetQueue]] without the reference
  * installed. This is the ONLY surface in the engine that speaks the
  * reference's byte format; everything downstream is ordinary columnar
  * data.
  *
  * Format (decoded from the reference's documented layout —
  * reference JournaledFile.scala:289-299 init / 634-666 offsets,
  * Schema.scala:66-100 type packing, DataType.scala:88-117 varint,
  * Codec.scala:20-44 PLAIN/GZIP; all values big-endian, JVM NIO
  * defaults):
  *
  *  - header: magic 0x5142 ("QB") short, header-size short,
  *    current-items long, last-position long, then the schema block:
  *    1 count byte + 4-bit type ids packed two per byte (padded to a
  *    whole byte). Type ids: 0 int, 1 real, 2 text, 3 binary,
  *    4 tensor — exactly [[GraftType]]'s ids.
  *  - entries: 32-byte frame ('@' signature byte, previous-entry
  *    offset long (-1 terminates the chain), created-at ms long,
  *    expires-at ms long (-1 = no TTL), error count short, data
  *    length int, codec byte 0=plain 1=gzip) followed by the data
  *    region: per-field stream — INTEGER/lengths as the bitcoin-style
  *    varint (≤252 inline; 253/254/255 prefix 2/4/8-byte values;
  *    negatives always 255+8), REAL as 8-byte double, TEXT/BINARY as
  *    varint length + bytes, TENSOR as varint rank + varint dims +
  *    row-major doubles.
  *  - the live chain hangs off last-position and walks `previous`
  *    pointers. In a PUSH journal (`.qbj`) the chain head is the
  *    NEWEST push (LIFO); in a migrated queue file the head is the
  *    next-to-pop entry, i.e. chain order IS FIFO
  *    (reference JournaledFile.scala:399-470 migrateTo reverses).
  *
  * Recovery semantics mirrored from the reference (C11): the writer
  * appends data+entry FIRST and commits by updating the header, so a
  * torn tail from a crashed push is byte-garbage PAST the committed
  * chain — the chain walk never visits it and the import succeeds. A
  * frame whose payload fails to decode (flipped bits in the data
  * region) is SKIPPED with accounting, like the reference's
  * error-count discard (JournaledFile.scala:226-247); a broken chain
  * structure (bad signature, pointer out of range) is a loud error —
  * silently importing half a queue would be data loss.
  *
  * Scale note: a quebic queue is a single-node file (the reference is
  * a one-machine library), so the decode is a bounded driver-side
  * sequential read by design; [[ParquetQueue]] distribution starts at
  * the push. Import cost is one pass over the file.
  */
object QuebicJournal {

  val MagicNumber: Short = 0x5142.toShort // 'Q' << 8 | 'B'
  val EntrySignature: Byte = '@'
  val EntrySize: Int = 1 + 8 + 8 + 8 + 2 + 4 + 1 // 32

  private object off { // header field offsets
    val CurrentItems = 4
    val LastPosition = 12
    val Schema = 20
  }

  /** One decoded live frame, chain position preserved. */
  case class Frame(entryOffset: Long, createdAtMs: Long, expiresAtMs: Long,
                   errors: Int, codecId: Byte, values: Seq[Any])

  case class Decoded(schema: GraftSchema, frames: Vector[Frame],
                     skippedBroken: Int)

  /** The envelope the decoded frames surface under (payload fields are
    * positional in the reference format, so they get stable synthetic
    * names f0..fN-1). */
  def sparkSchema(schema: GraftSchema): StructType =
    StructType(
      StructField("src_seq", LongType, nullable = false) ::
      StructField("created_at_ms", LongType, nullable = false) ::
      StructField("expires_at_ms", LongType, nullable = false) ::
      StructField("errors", IntegerType, nullable = false) ::
      schema.fields.map { case (n, t) =>
        StructField(n, t.sparkType, nullable = false) }.toList)

  private def readLongAt(fc: FileChannel, pos: Long): Long = {
    val b = ByteBuffer.allocate(8)
    if (fc.read(b, pos) < 8)
      throw new IllegalStateException(
        s"quebic journal truncated: cannot read long at offset $pos")
    b.flip(); b.getLong
  }

  /** Decode the packed 4-bit schema block at the current buffer
    * position (reference Schema.scala:84-96). */
  private def decodeSchema(buf: ByteBuffer): GraftSchema = {
    val count = buf.get() & 0xFF
    val aligned = count + (if (count % 2 == 0) 0 else 1)
    val ids = (0 until aligned / 2).flatMap { _ =>
      val packed = buf.get() & 0xFF
      Seq(((packed >> 4) & 0x0F).toByte, (packed & 0x0F).toByte)
    }.take(count)
    GraftSchema(ids.zipWithIndex.map { case (id, i) =>
      s"f$i" -> GraftType.valueOf(id) })
  }

  private def readVarint(in: DataInputStream): Long =
    (in.readByte() & 0xFF) match {
      case b if b <= 252 => b.toLong
      case 253 => (in.readShort() & 0xFFFF).toLong
      case 254 => in.readInt() & 0xFFFFFFFFL
      case _ => in.readLong()
    }

  /** Field-length varint, validated against the decompressed payload's
    * remaining bytes BEFORE allocation: a corrupt length (negative
    * after .toInt, or just under 2^31) must land in the documented
    * skip path (IllegalStateException is in readFrames' catch list),
    * not escape as NegativeArraySizeException / a 2 GB allocation. */
  private def readLen(in: DataInputStream, what: String): Int = {
    val n = readVarint(in)
    if (n < 0 || n > in.available())
      throw new IllegalStateException(
        s"$what length $n exceeds remaining payload (${in.available()}B) " +
          "— corrupt frame")
    n.toInt
  }

  private def readField(in: DataInputStream, t: GraftType): Any = t match {
    case GraftType.INTEGER => readVarint(in)
    case GraftType.REAL => in.readDouble()
    case GraftType.TEXT =>
      val n = readLen(in, "text")
      val b = new Array[Byte](n); in.readFully(b)
      new String(b, StandardCharsets.UTF_8)
    case GraftType.BINARY =>
      val n = readLen(in, "binary")
      val b = new Array[Byte](n); in.readFully(b)
      b
    case GraftType.TENSOR =>
      val rank = readLen(in, "tensor rank") // each dim needs >= 1 byte
      val shape = Seq.fill(rank)(readLen(in, "tensor dim"))
      // overflow-safe product: dims are each <= available (~2^31) and
      // the running product is capped before it can reach 2^63
      val count = shape.foldLeft(1L)((a, b) =>
        if (a > Int.MaxValue.toLong) a else a * b)
      if (count < 0 || count > in.available() / 8)
        throw new IllegalStateException(
          s"tensor of ${count} doubles exceeds remaining payload " +
            s"(${in.available()}B) — corrupt frame")
      val values = Seq.fill(count.toInt)(in.readDouble())
      Row(shape, values)
  }

  private def decodePayload(data: Array[Byte], codecId: Byte,
                            schema: GraftSchema): Seq[Any] = {
    val plain = codecId match {
      case 0 => data
      case 1 =>
        val in = new GZIPInputStream(new ByteArrayInputStream(data))
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      case other =>
        throw new IllegalStateException(s"unknown quebic codec id $other")
    }
    val in = new DataInputStream(new ByteArrayInputStream(plain))
    val vals = schema.fields.map { case (_, t) => readField(in, t) }
    if (in.available() > 0)
      throw new IllegalStateException(
        s"${in.available()} trailing bytes after the last schema field")
    vals
  }

  /** Read every LIVE frame of one quebic file, in CHAIN order (from
    * last-position following `previous`): LIFO for a push journal,
    * FIFO for a migrated queue file. Payload-corrupt frames are
    * skipped and counted; structural corruption is a loud error. */
  def readFrames(path: String): Decoded = {
    val fc = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      val fileSize = fc.size()
      require(fileSize >= off.Schema + 1,
        s"$path is too short (${fileSize}B) to be a quebic journal")
      val head = ByteBuffer.allocate(2)
      fc.read(head, 0); head.flip()
      val magic = head.getShort
      require(magic == MagicNumber,
        f"$path%s: bad magic 0x$magic%04X, expected 0x$MagicNumber%04X " +
          "(not a quebic journal)")
      // schema block: count byte caps the block at 129 bytes
      val sb = ByteBuffer.allocate(129)
      fc.read(sb, off.Schema); sb.flip()
      val schema = decodeSchema(sb)
      var at = readLongAt(fc, off.LastPosition)
      val headerSize = off.Schema +
        1 + { val c = schema.fields.length; (c + (c % 2)) / 2 }
      val frames = Vector.newBuilder[Frame]
      var skipped = 0
      var hops = 0L
      while (at >= 0) {
        if (at < headerSize || at + EntrySize > fileSize)
          throw new IllegalStateException(
            s"$path: chain pointer $at outside journal body " +
              s"[$headerSize, ${fileSize - EntrySize}] — structural corruption")
        hops += 1
        if (hops > (fileSize / EntrySize) + 1)
          throw new IllegalStateException(
            s"$path: entry chain loops — structural corruption")
        val eb = ByteBuffer.allocate(EntrySize)
        fc.read(eb, at); eb.flip()
        val sig = eb.get()
        if (sig != EntrySignature)
          throw new IllegalStateException(
            f"$path%s: bad entry signature 0x$sig%02X at offset $at%d")
        val previous = eb.getLong
        val createdAt = eb.getLong
        val expiresAt = eb.getLong
        val errors = eb.getShort & 0xFFFF
        val dataLength = eb.getInt
        val codecId = eb.get()
        if (dataLength < 0 || at + EntrySize + dataLength > fileSize)
          throw new IllegalStateException(
            s"$path: entry at $at declares ${dataLength}B data " +
              "overrunning the file — structural corruption")
        val db = ByteBuffer.allocate(dataLength)
        fc.read(db, at + EntrySize)
        try frames += Frame(at, createdAt, expiresAt, errors, codecId,
          decodePayload(db.array(), codecId, schema))
        catch { // the reference's error-discard path: skip, keep walking
          case _: EOFException | _: IllegalStateException |
               _: java.util.zip.ZipException => skipped += 1
        }
        if (previous >= at)
          throw new IllegalStateException(
            s"$path: non-monotonic chain $at -> $previous — " +
              "structural corruption")
        at = previous
      }
      Decoded(schema, frames.result(), skipped)
    } finally fc.close()
  }

  /** Decoded journal as a DataFrame in FIFO order with the original
    * per-entry metadata alongside the payload. `chainIsFifo=false`
    * (the default) treats `path` as a PUSH journal (`.qbj`) and
    * reverses the chain; pass true for a migrated queue file, whose
    * chain is already pop-order. `src_seq` numbers the FIFO order
    * from 0. */
  def readJournal(spark: SparkSession, path: String,
                  chainIsFifo: Boolean = false): DataFrame = {
    val d = readFrames(path)
    val fifo = if (chainIsFifo) d.frames else d.frames.reverse
    framesToDf(spark, d.schema, fifo)
  }

  private def framesToDf(spark: SparkSession, schema: GraftSchema,
                         fifo: Seq[Frame]): DataFrame = {
    val rows = fifo.zipWithIndex.map { case (f, i) =>
      Row.fromSeq(i.toLong +: f.createdAtMs +: f.expiresAtMs +:
        f.errors +: f.values)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      sparkSchema(schema))
  }

  /** One-shot import of a single quebic file into a [[ParquetQueue]]
    * whose payload schema matches the journal's (same types in order;
    * graft names its fields, the reference doesn't). FIFO order is
    * preserved through `seq`; with `preserveTimestamps` each run of
    * consecutive frames sharing (created-at, TTL) pushes with the
    * ORIGINAL enqueue time and remaining-lifetime semantics — the
    * imported entries expire at the same wall-clock instant they
    * would have in the reference. Returns rows imported. */
  def importJournal(spark: SparkSession, path: String,
                    queue: graft.queue.ParquetQueue,
                    chainIsFifo: Boolean = false,
                    preserveTimestamps: Boolean = true): Long = {
    val d = readFrames(path)
    val fifo = if (chainIsFifo) d.frames else d.frames.reverse
    importFrames(spark, d.schema, fifo, queue, preserveTimestamps)
  }

  /** Import a full quebic QUEUE (the double-stack pair): the migrated
    * queue file plus, if present, its sibling push journal
    * `<base>.qbj` (reference Queue.scala:31-37 naming) — exactly the
    * FIFO a reference consumer would see: queue-file chain first,
    * then the journal's pushes oldest-first. */
  def importQueue(spark: SparkSession, queueFile: String,
                  queue: graft.queue.ParquetQueue,
                  preserveTimestamps: Boolean = true): Long = {
    val qp = Paths.get(queueFile)
    val name = qp.getFileName.toString
    val base = name.lastIndexOf('.') match {
      case -1 => name
      case i => name.substring(0, i)
    }
    val journalPath = qp.resolveSibling(s"$base.qbj")
    val dq = readFrames(queueFile)
    val fifo =
      if (!Files.exists(journalPath) || Files.size(journalPath) == 0)
        dq.frames
      else {
        val dj = readFrames(journalPath.toString)
        require(dj.schema == dq.schema,
          s"queue/journal schema mismatch: ${dq.schema} vs ${dj.schema}")
        dq.frames ++ dj.frames.reverse
      }
    importFrames(spark, dq.schema, fifo, queue, preserveTimestamps)
  }

  // ---- export: graft -> quebic bytes (C15b) -------------------------

  private def writeVarint(out: java.io.DataOutputStream, v: Long): Unit =
    if (v >= 0 && v <= 252) out.write(v.toInt)
    else if (v >= 0 && v <= 0xFFFF) { out.write(253); out.writeShort(v.toInt) }
    else if (v >= 0 && v <= 0xFFFFFFFFL) { out.write(254); out.writeInt(v.toInt) }
    else { out.write(255); out.writeLong(v) }

  private def encodeField(out: java.io.DataOutputStream, t: GraftType,
                          v: Any): Unit = (t, v) match {
    case (GraftType.INTEGER, x: Number) => writeVarint(out, x.longValue())
    case (GraftType.REAL, x: Number) => out.writeDouble(x.doubleValue())
    case (GraftType.TEXT, s: String) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      writeVarint(out, b.length); out.write(b)
    case (GraftType.BINARY, b: Array[Byte]) =>
      writeVarint(out, b.length); out.write(b)
    case (GraftType.TENSOR, r: Row) =>
      val shape = r.getSeq[Int](0)
      val values = r.getSeq[Double](1)
      writeVarint(out, shape.length)
      shape.foreach(d => writeVarint(out, d.toLong))
      values.foreach(out.writeDouble)
    case (tt, other) => throw new IllegalArgumentException(
      s"cannot encode ${Option(other).map(_.getClass.getName).orNull} as ${tt.name}")
  }

  private def encodeSchema(schema: GraftSchema): Array[Byte] = {
    val ids = schema.fields.map(_._2.id)
    val count = ids.length
    val padded = ids.padTo(count + (count % 2), 0.toByte)
    (count.toByte +: padded.grouped(2).map { case Seq(hi, lo) =>
      (((hi & 0x0F) << 4) | (lo & 0x0F)).toByte }.toSeq).toArray
  }

  /** Export a payload DataFrame to a quebic journal file a REFERENCE
    * consumer can pop — the reverse bridge of [[importJournal]], so
    * migration works in both directions (a graft pipeline can hand
    * results back to a legacy quebic reader). Rows are written in
    * `orderCol` ascending order as a PUSH journal: the chain hangs
    * newest-first off last-position, exactly the layout the
    * reference's push loop produces (JournaledFile.scala:120-139), so
    * a reference queue pops them FIFO after migration. Encoding is a
    * bounded driver-side sequential write (one file = one machine's
    * queue, the reference's own contract); payload schema must match
    * `schema` positionally. `createdAtMs` stamps every entry
    * (defaults to now); TTL-free (expires -1) like the reference's
    * default push. Returns rows written. */
  def exportJournal(df: DataFrame, schema: GraftSchema, orderCol: String,
                    path: String,
                    codec: Byte = 0,
                    createdAtMs: Long = System.currentTimeMillis()): Long = {
    require(codec == 0 || codec == 1, s"codec must be 0 (plain) or 1 (gzip)")
    val schemaBin = encodeSchema(schema)
    val headerSize = off.Schema + schemaBin.length
    val rows = df.orderBy(orderCol).collect()
    val fc = FileChannel.open(Paths.get(path),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    try {
      val head = ByteBuffer.allocate(headerSize)
      head.putShort(MagicNumber).putShort(headerSize.toShort)
        .putLong(rows.length.toLong).putLong(-1L).put(schemaBin)
      head.flip(); fc.write(head, 0)
      var prev = -1L
      var at = headerSize.toLong
      rows.foreach { row =>
        val bo = new java.io.ByteArrayOutputStream()
        val dout = new java.io.DataOutputStream(bo)
        schema.fields.zipWithIndex.foreach { case ((_, t), i) =>
          encodeField(dout, t, row.get(i)) }
        dout.close()
        val plain = bo.toByteArray
        val data = if (codec == 0) plain else {
          val zo = new java.io.ByteArrayOutputStream()
          val g = new java.util.zip.GZIPOutputStream(zo)
          g.write(plain); g.finish(); g.close(); zo.toByteArray
        }
        val eb = ByteBuffer.allocate(EntrySize + data.length)
        eb.put(EntrySignature).putLong(prev).putLong(createdAtMs)
          .putLong(-1L).putShort(0.toShort).putInt(data.length)
          .put(codec).put(data)
        eb.flip(); fc.write(eb, at)
        prev = at
        at += EntrySize + data.length
      }
      val lp = ByteBuffer.allocate(8)
      lp.putLong(prev); lp.flip()
      fc.write(lp, off.LastPosition)
      rows.length.toLong
    } finally fc.close()
  }

  private def importFrames(spark: SparkSession, schema: GraftSchema,
                           fifo: Seq[Frame],
                           queue: graft.queue.ParquetQueue,
                           preserveTimestamps: Boolean): Long = {
    val payloadSchema = StructType(schema.fields.map { case (n, t) =>
      StructField(n, t.sparkType, nullable = false) })
    def push(fs: Seq[Frame], nowMs: Long, lifetimeMs: Long): Long = {
      val rows = fs.map(f => Row.fromSeq(f.values))
      queue.push(spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), payloadSchema),
        lifetimeMs = lifetimeMs, nowMs = nowMs)
      fs.length.toLong
    }
    if (!preserveTimestamps) {
      if (fifo.isEmpty) 0L
      else push(fifo, System.currentTimeMillis(), -1L)
    } else {
      // runs of identical (created-at, lifetime) push together: FIFO
      // seq order is preserved across pushes, timestamps within
      def key(f: Frame): (Long, Long) =
        (f.createdAtMs,
          if (f.expiresAtMs < 0) -1L else f.expiresAtMs - f.createdAtMs)
      var imported = 0L
      var run = List.empty[Frame]
      fifo.foreach { f =>
        if (run.nonEmpty && key(run.head) != key(f)) {
          imported += push(run.reverse, run.head.createdAtMs, key(run.head)._2)
          run = Nil
        }
        run = f :: run
      }
      if (run.nonEmpty)
        imported += push(run.reverse, run.head.createdAtMs, key(run.head)._2)
      imported
    }
  }
}
