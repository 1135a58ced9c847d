package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, plus batch feature extraction (BASELINE.json north star).
  *
  * The features surface decodes REAL container headers: [[parseHeader]]
  * reads true dimensions from PNG IHDR / JPEG SOF bytes (public
  * formats, zero dependencies), with a malformed-input fallback instead
  * of exceptions. Full pixel decode stays out of scope (the container
  * ships no codecs) — [[decodeFeatures]]/[[resizeStub]] keep the
  * byte-derived STUB bodies as the documented template for where a
  * javax.imageio / ffmpeg-JNI kernel would drop in.
  *
  * At 100 TB the decode stage is the expensive part; the shape here —
  * `mapPartitions` with partition-level init, no driver collection,
  * columnar metadata kept alongside the blob — is what a real decoder
  * drops into, and [[decodeMedia]] demonstrates it with a real parser
  * body.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct to the documents table
    * (text→UTF-8 bytes stands in for an image/audio blob).
    */
  def withBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        col("lang").as("lang"),
        col("source").as("source")).as("meta"))

  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      checksum: String)

  /** STUB decoder — deterministic fake in place of a real codec. A real
    * implementation would replace ONLY the body of `decodeOne`
    * (e.g. javax.imageio / ffmpeg JNI), keeping the partition-batch
    * shape: init once per partition, stream rows, emit typed features.
    */
  def decodeFeatures(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    val out = withPayload.select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would construct the real decoder here
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, bytes) => decodeOne(digest, id, bytes) }
      }
    out.toDF()
  }

  private def decodeOne(
      digest: java.security.MessageDigest, id: Long,
      bytes: Array[Byte]): MediaFeatures = {
    digest.reset()
    val md5hex = digest.digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString
    // ??? real decode goes here; fake dimensions derive from byte length
    MediaFeatures(id, bytes.length,
      1 + bytes.length % 64, 1 + bytes.length % 48, md5hex)
  }

  // ---- REAL header decode (round 8): PNG + JPEG are public formats
  // with fixed header layouts, so true dimensions parse with zero
  // dependencies. The container still has no pixel codecs — fixture
  // payloads are CRAFTED media containers (valid signature + header +
  // opaque body) and the decoder reads what the header actually says,
  // replacing the byte-length stub for the features surface. ----

  final case class MediaInfo(
      doc_id: Long, format: String, width: Int, height: Int, n_bytes: Int)

  /** Build a minimal-but-valid PNG container: signature, IHDR with real
    * CRC32 (width/height as the spec's big-endian 4-byte fields), the
    * payload as one opaque chunk, IEND. Total = 57 + payload bytes. */
  def buildPng(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(64 + payload.length)
    val out = new java.io.DataOutputStream(bos)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(tag: String, data: Array[Byte]): Unit = {
      out.writeInt(data.length)
      val tb = tag.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.writeInt(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    chunk("IHDR", ihdr)
    chunk("IDAT", payload)
    chunk("IEND", Array.empty)
    out.flush()
    bos.toByteArray
  }

  /** Build a minimal-but-valid JPEG container: SOI, SOF0 (baseline)
    * carrying precision/height/width/3 components, the payload as a COM
    * segment, EOI. Total = 27 + min(payload, 60000) bytes (a COM
    * segment's 2-byte length caps its body). */
  def buildJpeg(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val body = payload.take(60000)
    val bos = new java.io.ByteArrayOutputStream(32 + body.length)
    val out = new java.io.DataOutputStream(bos)
    out.write(0xff); out.write(0xd8)             // SOI
    out.write(0xff); out.write(0xc0)             // SOF0
    out.writeShort(8 + 3 * 3)                    // segment length (17)
    out.write(8)                                 // precision
    out.writeShort(height); out.writeShort(width)
    out.write(3)                                 // components
    Seq(1, 2, 3).foreach { id =>
      out.write(id); out.write(0x11); out.write(0)
    }
    out.write(0xff); out.write(0xfe)             // COM
    out.writeShort(body.length + 2)
    out.write(body)
    out.write(0xff); out.write(0xd9)             // EOI
    out.flush()
    bos.toByteArray
  }

  /** REAL header parse: PNG signature → IHDR width/height; JPEG SOI →
    * scan segments to the first SOF0/SOF1/SOF2 frame header. Anything
    * else — wrong magic, truncated header, a JPEG with no frame —
    * returns ("unknown", 0, 0): the malformed-input fallback, never an
    * exception (one bad blob must not kill a 100 TB decode stage). */
  def parseHeader(b: Array[Byte]): (String, Int, Int) = {
    def u8(i: Int) = b(i) & 0xff
    def be32(i: Int) =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    val pngSig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length >= 24 && pngSig.indices.forall(i => u8(i) == pngSig(i))) {
      if (be32(8) == 13 && b(12) == 'I' && b(13) == 'H' &&
          b(14) == 'D' && b(15) == 'R') ("png", be32(16), be32(20))
      else ("unknown", 0, 0)
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(i) != 0xff) return ("unknown", 0, 0)
        val m = u8(i + 1)
        if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
          if (i + 9 > b.length) return ("unknown", 0, 0)
          return ("jpeg", be16(i + 7), be16(i + 5))
        } else if (m == 0xd9 || (m >= 0xd0 && m <= 0xd8) || m == 0x01) {
          i += 2 // standalone marker, no length field
        } else {
          i += 2 + be16(i + 2) // skip the segment by its declared length
        }
      }
      ("unknown", 0, 0)
    } else ("unknown", 0, 0)
  }

  /** Crafted-media fixture: each document's text bytes wrapped in a real
    * container — PNG for even doc_ids, JPEG for odd — whose header
    * carries dimensions derived from doc_id (width = 1 + id % 512,
    * height = 1 + id % 384). The DECODER does not know this contract;
    * it parses the bytes. The ORACLE replicates the contract
    * arithmetically — that is the fixture's published spec. */
  def withMediaBinary(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("t"))
      .as[(Long, Array[Byte])]
      .map { case (id, text) =>
        val w = 1 + (id % 512).toInt
        val h = 1 + (id % 384).toInt
        val payload =
          if (id % 2 == 0) buildPng(w, h, text) else buildJpeg(w, h, text)
        (id, payload)
      }.toDF("doc_id", "payload")
  }

  /** The real decode stage over binary media payloads — mapPartitions
    * with per-partition init, streamed rows, typed output (the same
    * shape the stub documented; the body is now an actual parser). */
  def decodeMedia(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (fmt, w, h) = parseHeader(bytes)
          MediaInfo(id, fmt, w, h, bytes.length)
        }
      }.toDF()
  }

  /** Column-function variant of the same features (codegen'd, no
    * deserialization to JVM objects) — preferred when the "decode" is
    * expressible as expressions; the mapPartitions path above is the
    * template for when it is not.
    */
  def featureColumns(withPayload: DataFrame): DataFrame =
    withPayload.select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      (lit(1) + length(col("payload")) % 64).as("width"),
      (lit(1) + length(col("payload")) % 48).as("height"),
      md5(col("payload")).as("checksum"))

  /** STUB resize — a real implementation swaps the checksum/arith body
    * for a scaling kernel; the Spark shape (pure column functions over
    * the stub-decoded dimensions, no shuffle, no driver round-trip) is
    * what matters at scale.
    */
  def resizeStub(withPayload: DataFrame, targetW: Int, targetH: Int)
      : DataFrame =
    withPayload.select(
      col("doc_id"),
      (lit(1) + length(col("payload")) % 64).as("src_width"),
      (lit(1) + length(col("payload")) % 48).as("src_height"),
      lit(targetW).as("width"),
      lit(targetH).as("height"))
      .withColumn("scale_x",
        col("width").cast("double") / col("src_width"))
      .withColumn("scale_y",
        col("height").cast("double") / col("src_height"))

  /** STUB frame sampler — the payload is treated as a fixed-size-frame
    * "video" (frameBytes per frame) and every k-th frame is emitted with
    * a checksum. A real decoder replaces the substring/md5 with codec
    * calls; the generate-and-explode shape (one row per sampled frame,
    * computed columnar, never collected) is the 100 TB-safe plumbing.
    */
  def sampleFrames(withPayload: DataFrame, frameBytes: Int = 64,
      everyK: Int = 4): DataFrame =
    withPayload
      .where(length(col("payload")) > 0)
      .select(col("doc_id"),
        explode(expr(
          s"""transform(
             |  sequence(0, int(ceil(length(payload) / ${frameBytes}D)) - 1, $everyK),
             |  i -> named_struct(
             |    'frame_idx', i,
             |    'checksum', md5(substring(payload, i * $frameBytes + 1, $frameBytes))))""".stripMargin))
          .as("f"))
      .select(col("doc_id"), col("f.frame_idx"), col("f.checksum"))
}
