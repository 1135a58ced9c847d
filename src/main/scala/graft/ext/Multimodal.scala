package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, plus batch feature extraction (BASELINE.json north star).
  *
  * Every dimension this module emits comes from a REAL container
  * header: [[parseHeader]] reads PNG IHDR / JPEG SOF bytes (public
  * formats, zero dependencies) with a malformed-input fallback instead
  * of exceptions, [[pngHeaderColumns]] reads the same PNG fields as
  * pure column functions (whole-stage codegen, the columnar fast path
  * for fixed-offset formats), and [[resizePlan]]/[[sampleMediaFrames]]
  * derive their geometry from the parse. Full PIXEL decode stays out
  * of scope (the container ships no codecs) — the mapPartitions bodies
  * are where a javax.imageio / ffmpeg-JNI kernel drops in, and the
  * shape around them (per-partition init, streamed rows, no driver
  * collection, columnar metadata beside the blob) is the 100 TB-safe
  * plumbing.
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

  /** Column-function header read for FIXED-OFFSET formats: a PNG's
    * IHDR dimensions sit at container bytes 17–24 (big-endian), so the
    * whole read stays inside whole-stage codegen — no JVM object churn,
    * no mapPartitions — the columnar fast path at 100 TB. Non-PNG rows
    * (including JPEG, whose SOF needs a segment SCAN — that is
    * [[decodeMedia]]'s job) emit the same ('unknown', 0, 0) fallback
    * the parser uses. Dimensions come from the ACTUAL header bytes,
    * never from a byte-length formula.
    */
  def pngHeaderColumns(withPayload: DataFrame): DataFrame = {
    val pngSig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val isPng = length(col("payload")) >= 24 &&
      substring(col("payload"), 1, 8) === lit(pngSig) &&
      substring(col("payload"), 13, 4) === lit("IHDR".getBytes("US-ASCII"))
    def be32(pos: Int) =
      conv(hex(substring(col("payload"), pos, 4)), 16, 10).cast("int")
    withPayload.select(
      col("doc_id"),
      when(isPng, lit("png")).otherwise(lit("unknown")).as("format"),
      when(isPng, be32(17)).otherwise(lit(0)).as("width"),
      when(isPng, be32(21)).otherwise(lit(0)).as("height"),
      length(col("payload")).as("n_bytes"))
  }

  /** Resize PLAN derived from parsed headers: source dimensions come
    * from [[decodeMedia]]'s real PNG/JPEG parse (unparseable payloads
    * drop out — there is nothing to resize), targets and true scale
    * factors attach as pure column functions. The pixel resampling
    * kernel itself would drop into decodeMedia's mapPartitions body;
    * the plan shape (no shuffle, no driver round-trip) is what matters
    * at scale.
    */
  def resizePlan(withPayload: DataFrame, targetW: Int, targetH: Int)
      : DataFrame =
    decodeMedia(withPayload)
      .where(col("format") =!= "unknown")
      .select(
        col("doc_id"),
        col("width").as("src_width"),
        col("height").as("src_height"),
        lit(targetW).as("width"),
        lit(targetH).as("height"))
      .withColumn("scale_x",
        col("width").cast("double") / col("src_width"))
      .withColumn("scale_y",
        col("height").cast("double") / col("src_height"))

  final case class MediaFrame(doc_id: Long, frame_idx: Int, checksum: String)

  /** The opaque body region of a [[buildPng]]/[[buildJpeg]] container —
    * the fixture layout's published framing (PNG: signature + IHDR
    * chunk + IDAT header in front, CRC + IEND behind; JPEG: SOI + SOF0
    * + COM header in front, EOI behind). A real video pipeline replaces
    * this with codec calls; everything downstream only sees bytes. */
  private def containerBody(fmt: String, bytes: Array[Byte]): Array[Byte] =
    fmt match {
      case "png"  => bytes.slice(41, bytes.length - 16)
      case "jpeg" => bytes.slice(25, bytes.length - 2)
      case _      => Array.empty
    }

  /** Frame sampling driven by the PARSED header: each media container's
    * body is treated as a sequence of `width`-byte frames — width read
    * from the real PNG IHDR / JPEG SOF, never a fixture formula — and
    * every k-th frame is emitted with its checksum. mapPartitions with
    * per-partition digest init and a streamed flatMap: one output row
    * per sampled frame, nothing collected, unparseable payloads emit
    * nothing (one bad blob must not kill the stage).
    */
  def sampleMediaFrames(withPayload: DataFrame, everyK: Int = 4)
      : DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, bytes) =>
          val (fmt, w, _) = parseHeader(bytes)
          val body = containerBody(fmt, bytes)
          if (w <= 0 || body.isEmpty) Iterator.empty
          else {
            val nFrames = ((body.length + w - 1) / w)
            (0 until nFrames by everyK).iterator.map { i =>
              digest.reset()
              val hex = digest
                .digest(body.slice(i * w, math.min((i + 1) * w, body.length)))
                .map(b => f"${b & 0xff}%02x").mkString
              MediaFrame(id, i, hex)
            }
          }
        }
      }.toDF()
  }
}
