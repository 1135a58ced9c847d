package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, plus batch feature extraction (BASELINE.json north star).
  *
  * The container has no image/audio codecs, so `decode` is a clearly
  * marked DETERMINISTIC STUB — it derives fake dimensions/features from
  * the bytes. Everything around it is real and tested: the schema
  * (binary + metadata struct), the per-partition batch iteration (the
  * Scala analog of a vectorized pandas UDF: one decoder init per
  * partition, streamed rows), and the column-function fast path.
  *
  * At 100 TB the decode stage is the expensive part; the shape here —
  * `mapPartitions` with partition-level init, no driver collection,
  * columnar metadata kept alongside the blob — is what a real decoder
  * would drop into.
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
