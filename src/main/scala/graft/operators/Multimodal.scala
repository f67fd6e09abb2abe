package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct
  * alongside. IMAGE decode is REAL ([[decodeImage]] — header-only
  * `javax.imageio`, pure JDK); video decode remains a stub
  * ([[fakeDecode]] — the JDK ships no container demuxer). Everything
  * around them — schema, batched per-partition execution, partition
  * sizing — is what matters at 100 TB:
  *
  *  - decode/feature-extract run via `mapPartitions` over a typed Dataset:
  *    one JVM-side batch per partition (the Scala analog of arrow-batched
  *    Python `mapInPandas`), so a real decoder would amortize codec init
  *    per-partition, not per-row.
  *  - media rows are large: repartition by size budget BEFORE decode so a
  *    partition's decoded frames fit in executor memory (see
  *    [[repartitionForMedia]]).
  */
object Multimodal {

  case class MediaRow(media_id: Long, payload: Array[Byte])
  case class MediaMeta(media_id: Long, byte_len: Long, width: Int, height: Int,
                       n_frames: Int, format: String)
  case class ImageMetaRow(media_id: Long, byte_len: Long, width: Int,
                          height: Int, channels: Int, format: String)

  /** REAL image decode via `javax.imageio` (pure JDK — the PNG/JPEG/GIF/BMP
    * reader plugins ship with every JRE, no native deps). HEADER-ONLY: the
    * reader is probed for dimensions / band count / format without
    * materializing a pixel raster, so the per-row cost is parsing a few
    * hundred header bytes, not decompressing the image — the shape that
    * survives a 100 TB image corpus. Returns None for bytes no installed
    * reader recognizes (callers decide whether unknown payloads error or
    * pass through). Video stays stubbed ([[fakeDecode]]): the JDK has no
    * container demuxer. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, String)] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            val w = r.getWidth(0)
            val h = r.getHeight(0)
            val its = r.getImageTypes(0)
            val channels = if (its.hasNext) its.next().getNumComponents else -1
            Some((w, h, channels, r.getFormatName.toLowerCase))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** Deterministic RGB image ENCODER (`ImageIO.write`) — real format bytes
    * for specs and the oracle query without shipping binary fixtures. The
    * pixel pattern is a pure function of (x, y, seed), so the same call
    * reproduces the same image on any executor. */
  def encodeImage(width: Int, height: Int, seed: Long,
                  format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((x * 31 + y * 17 + seed) & 0xffffffL).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no ImageIO writer for format $format")
    bos.toByteArray
  }

  /** Decode a binary IMAGE payload column into typed metadata — the real
    * (non-stub) twin of [[decodeMeta]], batched per partition like a
    * production decoder (codec probe state amortizes per partition).
    * Unrecognized payloads map to (-1, -1, -1, "unknown") rather than
    * failing the batch. */
  def decodeImageMeta(df: DataFrame, idCol: String, payloadCol: String)
                     (implicit spark: SparkSession): Dataset[ImageMetaRow] = {
    import spark.implicits._
    df.select(col(idCol).as("media_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val len = if (r.payload == null) 0L else r.payload.length.toLong
          decodeImage(r.payload) match {
            case Some((w, h, c, fmt)) =>
              ImageMetaRow(r.media_id, len, w, h, c, fmt)
            case None => ImageMetaRow(r.media_id, len, -1, -1, -1, "unknown")
          }
        }
      }
  }

  /** STUB decoder for VIDEO payloads: deterministic pseudo-metadata from
    * payload bytes (the JDK ships no video demuxer). Image payloads use the
    * REAL [[decodeImage]]; the signature here (bytes in, typed metadata
    * out) is the real contract a codec would fill. */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Int, String) = {
    val n = payload.length
    val width = 320 + (n % 321)            // 320..640
    val height = 240 + ((n * 7) % 241)     // 240..480
    val frames = 1 + (n % 30)
    val fmt = if (n % 2 == 0) "rgb8" else "yuv420"
    (width, height, frames, fmt)
  }

  /** Decode a binary payload column into a typed metadata Dataset.
    * Batched per partition; codec state would be initialized once per
    * partition in the `mapPartitions` closure. */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String)
                (implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).as("media_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init of a (stub) codec happens here
        rows.map { r =>
          val (w, h, f, fmt) = fakeDecode(r.payload)
          MediaMeta(r.media_id, r.payload.length.toLong, w, h, f, fmt)
        }
      }
  }

  /** Frame sampling: keep every `stride`-th frame index, as the plumbing a
    * video pipeline needs (indices only — decode stubbed). Pure Column expr. */
  def sampleFrameIndices(nFrames: org.apache.spark.sql.Column, stride: Int)
      : org.apache.spark.sql.Column =
    filter(sequence(lit(0), nFrames - 1), i => i % stride === 0)

  /** "Resize": metadata-level scale transform (decode stubbed).
    * +1e-9 before round: w·(t/s) can land exactly on .5 for integer dims;
    * the epsilon makes rounding engine-portable (see Queries.roundSafe). */
  def resizeMeta(width: org.apache.spark.sql.Column,
                 height: org.apache.spark.sql.Column,
                 targetShortSide: Int)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val short = least(width, height)
    val scale = lit(targetShortSide).cast("double") / short
    (round(width * scale + lit(1e-9)).cast("int"),
     round(height * scale + lit(1e-9)).cast("int"))
  }

  /** Media partitions must be sized by BYTES, not rows: repartition so each
    * partition holds ~`targetMB` of payload. At 100 TB this is the difference
    * between a working pipeline and OOM: a 1000-row partition of 4K video is
    * tens of GB.
    *
    * Total bytes are measured FROM THE DATA (one cheap `sum(length)` agg —
    * a caller-supplied estimate was the round-1 skew hazard), and rows are
    * greedily packed into byte-budgeted buckets per input partition: each
    * task accumulates payload sizes and advances its bucket when the running
    * sum crosses `targetMB`, so a run of giant rows spills into more buckets
    * instead of round-robining into the same ones. The bucket id then drives
    * one hash repartition. A single row larger than `targetMB` still owns a
    * whole bucket (cannot be subdivided — documented limit). */
  def repartitionForMedia(df: DataFrame, payloadCol: String,
                          targetMB: Int = 128): DataFrame = {
    val targetBytes = targetMB * 1024L * 1024L
    // coalesce: sum() over zero rows (or all-null payloads) is NULL — an
    // empty frame must degrade to 1 partition, not NPE on getLong.
    val totalBytes = df
      .agg(coalesce(sum(length(col(payloadCol))), lit(0L))).head()
      .getLong(0)
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    assignMediaBuckets(df, payloadCol, targetMB)
      .repartition(parts, col("__media_bkt")).drop("__media_bkt")
  }

  /** The greedy byte-packing pass behind [[repartitionForMedia]], exposed so
    * its invariant is testable: each task accumulates payload sizes and
    * advances its `__media_bkt` when the running sum crosses the budget, so
    * every bucket holds ≤ targetBytes + one payload (the deterministic
    * guarantee; the subsequent hash repartition balances buckets across
    * partitions in expectation). Narrow — no shuffle, no driver data. */
  def assignMediaBuckets(df: DataFrame, payloadCol: String,
                         targetMB: Int): DataFrame = {
    val targetBytes = targetMB * 1024L * 1024L
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, LongType}
    val schema = df.schema.add(StructField("__media_bkt", LongType))
    // resolved on the driver: the closure must not capture the Dataset
    val sizeIdx = df.schema.fieldIndex(payloadCol)
    spark.createDataFrame(
      df.rdd.mapPartitionsWithIndex { (pid, rows) =>
        var acc = 0L
        var bkt = 0L
        rows.map { r =>
          val sz = r.get(sizeIdx) match {
            case b: Array[Byte] => b.length.toLong
            case s: String      => s.length.toLong
            case _              => 0L
          }
          acc += sz
          if (acc > targetBytes) { bkt += 1; acc = sz }
          Row.fromSeq(r.toSeq :+ (pid.toLong * 100003L + bkt))
        }
      }, schema)
  }
}
