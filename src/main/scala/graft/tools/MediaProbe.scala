package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Mixed-format media corpus probe — the composed path a multimodal
  * training pipeline runs: generate a corpus of REAL codec payloads
  * (PNG/JPEG/WAV/MP4, every byte produced by the actual encoder), plant a
  * 10×-size skew, push it through [[Multimodal.repartitionForMedia]]'s
  * byte-budget partitioning, then run the real decode/resize work and
  * report throughput + partition balance.
  * `runMain graft.tools.MediaProbe [nPayloads]` (default 1,000,000). */
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // corpus: 40% PNG / 20% JPEG / 20% WAV / 20% MP4, generated on
    // EXECUTORS by the real encoders. Every 512th payload is a planted
    // ~10× outlier (big image / long audio) — the skew the byte-budget
    // partitioning must absorb.
    val t0 = System.nanoTime()
    val corpus = spark.range(n).map { id =>
      val big = id % 512 == 0
      val kind = (id % 10) match {
        case k if k < 4 => "png"
        case k if k < 6 => "jpg"
        case k if k < 8 => "wav"
        case _          => "mp4"
      }
      val payload = kind match {
        case "png" =>
          val side = if (big) 192 else 48
          Multimodal.encodeImage(side, side, id, "png")
        case "jpg" =>
          val side = if (big) 256 else 64
          Multimodal.encodeImage(side, side, id, "jpg")
        case "wav" =>
          val frames = if (big) 40000 else 4000
          Multimodal.encodeWav(8000, 1, frames, id)
        case _ =>
          Multimodal.encodeMp4Meta(640, 360, 1000L + (id % 9000), "isom")
      }
      (id, kind, payload)
    }.toDF("media_id", "kind", "payload")
    corpus.write.mode("overwrite").parquet("/tmp/media_probe_corpus")
    val tGen = (System.nanoTime() - t0) / 1e9

    val df = spark.read.parquet("/tmp/media_probe_corpus")
    val totalBytes = df.agg(sum(length(col("payload")))).head().getLong(0)

    // byte-budget repartition: measure per-partition byte balance
    val t1 = System.nanoTime()
    val balanced = Multimodal.repartitionForMedia(df, "payload",
      targetMB = 32)
    val perPart = balanced
      .select(spark_partition_id().as("pid"), length(col("payload")).as("b"))
      .groupBy("pid").agg(sum("b").as("bytes"))
      .agg(min("bytes"), max("bytes"), count(lit(1))).head()
    val tPart = (System.nanoTime() - t1) / 1e9
    val (minB, maxB, nParts) =
      (perPart.getLong(0), perPart.getLong(1), perPart.getLong(2))

    // real codec work over the balanced frame, per format
    implicit val s: SparkSession = spark
    val t2 = System.nanoTime()
    val img = balanced.where(col("kind").isin("png", "jpg"))
    val nImgOk = Multimodal.decodeImageMeta(img, "media_id", "payload")
      .filter(_.width > 0).count()
    val nResized = Multimodal.resizeImages(img, "media_id", "payload",
      16, 16, "png").filter(_.payload != null).count()
    val nWavOk = Multimodal.decodeAudioMeta(
      balanced.where(col("kind") === "wav"), "media_id", "payload")
      .filter(_.sample_rate > 0).count()
    val nMp4Ok = Multimodal.decodeVideoMeta(
      balanced.where(col("kind") === "mp4"), "media_id", "payload")
      .filter(_.width > 0).count()
    val tDecode = (System.nanoTime() - t2) / 1e9
    val nOk = nImgOk + nWavOk + nMp4Ok

    println(f"MEDIAPROBE payloads=$n bytes=${totalBytes / 1048576}%dMB " +
      f"gen=$tGen%.1fs partition=$tPart%.1fs parts=$nParts " +
      f"part_bytes=[${minB / 1048576}%d..${maxB / 1048576}%dMB] " +
      f"decode+resize=$tDecode%.1fs " +
      f"(${(nOk + nResized) / tDecode}%.0f payloads/s) " +
      f"decoded=$nOk/${n}%d resized=$nResized")
    require(nOk == n,
      s"decode failures: $nOk of $n payloads decoded")
    spark.stop()
  }
}
