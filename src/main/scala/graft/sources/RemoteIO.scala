package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's `storage_options` surface (io.py:22-33, 237-266;
  * test_io.py:424-478 `_get_storage_options`/`_is_remote_dir`)
  * re-expressed Spark-native: per-scheme Hadoop FS configuration tuned
  * for parquet reads from object stores. In Spark the credentials/tuning
  * knobs live on the Hadoop configuration rather than per-call kwargs, so
  * the analog of `storage_options` is one [[applyStorageConf]] call per
  * session (or per bucket via `fs.s3a.bucket.<name>.*` keys).
  *
  * The values mirror SCALING.md's remote-IO table: random-access fadvise
  * (parquet = footer + page seeks, not streaming), vectored reads where
  * the connector supports them, and bounded readahead. Network-less
  * environments can still exercise scheme detection and conf application
  * (spec-covered); the actual object-store round-trip needs a cluster
  * with the relevant connector jars.
  */
object RemoteIO {

  /** Caller-registered schemes (the fsspec `register_implementation`
    * analog — the reference rides fsspec, whose protocol registry is
    * likewise process-global): scheme → Hadoop conf to apply, typically
    * including an `fs.<scheme>.impl` key naming the FileSystem class. */
  private val registeredSchemes =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]

  /** Register a custom filesystem scheme with its Hadoop conf (e.g. a
    * vendor connector, or a test filesystem). Subsequent
    * [[storageConf]]/[[readParquet]] calls for the scheme use it. */
  def registerScheme(scheme: String, conf: Map[String, String]): Unit =
    registeredSchemes.put(scheme, conf)

  /** Parquet-friendly Hadoop conf per filesystem scheme. Local schemes
    * need nothing; unknown schemes raise (like the reference's helpful
    * error on an unsupported protocol). */
  def storageConf(scheme: String): Map[String, String] =
    registeredSchemes.get(scheme).getOrElse(builtinStorageConf(scheme))

  private def builtinStorageConf(scheme: String): Map[String, String] =
    scheme match {
    case "s3a" => Map(
      "fs.s3a.experimental.input.fadvise" -> "random",
      "fs.s3a.vectored.read.min.seek.size" -> "131072",
      "fs.s3a.vectored.read.max.merged.size" -> "2097152",
      "fs.s3a.readahead.range" -> "1048576",
      "fs.s3a.connection.maximum" -> "96")
    case "abfs" | "abfss" => Map(
      "fs.azure.read.optimizefooterread" -> "true",
      "fs.azure.readaheadqueue.depth" -> "4",
      "fs.azure.read.readahead.blocksize" -> "4194304")
    case "gs" => Map(
      "fs.gs.inputstream.fadvise" -> "RANDOM",
      "fs.gs.status.parallel.enable" -> "true")
    case "file" | "hdfs" | "" => Map.empty
    case other => throw new IllegalArgumentException(
      s"unsupported filesystem scheme '$other' " +
        "(supported: s3a, abfs, abfss, gs, hdfs, file)")
  }

  /** Scheme of a storage URL; bare paths read as local files — including
    * legal local paths that are not legal URIs (spaces, brackets …), for
    * which URI.create would throw. A string that NAMES a scheme
    * ("s3a://bucket/path with space") but fails URI parsing rethrows:
    * silently treating a malformed remote URL as a local file would
    * apply local-file conf to what the caller meant as remote. */
  def schemeOf(url: String): String =
    try Option(java.net.URI.create(url).getScheme).getOrElse("file")
    catch {
      case e: IllegalArgumentException =>
        val sep = url.indexOf("://")
        val scheme = if (sep > 0) url.take(sep) else ""
        val hasSchemePrefix = scheme.matches("[A-Za-z][A-Za-z0-9+.-]*")
        // file:// is exempt: a spacey local path is still a local read
        // (Hadoop Path tolerates it); the rethrow protects REMOTE urls
        // from silently getting local-file conf
        if (hasSchemePrefix && !scheme.equalsIgnoreCase("file"))
          throw new IllegalArgumentException(
            s"malformed $scheme:// URL: $url", e)
        "file"
    }

  /** Apply the per-scheme conf (plus caller extras — credentials,
    * endpoints) to the session's Hadoop configuration. Returns the
    * applied map. Session-level by design: Spark resolves FileSystem
    * instances against this configuration and caches them per scheme. */
  def applyStorageConf(spark: SparkSession, scheme: String,
                       extra: Map[String, String] = Map.empty)
      : Map[String, String] = {
    val conf = storageConf(scheme) ++ extra
    val hc = spark.sparkContext.hadoopConfiguration
    conf.foreach { case (k, v) => hc.set(k, v) }
    conf
  }

  /** `read_parquet(url, storage_options=...)` analog: configure the
    * session for the URL's scheme, then read. */
  def readParquet(spark: SparkSession, url: String,
                  extra: Map[String, String] = Map.empty): DataFrame = {
    applyStorageConf(spark, schemeOf(url), extra)
    spark.read.parquet(url)
  }
}
