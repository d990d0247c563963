package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Path, StandardCopyOption}

/** URL fetch → temp file → load (reference: utils.py:1340-1359
  * `load_file` over http(s) — download with retries to a named temp
  * file, then extension-dispatch). This environment has zero egress,
  * so the wrapper is exercised against `file://` URLs in tests; the
  * retry/temp-file/cleanup contract is the part that carries over to
  * http(s) unchanged (`java.net.URL.openStream` handles both).
  *
  * Scale note: fetching happens on the DRIVER (one file), matching
  * the reference's single-file semantics — bulk ingestion of many
  * remote files should land them on shared storage and use
  * `spark.read` directly instead.
  */
object Fetch {

  /** Download `url` to a fresh temp file, retrying transient IO
    * failures with linear backoff. Caller owns (and should delete)
    * the returned file; a failed attempt never leaks its temp file.
    */
  def fetchToTemp(url: String, retries: Int = 3, backoffMs: Long = 100L): Path = {
    require(retries >= 1, "retries must be >= 1")
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < retries) {
      val tmp = Files.createTempFile("graft-fetch-", suffixOf(url))
      try {
        val in = new java.net.URL(url).openStream()
        try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
        return tmp
      } catch {
        case e: java.io.IOException =>
          Files.deleteIfExists(tmp)
          lastErr = e
          attempt += 1
          if (attempt < retries) Thread.sleep(backoffMs * attempt)
      }
    }
    throw new java.io.IOException(
      s"fetch failed after $retries attempts: $url", lastErr)
  }

  /** Keep the extension so [[Loaders.loadFile]] dispatch still works
    * on the temp copy.
    */
  private def suffixOf(url: String): String = {
    val name = url.substring(url.lastIndexOf('/') + 1)
    val dot = name.lastIndexOf('.')
    if (dot >= 0) name.substring(dot) else ".tmp"
  }

  /** Fetch + extension-dispatch load + cleanup — the full
    * `load_file(url)` path of the reference.
    */
  def loadUrl(
      spark: SparkSession,
      url: String,
      oid: Loaders.OidSpec = Loaders.OidRowNumber,
      asOf: Double = 0.0,
      retries: Int = 3): DataFrame = {
    val tmp = fetchToTemp(url, retries)
    try {
      val df = Loaders.loadFile(spark, tmp.toString, oid, asOf)
      // materialize before deleting the temp source: the lazy plan
      // would otherwise read a deleted file at action time
      val rows = df.collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq), df.schema)
    } finally {
      Files.deleteIfExists(tmp)
      ()
    }
  }
}
