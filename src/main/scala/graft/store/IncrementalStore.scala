package graft.store

import graft.model.Meta

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 store with incremental flush — the layout that makes version
  * rotation affordable at 100 TB (SURVEY §7.3 "hard part #1": Spark
  * has no in-place UPDATE, so the table layout must turn rotation into
  * small writes).
  *
  * Layout under `root`:
  *   - `history/` — closed versions, APPEND-ONLY (never rewritten);
  *   - `current_v<N>/` — the current snapshot, REPLACED per flush
  *     (its size is the entity count, a sliver of total history);
  *   - `MANIFEST` — the live snapshot version N (atomic cutover, and
  *     the reason a flush never reads the directory it is writing).
  *
  * Per flush: one full-outer join of current × incoming (the
  * single-pass upsert split), the newly-closed versions append to
  * `history/`, the new snapshot writes to `current_v<N+1>`, MANIFEST
  * flips, the old snapshot dir is deleted. Write volume is
  * O(|current| + |batch|) regardless of how much history has
  * accumulated. Current-only reads (`date = null`) never touch
  * `history/` — the union branch is eliminated by a literal-false
  * filter, so the scan lists only the snapshot directory.
  */
class IncrementalStore private (
    val spark: SparkSession,
    val name: String,
    val root: String) {

  private val fs: FileSystem =
    FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  private def manifestPath = new Path(root, "MANIFEST")
  private def historyPath = new Path(root, "history")
  private def currentPath(v: Long) = new Path(root, s"current_v$v")

  private def readManifest(): Long = {
    if (!fs.exists(manifestPath)) 0L
    else {
      val in = fs.open(manifestPath)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeManifest(v: Long): Unit = {
    val out = fs.create(manifestPath, true)
    try out.write(v.toString.getBytes)
    finally out.close()
  }

  private def readDir(p: Path): Option[DataFrame] =
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
      Some(spark.read.parquet(p.toString))
    else None

  /** Current snapshot (empty DataFrame with no rows if never flushed). */
  def current: Option[DataFrame] = readDir(currentPath(readManifest()))

  def history: Option[DataFrame] = readDir(historyPath)

  /** Full table = history ∪ current. */
  def df: DataFrame = (history, current) match {
    case (Some(h), Some(c)) => h.unionByName(c, allowMissingColumns = true)
    case (Some(h), None) => h
    case (None, Some(c)) => c
    case (None, None) =>
      throw new IllegalStateException(s"store $root has no data")
  }

  /** Current-only view — scans ONLY the snapshot directory. */
  def currentDf: DataFrame =
    current.getOrElse(throw new IllegalStateException(s"store $root has no data"))

  /** Compact the append-only history: many small flushes accumulate
    * many small files; rewrite them into `targetFiles` larger ones.
    * Writes to a staging dir first and swaps via rename, so a crash
    * mid-compaction leaves the original history intact (read path sees
    * either the old or the new directory, never a partial mix).
    */
  def compactHistory(targetFiles: Int = 8): IncrementalStore = {
    history.foreach { h =>
      val staging = new Path(root, "history_compacting")
      fs.delete(staging, true)
      h.repartition(targetFiles).write.parquet(staging.toString)
      val retired = new Path(root, "history_retired")
      fs.delete(retired, true)
      if (!fs.rename(historyPath, retired))
        throw new IllegalStateException(s"compaction rename failed for $historyPath")
      if (!fs.rename(staging, historyPath)) {
        fs.rename(retired, historyPath) // roll back
        throw new IllegalStateException(s"compaction swap failed for $historyPath")
      }
      fs.delete(retired, true)
    }
    this
  }

  /** SCD2 flush: same per-key semantics as Container.upsert
    * (insert / untouched / idempotent-skip / rotate+insert), with
    * append-only history and snapshot replacement.
    */
  def flushUpsert(incoming: DataFrame): IncrementalStore = {
    val v = readManifest()
    // latest incoming version per oid
    val w = Window.partitionBy(Meta.OID).orderBy(col(Meta.START).desc)
    val inc = incoming
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")

    val (closed, nextCurrent) = current match {
      case None =>
        (None, inc)
      case Some(curr) =>
        val cols = curr.columns.toSeq
        val incAligned = cols.foldLeft(inc) { (d, c) =>
          if (d.columns.contains(c)) d
          else d.withColumn(c, lit(null).cast(curr.schema(c).dataType))
        }.select(cols.map(col): _*)
        val currS = curr.select(col(Meta.OID).as("_k"), struct(cols.map(col): _*).as("_c"))
        val incS = incAligned.select(col(Meta.OID).as("_k"), struct(cols.map(col): _*).as("_i"))
        val joined = currS.join(incS, Seq("_k"), "full_outer")
        val rotatedOld = struct(cols.map {
          case Meta.END => col("_i." + Meta.START).as(Meta.END)
          case Meta.ID =>
            Meta.genId(col("_c." + Meta.OID), col("_c." + Meta.START), col("_i." + Meta.START))
              .as(Meta.ID)
          case c => col("_c." + c).as(c)
        }: _*)
        val changed = col("_c").isNotNull && col("_i").isNotNull &&
          col("_c." + Meta.HASH) =!= col("_i." + Meta.HASH)
        val closedDf = joined.filter(changed)
          .select(cols.map(c => rotatedOld.getField(c).as(c)): _*)
        val newCurr = joined.select(
          when(col("_i").isNull, col("_c"))
            .when(col("_c").isNull, col("_i"))
            .when(col("_c." + Meta.HASH) === col("_i." + Meta.HASH), col("_c"))
            .otherwise(col("_i")).as("_r"))
          .select(cols.map(c => col("_r." + c).as(c)): _*)
        (Some(closedDf), newCurr)
    }

    // 1. append newly-closed versions to history (append-only)
    closed.foreach(_.write.mode("append").parquet(historyPath.toString))
    // 2. write the new snapshot to a FRESH dir (never the one we read)
    nextCurrent.write.mode("overwrite").parquet(currentPath(v + 1).toString)
    // 3. atomic cutover + cleanup
    writeManifest(v + 1)
    fs.delete(currentPath(v), true)
    this
  }
}

object IncrementalStore {
  def open(spark: SparkSession, name: String, root: String): IncrementalStore = {
    val s = new IncrementalStore(spark, name, root)
    val fs = FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(root))
    s
  }
}
