package graft.etl

import graft.model.Meta
import graft.store.Container

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Incremental delta sync (reference: cubes/sqldata/generic.py:201-269
  * `_delta_force`/`get_new_oids`/`get_changed_oids` + watermark
  * persistence sqlalchemy.py:805-824).
  *
  * The incremental id set = new oids (`oid > max known`) ∪ changed oids
  * (`mtime >= last sync`); the watermark is a file-backed checkpoint or
  * derived from `max(_start)` of the target container.
  */
object Delta {

  /** Oids in `source` beyond the container's max known oid
    * (generic.py:344-364). Both sides reduce to one number / one
    * filtered scan — no join.
    */
  def newOids(source: DataFrame, oidCol: String, target: Container): DataFrame = {
    val maxKnown = target.getLastField(Meta.OID)
    maxKnown match {
      case Some(m) => source.filter(col(oidCol) > lit(m)).select(col(oidCol)).distinct()
      case None => source.select(col(oidCol)).distinct()
    }
  }

  /** Oids whose `mtimeCol` is on/after the last-sync watermark
    * (generic.py:228-253).
    */
  def changedOids(source: DataFrame, oidCol: String, mtimeCol: String, since: Double): DataFrame =
    source.filter(col(mtimeCol) >= lit(since)).select(col(oidCol)).distinct()

  /** Full-resync id diff: source oids ABSENT from the target container
    * (the catch-rows-we-missed companion to [[deltaOids]], reference
    * `_delta_force` resync, generic.py:201-226). At 100 TB the naive
    * formulation is a full source⋈target anti-join; here the join is
    * Bloom-pruned: a filter built over the target's oid set classifies
    * each source oid as DEFINITELY-absent (a miss by construction — no
    * join needed) or maybe-present, and only the maybe sliver (true
    * matches + `fpp` false positives) enters the exact left_anti join.
    * The scan-reduction is measured in ScaleProbe.
    *
    * `expectedItems` sizes the filter (≈1.2 GB at 10^9 ids / 1% fpp —
    * raise `fpp` to shrink it); defaults to a count of the target oids.
    *
    * Measured (local[16], 10M source / 6M target): the bloom classifies
    * 39.5% of the source as definite misses without joining, but the
    * loopback run is SLOWER than the plain anti-join (7.8 s vs 2.3 s) —
    * building the filter costs two target passes and local shuffle is
    * free. The win is network-bound: on a cluster the pruned fraction
    * never leaves its mapper, so use this when source≫target or shuffle
    * bytes bind; use the plain anti-join for single-node work.
    */
  def missedOids(
      source: DataFrame,
      oidCol: String,
      target: Container,
      fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame = {
    val targetOids = target.df.select(col(Meta.OID)).distinct()
    val n = if (expectedItems > 0) expectedItems else math.max(1L, targetOids.count())
    val bloom = targetOids.stat.bloomFilter(Meta.OID, n, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val might = graft.functions.DedupExpressions.bloomMightContain(col(oidCol), bytes)
    val src = source.select(col(oidCol)).distinct()
    src.filter(!might) // bloom-negative: provably not in target
      .unionByName(
        src.filter(might) // candidate sliver: exact anti-join decides
          .join(targetOids.withColumnRenamed(Meta.OID, oidCol), Seq(oidCol), "left_anti"))
  }

  /** Delta id set = new ∪ changed. */
  def deltaOids(
      source: DataFrame,
      oidCol: String,
      mtimeCol: String,
      target: Container,
      since: Double): DataFrame =
    newOids(source, oidCol, target)
      .unionByName(changedOids(source, oidCol, mtimeCol, since))
      .distinct()

  /** File-backed watermark (reference: get_delta_ts/update_delta_ts,
    * sqlalchemy.py:805-824). Falls back to the container's
    * `max(_start)` when absent (`_fetch_mtime`, generic.py:255-269).
    */
  def readWatermark(path: String, target: => Container): Option[Double] = {
    val p = Paths.get(path)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p)).trim.toDouble)
    else target.getLastField(Meta.START).map(_.toString.toDouble)
  }

  def writeWatermark(path: String, ts: Double): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, ts.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}
