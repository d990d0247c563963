package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reserved metadata columns of a versioned object ("metrique_object").
  *
  * Mirrors the reference data model (reference: metrique/core_api.py:85-131):
  * every row is one *version* of an entity identified by `_oid`, valid over
  * the interval [`_start`, `_end`); `_end` null means "current version".
  * Times are epoch seconds as Double (UTC) for cross-engine comparability
  * (reference: metrique/sqlalchemy.py:123-130 `UTCEpoch`).
  */
object Meta {
  val OID = "_oid"
  val START = "_start"
  val END = "_end"
  val ID = "_id"
  val HASH = "_hash"
  val V = "_v"
  val LIB_V = "__v__"
  val E = "_e"

  /** Library version stamped into `__v__`. */
  val LibVersion = "0.1.0"

  /** Keys excluded from content hashing (reference: core_api.py:69). */
  val HashExcludeKeys: Set[String] = Set(HASH, ID, START, END, LIB_V, "id")

  /** All meta columns in canonical order. */
  val All: Seq[String] = Seq(ID, OID, HASH, START, END, V, LIB_V, E)

  /** Version primary key: `_oid` if current else `"{_oid}:{_start}"`
    * (reference: core_api.py:73-82 `gen_id`).
    */
  def genId(oid: Column, start: Column, end: Column): Column =
    when(end.isNull, oid.cast(StringType))
      .otherwise(concat_ws(":", oid.cast(StringType), start.cast(StringType)))

  /** Content hash over the non-meta columns of `df`: SHA-1 of the
    * canonical JSON rendering (sorted keys, order-preserving arrays).
    *
    * Deliberately NOT bit-compatible with the reference's Python-2
    * `sha1(repr(...))` (reference: utils.py:719-745) — that encoding is
    * unreproducible outside CPython 2; we freeze our own goldens instead.
    * Composed from codegen'd built-ins (`to_json` over a name-sorted
    * struct + `sha1`) so it stays inside whole-stage codegen.
    */
  def contentHash(df: DataFrame): Column = {
    val dataCols = df.columns.filterNot(HashExcludeKeys.contains).sorted
    contentHashOf(dataCols.toIndexedSeq.map(c => c -> col(c)): _*)
  }

  /** Canonical hash over explicit (name, column) pairs. */
  def contentHashOf(fields: (String, Column)*): Column = {
    val sorted = fields.sortBy(_._1)
    sha1(to_json(struct(sorted.map { case (n, c) => c.as(n) }: _*)))
  }

  /** Normalize a field name the way the reference does on ingest:
    * lowercase, whitespace→`_`, strip non-word chars, collapse
    * underscores (reference: core_api.py:247-249,412-419).
    */
  def normalizeFieldName(name: String): String = {
    name.toLowerCase
      .replaceAll("\\s+", "_")
      .replaceAll("[^a-z0-9_]", "")
      .replaceAll("_+", "_")
      .stripPrefix("_")
      .stripSuffix("_") match {
      case "" => "_"
      case s => s
    }
  }

  /** Wrap a plain DataFrame as a versioned-object table: renames nothing,
    * adds the meta columns. `oid` is required; `start` defaults to
    * `asOf` (caller-supplied for determinism — Spark plans must not embed
    * wall-clock); `end` defaults to null (current version).
    */
  def wrap(
      df: DataFrame,
      oid: Column,
      asOf: Double,
      start: Option[Column] = None,
      end: Option[Column] = None,
      v: Int = 0,
      dataCols: Option[Seq[String]] = None): DataFrame = {
    val startCol = start.getOrElse(lit(asOf)).cast(DoubleType)
    val endCol = end.getOrElse(lit(null).cast(DoubleType)).cast(DoubleType)
    val withMeta = df
      .withColumn(OID, oid)
      .withColumn(START, startCol)
      .withColumn(END, endCol)
    val hashExpr = dataCols match {
      case Some(cols) => contentHashOf(cols.map(c => c -> col(c)): _*)
      case None => contentHash(df)
    }
    val hashed = withMeta.withColumn(HASH, hashExpr)
    hashed
      .withColumn(ID, genId(col(OID), col(START), col(END)))
      .withColumn(V, lit(v))
      .withColumn(LIB_V, lit(LibVersion))
      .withColumn(E, lit(null).cast(MapType(StringType, StringType)))
  }
}
