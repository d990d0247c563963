package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic SQL-database source (reference: cubes/sqldata/generic.py —
  * `_generate_sql`, field specs, oid-batched extraction).
  *
  * The reference hand-builds SELECTs and fans extraction over joblib
  * worker processes in 5000-oid batches (generic.py:36-54,377-435).
  * On Spark that whole mechanism dissolves into a partitioned JDBC
  * read: `numPartitions` concurrent connections, each pulling one
  * stripe of the keyspace — same parallelism, no custom batching code.
  *
  * No database is reachable in this environment, so this is the thin,
  * declarative layer over `spark.read.jdbc`; `partitionPredicates`
  * mirrors the reference's `_oid IN (...)` batching for non-numeric
  * keys.
  */
object JdbcSource {

  /** Field spec: rename/transform columns at extraction, the way the
    * reference's cube field spec does (`select`/`sql` per field,
    * generic.py:288-320).
    */
  final case class FieldSpec(column: String, as: Option[String] = None)

  /** Numeric-range partitioned read — each of `numPartitions` executors
    * issues one stripe query `WHERE oid BETWEEN lo AND hi`.
    */
  def read(
      spark: SparkSession,
      url: String,
      table: String,
      oidColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int = 8,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(
      url, table, oidColumn, lowerBound, upperBound, numPartitions, props)

  /** Arbitrary-predicate partitioned read — one partition per
    * predicate; the Spark-native form of the reference's oid-batch
    * IN-lists (generic.py:322-342).
    */
  def readByPredicates(
      spark: SparkSession,
      url: String,
      table: String,
      predicates: Seq[String],
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, predicates.toArray, props)

  /** Chunk an oid list into IN-list predicates of `batchSize`
    * (reference batch sizes: 999 SQLite / 5000 worker batches).
    */
  def oidBatchPredicates(
      oidColumn: String,
      oids: Seq[Any],
      batchSize: Int = 999): Seq[String] =
    oids.grouped(batchSize).map { batch =>
      val vals = batch.map {
        case s: String => "'" + s.replace("'", "''") + "'"
        case other => other.toString
      }
      s"$oidColumn IN (${vals.mkString(",")})"
    }.toSeq

  /** SELECT-list generation from a field spec (reference
    * `_generate_sql`): `SELECT a AS x, b FROM tbl [LEFT JOIN ...]`.
    */
  def generateSql(
      table: String,
      fields: Seq[FieldSpec],
      leftJoins: Seq[String] = Nil,
      where: Option[String] = None): String = {
    val sel = fields.map(f => f.as.fold(f.column)(a => s"${f.column} AS $a")).mkString(", ")
    val joins = if (leftJoins.isEmpty) "" else " " + leftJoins.mkString(" ")
    val w = where.fold("")(c => s" WHERE $c")
    s"SELECT $sel FROM $table$joins$w"
  }
}
