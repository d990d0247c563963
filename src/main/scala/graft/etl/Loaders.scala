package graft.etl

import graft.model.Meta

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File loaders with the reference's `_oid`/`_start`/`_end` mapper
  * semantics (reference: cubes/csvdata/rows.py:38-86, utils.py:762-912,
  * jsoncube `orient=index` handling tests/testcubes/jsoncube/local.py).
  */
object Loaders {

  /** How to derive `_oid` for loaded rows. */
  sealed trait OidSpec
  /** From a column (post key-normalization name). */
  final case class OidColumn(name: String) extends OidSpec
  /** 1-based row counter in file order — the reference's CSV default
    * (rows.py default `_oid` = row index).
    */
  case object OidRowNumber extends OidSpec
  /** Arbitrary column expression. */
  final case class OidExpr(expr: Column) extends OidSpec

  /** CSV with header + schema inference; field names normalized the
    * reference way (lowercase, non-word → underscore).
    */
  def loadCsv(
      spark: SparkSession,
      path: String,
      oid: OidSpec = OidRowNumber,
      asOf: Double = 0.0,
      start: Option[Column] = None): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)
    wrapLoaded(normalizeKeys(raw), oid, asOf, start)
  }

  /** JSON lines / array-of-objects. */
  def loadJson(
      spark: SparkSession,
      path: String,
      oid: OidSpec = OidRowNumber,
      asOf: Double = 0.0): DataFrame =
    wrapLoaded(normalizeKeys(spark.read.option("multiLine", "true").json(path)), oid, asOf, None)

  /** `orient=index` JSON: one object of `{id: {fields...}}` — the meps
    * fixture shape. Explodes the top-level map into (id → row), id
    * becomes `_oid` (reference: jsoncube/local.py:20-28).
    */
  def loadJsonIndex(spark: SparkSession, path: String, asOf: Double = 0.0): DataFrame = {
    import spark.implicits._
    val text = spark.read.option("wholetext", "true").text(path).as[String].head()
    val norm = normalizeKeys(ujsonLite(spark, text)) // __index_id -> index_id
    Meta.wrap(
        norm, col("index_id"), asOf,
        dataCols = Some(norm.columns.toSeq.filterNot(_ == "index_id")))
      .drop("index_id")
  }

  /** Driver-side reshape of an orient=index JSON string into a
    * DataFrame with `__index_id` — small-file path (the reference
    * loads these via pandas on the driver too).
    */
  private def ujsonLite(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    // Re-emit as JSON lines with the id injected, then let Spark infer.
    val mapped = parseTopLevelObject(text).map { case (id, body) =>
      val trimmed = body.trim
      val inner = trimmed.substring(1, trimmed.length - 1).trim
      val idField = "\"__index_id\": \"" + id.replace("\"", "\\\"") + "\""
      if (inner.isEmpty) s"{$idField}" else s"{$idField, $inner}"
    }
    spark.read.json(spark.createDataset(mapped))
  }

  /** Minimal top-level `{id: {...}}` splitter (depth-tracking scan). */
  private[etl] def parseTopLevelObject(text: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val s = text.trim
    require(s.startsWith("{"), "orient=index JSON must be an object")
    var i = 1
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    while (i < s.length) {
      skipWs()
      if (i >= s.length || s(i) == '}') return out.toSeq
      if (s(i) == ',') { i += 1; skipWs() }
      // key
      require(s(i) == '"', s"expected key quote at $i")
      val keyStart = i + 1
      i += 1
      while (s(i) != '"' || s(i - 1) == '\\') i += 1
      val key = s.substring(keyStart, i)
      i += 1
      skipWs()
      require(s(i) == ':', s"expected ':' at $i")
      i += 1
      skipWs()
      // value: object
      require(s(i) == '{', s"orient=index values must be objects at $i")
      val vStart = i
      var depth = 0
      var inStr = false
      var done = false
      while (!done) {
        val c = s(i)
        if (inStr) {
          if (c == '\\') i += 1
          else if (c == '"') inStr = false
        } else c match {
          case '"' => inStr = true
          case '{' => depth += 1
          case '}' =>
            depth -= 1
            if (depth == 0) done = true
          case _ =>
        }
        i += 1
      }
      out += key -> s.substring(vStart, i)
    }
    out.toSeq
  }

  /** Extension-based dispatch (reference: utils.py:881-895 `load_file`).
    * Parquet stands in for the reference's pickle as the native binary
    * format.
    */
  def loadFile(
      spark: SparkSession,
      path: String,
      oid: OidSpec = OidRowNumber,
      asOf: Double = 0.0): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".csv") || lower.endsWith(".txt")) loadCsv(spark, path, oid, asOf)
    else if (lower.endsWith(".json")) loadJson(spark, path, oid, asOf)
    else if (lower.endsWith(".parquet"))
      wrapLoaded(normalizeKeys(spark.read.parquet(path)), oid, asOf, None)
    else if (lower.endsWith(".orc"))
      wrapLoaded(normalizeKeys(spark.read.orc(path)), oid, asOf, None)
    else if (lower.endsWith(".avro"))
      wrapLoaded(normalizeKeys(
        spark.read.format(AvroProvider).load(path)), oid, asOf, None)
    else throw new IllegalArgumentException(s"unsupported file type: $path")
  }

  /** Avro is compiled into spark-sql since Spark 4, but this build's
    * `DataSourceRegister` service file doesn't alias the `avro` short
    * name (it lived in the separate spark-avro artifact's service
    * entry), so `format("avro")` fails lookup while the provider class
    * itself is present and fully functional — dispatch by class name.
    */
  val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  /** Interchange export: write `df` to `dest` in `format`. Parquet and
    * ORC are the typed columnar formats (predicate pushdown and column
    * pruning survive on re-read — both are first-class Spark
    * datasources, so the write is a distributed job, one file per
    * partition); csv/json are for small extracts consumed by external
    * tools (csv stringifies types lossily).
    */
  def exportTable(
      df: DataFrame,
      dest: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): Unit = {
    // case-insensitive like loadFile's extension dispatch; the csv
    // header DEFAULT goes on before user options so a caller's
    // header=false wins
    val fmt = format.toLowerCase(java.util.Locale.ROOT)
    val base = df.write.mode("overwrite")
    val w = (if (fmt == "csv") base.option("header", "true") else base).options(options)
    fmt match {
      case "parquet" => w.parquet(dest)
      case "orc" => w.orc(dest)
      case "avro" => w.format(AvroProvider).save(dest)
      case "csv" => w.csv(dest)
      case "json" => w.json(dest)
      case other => throw new IllegalArgumentException(s"unsupported export format: $other")
    }
  }

  /** Normalize all column names the reference way
    * (core_api.py:247-249,412-419).
    */
  def normalizeKeys(df: DataFrame): DataFrame = {
    val renames = df.columns.map(c => c -> Meta.normalizeFieldName(c))
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (from == to) d else d.withColumnRenamed(from, to)
    }
  }

  private def wrapLoaded(
      df: DataFrame,
      oid: OidSpec,
      asOf: Double,
      start: Option[Column]): DataFrame = oid match {
    case OidColumn(name) => Meta.wrap(df, col(name), asOf, start)
    case OidExpr(e) => Meta.wrap(df, e, asOf, start)
    case OidRowNumber =>
      // 1-based row counter in file order, TWO-PHASE (the
      // packSequences prefix-sum recipe): within-partition rank plus
      // per-partition offsets from a numPartitions-row collect. The
      // old global `Window.orderBy(monotonically_increasing_id())`
      // funneled the whole load through ONE task; this keeps the exact
      // same numbering (ascending mid ⇔ ascending (partition id,
      // position) — Spark documents the pid-in-upper-bits layout the
      // global sort itself relied on) at full parallelism.
      val withPid = df
        .withColumn("__mid", monotonically_increasing_id())
        .withColumn("__pid", spark_partition_id())
      val counts = withPid.groupBy("__pid")
        .agg(count(lit(1)).as("__n")).collect()
        .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val offsets = counts.scanLeft(0L)(_ + _._2).init
      val offDf = df.sparkSession.createDataFrame(
        counts.map(_._1).zip(offsets).toSeq).toDF("__pid", "__off")
      val wIn = Window.partitionBy("__pid").orderBy("__mid")
      val withRn = withPid
        .join(broadcast(offDf), Seq("__pid"))
        .withColumn("__rn", row_number().over(wIn).cast(LongType) + col("__off"))
        .drop("__mid", "__pid", "__off")
      Meta.wrap(withRn, col("__rn"), asOf, start, dataCols = Some(df.columns.toSeq))
        .drop("__rn")
  }
}
