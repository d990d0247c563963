package graft.etl

import graft.model.Meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The value-prep pipeline (reference: core_api.py:367-524
  * `_prep_value`): per-field container normalization → user convert →
  * typecast, with failures recorded in the `_e` error map and the value
  * nulled (core_api.py:445-458). Declarative `Column` composition —
  * the whole pipeline is one projection, fully codegen'd, zero
  * shuffles; the reference's 8k values/s single-core Python loop
  * becomes a vectorized scan.
  */
object Prep {

  /** Per-field spec (reference schema dict `{type, container, convert,
    * variants}`, core_api.py:186-214).
    *
    * @param dataType  target Spark type (element type when container)
    * @param container value is a list of `dataType` (null → `[]`,
    *                  scalar → singleton; arrays sorted after cast,
    *                  core_api.py:490-498)
    * @param convert   user transform applied pre-cast (mapped over
    *                  container elements)
    * @param variants  derived columns computed from the prepped value
    */
  final case class FieldSpec(
      dataType: DataType,
      container: Boolean = false,
      convert: Option[Column => Column] = None,
      variants: Map[String, Column => Column] = Map.empty)

  /** Infer a FieldSpec schema from a DataFrame (the reference's
    * `autoschema`, utils.py:121-157): existing arrays become
    * containers, everything else keeps its type.
    */
  def autoschema(df: DataFrame): Map[String, FieldSpec] =
    df.schema.fields.collect {
      case f if !Meta.All.contains(f.name) =>
        f.dataType match {
          case ArrayType(el, _) => f.name -> FieldSpec(el, container = true)
          case dt => f.name -> FieldSpec(dt)
        }
    }.toMap

  /** Apply the prep pipeline. Columns not in `schema` pass through;
    * failed casts null the value and add an `_e` entry
    * `field -> original-as-string`.
    */
  def prep(df: DataFrame, schema: Map[String, FieldSpec]): DataFrame = {
    var out = df
    val errFields = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, spec) <- schema.toSeq.sortBy(_._1) if df.columns.contains(name)) {
      val raw = col(name)
      val isArrayIn = df.schema(name).dataType.isInstanceOf[ArrayType]
      val prepped: Column =
        if (spec.container) {
          // null -> [], scalar -> [x] (core_api.py:367-377,490-498)
          val asArray =
            if (isArrayIn) coalesce(raw, array())
            else when(raw.isNull, array()).otherwise(array(raw))
          val converted = spec.convert match {
            case Some(fn) => transform(asArray, fn)
            case None => asArray
          }
          array_sort(converted.try_cast(ArrayType(spec.dataType)))
        } else {
          val converted = spec.convert.map(_(raw)).getOrElse(raw)
          converted.try_cast(spec.dataType)
        }
      if (!spec.container) {
        // cast failure: value was non-null but result is null — record
        // the ORIGINAL value (before overwriting the column)
        out = out.withColumn(
          s"__err_$name",
          when(raw.isNotNull && prepped.isNull, raw.cast(StringType)).otherwise(lit(null)))
        errFields += name
      }
      out = out.withColumn(name, prepped)
      for ((vname, vfn) <- spec.variants.toSeq.sortBy(_._1))
        out = out.withColumn(vname, vfn(col(name)))
    }
    // assemble _e: map of field -> original value for failed fields
    if (errFields.isEmpty)
      out.withColumn(Meta.E, lit(null).cast(MapType(StringType, StringType)))
    else {
      val pairs = errFields.toSeq.flatMap(n => Seq(lit(n), col(s"__err_$n")))
      out
        .withColumn(Meta.E, map_filter(map(pairs: _*), (_, v) => v.isNotNull))
        .withColumn(Meta.E, when(size(map_keys(col(Meta.E))) === 0,
          lit(null).cast(MapType(StringType, StringType))).otherwise(col(Meta.E)))
        .drop(errFields.toSeq.map(n => s"__err_$n"): _*)
    }
  }
}
