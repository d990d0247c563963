package graft.etl

import graft.model.Meta

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Activity import: rebuild version history BACKWARDS from a change-log
  * (reference: cubes/sqldata/generic.py:106-199).
  *
  * Input: the *current* document per `_oid` plus activity events
  * `(_oid, when, field, removed, added)` describing forward changes
  * (`field` went from `removed` to `added` at instant `when`). Walking
  * activities newest→oldest, each step splits the working version at
  * `when` and applies the inverse change to the older half:
  *   - scalar fields: value ← `removed` (generic.py:195-199)
  *   - array fields: drop `added` elements, extend with `removed`
  *     (generic.py:186-194)
  * Same-instant events merge into one split (generic.py:144-147);
  * if the doc's value doesn't match the activity's `added`, the
  * inconsistency is recorded in `_e` and patched (generic.py:450-465).
  *
  * Spark shape: `cogroup` per `_oid` with a pure sequential fold —
  * per-key sequential logic, embarrassingly parallel across keys; the
  * only shuffle is the cogroup hash partition on `_oid`, which is
  * exactly the 100 TB-safe formulation (no driver-side iteration).
  *
  * Representation: scalar fields as strings, array fields as
  * `array<string>` (cast on the way in/out); `when`/`_start`/`_end`
  * are epoch-second doubles.
  */
object ActivityImport {

  /** @param current   one row per `_oid`, columns: `_oid` + data fields
    *                  (+ optional `_start`; defaults to `asOf`)
    * @param activities `(_oid, when, field, removed, added)`; for array
    *                  fields `removed`/`added` are comma-joined element
    *                  lists
    * @param arrayFields which data fields are arrays
    * @param creationField optional field holding the true creation
    *                  instant — the oldest version's `_start` is
    *                  clamped to it (generic.py:168-184)
    */
  def rebuild(
      current: DataFrame,
      activities: DataFrame,
      arrayFields: Set[String] = Set.empty,
      creationField: Option[String] = None,
      asOf: Double = 0.0): DataFrame = {
    val spark = current.sparkSession

    val dataFields: Array[String] =
      current.columns.filterNot(c => c == Meta.OID || c == Meta.START)
    val hasStart = current.columns.contains(Meta.START)

    val outSchema = StructType(
      Seq(
        StructField(Meta.OID, StringType),
        StructField(Meta.START, DoubleType),
        StructField(Meta.END, DoubleType)) ++
        dataFields.map { f =>
          if (arrayFields(f)) StructField(f, ArrayType(StringType))
          else StructField(f, StringType)
        } :+ StructField(Meta.E, MapType(StringType, StringType)))

    // normalize inputs to string-typed payloads keyed by a string oid
    val curNorm = current.select(
      (col(Meta.OID).cast(StringType).as(Meta.OID) +:
        (if (hasStart) col(Meta.START).cast(DoubleType) else lit(asOf)).as(Meta.START) +:
        dataFields.toSeq.map { f =>
          if (arrayFields(f)) col(f).cast(ArrayType(StringType)).as(f)
          else col(f).cast(StringType).as(f)
        }): _*)
    val actNorm = activities.select(
      col(Meta.OID).cast(StringType).as(Meta.OID),
      col("when").cast(DoubleType).as("when"),
      col("field").cast(StringType).as("field"),
      col("removed").cast(StringType).as("removed"),
      col("added").cast(StringType).as("added"))

    implicit val rowEnc: Encoder[Row] = Encoders.row(outSchema)
    import spark.implicits._

    val curKV = curNorm.groupByKey(r => r.getString(0))
    val actKV = actNorm.groupByKey(r => r.getString(0))

    val fieldIdx = dataFields.zipWithIndex.toMap

    curKV.cogroup(actKV) { (oid, docs, acts) =>
      if (!docs.hasNext) Iterator.empty
      else {
        val doc = docs.next()
        val origStart = doc.getDouble(1)
        // working payload: Array[Any] over dataFields
        var values: Array[Any] = dataFields.map(f => doc.getAs[Any](f))
        var errs = Map.empty[String, String]

        // newest -> oldest; same-instant events form one split
        val sorted = acts.toSeq
          .map(a => (a.getDouble(1), a.getString(2), Option(a.getString(3)), Option(a.getString(4))))
          .sortBy(-_._1)
        val grouped = sorted.groupBy(_._1).toSeq.sortBy(-_._1)

        var out = List.empty[(Double, Option[Double], Array[Any], Map[String, String])]
        var end: Option[Double] = None // current version is open
        var curStart = origStart

        for ((when, evs) <- grouped) {
          // close the newer version at [when, end)
          out = (when, end, values.clone(), errs) :: out
          // apply inverse changes to get the older state
          val older = values.clone()
          var olderErrs = Map.empty[String, String]
          for ((_, field, removed, added) <- evs) {
            fieldIdx.get(field).foreach { i =>
              if (arrayFields(field)) {
                val cur: Seq[String] = older(i) match {
                  case null => Seq.empty
                  case s: scala.collection.Seq[_] => s.map(x => if (x == null) null else x.toString).toSeq
                  case other => Seq(other.toString)
                }
                val addedEls = added.map(_.split(",", -1).toSeq).getOrElse(Seq.empty)
                val removedEls = removed.map(_.split(",", -1).toSeq).getOrElse(Seq.empty)
                older(i) = (cur.filterNot(addedEls.contains) ++ removedEls).sorted
              } else {
                val curV = Option(older(i)).map(_.toString)
                if (added.isDefined && curV != added)
                  olderErrs += (field -> s"expected added=${added.orNull} found=${curV.orNull}")
                older(i) = removed.orNull
              }
            }
          }
          values = older
          errs = olderErrs
          end = Some(when)
        }

        // oldest version keeps the original _start, optionally clamped
        // to the creation field
        val clampStart = creationField.flatMap(fieldIdx.get).flatMap { i =>
          Option(values(i)).flatMap(v => scala.util.Try(v.toString.toDouble).toOption)
        }
        val firstStart = (clampStart.toSeq :+ math.min(
          curStart, end.getOrElse(curStart))).min
        out = (firstStart, end, values, errs) :: out

        out.iterator.map { case (s, e, vs, er) =>
          Row.fromSeq(
            Seq(oid, s, e.map(Double.box).orNull) ++ vs.toSeq :+
              (if (er.isEmpty) null else er))
        }
      }
    }
  }
}
