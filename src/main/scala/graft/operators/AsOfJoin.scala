package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row (per
  * key) whose time is <= the left row's time — "what was the entity's
  * state when this event happened", the join form of the reference's
  * as-of date predicate (SURVEY §2.3, parse.py:109-124).
  *
  * Implementation is the UNION + carry-forward formulation, not an
  * inequality join: tag both sides, union, then one window per key
  * ordered by (time, side) carrying the last right payload forward.
  * One shuffle on the key, O(n log n) per key — an inequality
  * (`l.t >= r.t`) join would be a per-key cross product that
  * detonates on hot keys at 100 TB. (Composed from primitives —
  * preference (a) of the build brief — rather than a custom
  * LogicalPlan; Catalyst sees ordinary window + filter nodes.)
  *
  * Right rows at exactly the left time match (<=): the right side
  * sorts before the left at equal times.
  */
object AsOfJoin {

  /** @param payload right-side columns to carry onto left rows
    *                (null when no right row is at-or-before)
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(!payload.exists(leftCols.contains),
      s"payload ${payload} collides with left columns")

    // payloads travel as ONE struct so right rows with legitimately
    // null payload values still overwrite the carry (last(ignoreNulls)
    // on a bare column would reach past them to an older version)
    val payloadStruct = struct(payload.map(col): _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(payload.map(c => right.schema(c))))

    val l = left.select(
      (col(leftKey).as("_k") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        nullPayload.as("_r") +: leftCols.map(c => col(c).as(s"_l_$c"))): _*)
    val r = right.select(
      (col(rightKey).as("_k") +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        payloadStruct.as("_r") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c"))): _*)

    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))

    carried
      .filter(col("_side") === 1)
      .select(
        (leftCols.map(c => col(s"_l_$c").as(c)) ++
          payload.map(c => col("_r").getField(c).as(c))): _*)
  }
}
