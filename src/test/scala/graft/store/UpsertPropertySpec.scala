package graft.store

import graft.SparkSpec
import graft.model.Meta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.Random

/** SCD2 upsert invariants over random batch sequences, checked against
  * an in-memory sequential oracle (the reference's semantics:
  * sqlalchemy.py:906-975 + container goldens).
  */
class UpsertPropertySpec extends SparkSpec {
  import spark.implicits._

  private def toBatch(objs: Seq[(Long, String, Double)]): DataFrame =
    objs.toDF("_oid", "v", "_start")
      .withColumn(Meta.END, lit(null).cast(DoubleType))
      .withColumn(Meta.HASH, Meta.contentHashOf("v" -> col("v")))
      .withColumn(Meta.ID, Meta.genId(col("_oid"), col("_start"), col(Meta.END)))
      .select("_oid", "_start", "_end", "v", "_hash", "_id")

  test("random batch sequences match a sequential in-memory oracle") {
    val rng = new Random(42)
    for (trial <- 0 until 3) {
      // oracle state: oid -> list of (start, end?, value)
      var oracle = Map.empty[Long, List[(Double, Option[Double], String)]]
      var c: Container = new Container(spark, "p", toBatch(Nil))
      var t = 0.0
      for (_ <- 0 until 5) {
        t += 10.0
        val batch = (0 until 8).map { _ =>
          val oid = rng.nextInt(5).toLong
          val v = s"v${rng.nextInt(3)}"
          (oid, v, t)
        }.distinct.groupBy(_._1).map(_._2.head).toSeq // one row per oid per batch
        // apply to oracle
        for ((oid, v, start) <- batch) {
          val versions = oracle.getOrElse(oid, Nil)
          versions.headOption match {
            case Some((s0, None, v0)) if v0 == v => // dup: no-op
            case Some((s0, None, v0)) =>
              oracle += oid -> ((start, None, v) :: (s0, Some(start), v0) :: versions.tail)
            case _ =>
              oracle += oid -> ((start, None, v) :: versions)
          }
        }
        c.upsert(toBatch(batch))
      }
      val got = c.df.collect()
        .map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getString(3)))
        .toSet
      val expected = oracle.flatMap { case (oid, vs) =>
        vs.map { case (s, e, v) => (oid, s, e, v) }
      }.toSet
      assert(got == expected, s"trial $trial")
      // invariants: exactly one open version per touched oid;
      // closed versions chain (end == next start)
      val byOid = got.groupBy(_._1)
      byOid.foreach { case (oid, vs) =>
        assert(vs.count(_._3.isEmpty) == 1, s"oid $oid open-version count")
        val sorted = vs.toSeq.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Seq(a, b) => assert(a._3.contains(b._2), s"oid $oid chain break")
          case _ =>
        }
      }
    }
  }
}
