package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r14 concurrency contract of [[Pins]]: pin registration is
  * atomic, so pins taken from concurrent threads (a parallel Verify,
  * overlapped pipeline stages) are attributed to their own caller —
  * releasing one thread's pins can never unpersist another thread's
  * localCheckpoint blocks (whose lineage is truncated and therefore
  * unrecomputable). The pre-r14 set-diff raced exactly there.
  */
class PinsConcurrencySpec extends SparkSpec {

  test("concurrent pins attribute block ids to their own caller and release cleanly") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val threads = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val tasks = (0 until threads).map { t =>
        pool.submit(new java.util.concurrent.Callable[(Long, Set[Int])] {
          override def call(): (Long, Set[Int]) = {
            // distinct frame per thread; eager pin materializes it
            val (df, pins) = Pins.pin(
              spark.range(t * 1000, t * 1000 + 500)
                .select(col("id"), (col("id") * 2).as("v")))
            assert(pins.nonEmpty, s"thread $t: no pin ids attributed")
            // the pinned frame must stay readable while OTHER threads
            // pin and release around it — a cross-released block would
            // throw here (truncated lineage cannot recompute)
            val n = df.count()
            Thread.sleep(5)
            val n2 = df.agg(sum(col("v"))).head().getLong(0)
            Pins.release(df, pins)
            (n + n2, pins)
          }
        })
      }
      val results = tasks.map(_.get())
      // every thread read its own 500 rows + the right sum
      (0 until threads).foreach { t =>
        val expectSum = (t * 1000L until t * 1000L + 500).map(_ * 2).sum
        assert(results(t)._1 == 500L + expectSum, s"thread $t wrong data")
      }
      // pin-id sets are pairwise disjoint (atomic attribution)
      val all = results.flatMap(_._2)
      assert(all.distinct.length == all.length,
        s"pin ids shared across threads: ${all.mkString(",")}")
      // and every block released: no persistent RDDs beyond the
      // pre-existing set survive
      val leaked = sc.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"leaked persistent RDDs: $leaked")
    } finally pool.shutdown()
  }

  test("eager pin materializes without planning a SQL aggregate (plan-shape contract)") {
    // the materializing job must be RDD-level: operators' plan-shape
    // specs forbid an Exchange SinglePartition near their subtrees,
    // which a Dataset.count() materialization would plan
    val (df, pins) = Pins.pin(spark.range(100).toDF("id"))
    try {
      // already materialized: reading it plans a plain RDD scan
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
        s"pin did not truncate lineage to an RDD scan:\n$plan")
      assert(df.count() == 100L)
    } finally Pins.release(df, pins)
  }
}
