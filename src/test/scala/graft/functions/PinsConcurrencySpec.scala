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

  test("pin/release threads never unpersist a concurrent DIRECT eager localCheckpoint") {
    // the r14 failure mode (dropped q_semantic_recluster): operators
    // call df.localCheckpoint(eager = true) directly, OUTSIDE Pins —
    // with set-diff attribution a concurrent Pins.pin could capture
    // that foreign checkpoint RDD in its diff window and a later
    // Pins.release would unpersist it; the checkpoint's lineage is
    // truncated, so the victim's next read dies. Exact-id attribution
    // makes this impossible; this spec hammers precisely that
    // interleaving.
    val sc = spark.sparkContext
    val mine = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    try {
      // 4 churn threads: pin + release in a tight loop
      val churners = (0 until 4).map { t =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          override def call(): Int = {
            var n = 0
            while (!stop.get()) {
              val (df, pins) = Pins.pin(
                spark.range(t * 10000 + n, t * 10000 + n + 50).toDF("id"))
              pins.foreach(mine.add)
              Pins.release(df, pins)
              n += 1
            }
            n
          }
        })
      }
      // 4 victim threads: direct eager localCheckpoints, read AFTER a
      // churn window so a cross-release would surface as a lost block
      val victims = (0 until 4).map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            (0 until 10).foreach { k =>
              val ck = spark.range(t * 1000 + k * 100, t * 1000 + k * 100 + 100)
                .select(col("id"), (col("id") * 3).as("v"))
                .localCheckpoint(true)
              val ckId = ck.queryExecution.logical match {
                case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
                case other => fail(s"localCheckpoint returned $other")
              }
              mine.add(ckId)
              Thread.sleep(10) // let churners cycle around this checkpoint
              val got = ck.agg(sum(col("v"))).head().getLong(0)
              val lo = t * 1000L + k * 100
              assert(got == (lo until lo + 100).map(_ * 3).sum,
                s"victim $t/$k read wrong data — a foreign release hit it")
              // release the checkpoint's UNDERLYING rdd — a
              // Dataset.unpersist is a CacheManager call and does not
              // touch localCheckpoint blocks
              sc.getPersistentRDDs.get(ckId).foreach(_.unpersist(false))
            }
          }
        })
      }
      victims.foreach(_.get()) // throws if any victim lost its blocks
      stop.set(true)
      assert(churners.map(_.get()).sum > 0, "churners never cycled")
      // only THIS test's ids: parallel suites persist their own RDDs
      // concurrently, so a global before/after set-diff is racy
      val persistent = sc.getPersistentRDDs.keySet
      val leaked = scala.jdk.CollectionConverters
        .CollectionHasAsScala(mine).asScala.toSet.filter(persistent.contains)
      assert(leaked.isEmpty, s"leaked persistent RDDs from this spec: $leaked")
    } finally { stop.set(true); pool.shutdown() }
  }

  test("pin attributes exactly the checkpoint RDD id of the returned frame") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val (df, pins) = Pins.pin(spark.range(10).toDF("id"))
    try {
      assert(pins.size == 1, s"expected exactly one pin id, got $pins")
      // subset, not equality: concurrently-running suites may register
      // their own persistent RDDs in the window
      val after = sc.getPersistentRDDs.keySet -- before
      assert(pins.subsetOf(after),
        s"attributed ids $pins not among newly persistent ids $after")
    } finally Pins.release(df, pins)
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
