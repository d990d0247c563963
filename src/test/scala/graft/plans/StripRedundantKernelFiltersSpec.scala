package graft.plans

import graft.SparkSpec
import graft.functions.DedupExpressions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The optimizer rule that strips InferFiltersFromGenerate's
  * kernel-re-evaluating conjuncts under non-outer explodes.
  */
class StripRedundantKernelFiltersSpec extends SparkSpec {

  private def kernelSites(df: DataFrame): Int =
    "shingle_set\\(".r.findAllIn(df.queryExecution.optimizedPlan.toString).size

  // the vulnerable shape: kernel aliased in one select, exploded from
  // the attribute in the next — the infer rule fires on the attribute
  // and pushdown inlines the kernel into a scan-side Filter. Parquet
  // source, NOT a local Seq: ConvertToLocalRelation would fold the
  // kernel away entirely and there would be nothing to observe.
  private def docs(s: SparkSession): DataFrame =
    s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))

  private def twoStepExplode(s: SparkSession): DataFrame =
    docs(s)
      .select(col("id"), DedupExpressions.shingleSet(col("text"), 3).as("hs"))
      .select(col("id"), explode(col("hs")).as("h"))

  private lazy val registered: SparkSession = {
    val s = spark.newSession()
    new graft.GraftExtensions().register(s)
    s
  }

  test("strips the inferred duplicate kernel filter under an explode") {
    // control: a plain session re-plans the kernel in the inferred
    // Filter — 3 textual sites (size + isnotnull conjuncts) vs the
    // Project's one, i.e. the kernel EXECUTES twice per row
    val control = kernelSites(twoStepExplode(spark.newSession()))
    assert(control == 3, s"expected the vulnerable 3-site control, got $control")
    // with the rule: one site, and row-for-row identical output
    val df = twoStepExplode(registered)
    assert(kernelSites(df) == 1, df.queryExecution.optimizedPlan.toString)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = twoStepExplode(spark.newSession()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got.nonEmpty && got == want,
      "stripping the redundant filter changed results")
  }

  test("keeps user conjuncts in the same filter and filters not under an explode") {
    val base = docs(registered)
    // extra user conjunct rides the same filter the infer rule extends —
    // only the kernel-redundant parts may go
    val mixed = base
      .select(col("id"), DedupExpressions.shingleSet(col("text"), 3).as("hs"))
      .filter(col("id") > 3)
      .select(col("id"), explode(col("hs")).as("h"))
    assert(kernelSites(mixed) == 1,
      mixed.queryExecution.optimizedPlan.toString)
    assert(mixed.collect().map(_.getLong(0)).forall(_ > 3L), "user conjunct lost")
    // a size() filter NOT feeding an explode must be untouched: the
    // rows it drops are observable
    val standalone = base
      .filter(size(DedupExpressions.shingleSet(col("text"), 3)) > lit(1000000))
    assert(standalone.count() == 0, "standalone kernel filter was stripped")
    assert(standalone.queryExecution.optimizedPlan.toString.contains("shingle_set"),
      "standalone filter lost its predicate")
  }

  test("posexplode gets the same treatment; aggregates stop the walk") {
    // posexplode is an ExplodeBase too — the inferred conjuncts must go
    val pos = docs(registered)
      .select(col("id"), DedupExpressions.shingleSet(col("text"), 3).as("hs"))
      .select(col("id"), posexplode(col("hs")).as(Seq("p", "h")))
    assert(kernelSites(pos) == 1, pos.queryExecution.optimizedPlan.toString)
    assert(pos.count() == twoStepExplode(spark.newSession()).count(),
      "posexplode output changed")
    // an aggregate between the explode and a kernel filter OBSERVES the
    // filtered rows — the walk must stop at the aggregate and leave the
    // filter alone (rows with > 1 shingle, aggregated, then exploded)
    val barrier = registered.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(size(DedupExpressions.shingleSet(col("text"), 3)) > lit(1))
      .groupBy(col("lang")).agg(collect_list(col("doc_id")).as("ids"))
      .select(col("lang"), explode(col("ids")).as("id"))
    assert(barrier.queryExecution.optimizedPlan.toString.contains("shingle_set"),
      "kernel filter beyond an aggregate was stripped")
  }
}
