package graft.mql

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** MQL → Column compilation semantics over a tiny table with scalar and
  * array fields (reference array semantics: parse.py:201-245).
  */
class CompilerSpec extends SparkSpec {

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("n", LongType),
      StructField("tags", ArrayType(StringType)),
      StructField("maybe", StringType)))
    val rows = Seq(
      Row("alpha", 1L, Seq("x", "y"), "v"),
      Row("Beta", 2L, Seq("y"), null),
      Row("gamma", 3L, Seq.empty[String], "w"),
      Row("delta", 4L, null, null))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  private def names(q: String): Set[String] =
    df.filter(Compiler.compile(q, df.schema))
      .collect().map(_.getString(0)).toSet

  test("scalar comparisons") {
    assert(names("n > 2") == Set("gamma", "delta"))
    assert(names("n >= 2 and n < 4") == Set("Beta", "gamma"))
    assert(names("name == 'alpha' or n == 4") == Set("alpha", "delta"))
    assert(names("not n == 1") == Set("Beta", "gamma", "delta"))
  }

  test("None semantics: == None is a null test") {
    assert(names("maybe == None") == Set("Beta", "delta"))
    assert(names("maybe != None") == Set("alpha", "gamma"))
  }

  test("membership incl. None element") {
    assert(names("n in [1, 3]") == Set("alpha", "gamma"))
    assert(names("n not in [1, 3]") == Set("Beta", "delta"))
    assert(names("maybe in ['v', None]") == Set("alpha", "Beta", "delta"))
  }

  test("regex / iregex") {
    assert(names("name == regex('^a')") == Set("alpha"))
    assert(names("name == iregex('^b')") == Set("Beta"))
    assert(names("name != regex('ta')") == Set("alpha", "gamma"))
  }

  test("array field: ANY for ==/in, ALL for !=/not in") {
    assert(names("tags == 'x'") == Set("alpha"))
    assert(names("tags != 'x'") == Set("Beta", "gamma")) // forall; null array excluded
    assert(names("tags in ['x', 'z']") == Set("alpha"))
    assert(names("tags not in ['x']") == Set("Beta", "gamma"))
    assert(names("tags == regex('^y$')") == Set("alpha", "Beta"))
  }

  test("empty(): empty or null array") {
    assert(names("empty(tags)") == Set("gamma", "delta"))
    assert(names("not empty(tags)") == Set("alpha", "Beta"))
  }

  test("unknown field rejected") {
    intercept[MqlParseException](names("nope == 1"))
  }
}
