package graft

import org.apache.spark.sql.SparkSession

/** Manual end-to-end smoke: runs the flagship `entry` query plus the
  * MQL error paths a user would hit first. `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5)

    val c = new store.Container(
      spark, "li", spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))
    try c.find(query = "l_quantity >")
    catch { case e: Exception => println("PROBE1 parse error => " + e.getMessage) }
    try c.find(query = "nosuchcol == 5", date = "~").count()
    catch { case e: Exception => println("PROBE2 unknown field => " + e.getMessage) }
    try mql.DateRange.toMql(Some("a~b~c"))
    catch { case e: Exception => println("PROBE3 bad date spec => " + e.getMessage) }
    println("PROBE_DONE")
    spark.stop()
  }
}
