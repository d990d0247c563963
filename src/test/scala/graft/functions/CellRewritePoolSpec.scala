package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r14 overlapped per-cell rewrite: `perCellStagedRewrite` runs
  * up to 4 cell rewrites concurrently. This spec drives MORE dirty
  * cells than pool lanes through one compaction pass (exercising the
  * queue + concurrent stage/swap paths) and asserts the invariants
  * the sequential version guaranteed: every dirty cell lands at one
  * file, values/serving are bit-equal, and no stage/retired leftovers
  * survive.
  */
class CellRewritePoolSpec extends SparkSpec {
  import spark.implicits._

  test("per-cell compaction with more dirty cells than pool lanes is bit-equal and leftover-free") {
    val rnd = new scala.util.Random(131)
    val vecs = (0 until 240).map { i =>
      (i.toLong, (0 until 16).map(_ => (rnd.nextDouble() * 2 - 1).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val scale = Similarity.kmeansGlobalScale(df, "embedding")
    // 8 coarse cells > the 4 rewrite lanes
    val (coarse, cbs) = Similarity.ivfPqFit(df, "vec_id", "embedding",
      coarseK = 8, m = 4, k = 3, iters = 1, scale = scale)
    val root = java.nio.file.Files.createTempDirectory("graft-cellpool-t")
    val dir = root.resolve("codes").toString
    // three append batches fragment EVERY populated cell
    Similarity.saveIvfPqEncoded(df.filter(col("vec_id") % 3 === 0),
      "vec_id", "embedding", scale, coarse, cbs, dir)
    (1 to 2).foreach { i =>
      Similarity.appendIvfPqEncoded(df.filter(col("vec_id") % 3 === i),
        "vec_id", "embedding", scale, coarse, cbs, dir)
    }
    def cellFiles(): Map[String, Int] = {
      val d = new java.io.File(dir)
      d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(c => c.getName ->
          c.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    val cells = cellFiles()
    assert(cells.size >= 5, s"want >= 5 populated cells, got $cells")
    assert(cells.values.forall(_ >= 2), s"every cell should be fragmented: $cells")
    val rows = spark.read.parquet(dir)
      .select("vec_id", "cell", "codes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1).toSeq
    val q = vecs(5)._2
    def serve(): Seq[(Long, Long, Long)] =
      Similarity.ivfPqTopKFromCodes(spark.read.parquet(dir), "vec_id",
          q, kTop = 9, scale = scale, coarse = coarse, codebooks = cbs,
          nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = serve()
    // every populated cell is dirty -> all of them queue through the
    // 4-lane pool in one pass
    Similarity.compactIvfPqCells(spark, dir,
      cells.keys.map(_.stripPrefix("cell=").toLong).toSeq.sorted)
    val after = cellFiles()
    assert(after.keySet == cells.keySet, s"cell set changed: $after")
    assert(after.values.forall(_ == 1), s"not compacted to 1 file/cell: $after")
    val rowsAfter = spark.read.parquet(dir)
      .select("vec_id", "cell", "codes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1).toSeq
    assert(rowsAfter == rows, "concurrent cell rewrites changed stored values")
    assert(serve() == want, "concurrent cell rewrites changed serving")
    // no _cellstage/_cellretired leftovers beside the layout
    assert(root.toFile.listFiles().map(_.getName).toSet == Set("codes"),
      s"leftovers: ${root.toFile.listFiles().map(_.getName).mkString(",")}")
  }
}
