package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
  * (random-hyperplane) and an IVF-style (coarse-quantizer) variant as
  * the 100 TB scale path — both turn the O(n·q) scan into a bucketed
  * join that only scores within matching buckets.
  */
object Similarity {

  /** Dot product of two float-array columns (codegen'd builtins). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. Backed by
    * the one-pass [[CosineSimExpr]] — the composed `aggregate(zip_with)`
    * form is an interpreted HOF chain (kept above for the dot/norm
    * building blocks, which are off the hot path).
    */
  def cosine(a: Column, b: Column): Column = DedupExpressions.cosineSim(a, b)

  /** Symmetric int8 quantization of an embedding column: per-vector
    * scale = max|x|/127, elements → round(x/scale) in [-127, 127].
    * At 100 TB of vectors this is the difference between shuffling/
    * storing 4 bytes and 1 byte per dimension — ANN candidate
    * generation (LSH buckets, IVF cells) runs on the int8 vectors and
    * only the final rerank touches float precision. Returns a struct
    * `(q: array<tinyint>, scale: double)`.
    */
  def quantizeInt8(vec: Column): Column = {
    val scale = greatest(
      aggregate(vec, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double")))),
      lit(java.lang.Double.MIN_NORMAL)) / lit(127.0)
    struct(
      transform(vec, x => round(x.cast("double") / scale).cast("tinyint")).as("q"),
      scale.as("scale"))
  }

  /** Reconstruct approximate floats from [[quantizeInt8]] output. */
  def dequantizeInt8(quantized: Column): Column =
    transform(quantized.getField("q"),
      x => (x.cast("double") * quantized.getField("scale")).cast("float"))

  /** Exact brute-force top-k by cosine against one query vector.
    * One full scan, no shuffle until the final top-k (a TakeOrdered —
    * per-partition heaps then a driver merge). Ties broken by id for
    * determinism.
    */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    df.select(
        col(idCol),
        round(cosine(col(vecCol), q), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** All-pairs exact cosine ≥ threshold — embedding-based near-dup
    * detection. Quadratic: use only after LSH prefiltering at scale
    * (see [[lshBuckets]]); kept exact here as the correctness oracle.
    */
  def cosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("v_a"), col("v_b")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Random-hyperplane LSH bucket id: sign bits of dot products with
    * `nPlanes` deterministic pseudo-random hyperplanes (seeded by plane
    * index — stable across executors). Vectors in the same bucket are
    * probable cosine neighbors.
    */
  def lshBuckets(vec: Column, dim: Int, nPlanes: Int = 16, seed: Long = 42L): Column = {
    val planes: Seq[Seq[Double]] = {
      val rng = new scala.util.Random(seed)
      Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
    }
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val pc = array(p.map(lit): _*)
      when(dot(vec, pc) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** ANN top-k via LSH buckets: score only within the query's bucket
    * (plus optional multi-probe neighbors at Hamming distance 1).
    * Approximate — recall depends on nPlanes; the scale path for ANN
    * when brute force over 100 TB of vectors is off the table.
    */
  def annTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      dim: Int,
      nPlanes: Int = 8,
      multiProbe: Boolean = true): DataFrame = {
    val bucketed = df.withColumn("_bucket", lshBuckets(col(vecCol), dim, nPlanes))
    // driver-side bucket id of the query vector (same plane family)
    val rng = new scala.util.Random(42L)
    val planes = Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (x, y) => x * y }.sum
      if (d >= 0) 1L << i else 0L
    }.reduce(_ | _)
    val probes: Seq[Long] =
      if (multiProbe) qBucket +: (0 until nPlanes).map(i => qBucket ^ (1L << i))
      else Seq(qBucket)
    val q = array(query.map(v => lit(v)): _*)
    bucketed
      .filter(col("_bucket").isin(probes: _*))
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-style coarse quantization: assign each vector to the nearest
    * of `centroids`; at query time only the closest `nProbe` centroid
    * partitions are scanned. Centroids come from a driver-side sample
    * (k-means would slot in here); partitionBy("ivf_cell") at write
    * time makes the probe a partition-pruned scan.
    */
  def ivfAssign(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cc = array(c.map(lit): _*)
      struct((-cosine(vec, cc)).as("negScore"), lit(i).as("cell"))
    }
    array_min(array(scored: _*)).getField("cell")
  }
}
