package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The actual codecs (JPEG decode, audio resample, video frame-sample)
  * are NOT available in this environment — the decode kernels are
  * clearly-marked deterministic fakes ([[fakeDecode]]) so the
  * Spark-side plumbing (schema, partitioning, batch shape, column
  * pruning) is real and testable; swap `decodeKernel` for a JNI/FFmpeg
  * call in production. The `mapPartitions` shape mirrors what a Pandas
  * `mapInPandas` batch UDF does on the Python side: one kernel
  * invocation per batch, not per row.
  */
object Multimodal {

  /** Canonical schema of a multimodal asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),   // opaque payload
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Deterministic fake "decode": a real decoder is unavailable in this
    * container (STUB — replace with the actual codec). Produces a
    * fixed-length feature vector derived from the payload bytes so
    * downstream plumbing (similarity, dedup over features) is
    * exercisable end-to-end.
    */
  def fakeDecode(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
    if (bytes == null) return Array.fill(dim)(0f)
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Per-partition kernel-initialization counter — lets tests PROVE
    * the batch shape (decoder inits once per partition, not per row),
    * which is the property a real JNI/FFmpeg kernel needs.
    */
  val kernelInits = new java.util.concurrent.atomic.AtomicLong(0)

  /** Batch feature extraction over the binary column: Dataset-native
    * `mapPartitions` so the (stubbed) decoder initializes ONCE per
    * partition and processes rows as a stream — the same batch shape a
    * Pandas-UDF/`mapInPandas` pipeline has on the Python side. Output
    * keeps asset_id + modality and appends `features: array<float>`.
    */
  def extractFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("modality", StringType),
      StructField("features", ArrayType(FloatType))))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    df.select("asset_id", "modality", "content")
      .mapPartitions { rows =>
        // per-partition decoder init (STUB: a real codec would open its
        // native context here; the counter proves once-per-partition)
        kernelInits.incrementAndGet()
        rows.map { r =>
          Row(
            r.getLong(0),
            r.getString(1),
            fakeDecode(r.getAs[Array[Byte]](2), dim).toSeq)
        }
      }
  }

  /** Frame-sampling plan for video assets: every `everyMs` milliseconds
    * up to `maxFrames` — emits (asset_id, frame_idx, ts_ms) rows via a
    * `sequence`+`explode` (no decoder needed to *plan* the sample;
    * the decode of each planned frame is the stubbed kernel above).
    */
  def planFrameSamples(df: DataFrame, everyMs: Long, maxFrames: Int): DataFrame =
    df.filter(col("modality") === "video" && col("duration_ms").isNotNull)
      .select(
        col("asset_id"),
        posexplode(
          slice(
            sequence(lit(0L), col("duration_ms"), lit(everyMs)),
            1, maxFrames)))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "ts_ms")

  /** Deterministic synthetic asset table for tests (no real media in
    * the container): payload bytes derived from the id.
    */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val modality = Seq("image", "audio", "video")(i % 3)
      val payload = Array.tabulate[Byte](64 + i % 32)(j => ((i * 31 + j * 7) % 256).toByte)
      Row(
        i.toLong, modality, payload,
        Some(modality).map(m => s"application/x-fake-$m").orNull,
        if (modality == "image") Integer.valueOf(640) else null,
        if (modality == "image") Integer.valueOf(480) else null,
        if (modality != "image") java.lang.Long.valueOf(1000L * (i % 10 + 1)) else null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 4), assetSchema)
  }
}
