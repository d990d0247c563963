package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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
    * exercisable end-to-end. Feature k = (sum of bytes at positions
    * ≡ k mod dim) / 256 — an exact integer sum and a dyadic division,
    * so the value is bit-exact in ANY IEEE engine and the DuckDB
    * oracle reproduces it from the reconstructed payload.
    */
  def fakeDecode(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
    if (bytes == null) return Array.fill(dim)(0f)
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xffL)
      i += 1
    }
    acc.map(s => (s / 256.0).toFloat)
  }

  /** REAL (non-stub) multimodal kernels: content-level operations that
    * need no codec. Magic-byte mime sniffing — the first real step of
    * any ingest pipeline (route/validate payloads BEFORE decoding).
    * Pure `Column` ops over the binary payload, codegen'd.
    */
  def sniffMime(content: Column): Column = {
    // RIFF is a container: the FORM TYPE at bytes 9-12 distinguishes
    // AVI video from WAV audio and WebP images — classifying every
    // RIFF as video would misroute audio/image payloads
    val riffForm = substring(content, 9, 4)
    when(substring(content, 1, 8) ===
      lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)), "image/png")
      .when(substring(content, 1, 3) === lit("ID3".getBytes("UTF-8")), "audio/mpeg")
      .when(substring(content, 1, 4) === lit("RIFF".getBytes("UTF-8")),
        when(riffForm === lit("AVI ".getBytes("UTF-8")), "video/x-msvideo")
          .when(riffForm === lit("WAVE".getBytes("UTF-8")), "audio/x-wav")
          .when(riffForm === lit("WEBP".getBytes("UTF-8")), "image/webp")
          .otherwise(lit("application/x-riff")))
      .when(substring(content, 1, 3) === lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)), "image/jpeg")
      .otherwise(lit("application/octet-stream"))
  }

  /** REAL kernel #2: exact binary dedup — sha256 over the (hex-encoded)
    * payload, one hash-shuffle, groups >1 with the smallest id as the
    * canonical copy and the sniffed mime along for routing. The hex
    * passthrough keeps the hash replicable in engines whose sha256
    * takes strings (DuckDB); identical bytes ⇔ identical hex ⇔
    * identical digest, so dedup semantics are unchanged.
    */
  def binaryDedupGroups(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(
        sha2(hex(col(contentCol)), 256).as("content_sha"),
        sniffMime(col(contentCol)).as("mime_sniffed"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))
      .filter(col("n_dups") > 1)

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
    * the container). Payloads carry REAL magic bytes (PNG/ID3/RIFF by
    * modality) followed by a deterministic body keyed on `id mod 39` —
    * 39 ≡ 0 (mod 3) keeps modality aligned, so every payload recurs
    * every 39 ids and exact-binary-dedup has genuine duplicate groups.
    * The whole construction is reproducible in SQL
    * (blob-literal magic || encode(repeat(...))), which is what lets
    * the DuckDB oracle verify sha256 dedup and feature extraction.
    */
  val PngMagic: Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val modality = Seq("image", "audio", "video")(i % 3)
      val magic = modality match {
        case "image" => PngMagic
        case "audio" => "ID3".getBytes("UTF-8")
        // full 12-byte RIFF header with the AVI form type, as a real
        // .avi starts (size field zeroed — sniffing ignores it)
        case _ => "RIFF".getBytes("UTF-8") ++ Array[Byte](0, 0, 0, 0) ++
          "AVI ".getBytes("UTF-8")
      }
      val r = i % 39
      val payload = magic ++ (s"asset-$r|" * (1 + r % 4)).getBytes("UTF-8")
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
