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
      .when(substring(content, 1, 6) === lit("GIF87a".getBytes("UTF-8")) ||
        substring(content, 1, 6) === lit("GIF89a".getBytes("UTF-8")), "image/gif")
      .otherwise(lit("application/octet-stream"))
  }

  // --- REAL kernel #3: header-level media metadata — no codec ------
  // Dimensions, channel counts and sample rates live in fixed-layout
  // (or marker-delimited) HEADERS; only pixel/sample DECODE needs the
  // codecs this container lacks. Everything below is genuine byte
  // parsing of the published container formats.

  /** Big-endian unsigned int from `len` bytes at 1-based `pos`. */
  private def beUint(content: Column, pos: Int, len: Int): Column =
    conv(hex(substring(content, pos, len)), 16, 10).cast("long")

  /** Little-endian unsigned int from `len` (≤4) bytes at 1-based
    * `pos` — hex the slice, reverse its byte pairs, parse.
    */
  private def leUint(content: Column, pos: Int, len: Int): Column = {
    val h = hex(substring(content, pos, len))
    val reordered = concat((len to 1 by -1).map(i =>
      substring(h, (i - 1) * 2 + 1, 2)): _*)
    conv(reordered, 16, 10).cast("long")
  }

  /** PNG dimensions: the IHDR chunk is REQUIRED to be first (PNG
    * spec §11.2.2), so width/height sit at fixed offsets 17/21
    * (big-endian u32) after the 8-byte signature + 4-byte length +
    * "IHDR". Non-PNG or truncated payloads → null.
    */
  def pngDims(content: Column): Column = {
    // u32 fields >= 2^31 (corrupt/adversarial headers) must yield the
    // documented loud-NULL, not an ANSI CAST_OVERFLOW that kills the
    // whole scan stage — range-check before the int cast
    val w = beUint(content, 17, 4)
    val h = beUint(content, 21, 4)
    val isPng = substring(content, 1, 8) === lit(PngMagic) &&
      substring(content, 13, 4) === lit("IHDR".getBytes("UTF-8")) &&
      length(content) >= 24 &&
      w <= lit(Int.MaxValue.toLong) && h <= lit(Int.MaxValue.toLong)
    when(isPng, struct(
      w.cast("int").as("width"),
      h.cast("int").as("height")))
  }

  /** GIF dimensions: logical-screen width/height at offsets 7/9,
    * little-endian u16, right after the GIF87a/GIF89a signature.
    */
  def gifDims(content: Column): Column = {
    val sig = substring(content, 1, 6)
    val isGif = (sig === lit("GIF87a".getBytes("UTF-8")) ||
      sig === lit("GIF89a".getBytes("UTF-8"))) && length(content) >= 10
    when(isGif, struct(
      leUint(content, 7, 2).cast("int").as("width"),
      leUint(content, 9, 2).cast("int").as("height")))
  }

  /** WAV format from the CANONICAL 44-byte header (RIFF/"WAVE" with
    * the 16-byte PCM "fmt " chunk first, "data" second — the layout
    * virtually every PCM .wav on disk uses): channels@23 (LE16),
    * sample rate@25 (LE32), bits@35 (LE16), duration from the data
    * chunk size@41 over the byte rate@29. Non-canonical chunk orders
    * (LIST/fact before data) → null rather than a wrong guess; a
    * production ingest would fall back to a chunk-walk kernel there.
    */
  def wavFormat(content: Column): Column = {
    // same ANSI-overflow discipline as pngDims: a u32 sample rate
    // >= 2^31 is a corrupt header — null the asset, don't crash
    val rate = leUint(content, 25, 4)
    val isCanonicalWav =
      substring(content, 1, 4) === lit("RIFF".getBytes("UTF-8")) &&
      substring(content, 9, 8) === lit("WAVEfmt ".getBytes("UTF-8")) &&
      substring(content, 37, 4) === lit("data".getBytes("UTF-8")) &&
      length(content) >= 44 &&
      rate <= lit(Int.MaxValue.toLong)
    val byteRate = leUint(content, 29, 4)
    when(isCanonicalWav, struct(
      leUint(content, 23, 2).cast("int").as("channels"),
      rate.cast("int").as("sample_rate_hz"),
      leUint(content, 35, 2).cast("int").as("bits"),
      when(byteRate > 0, {
        // FLOOR division, exactly like WavChunkExpr's Long `/`: a
        // bare `/` is Catalyst Divide → double, whose rounding can
        // cross an integer for large data sizes and disagree with the
        // chunk-walk path by 1 ms on the same file. Subtracting the
        // remainder first makes the double quotient an exact integer
        // (both operands < 2^53), so the cast is lossless.
        val num = leUint(content, 41, 4) * lit(1000L)
        (num - pmod(num, byteRate)) / byteRate
      }).cast("long").as("duration_ms")))
  }

  /** Header-level metadata for a mixed asset table in ONE projection:
    * sniffed mime + image dimensions (PNG/GIF fixed-offset, JPEG via
    * the marker-scan kernel) + WAV audio format. Null where the
    * format doesn't carry the field in its header.
    */
  def mediaMeta(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val c = col(contentCol)
    val dims = coalesce(pngDims(c), gifDims(c), JpegDimsExpr(c))
    // canonical layout via the cheap fixed-offset Column parse; any
    // other chunk order falls through to the chunk-walk kernel
    val wav = coalesce(wavFormat(c), WavChunkExpr(c))
    df.select(col(idCol),
      sniffMime(c).as("mime_sniffed"),
      dims.getField("width").as("width"),
      dims.getField("height").as("height"),
      wav.getField("channels").as("channels"),
      wav.getField("sample_rate_hz").as("sample_rate_hz"),
      wav.getField("bits").as("bits"),
      wav.getField("duration_ms").as("duration_ms"))
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

  /** Deterministic REAL-HEADER asset fixture for the header-metadata
    * kernels: full valid PNG IHDR / GIF logical screen / JPEG
    * APP0+SOF0 / canonical 44-byte WAV headers with dimensions and
    * audio format derived from `asset_id` arithmetic — which is
    * exactly how the gate oracle verifies the parsers (the oracle
    * knows the arithmetic; the engine must actually parse the bytes
    * to agree).
    */
  def syntheticMediaAssets(spark: SparkSession, n: Int): DataFrame = {
    def be16(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val rows = (0 until n).map { i =>
      val w = 100 + i % 37
      val h = 50 + i % 23
      val ch = 1 + i % 2
      val rate = 8000 + 1000 * (i % 5)
      val bits = 8 + 8 * (i % 2)
      val nData = 1000 + i % 500
      val payload: Array[Byte] = (i % 4) match {
        case 0 => // PNG: signature + IHDR(len 13) + bit depth/color + CRC
          PngMagic ++ be32(13) ++ "IHDR".getBytes("UTF-8") ++
            be32(w) ++ be32(h) ++ Array[Byte](8, 6, 0, 0, 0) ++ be32(0)
        case 1 => // GIF89a + logical screen descriptor
          "GIF89a".getBytes("UTF-8") ++ le16(w) ++ le16(h) ++
            Array[Byte](0, 0, 0)
        case 2 => // JPEG: SOI + APP0(JFIF) + SOF0 + EOI — dims NOT at a
          // fixed offset (the APP0 length would shift them)
          Array[Byte](0xff.toByte, 0xd8.toByte) ++
            Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
            "JFIF".getBytes("UTF-8") ++ Array[Byte](0, 1, 1, 0) ++
            be16(1) ++ be16(1) ++ Array[Byte](0, 0) ++
            Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++
            Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](3) ++
            Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1) ++
            Array[Byte](0xff.toByte, 0xd9.toByte)
        case _ => // canonical 44-byte PCM WAV header (+ a token body)
          val byteRate = rate * ch * bits / 8
          "RIFF".getBytes("UTF-8") ++ le32(36 + nData) ++
            "WAVE".getBytes("UTF-8") ++ "fmt ".getBytes("UTF-8") ++
            le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
            le32(byteRate) ++ le16(ch * bits / 8) ++ le16(bits) ++
            "data".getBytes("UTF-8") ++ le32(nData) ++ Array[Byte](0, 0, 0, 0)
      }
      Row(i.toLong, Seq("image", "image", "image", "audio")(i % 4),
        payload, null, null, null, null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 4), assetSchema)
  }

  /** WAV fixture exercising the chunk-walk fallback: four layouts —
    * canonical; a LIST chunk before "fmt "; a fact chunk between
    * "fmt " and "data"; an ODD-size LIST (word-alignment padding) —
    * all with format fields from the same `asset_id` arithmetic, so
    * the gate oracle is layout-independent while the engine must
    * actually walk the chains.
    */
  def syntheticWavAssets(spark: SparkSession, n: Int): DataFrame = {
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] =
      id.getBytes("UTF-8") ++ le32(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val rows = (0 until n).map { i =>
      val ch = 1 + i % 2
      val rate = 8000 + 1000 * (i % 5)
      val bits = 8 + 8 * (i % 2)
      val nData = 1000 + i % 500
      val byteRate = rate * ch * bits / 8
      val fmt = chunk("fmt ", le16(1) ++ le16(ch) ++ le32(rate) ++
        le32(byteRate) ++ le16(ch * bits / 8) ++ le16(bits))
      // data chunk whose SIZE field is nData but whose payload is a
      // token 2 bytes (headers rule; gates never ship megabytes) —
      // the walker reads the size FIELD, and "data" is always the
      // LAST chunk here so the truncated payload ends the chain
      val dataHdr = "data".getBytes("UTF-8") ++ le32(nData) ++ Array[Byte](0, 0)
      val list = chunk("LIST", "INFOjunkdata".getBytes("UTF-8"))
      val oddList = chunk("LIST", "INFOodd".getBytes("UTF-8")) // 7 bytes -> padded
      val fact = chunk("fact", le32(nData / (ch * bits / 8)))
      val body: Array[Byte] = (i % 4) match {
        case 0 => fmt ++ dataHdr
        case 1 => list ++ fmt ++ dataHdr
        case 2 => fmt ++ fact ++ dataHdr
        case _ => oddList ++ fmt ++ fact ++ dataHdr
      }
      val payload = "RIFF".getBytes("UTF-8") ++ le32(4 + body.length) ++
        "WAVE".getBytes("UTF-8") ++ body
      Row(i.toLong, "audio", payload, null, null, null, null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 4), assetSchema)
  }

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

/** JPEG dimensions via the marker scan (ITU-T T.81 §B): walk the
  * segment chain from SOI, skip fill bytes, and read height/width
  * from the first SOF frame header (markers C0-C3, C5-C7, C9-CB,
  * CD-CF — every baseline/progressive/lossless variant; C4/C8/CC are
  * tables, not frames). Dimensions are NOT at a fixed offset in JPEG
  * (APPn/comment segments of arbitrary length precede the frame), so
  * this is a kernel, not a fixed-slice Column op. Returns
  * struct<width, height> or NULL for non-JPEG / truncated / SOF-less
  * payloads — a loud-null, never a wrong guess.
  */
case class JpegDimsExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"jpeg_dims requires a BINARY column, got $t")
  }
  // fields nullable so the struct type unifies with the Column-built
  // PNG/GIF structs under coalesce (values are never actually null)
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))
  override def nullable: Boolean = true

  /** Kernel; public for the codegen reference-object call. Null when
    * no SOF frame header is found before SOS/EOI/truncation.
    */
  def compute(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val n = bytes.length
    @inline def u(i: Int): Int = bytes(i) & 0xff
    if (n < 4 || u(0) != 0xff || u(1) != 0xd8) return null
    var i = 2
    while (i + 3 < n) {
      if (u(i) != 0xff) return null // corrupt chain
      var j = i
      while (j + 1 < n && u(j + 1) == 0xff) j += 1 // fill bytes
      val marker = if (j + 1 < n) u(j + 1) else return null
      i = j
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone marker, no length field
      } else if (marker == 0xd9 || marker == 0xda) {
        return null // EOI / start-of-scan before any SOF
      } else {
        if (i + 3 >= n) return null
        val segLen = (u(i + 2) << 8) | u(i + 3)
        if (segLen < 2) return null
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 8 >= n) return null
          val h = (u(i + 5) << 8) | u(i + 6)
          val w = (u(i + 7) << 8) | u(i + 8)
          return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](w, h))
        }
        i += 2 + segLen
      }
    }
    null
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jpegDims", this, classOf[JpegDimsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.InternalRow r = $ref.compute($c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
    """)
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): JpegDimsExpr =
    copy(child = c)
  override def prettyName: String = "jpeg_dims"
}

object JpegDimsExpr {
  def apply(content: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new JpegDimsExpr(expression(content)))
  }
}

/** RIFF chunk-walk WAV parser — the fallback [[Multimodal.wavFormat]]
  * documents: real .wav files sometimes carry LIST/fact/cue chunks
  * before (or between) "fmt " and "data", which the canonical
  * fixed-offset parse correctly refuses. This kernel walks the chunk
  * chain per the RIFF spec (4-byte id, LE32 size, word-aligned
  * payloads) and reads the PCM format fields and data size wherever
  * their chunks sit. Null — never a wrong guess — on non-RIFF/WAVE
  * payloads, truncated chains, missing fmt/data, or out-of-range
  * fields (the ANSI-overflow discipline of the Column parsers).
  */
case class WavChunkExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wav_chunks requires a BINARY column, got $t")
  }
  // field shapes/nullability match wavFormat's struct so the two
  // compose under coalesce in mediaMeta
  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate_hz", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))
  override def nullable: Boolean = true

  /** Kernel; public for the codegen reference-object call. */
  def compute(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val n = bytes.length
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong | (u8(i + 3).toLong << 24)
    @inline def tag(i: Int, s: String): Boolean =
      (0 until 4).forall(j => bytes(i + j) == s.charAt(j).toByte)
    if (n < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return null
    var i = 12L
    var channels = -1
    var rate = -1L
    var bits = -1
    var byteRate = -1L
    var dataSize = -1L
    while (i + 8 <= n) {
      val ii = i.toInt
      val size = le32(ii + 4)
      if (tag(ii, "fmt ") && size >= 16 && i + 8 + 16 <= n) {
        channels = le16(ii + 10)
        rate = le32(ii + 12)
        byteRate = le32(ii + 16)
        bits = le16(ii + 22)
      } else if (tag(ii, "data")) {
        dataSize = size
      }
      i += 8L + size + (size & 1L) // chunks are word-aligned
    }
    if (channels < 0 || rate < 0 || dataSize < 0 || rate > Int.MaxValue) return null
    val dur: Any =
      if (byteRate > 0) java.lang.Long.valueOf(dataSize * 1000L / byteRate) else null
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](channels, rate.toInt, bits, dur))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wavChunks", this, classOf[WavChunkExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.InternalRow r = $ref.compute($c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
    """)
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): WavChunkExpr =
    copy(child = c)
  override def prettyName: String = "wav_chunks"
}

object WavChunkExpr {
  def apply(content: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new WavChunkExpr(expression(content)))
  }
}
