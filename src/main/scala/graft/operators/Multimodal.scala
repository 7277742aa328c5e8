package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed by batched per-partition kernels.
  *
  * The container has no media codecs, so the decode step is a STUB — a
  * deterministic fake (bytes -> features derived from the leading bytes)
  * clearly marked below. Everything around it is real and tested: the
  * asset schema, binary column handling, the batched mapPartitions kernel
  * signature (the JVM analogue of an Arrow-batched Pandas UDF: fixed-size
  * batches, columnar in, columnar out), frame-sampling explode, and
  * partitioning.
  *
  * Scale notes: binary payloads are kept opaque and never shuffled unless
  * the operator needs them (metadata-only transforms project the blob away);
  * feature extraction is embarrassingly parallel per partition with bounded
  * batch memory (BatchSize); frame sampling explodes only (asset_id, offset)
  * pairs, never the blob.
  */
object Multimodal {

  /** Kernel batch size — the "Arrow batch" shape of the pipeline. */
  val BatchSize = 64

  val MetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_frames", IntegerType)))

  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("kind", StringType),
    StructField("data", BinaryType),
    StructField("meta", MetaSchema)))

  /** Synthesize a deterministic asset table from the documents fixture
    * (the fixtures ship no real media): data = md5(text) bytes; metadata
    * derived arithmetically from n_chars. Kind cycles image/audio/video.
    */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      to_binary(md5(col("text")), lit("hex")).as("data"),
      struct(
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") % 480 + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 100).cast("long").as("duration_ms"),
        (col("n_chars") % 240 + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB DECODE — deterministic fake standing in for a real image/audio
    * decoder (no codec libraries in this container). Consumes the binary
    * payload and emits 4 floats: feature i is the big-endian unsigned int of
    * bytes [4i, 4i+4) scaled to [0,1). A real deployment swaps only this
    * function; the batching, schema, and partitioning around it stay.
    */
  def decodeStub(data: Array[Byte]): Array[Double] =
    (0 until 4).map { i =>
      val u = ((data(4 * i) & 0xffL) << 24) | ((data(4 * i + 1) & 0xffL) << 16) |
        ((data(4 * i + 2) & 0xffL) << 8) | (data(4 * i + 3) & 0xffL)
      u.toDouble / 4294967296.0
    }.toArray

  /** Feature extraction: batched per-partition kernel over the binary
    * column — a TYPED Dataset mapPartitions, not an RDD round-trip, so the
    * whole pipeline stays ONE Catalyst plan: the narrow select above the
    * kernel reaches the scan as column pruning, AQE re-plans around it, and
    * there is no createDataFrame re-analysis on the way out (the JVM
    * analogue of mapInPandas: Spark plans DeserializeToObject → kernel →
    * SerializeFromObject with codegen'd boundaries).
    *
    * The iterator is consumed in BatchSize groups — the batch boundary
    * where a real kernel hands a columnar block to the decoder.
    */
  def extractFeatures(assetsDf: DataFrame): DataFrame = {
    val spark = assetsDf.sparkSession
    import spark.implicits._
    assetsDf.select(col("asset_id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          // a real decoder receives `batch` whole (columnar block seam)
          batch.map { case (id, data) =>
            val f = decodeStub(data)
            (id, f(0), f(1), f(2), f(3))
          }
        }
      }
      .toDF("asset_id", "f0", "f1", "f2", "f3")
  }

  /** Metadata-only resize: blob untouched (and prunable by Catalyst if the
    * caller never selects it).
    */
  def resize(assetsDf: DataFrame, w: Int, h: Int): DataFrame =
    assetsDf.withColumn("meta",
      col("meta").withField("width", least(col("meta.width"), lit(w)))
        .withField("height", least(col("meta.height"), lit(h))))

  /** Frame sampling for video assets: every `stride`-th frame index with its
    * timestamp offset; explodes only scalar pairs, never the payload.
    */
  def sampleFrames(assetsDf: DataFrame, stride: Int): DataFrame =
    assetsDf.filter(col("kind") === "video")
      .select(col("asset_id"), col("meta.n_frames").as("n_frames"),
        col("meta.duration_ms").as("duration_ms"))
      // zero-frame assets emit no samples. Load-bearing beyond semantics:
      // Spark's sequence(0, n_frames-1, stride) THROWS when n_frames = 0
      // (step sign vs direction), so one malformed asset would crash the
      // whole job where the oracle's range() just yields nothing
      .filter(col("n_frames") > 0)
      .select(col("asset_id"), col("n_frames"), col("duration_ms"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_no"))
      .select(col("asset_id"), col("frame_no").cast("bigint").as("frame_no"),
        floor(col("duration_ms") * col("frame_no") / col("n_frames")).cast("bigint")
          .as("offset_ms"))
      .orderBy(col("asset_id"), col("frame_no"))

  /** Audio windowing constants: 1 s windows every 500 ms (50% overlap) —
    * the standard feature-extraction framing.
    */
  val WindowMs = 1000L
  val StepMs = 500L

  /** Overlapping analysis windows for audio assets: (window_no, start_ms,
    * end_ms, n_samples) per window — the framing a spectrogram/feature
    * kernel consumes. Like [[sampleFrames]], explodes only scalar window
    * bounds derived from metadata; the audio payload itself is projected
    * away and never shuffled.
    */
  def audioWindows(assetsDf: DataFrame): DataFrame =
    assetsDf.filter(col("kind") === "audio")
      .select(col("asset_id"),
        col("meta.duration_ms").as("dur"), col("meta.sample_rate").as("sr"))
      .select(col("asset_id"), col("dur"), col("sr"),
        explode(sequence(lit(0L), greatest(col("dur") - 1, lit(0L)), lit(StepMs)))
          .as("start_ms"))
      .select(col("asset_id"),
        (col("start_ms") / StepMs).cast("bigint").as("window_no"),
        col("start_ms").cast("bigint").as("start_ms"),
        least(col("start_ms") + WindowMs, col("dur")).cast("bigint").as("end_ms"),
        expr(s"(least(start_ms + $WindowMs, dur) - start_ms) * sr div 1000")
          .cast("bigint").as("n_samples"))
      .orderBy(col("asset_id"), col("window_no"))

  // -------------------------------------------------------------- oracles

  /** DuckDB twin of assets->extractFeatures: feature i = big-endian uint of
    * md5 bytes [4i,4i+4) / 2^32 — i.e. hex chars [8i+1, 8i+8].
    */
  val sqlFeatures: String = {
    val feats = (0 until 4).map { i =>
      s"round((('0x' || substr(md5(text), ${8 * i + 1}, 8))::BIGINT) / 4294967296.0, 8) AS f$i"
    }.mkString(",\n  ")
    s"""SELECT doc_id AS asset_id,
       |  $feats
       |FROM documents ORDER BY asset_id""".stripMargin
  }

  val sqlAudioWindows: String =
    s"""WITH a AS (SELECT doc_id AS asset_id, (n_chars * 100)::BIGINT AS dur,
       |    16000 AS sr
       |  FROM documents WHERE doc_id % 3 = 1)
       |SELECT asset_id, (s // $StepMs)::BIGINT AS window_no, s::BIGINT AS start_ms,
       |  least(s + $WindowMs, dur)::BIGINT AS end_ms,
       |  ((least(s + $WindowMs, dur) - s) * sr // 1000)::BIGINT AS n_samples
       |FROM a, LATERAL unnest(range(0, greatest(dur, 1), $StepMs)) t(s)
       |ORDER BY asset_id, window_no""".stripMargin

  def sqlSampleFrames(stride: Int): String =
    s"""WITH v AS (SELECT doc_id AS asset_id,
       |    (n_chars % 240 + 1)::INT AS n_frames,
       |    (n_chars * 100)::BIGINT AS duration_ms
       |  FROM documents WHERE doc_id % 3 = 2)
       |SELECT asset_id, i::BIGINT AS frame_no,
       |  floor(duration_ms * i / n_frames)::BIGINT AS offset_ms
       |FROM v, LATERAL unnest(range(0, n_frames, $stride)) t(i)
       |ORDER BY asset_id, frame_no""".stripMargin
}
