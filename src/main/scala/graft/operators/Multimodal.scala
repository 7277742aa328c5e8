package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed by batched per-partition kernels.
  *
  * The decode step is REAL: payloads are genuine binary-PPM (P6) images
  * and RIFF/PCM WAV audio, and the kernel parses the actual container
  * formats via [[MediaCodec]] (validating headers, walking RIFF chunks)
  * before computing features from the decoded pixels/samples. The fixture
  * generator wraps deterministic md5-derived payload bytes in real
  * headers, so the DuckDB oracle can replay the identical feature math
  * from the same bytes — and any real small PPM/WAV file runs through the
  * same kernel unchanged.
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

  /** Image payload dims (2x2 P6 = 12 pixel bytes) and audio payload shape
    * (4 PCM16 samples @ 16 kHz = 8 data bytes): both payloads fit in one
    * md5 digest, so the fixture stays deterministic and oracle-replayable.
    */
  val PpmW = 2
  val PpmH = 2
  val AudioSamples = 4
  val AudioRate = 16000

  /** Synthesize a deterministic asset table from the documents fixture
    * (the fixtures ship no real media): payload bytes come from md5(text),
    * wrapped in REAL container headers — audio assets are valid RIFF/PCM
    * WAV files, image/video assets valid binary PPMs — so the kernel
    * exercises the actual decoders. Metadata derives arithmetically from
    * n_chars. Kind cycles image/audio/video.
    */
  def assets(docs: DataFrame): DataFrame = {
    val payload = to_binary(md5(col("text")), lit("hex"))
    val wav = concat(lit(MediaCodec.wavHeader(AudioSamples, AudioRate)),
      substring(payload, 1, AudioSamples * 2))
    val ppm = concat(lit(MediaCodec.ppmHeader(PpmW, PpmH)),
      substring(payload, 1, PpmW * PpmH * 3))
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      when(col("doc_id") % 3 === 1, wav).otherwise(ppm).as("data"),
      struct(
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") % 480 + 16).cast("int").as("height"),
        lit(AudioRate).as("sample_rate"),
        (col("n_chars") * 100).cast("long").as("duration_ms"),
        (col("n_chars") % 240 + 1).cast("int").as("n_frames")).as("meta"))
  }

  /** Features of a decoded image: per-channel means and the brightest
    * pixel's luminance, all scaled to [0,1]. Channel sums are exact ints,
    * so the divide-then-divide sequence is IEEE-identical in the oracle.
    */
  def imageFeatures(img: MediaCodec.Ppm): Array[Double] = {
    val n = img.width * img.height
    var sr = 0L; var sg = 0L; var sb = 0L; var maxSum = 0L
    var p = 0
    while (p < n) {
      val r = img.rgb(3 * p); val g = img.rgb(3 * p + 1); val b = img.rgb(3 * p + 2)
      sr += r; sg += g; sb += b
      if (r + g + b > maxSum) maxSum = r + g + b
      p += 1
    }
    Array(sr / n.toDouble / 255.0, sg / n.toDouble / 255.0,
      sb / n.toDouble / 255.0, maxSum / 765.0)
  }

  /** Features of decoded PCM audio: mean |amplitude|, RMS, zero-crossing
    * rate, peak — all scaled to [0,1]. Sums are exact ints (|s| <= 2^15,
    * squares <= 2^30), so the math replays exactly cross-engine.
    */
  def audioFeatures(wav: MediaCodec.Wav): Array[Double] = {
    val s = wav.samples
    val n = s.length
    require(n > 0, "audio features need at least one sample")
    var sumAbs = 0L; var sumSq = 0L; var maxAbs = 0L; var crossings = 0L
    var i = 0
    while (i < n) {
      val v = s(i).toLong
      val a = math.abs(v)
      sumAbs += a; sumSq += v * v
      if (a > maxAbs) maxAbs = a
      if (i > 0 && (s(i) >= 0) != (s(i - 1) >= 0)) crossings += 1
      i += 1
    }
    val zc = if (n < 2) 0.0 else crossings / (n - 1).toDouble
    Array(sumAbs / n.toDouble / 32768.0, math.sqrt(sumSq / n.toDouble) / 32768.0,
      zc, maxAbs / 32768.0)
  }

  /** Kind-dispatched REAL decode: audio payloads parse as WAV, image and
    * video payloads as PPM (a video asset's payload is its poster frame).
    * Malformed bytes fail loudly in the codec, never silently zero.
    */
  def decode(kind: String, data: Array[Byte]): Array[Double] = kind match {
    case "audio" => audioFeatures(MediaCodec.decodeWav(data))
    case _       => imageFeatures(MediaCodec.decodePpm(data))
  }

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
    assetsDf.select(col("asset_id"), col("kind"), col("data"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          // a real decoder receives `batch` whole (columnar block seam)
          batch.map { case (id, kind, data) =>
            val f = decode(kind, data)
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

  /** REAL pixel resize (mm4): block-average downsample of the DECODED
    * image — each output pixel is the integer-floor mean of its source
    * block per channel, the standard area-average thumbnail. Runs through
    * the same batched mapPartitions kernel seam as [[extractFeatures]]
    * (the shape a native decoder slots into), emits one row per OUTPUT
    * pixel — scalars only, the payload never shuffles past the kernel.
    * All sums are exact integers, so the output is engine-replayable
    * byte-for-byte (the [[sqlFeatures]] oracle technique).
    */
  def thumbnails(assetsDf: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, s"output dims must be positive: $outW x $outH")
    val spark = assetsDf.sparkSession
    import spark.implicits._
    assetsDf.filter(col("kind") === "image")
      .select(col("asset_id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { case (id, data) =>
            val img = MediaCodec.decodePpm(data)
            for (py <- 0 until outH; px <- 0 until outW) yield {
              val y0 = py * img.height / outH; val y1 = (py + 1) * img.height / outH
              val x0 = px * img.width / outW; val x1 = (px + 1) * img.width / outW
              var r = 0L; var g = 0L; var b = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val p = 3 * (y * img.width + x)
                  r += img.rgb(p); g += img.rgb(p + 1); b += img.rgb(p + 2)
                  x += 1
                }
                y += 1
              }
              val n = (y1 - y0).toLong * (x1 - x0)
              (id, px, py, r / n, g / n, b / n)
            }
          }
        }
      }
      .toDF("asset_id", "px", "py", "r", "g", "b")
      .select(col("asset_id"), col("px").cast("bigint").as("px"),
        col("py").cast("bigint").as("py"),
        col("r"), col("g"), col("b"))
      .orderBy(col("asset_id"), col("py"), col("px"))
  }

  /** Oracle for [[thumbnails]] at the fixture's 2x2 -> 1x1 shape: the one
    * output pixel is the floor-mean of the four RGB triples replayed from
    * the md5 payload bytes.
    */
  val sqlThumbnails: String = {
    val bytes = (0 until 12)
      .map(k => s"('0x' || substr(hx, ${2 * k + 1}, 2))::BIGINT AS b$k").mkString(", ")
    s"""WITH m AS (SELECT doc_id, md5(text) AS hx FROM documents
       |  WHERE doc_id % 3 = 0),
       |b AS (SELECT doc_id, $bytes FROM m)
       |SELECT doc_id AS asset_id, 0::BIGINT AS px, 0::BIGINT AS py,
       |  ((b0 + b3 + b6 + b9) // 4)::BIGINT AS r,
       |  ((b1 + b4 + b7 + b10) // 4)::BIGINT AS g,
       |  ((b2 + b5 + b8 + b11) // 4)::BIGINT AS b
       |FROM b ORDER BY asset_id, py, px""".stripMargin
  }

  /** Histogram bins for [[channelHistogram]] (mm6): 4 bins of 64 levels. */
  val HistBins = 4

  /** Per-channel pixel histogram (mm6) — the first real statistic an
    * image-quality gate reads (all-dark, blown-out, or single-level
    * images show up as mass in one bin): decoded RGB values bucketed
    * into [[HistBins]] equal ranges, counted per (asset, channel, bin)
    * INSIDE the kernel — only bounded scalar rows leave it (≤ 3×bins per
    * asset), the payload never shuffles. Integer arithmetic throughout.
    */
  def channelHistogram(assetsDf: DataFrame): DataFrame = {
    val spark = assetsDf.sparkSession
    import spark.implicits._
    val width = 256 / HistBins
    assetsDf.filter(col("kind") === "image")
      .select(col("asset_id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { case (id, data) =>
            val img = MediaCodec.decodePpm(data)
            val n = img.width * img.height
            val counts = Array.ofDim[Long](3, HistBins)
            var p = 0
            while (p < n) {
              var ch = 0
              while (ch < 3) {
                counts(ch)(img.rgb(3 * p + ch) / width) += 1
                ch += 1
              }
              p += 1
            }
            for (ch <- 0 until 3; b <- 0 until HistBins if counts(ch)(b) > 0)
              yield (id, ch, b, counts(ch)(b))
          }
        }
      }
      .toDF("asset_id", "channel", "bin", "n")
      .select(col("asset_id"), col("channel").cast("int").as("channel"),
        col("bin").cast("int").as("bin"), col("n"))
      .orderBy(col("asset_id"), col("channel"), col("bin"))
  }

  /** Oracle: md5-payload bytes bucketed with the same integer division;
    * byte k of the 2x2 fixture image is channel k%3.
    */
  val sqlChannelHistogram: String = {
    val width = 256 / HistBins
    val bytes = (0 until 12)
      .map(k => s"SELECT doc_id, ${k % 3} AS channel, ('0x' || substr(hx, ${2 * k + 1}, 2))::INT // $width AS bin FROM m")
      .mkString(" UNION ALL ")
    s"""WITH m AS (SELECT doc_id, md5(text) AS hx FROM documents WHERE doc_id % 3 = 0),
       |px AS ($bytes)
       |SELECT doc_id AS asset_id, channel::INT AS channel, bin::INT AS bin,
       |  count(*)::BIGINT AS n
       |FROM px GROUP BY 1, 2, 3
       |ORDER BY asset_id, channel, bin""".stripMargin
  }

  /** Decimation factor for [[downsampleAudio]] (mm5). */
  val DecimateBy = 2

  /** REAL audio downsample (mm5): block-mean decimation of the DECODED
    * PCM stream by [[DecimateBy]] — the audio twin of mm4's pixel
    * resize, through the same batched mapPartitions kernel seam. Each
    * output sample is the TRUNCATE-toward-zero mean of its source block:
    * int16 blocks can sum negative, where floor and truncation diverge
    * by one — Scala `/`, Spark `div` and DuckDB `//` all truncate
    * (measured: DuckDB `-1 // 2 = 0`), so truncation is the one
    * convention every engine shares and the unit pins it on a planted
    * negative block. Emitted with the decimated rate; a trailing partial
    * block is dropped (the standard decimator convention). One scalar
    * row per output sample — the payload never shuffles past the kernel.
    */
  def downsampleAudio(assetsDf: DataFrame, factor: Int = DecimateBy): DataFrame = {
    require(factor > 0, s"decimation factor must be positive: $factor")
    val spark = assetsDf.sparkSession
    import spark.implicits._
    assetsDf.filter(col("kind") === "audio")
      .select(col("asset_id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { case (id, data) =>
            val wav = MediaCodec.decodeWav(data)
            val n = wav.samples.length / factor
            (0 until n).map { i =>
              var s = 0L
              var j = i * factor
              while (j < (i + 1) * factor) { s += wav.samples(j); j += 1 }
              (id, i.toLong, s / factor, wav.sampleRate / factor)
            }
          }
        }
      }
      .toDF("asset_id", "idx", "sample", "out_rate")
      .select(col("asset_id"), col("idx"), col("sample"),
        col("out_rate").cast("int").as("out_rate"))
      .orderBy(col("asset_id"), col("idx"))
  }

  /** Oracle: the md5-payload int16 samples replayed ([[sqlFeatures]]'
    * technique), each output block a `//`-truncated pair mean.
    */
  val sqlDownsampleAudio: String = {
    val bytes = (0 until AudioSamples * 2)
      .map(k => s"('0x' || substr(hx, ${2 * k + 1}, 2))::INT AS b$k").mkString(", ")
    val samples = (0 until AudioSamples).map { i =>
      s"(CASE WHEN b${2 * i} + b${2 * i + 1} * 256 < 32768 " +
        s"THEN b${2 * i} + b${2 * i + 1} * 256 " +
        s"ELSE b${2 * i} + b${2 * i + 1} * 256 - 65536 END)::BIGINT AS s$i"
    }.mkString(", ")
    val outs = (0 until AudioSamples / DecimateBy).map { i =>
      val blk = (0 until DecimateBy).map(j => s"s${i * DecimateBy + j}").mkString(" + ")
      s"SELECT doc_id AS asset_id, ${i}::BIGINT AS idx, (($blk) // $DecimateBy)::BIGINT AS sample, ${AudioRate / DecimateBy}::INT AS out_rate FROM s"
    }.mkString(" UNION ALL ")
    s"""WITH m AS (SELECT doc_id, md5(text) AS hx FROM documents WHERE doc_id % 3 = 1),
       |b AS (SELECT doc_id, $bytes FROM m),
       |s AS (SELECT *, $samples FROM b)
       |$outs
       |ORDER BY asset_id, idx""".stripMargin
  }

  // ------------------------------------------ perceptual image near-dup

  /** aHash grid edge: 8x8 = 64 bits on any image at least 8 px per axis;
    * smaller images hash at native resolution (nbits = w*h < 64), and the
    * pair join keys on nbits so differently-sized fingerprints never mix.
    */
  val HashGrid = 8

  /** Near-dup radius (Manku et al.'s classic k=3, matching d15) and the
    * pigeonhole band count k+1: a pair within Hamming distance 3 must
    * agree EXACTLY on at least one of 4 bands.
    */
  val HashMaxHamming = 3
  val HashBands = HashMaxHamming + 1

  /** Average hash (aHash) of a decoded image — the classic perceptual
    * fingerprint: block-average the image to a [[HashGrid]]-square grid
    * (exactly [[thumbnails]]' integer floor-mean blocks, summed to a
    * luminance), then set bit i iff block i's luminance exceeds the mean
    * over all blocks. The comparison is cross-multiplied
    * (`lum_i * nblocks > total`) so the whole hash is integer-exact —
    * no float mean — and replays bit-for-bit in the oracle. Returns
    * (hash, nbits); a near-identical image (small crop, brightness
    * touch-up, recompression noise) flips at most a few bits.
    */
  def aHash(img: MediaCodec.Ppm): (Long, Int) = {
    val gw = math.min(img.width, HashGrid)
    val gh = math.min(img.height, HashGrid)
    val g = gw * gh
    val lums = new Array[Long](g)
    var total = 0L
    var i = 0
    var by = 0
    while (by < gh) {
      var bx = 0
      while (bx < gw) {
        val y0 = by * img.height / gh; val y1 = (by + 1) * img.height / gh
        val x0 = bx * img.width / gw; val x1 = (bx + 1) * img.width / gw
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = 3 * (y * img.width + x)
            s += img.rgb(p) + img.rgb(p + 1) + img.rgb(p + 2)
            x += 1
          }
          y += 1
        }
        lums(i) = s / ((y1 - y0).toLong * (x1 - x0))
        total += lums(i)
        i += 1
        bx += 1
      }
      by += 1
    }
    var h = 0L
    i = 0
    while (i < g) {
      if (lums(i) * g > total) h |= (1L << i)
      i += 1
    }
    (h, g)
  }

  /** Fingerprint every image asset through the same batched kernel seam
    * as [[extractFeatures]]: decode → aHash, one (asset_id, ahash, nbits)
    * row per image. The payload never leaves the kernel — what shuffles
    * downstream is 8 bytes per image, which is what makes image dedup
    * run over gigabytes at a 100 TB crawl, not the crawl itself.
    */
  def imageHashes(assetsDf: DataFrame): DataFrame = {
    val spark = assetsDf.sparkSession
    import spark.implicits._
    assetsDf.filter(col("kind") === "image")
      .select(col("asset_id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, data) =>
            val (h, g) = aHash(MediaCodec.decodePpm(data))
            (id, h, g)
          }
        }
      }
      .toDF("asset_id", "ahash", "nbits")
  }

  /** Perceptual image near-dup pairs (mm7) — the multimodal leg of the
    * dedup chain: two images are near-dups when their aHash fingerprints
    * differ in at most [[HashMaxHamming]] bits. Candidate generation is
    * d15's byte-band pigeonhole applied to the pixel fingerprint: the
    * hash splits into [[HashBands]] equal bands of ceil(nbits/4) bits,
    * any qualifying pair agrees exactly on >=1 band, so the band-bucket
    * equi-join finds EVERY pair within the radius (exact, not
    * probabilistic — banding==brute pinned in MultimodalSpec), then a
    * codegen'd bit_count(xor) verifies candidates only.
    *
    * Scale shape: one 12-byte fingerprint row per image, 4 band rows,
    * one equi-join on (nbits, band, value) — 2^16 buckets per band at
    * the full 64-bit hash — no cross product, payloads long gone.
    */
  def imageHashPairs(assetsDf: DataFrame): DataFrame =
    bandedHammingPairs(imageHashes(assetsDf))

  /** Shared banded-Hamming pairing over any (asset_id, ahash, nbits)
    * fingerprint table — the d15 pigeonhole machinery factored out once
    * for every perceptual modality (image aHash here, audio
    * sign-of-delta in [[audioHashPairs]]): split into [[HashBands]]
    * bands, equi-join on exact band agreement (every pair within
    * [[HashMaxHamming]] shares >=1 band — exact, not probabilistic),
    * verify candidates with codegen'd bit_count(xor).
    */
  private[operators] def bandedHammingPairs(hashes: DataFrame): DataFrame = {
    // NO checkpoint on the band rows (round-17 finding): the two
    // self-join sides hash-exchange on identical canonical subtrees, so
    // AQE's stage reuse already runs the decode ONCE (the executed plan
    // shows ReusedExchange) — a checkpoint would only add a job and
    // break the kernel-stays-in-plan contract (PlanShapeSpec mm7)
    val stacked = bandStack(hashes)
    val cand = stacked.as("x").join(stacked.as("y"),
        col("x.nbits") === col("y.nbits") && col("x.band") === col("y.band") &&
          col("x.bv") === col("y.bv") && col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("ia"), col("y.asset_id").as("ib"),
        col("x.ahash").as("ha"), col("y.ahash").as("hb"))
      .distinct()
    cand.select(col("ia"), col("ib"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int").as("hamming"))
      .filter(col("hamming") <= HashMaxHamming)
      .orderBy(col("ia"), col("ib"))
  }

  /** The band-explosion half of [[bandedHammingPairs]], factored so the
    * incremental path can probe a different build side.
    */
  private def bandStack(hashes: DataFrame): DataFrame = hashes
    .withColumn("w", expr(s"cast((nbits + ${HashBands - 1}) div $HashBands as int)"))
    .select(col("asset_id"), col("ahash"), col("nbits"),
      explode(expr(s"""transform(sequence(0, ${HashBands - 1}),
        b -> struct(b as band,
          (shiftright(ahash, b * w) & (shiftleft(cast(1 as bigint), w) - 1)) as bv))"""))
        .as("s"))
    .select(col("asset_id"), col("ahash"), col("nbits"),
      col("s.band").as("band"), col("s.bv").as("bv"))

  /** INCREMENTAL IMAGE-SHARD DEDUP (mm11) — d13's saved-index economics
    * applied to the perceptual modality: yesterday's corpus ships as its
    * SAVED fingerprint table (8 bytes an image, the artifact mm7 already
    * computes); today's shard decodes and hashes ONLY its own images,
    * then band-probes the saved+shard fingerprints. Emitted pairs touch
    * the shard on at least one side by construction (the probe side IS
    * the shard); old×old pairs never recompute. Candidate volume scales
    * with the shard, not the corpus — the s11/d13 argument, verbatim.
    */
  def imageShardNearDup(savedHashes: DataFrame, shardAssets: DataFrame): DataFrame =
    shardBandProbe(savedHashes, imageHashes(shardAssets))

  /** Incremental AUDIO-shard dedup (mm12, mm11's waveform sibling):
    * today's shard decodes and fingerprints only its own audio, then
    * band-probes the SAVED fingerprint table — candidate volume scales
    * with the shard, the corpus is never re-decoded. Same 8-bytes-per-
    * asset economics, same pigeonhole exactness.
    */
  def audioShardNearDup(savedHashes: DataFrame, shardAssets: DataFrame): DataFrame =
    shardBandProbe(savedHashes, audioHashes(shardAssets))

  /** The shared shard probe behind mm11/mm12: new fingerprints band-join
    * saved ∪ new (cross-corpus AND within-shard pairs), bit_count
    * verifies candidates only — the d13 two-sided candidate rule applied
    * to the Hamming pigeonhole.
    */
  private def shardBandProbe(savedHashes: DataFrame, newH0: DataFrame): DataFrame = {
    // the shard's fingerprints feed the probe side AND the build union —
    // checkpoint (8-12 B per asset) so the shard decode runs once
    val newH = newH0.localCheckpoint(true)
    val probe = bandStack(newH)
    val build = bandStack(savedHashes.unionByName(newH))
    val cand = probe.as("x").join(build.as("y"),
        col("x.nbits") === col("y.nbits") && col("x.band") === col("y.band") &&
          col("x.bv") === col("y.bv") && col("x.asset_id") =!= col("y.asset_id"))
      .select(least(col("x.asset_id"), col("y.asset_id")).as("ia"),
        greatest(col("x.asset_id"), col("y.asset_id")).as("ib"),
        col("x.ahash").as("ha"), col("y.ahash").as("hb"))
      .select(col("ia"), col("ib"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int").as("hamming"))
      .distinct()
    cand.filter(col("hamming") <= HashMaxHamming)
      .orderBy(col("ia"), col("ib"))
  }

  /** Incremental VIDEO-shard dedup (mm13, the temporal leg's shard path):
    * the corpus ships as its saved per-frame fingerprint table; the
    * shard's frames probe the (position, frame-hash) inverted index —
    * the mm9 verify (matching-position fraction against the longer
    * video) over pairs with a shard side only. Within-shard pairs found
    * from both directions collapse via the per-position distinct.
    */
  def videoShardNearDup(savedFrames: DataFrame, shardAssets: DataFrame): DataFrame = {
    // the shard's frame hashes feed the probe side AND the build union
    // (and through it the length table) — checkpoint so the shard reel
    // decode runs once, and checkpoint the per-asset frame counts (two
    // verify-side joins read them)
    val newF = videoFrameHashes(shardAssets).localCheckpoint(true)
    val all = savedFrames.unionByName(newF)
    // cnt: both verify sides reuse its one broadcast build — no checkpoint
    val cnt = all.groupBy(col("asset_id")).agg(count(lit(1)).as("nf"))
    val pos = newF.as("x").join(all.as("y"),
        col("x.frame_no") === col("y.frame_no") &&
          col("x.nbits") === col("y.nbits") &&
          col("x.fhash") === col("y.fhash") &&
          col("x.asset_id") =!= col("y.asset_id"))
      .select(least(col("x.asset_id"), col("y.asset_id")).as("ia"),
        greatest(col("x.asset_id"), col("y.asset_id")).as("ib"),
        col("x.frame_no").as("f"))
      .distinct()
    pos.groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("n_match"))
      .join(cnt.as("ca"), col("ia") === col("ca.asset_id"))
      .join(cnt.as("cb"), col("ib") === col("cb.asset_id"))
      .filter(col("n_match").cast("double")
        / greatest(col("ca.nf"), col("cb.nf")) >= VideoMatchFrac)
      .select(col("ia"), col("ib"), col("n_match"),
        round(col("n_match").cast("double")
          / greatest(col("ca.nf"), col("cb.nf")), 4).as("match_frac"))
      .orderBy(col("ia"), col("ib"))
  }

  /** Oracle for [[imageShardNearDup]]: the mm7 replay with the 4/5 cut —
    * pairs restricted to those with a shard-side asset (variant ids map
    * back to their base doc for the newness test).
    */
  // def, not val: sqlImageHashCtes is declared later in the object and a
  // val here would capture null at initialization order
  def sqlImageShardPairs: String = {
    val isNewX =
      s"(CASE WHEN x.doc_id >= $VariantOffset THEN x.doc_id - $VariantOffset ELSE x.doc_id END) >= (SELECT cnt FROM cn)"
    s"""WITH cn AS (SELECT (count(*) * 4) // 5 AS cnt FROM documents),
       |${sqlImageHashCtes}
       |cand AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS ia,
       |    greatest(x.doc_id, y.doc_id) AS ib,
       |    bit_count(xor(x.h, y.h))::INT AS hamming
       |  FROM st x JOIN st y ON x.band = y.band AND x.bv = y.bv
       |    AND x.doc_id <> y.doc_id
       |  WHERE $isNewX)
       |SELECT ia, ib, hamming FROM cand WHERE hamming <= $HashMaxHamming
       |ORDER BY 1, 2""".stripMargin
  }

  /** 8x8 image fixture for mm7: [[assets]]' 2x2 payload carries only 4
    * pixels (a 4-bit hash — degenerate buckets), so the hash fixture
    * synthesizes REAL 8x8 binary PPMs whose 192 payload bytes come from
    * 12 chained md5 digests of the text — deterministic, full 64-bit
    * fingerprints. The corpus has no duplicate texts, so the fixture
    * PLANTS near-dups: every 10th doc also emits a "retouched" variant
    * (asset_id + [[VariantOffset]]) whose first pixel is forced to pure
    * white — the brightness-touch-up edit aHash is built to survive,
    * flipping ~1 bit — so the band join finds real pairs on fixture
    * data, replayed identically by the oracle. The kernel path is
    * byte-identical to what a real 8x8 thumbnail flows through.
    */
  val HashPpmW = 8
  val HashPpmH = 8
  val VariantOffset = 1000000000L

  def hashAssets(docs: DataFrame): DataFrame = {
    val digests = md5(col("text")) +:
      (1 until 12).map(i => md5(concat(col("text"), lit("#" + i))))
    val withHex = docs.select(col("doc_id"), concat(digests: _*).as("hx"))
    val header = lit(MediaCodec.ppmHeader(HashPpmW, HashPpmH))
    val base = withHex.select(
      col("doc_id").as("asset_id"), lit("image").as("kind"),
      concat(header, to_binary(col("hx"), lit("hex"))).as("data"))
    val variants = withHex.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + VariantOffset).as("asset_id"),
        lit("image").as("kind"),
        concat(header, to_binary(
          concat(lit("ffffff"), substring(col("hx"), 7, 378)), lit("hex"))).as("data"))
    base.unionByName(variants)
  }

  /** Oracle for [[hashAssets]] → [[imageHashPairs]]: replay the 192
    * payload bytes from the 12 digests, compute the 64 single-pixel
    * block luminances, the cross-multiplied mean-comparison bits, and
    * the same 16-bit-band pigeonhole join + bit_count verify. Bit 63 is
    * set by adding Long.MIN_VALUE (DuckDB raises on `1 << 63`); shifts
    * on the resulting negative hash are arithmetic in BOTH engines and
    * the band mask strips the sign-extension, measured identical.
    */
  /** The decode-replay CTE chain shared by mm7 and mm11: digests →
    * luminances → aHash bits → band stack (`st`). Ends with a trailing
    * comma so callers append their own pairing CTEs.
    */
  private[operators] val sqlImageHashCtes: String = {
    val g = HashPpmW * HashPpmH
    val hx = ("md5(text)" +: (1 until 12).map(i => s"md5(text || '#$i')"))
      .mkString(" || ")
    val lums = (0 until g).map { k =>
      val b = (0 until 3)
        .map(c => s"('0x' || substr(hx, ${2 * (3 * k + c) + 1}, 2))::BIGINT")
        .mkString(" + ")
      s"($b) AS l$k"
    }.mkString(", ")
    val total = (0 until g).map(k => s"l$k").mkString(" + ")
    val hashExpr = (0 until g).map { k =>
      val bit = if (k == 63) "(-9223372036854775807 - 1)" else s"${1L << k}"
      s"CASE WHEN l$k * $g > total THEN $bit ELSE 0 END"
    }.mkString(" + ")
    val bandW = (g + HashBands - 1) / HashBands
    val mask = (1L << bandW) - 1
    val bandList = (0 until HashBands).mkString(", ")
    s"""hxs AS (SELECT doc_id, $hx AS hx FROM documents),
       |m AS (SELECT doc_id, hx FROM hxs
       |  UNION ALL
       |  SELECT doc_id + $VariantOffset, 'ffffff' || substr(hx, 7)
       |  FROM hxs WHERE doc_id % 10 = 0),
       |l AS (SELECT doc_id, $lums FROM m),
       |tt AS (SELECT *, ($total) AS total FROM l),
       |hs AS (SELECT doc_id, ($hashExpr)::BIGINT AS h FROM tt),
       |st AS (SELECT doc_id, h, b AS band, (h >> (b * $bandW)) & $mask AS bv
       |  FROM hs, LATERAL unnest([$bandList]) t(b)),""".stripMargin
  }

  val sqlImageHashPairs: String =
    s"""WITH $sqlImageHashCtes
       |cand AS (SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib,
       |    x.h AS ha, y.h AS hb
       |  FROM st x JOIN st y ON x.band = y.band AND x.bv = y.bv
       |    AND x.doc_id < y.doc_id)
       |SELECT ia, ib, bit_count(xor(ha, hb))::INT AS hamming
       |FROM cand WHERE bit_count(xor(ha, hb)) <= $HashMaxHamming
       |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------- audio perceptual hash

  /** mm8 audio fixture shape: 65 PCM16 samples @16 kHz in a REAL RIFF/WAV
    * envelope — 64 sign-of-delta bits, a full fingerprint from 260 payload
    * bytes (9 chained md5 digests, truncated).
    */
  val AudioHashSamples = 65

  /** Perceptual audio fingerprint — the Chromaprint idea at its core: the
    * bit vector of FRAME-ENERGY DELTAS. Frame f's energy here is the
    * decoded sample's |amplitude| (exact int), and bit f is set iff
    * e(f+1) > e(f) — strictly, so ties are stable. Sign-of-delta is what
    * makes it perceptual: any positive re-scaling of the waveform (volume
    * normalization, the most common audio re-encode artifact) preserves
    * every strict comparison, so the fingerprint is IDENTICAL — while a
    * clipped intro or an edited sample flips only the bits whose frames
    * it touches. Returns (hash, nbits) with nbits = min(samples-1, 64).
    */
  def audioHash(wav: MediaCodec.Wav): (Long, Int) = {
    val s = wav.samples
    require(s.length >= 2, "audio hash needs at least two samples")
    val nb = math.min(s.length - 1, 64)
    var h = 0L
    var i = 0
    while (i < nb) {
      // Long abs: Short.MinValue would overflow Int negation at -32768
      if (math.abs(s(i + 1).toLong) > math.abs(s(i).toLong)) h |= (1L << i)
      i += 1
    }
    (h, nb)
  }

  /** Fingerprint every audio asset through the batched kernel seam: REAL
    * RIFF walk ([[MediaCodec.decodeWav]]) then [[audioHash]] — one
    * (asset_id, ahash, nbits) row per clip; the waveform never leaves the
    * kernel.
    */
  def audioHashes(assetsDf: DataFrame): DataFrame = {
    val spark = assetsDf.sparkSession
    import spark.implicits._
    assetsDf.filter(col("kind") === "audio")
      .select(col("asset_id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, data) =>
            val (h, g) = audioHash(MediaCodec.decodeWav(data))
            (id, h, g)
          }
        }
      }
      .toDF("asset_id", "ahash", "nbits")
  }

  /** Perceptual audio near-dup pairs (mm8) — the audio leg of the
    * multimodal dedup chain, mm7's machinery applied to the waveform
    * fingerprint: [[audioHashes]] then the SAME [[bandedHammingPairs]]
    * byte-band pigeonhole + bit_count verify (exact within
    * [[HashMaxHamming]], banding==brute pinned in MultimodalSpec).
    */
  def audioHashPairs(assetsDf: DataFrame): DataFrame =
    bandedHammingPairs(audioHashes(assetsDf))

  /** mm8 fixture: REAL WAV audio assets whose 130 payload bytes come from
    * 9 chained md5 digests of the text (truncated to 65 LE-int16
    * samples). As with mm7, the corpus has no duplicate texts, so the
    * fixture PLANTS near-dups: every 10th doc also emits a "clipped
    * intro" variant (asset_id + [[VariantOffset]]) whose first sample is
    * forced to silence — the edit [[audioHash]] is built to survive,
    * flipping at most bit 0 — so the band join finds real pairs on
    * fixture data, replayed identically by the oracle.
    */
  def audioHashAssets(docs: DataFrame): DataFrame = {
    val digests = (0 until 9).map(i => md5(concat(col("text"), lit("#a" + i))))
    val withHex = docs.select(col("doc_id"),
      substring(concat(digests: _*), 1, 260).as("hx"))
    val header = lit(MediaCodec.wavHeader(AudioHashSamples, AudioRate))
    val base = withHex.select(
      col("doc_id").as("asset_id"), lit("audio").as("kind"),
      concat(header, to_binary(col("hx"), lit("hex"))).as("data"))
    val variants = withHex.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + VariantOffset).as("asset_id"),
        lit("audio").as("kind"),
        concat(header, to_binary(
          concat(lit("0000"), substring(col("hx"), 5, 256)), lit("hex"))).as("data"))
    base.unionByName(variants)
  }

  /** Oracle for [[audioHashAssets]] -> [[audioHashPairs]]: replay the 130
    * payload bytes from the digests, decode the 65 LE-int16 samples, the
    * 64 strict |e(f+1)| > |e(f)| comparisons, and the same 16-bit-band
    * pigeonhole join + bit_count verify as mm7 (bit 63 via the
    * add-Long.MinValue trick; arithmetic shifts masked per band).
    */
  private val sqlAudioHashCtes: String = {
    val nb = AudioHashSamples - 1
    val hx = (0 until 9).map(i => s"md5(text || '#a$i')").mkString(" || ")
    val es = (0 until AudioHashSamples).map { i =>
      val lo = s"('0x' || substr(hx, ${4 * i + 1}, 2))::BIGINT"
      val hi = s"('0x' || substr(hx, ${4 * i + 3}, 2))::BIGINT"
      s"abs(CASE WHEN $lo + $hi * 256 < 32768 THEN $lo + $hi * 256 " +
        s"ELSE $lo + $hi * 256 - 65536 END) AS e$i"
    }.mkString(", ")
    val hashExpr = (0 until nb).map { k =>
      val bit = if (k == 63) "(-9223372036854775807 - 1)" else s"${1L << k}"
      s"CASE WHEN e${k + 1} > e$k THEN $bit ELSE 0 END"
    }.mkString(" + ")
    val bandW = (nb + HashBands - 1) / HashBands
    val mask = (1L << bandW) - 1
    val bandList = (0 until HashBands).mkString(", ")
    s"""hxs AS (SELECT doc_id,
       |    substr($hx, 1, 260) AS hx FROM documents),
       |m AS (SELECT doc_id, hx FROM hxs
       |  UNION ALL
       |  SELECT doc_id + $VariantOffset, '0000' || substr(hx, 5)
       |  FROM hxs WHERE doc_id % 10 = 0),
       |l AS (SELECT doc_id, $es FROM m),
       |hs AS (SELECT doc_id, ($hashExpr)::BIGINT AS h FROM l),
       |st AS (SELECT doc_id, h, b AS band, (h >> (b * $bandW)) & $mask AS bv
       |  FROM hs, LATERAL unnest([$bandList]) t(b)),""".stripMargin
  }

  val sqlAudioHashPairs: String =
    s"""WITH $sqlAudioHashCtes
       |cand AS (SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib,
       |    x.h AS ha, y.h AS hb
       |  FROM st x JOIN st y ON x.band = y.band AND x.bv = y.bv
       |    AND x.doc_id < y.doc_id)
       |SELECT ia, ib, bit_count(xor(ha, hb))::INT AS hamming
       |FROM cand WHERE bit_count(xor(ha, hb)) <= $HashMaxHamming
       |ORDER BY 1, 2""".stripMargin

  /** Oracle for [[audioShardNearDup]]: the mm8 replay with the 4/5 cut —
    * pairs restricted to those with a shard-side asset (variant ids map
    * back to their base doc for the newness test).
    */
  def sqlAudioShardPairs: String = {
    val isNewX =
      s"(CASE WHEN x.doc_id >= $VariantOffset THEN x.doc_id - $VariantOffset ELSE x.doc_id END) >= (SELECT cnt FROM cn)"
    s"""WITH cn AS (SELECT (count(*) * 4) // 5 AS cnt FROM documents),
       |$sqlAudioHashCtes
       |cand AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS ia,
       |    greatest(x.doc_id, y.doc_id) AS ib,
       |    bit_count(xor(x.h, y.h))::INT AS hamming
       |  FROM st x JOIN st y ON x.band = y.band AND x.bv = y.bv
       |    AND x.doc_id <> y.doc_id
       |  WHERE $isNewX)
       |SELECT ia, ib, hamming FROM cand WHERE hamming <= $HashMaxHamming
       |ORDER BY 1, 2""".stripMargin
  }

  // --------------------------------------------------- video perceptual dup

  /** mm9 video fixture shape: 8 frames of 4x4 P6 PPM concatenated into one
    * "reel" payload (frame-major raw layout), walked by the REAL cursor
    * parser [[MediaCodec.decodePpmReel]].
    */
  val VideoFrames = 8

  /** Two videos are near-dups when at least this fraction of frame
    * positions carry an identical per-frame aHash — 6 of 8 on the
    * fixture, surviving a one-frame re-encode glitch with margin.
    */
  val VideoMatchFrac = 0.75

  /** Per-frame perceptual fingerprints of every video asset: the reel is
    * decoded INSIDE the batched kernel (real container walk, frame by
    * frame), each frame aHashed exactly like a still image — one
    * (asset_id, frame_no, fhash, nbits) row per frame. What shuffles
    * downstream is ~10 bytes per frame, never pixels.
    */
  def videoFrameHashes(assetsDf: DataFrame): DataFrame = {
    val spark = assetsDf.sparkSession
    import spark.implicits._
    assetsDf.filter(col("kind") === "video")
      .select(col("asset_id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { case (id, data) =>
            MediaCodec.decodePpmReel(data).iterator.zipWithIndex.map {
              case (ppm, f) =>
                val (h, g) = aHash(ppm)
                (id, f, h, g)
            }
          }
        }
      }
      .toDF("asset_id", "frame_no", "fhash", "nbits")
  }

  /** Video near-dup pairs (mm9) — the temporal leg of the perceptual
    * chain: candidates come from an INVERTED INDEX on (frame_no, fhash)
    * — an equi-join where two videos collide iff some position carries
    * the identical frame fingerprint — and the verify step is the
    * per-pair count of matching positions against [[VideoMatchFrac]] of
    * the longer video. A trimmed/re-encoded upload shares all but its
    * edited frames and clears the bar; unrelated videos meet only
    * through rare 16-bit frame-hash collisions at one position and are
    * filtered by the fraction.
    *
    * Scale shape: the join key space is positions x 2^16 hashes, the
    * per-key lists are collision-sized, and the pair aggregation sees
    * only true/colliding matches — never an all-pairs product. A crawl
    * where one frame hash is pathologically hot (letterbox black frames)
    * would cap that key's df exactly like d2's shingle cap; the fixture
    * has no such head.
    */
  def videoNearDupPairs(assetsDf: DataFrame): DataFrame = {
    // fh feeds the length table AND both inverted-index sides; the join
    // sides reuse one exchange at runtime but the count aggregate is a
    // structurally different consumer, so without a checkpoint the
    // reel-decode kernel still ran twice — checkpoint fh once. cnt's own
    // two verify-side joins reuse one broadcast build (no checkpoint).
    val fh = videoFrameHashes(assetsDf).localCheckpoint(true)
    val cnt = fh.groupBy(col("asset_id")).agg(count(lit(1)).as("nf"))
    val matches = fh.as("x").join(fh.as("y"),
        col("x.frame_no") === col("y.frame_no") &&
          col("x.nbits") === col("y.nbits") &&
          col("x.fhash") === col("y.fhash") &&
          col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("ia"), col("y.asset_id").as("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("n_match"))
    matches
      .join(cnt.as("ca"), col("ia") === col("ca.asset_id"))
      .join(cnt.as("cb"), col("ib") === col("cb.asset_id"))
      .filter(col("n_match").cast("double")
        / greatest(col("ca.nf"), col("cb.nf")) >= VideoMatchFrac)
      .select(col("ia"), col("ib"), col("n_match"),
        round(col("n_match").cast("double")
          / greatest(col("ca.nf"), col("cb.nf")), 4).as("match_frac"))
      .orderBy(col("ia"), col("ib"))
  }

  /** mm9 fixture: video assets as REAL 8-frame 4x4 PPM reels whose 384
    * payload bytes come from 24 chained md5 digests. Every 10th doc also
    * emits a "re-encode glitch" variant (asset_id + [[VariantOffset]])
    * with frame 3's first pixel forced white — that frame's hash moves,
    * the other 7 positions still match exactly (7/8 >= 0.75), so the
    * inverted index finds real pairs on fixture data.
    */
  def videoHashAssets(docs: DataFrame): DataFrame = {
    val digests = (0 until 24).map(i => md5(concat(col("text"), lit("#v" + i))))
    val withHex = docs.select(col("doc_id"), concat(digests: _*).as("hx"))
    def reel(hx: Column): Column =
      concat((0 until VideoFrames).flatMap { f =>
        Seq(lit(MediaCodec.ppmHeader(4, 4)),
          to_binary(substring(hx, f * 96 + 1, 96), lit("hex")))
      }: _*)
    val base = withHex.select(
      col("doc_id").as("asset_id"), lit("video").as("kind"),
      reel(col("hx")).as("data"))
    val variants = withHex.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + VariantOffset).as("asset_id"),
        lit("video").as("kind"),
        reel(concat(substring(col("hx"), 1, 288), lit("ffffff"),
          substring(col("hx"), 295, 474))).as("data"))
    base.unionByName(variants)
  }

  /** Oracle for [[videoHashAssets]] -> [[videoNearDupPairs]]: frames
    * unnest as (doc_id, f) rows whose 16 pixel luminances read at
    * f-computed hex offsets, the cross-multiplied mean comparison builds
    * each 16-bit frame hash, and the same position+hash equi-join /
    * count / fraction replays the verify.
    */
  private val sqlVideoHashCtes: String = {
    val hx = (0 until 24).map(i => s"md5(text || '#v$i')").mkString(" || ")
    val lums = (0 until 16).map { k =>
      val b = (0 until 3)
        .map(c => s"('0x' || substr(hx, f * 96 + ${6 * k + 2 * c + 1}, 2))::BIGINT")
        .mkString(" + ")
      s"($b) AS l$k"
    }.mkString(", ")
    val total = (0 until 16).map(k => s"l$k").mkString(" + ")
    val hashExpr = (0 until 16)
      .map(k => s"CASE WHEN l$k * 16 > total THEN ${1L << k} ELSE 0 END")
      .mkString(" + ")
    val frameList = (0 until VideoFrames).mkString(", ")
    s"""hxs AS (SELECT doc_id, $hx AS hx FROM documents),
       |m AS (SELECT doc_id, hx FROM hxs
       |  UNION ALL
       |  SELECT doc_id + $VariantOffset,
       |    substr(hx, 1, 288) || 'ffffff' || substr(hx, 295)
       |  FROM hxs WHERE doc_id % 10 = 0),
       |fr AS (SELECT doc_id, f FROM m, LATERAL unnest([$frameList]) t(f)),
       |l AS (SELECT fr.doc_id, fr.f, $lums
       |  FROM fr JOIN m ON fr.doc_id = m.doc_id),
       |tt AS (SELECT *, ($total) AS total FROM l),
       |hs AS (SELECT doc_id, f, ($hashExpr)::BIGINT AS h FROM tt),
       |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf FROM hs GROUP BY 1),""".stripMargin
  }

  val sqlVideoNearDupPairs: String =
    s"""WITH $sqlVideoHashCtes
       |g AS (SELECT x.doc_id AS ia, y.doc_id AS ib,
       |    CAST(count(*) AS BIGINT) AS n_match
       |  FROM hs x JOIN hs y ON x.f = y.f AND x.h = y.h
       |    AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT ia, ib, n_match,
       |  round(n_match::DOUBLE / greatest(ca.nf, cb.nf), 4) AS match_frac
       |FROM g JOIN cnt ca ON g.ia = ca.doc_id JOIN cnt cb ON g.ib = cb.doc_id
       |WHERE n_match::DOUBLE / greatest(ca.nf, cb.nf) >= $VideoMatchFrac
       |ORDER BY 1, 2""".stripMargin

  /** Oracle for [[videoShardNearDup]]: the mm9 replay with the 4/5 cut —
    * per-position matches counted once per pair (DISTINCT on the
    * canonical pair + position), pairs restricted to a shard side.
    */
  def sqlVideoShardPairs: String = {
    val isNewX =
      s"(CASE WHEN x.doc_id >= $VariantOffset THEN x.doc_id - $VariantOffset ELSE x.doc_id END) >= (SELECT cnt FROM cn)"
    s"""WITH cn AS (SELECT (count(*) * 4) // 5 AS cnt FROM documents),
       |$sqlVideoHashCtes
       |pos AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS ia,
       |    greatest(x.doc_id, y.doc_id) AS ib, x.f AS f
       |  FROM hs x JOIN hs y ON x.f = y.f AND x.h = y.h
       |    AND x.doc_id <> y.doc_id
       |  WHERE $isNewX),
       |g AS (SELECT ia, ib, CAST(count(*) AS BIGINT) AS n_match
       |  FROM pos GROUP BY 1, 2)
       |SELECT ia, ib, n_match,
       |  round(n_match::DOUBLE / greatest(ca.nf, cb.nf), 4) AS match_frac
       |FROM g JOIN cnt ca ON g.ia = ca.doc_id JOIN cnt cb ON g.ib = cb.doc_id
       |WHERE n_match::DOUBLE / greatest(ca.nf, cb.nf) >= $VideoMatchFrac
       |ORDER BY 1, 2""".stripMargin
  }

  /** Shot-cut threshold: consecutive frames whose 16-bit aHashes differ
    * by MORE than this many bits mark a boundary. Within-shot repeats
    * differ by 0; independent scenes differ by ~8 (half the bits).
    */
  val ShotCutBits = 4

  /** mm10 fixture: SHOT-STRUCTURED reels — 4 frames of scene A then 4 of
    * scene B (each scene's 16 pixels from 3 chained md5 digests of the
    * doc text), so the only true cut is at frame 4 and every other
    * transition is a 0-bit repeat. Same REAL container bytes as the mm9
    * reels, walked by the same cursor parser.
    */
  def videoShotAssets(docs: DataFrame): DataFrame = {
    def hx(tag: String): Column =
      concat((0 until 3).map(i => md5(concat(col("text"), lit(s"#$tag$i")))): _*)
    def frame(h: Column): Column =
      concat(lit(MediaCodec.ppmHeader(4, 4)), to_binary(h, lit("hex")))
    docs.select(col("doc_id").as("asset_id"), lit("video").as("kind"),
      concat(Seq.fill(4)(frame(hx("sa"))) ++ Seq.fill(4)(frame(hx("sb"))): _*)
        .as("data"))
  }

  /** SHOT-BOUNDARY DETECTION (mm10) — the temporal segmentation every
    * video-curation pipeline runs before per-shot sampling/dedup: one
    * lag over each asset's per-frame perceptual hashes, hamming =
    * bit_count(xor) against the previous frame, a cut wherever the
    * distance clears [[ShotCutBits]]. Emits every transition with its
    * distance (the honesty table — thresholds are tunable downstream).
    *
    * Scale shape: the reel decodes ONCE in the batched kernel
    * ([[videoFrameHashes]] — pixels never leave it); what shuffles is
    * ~10 bytes per frame into a per-asset window whose partition is one
    * reel's frames. Detection cost is linear in frames, zero joins.
    */
  def shotBoundaries(assetsDf: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("frame_no"))
    videoFrameHashes(assetsDf)
      .select(col("asset_id"), col("frame_no"), col("fhash"),
        lag(col("fhash"), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .select(col("asset_id"), col("frame_no"),
        bit_count(col("prev").bitwiseXOR(col("fhash"))).cast("int").as("hamming"))
      .withColumn("is_cut", col("hamming") > ShotCutBits)
      .orderBy(col("asset_id"), col("frame_no"))
  }

  /** Oracle for [[videoShotAssets]] -> [[shotBoundaries]]: the two scene
    * hashes replay from the same digest hex (per-scene 16-luminance
    * cross-multiplied mean), frames 1..7 take (prev, cur) by position,
    * and the same bit_count(xor) walk emits every transition.
    */
  val sqlShotBoundaries: String = {
    def scene(tag: String, h: String, out: String): String = {
      val hx = (0 until 3).map(i => s"md5(text || '#$tag$i')").mkString(" || ")
      val lums = (0 until 16).map { k =>
        val b = (0 until 3)
          .map(c => s"('0x' || substr($h, ${6 * k + 2 * c + 1}, 2))::BIGINT")
          .mkString(" + ")
        s"($b) AS l$k"
      }.mkString(", ")
      val total = (0 until 16).map(k => s"l$k").mkString(" + ")
      val hashExpr = (0 until 16)
        .map(k => s"CASE WHEN l$k * 16 > total THEN ${1L << k} ELSE 0 END")
        .mkString(" + ")
      s"""hx_$tag AS (SELECT doc_id, $hx AS $h FROM documents),
         |l_$tag AS (SELECT doc_id, $lums FROM hx_$tag),
         |t_$tag AS (SELECT *, ($total) AS total FROM l_$tag),
         |$out AS (SELECT doc_id, ($hashExpr)::BIGINT AS $out FROM t_$tag)""".stripMargin
    }
    s"""WITH ${scene("sa", "ha_hex", "ha")},
       |${scene("sb", "hb_hex", "hb")},
       |h AS (SELECT ha.doc_id, ha.ha, hb.hb FROM ha JOIN hb USING (doc_id)),
       |tr AS (SELECT doc_id, f,
       |    CASE WHEN f <= 4 THEN ha ELSE hb END AS prev,
       |    CASE WHEN f < 4 THEN ha ELSE hb END AS cur
       |  FROM h, LATERAL unnest([1, 2, 3, 4, 5, 6, 7]) t(f))
       |SELECT doc_id AS asset_id, f AS frame_no,
       |  bit_count(xor(prev, cur))::INT AS hamming,
       |  bit_count(xor(prev, cur)) > $ShotCutBits AS is_cut
       |FROM tr ORDER BY asset_id, frame_no""".stripMargin
  }

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

  /** DuckDB twin of assets -> extractFeatures: the payload bytes are
    * md5(text), so the oracle extracts the same bytes from the hex digest
    * and replays [[imageFeatures]]/[[audioFeatures]] arithmetic exactly —
    * image pixels are bytes 0..11 as RGB triples, audio samples bytes 0..7
    * as little-endian int16. Every sum is an exact integer, so the
    * divide/sqrt sequences are IEEE-identical cross-engine.
    */
  val sqlFeatures: String = {
    val bytes = (0 until 12)
      .map(k => s"('0x' || substr(hx, ${2 * k + 1}, 2))::INT AS b$k").mkString(", ")
    // BIGINT samples: the f1 sum of squares tops out near 4 * 2^30, past
    // INT32 — the Scala kernel accumulates in Long for the same reason
    val samples = (0 until AudioSamples).map { i =>
      s"(CASE WHEN b${2 * i} + b${2 * i + 1} * 256 < 32768 " +
        s"THEN b${2 * i} + b${2 * i + 1} * 256 " +
        s"ELSE b${2 * i} + b${2 * i + 1} * 256 - 65536 END)::BIGINT AS s$i"
    }.mkString(", ")
    def cross(i: Int, j: Int) =
      s"CASE WHEN (s$i >= 0) <> (s$j >= 0) THEN 1 ELSE 0 END"
    s"""WITH m AS (SELECT doc_id, md5(text) AS hx FROM documents),
       |b AS (SELECT doc_id, $bytes FROM m),
       |s AS (SELECT *, $samples FROM b)
       |SELECT doc_id AS asset_id,
       |  round(CASE WHEN doc_id % 3 = 1
       |    THEN ((abs(s0) + abs(s1) + abs(s2) + abs(s3)) / 4.0) / 32768.0
       |    ELSE ((b0 + b3 + b6 + b9) / 4.0) / 255.0 END, 8) AS f0,
       |  round(CASE WHEN doc_id % 3 = 1
       |    THEN sqrt((s0*s0 + s1*s1 + s2*s2 + s3*s3) / 4.0) / 32768.0
       |    ELSE ((b1 + b4 + b7 + b10) / 4.0) / 255.0 END, 8) AS f1,
       |  round(CASE WHEN doc_id % 3 = 1
       |    THEN (${cross(1, 0)} + ${cross(2, 1)} + ${cross(3, 2)}) / 3.0
       |    ELSE ((b2 + b5 + b8 + b11) / 4.0) / 255.0 END, 8) AS f2,
       |  round(CASE WHEN doc_id % 3 = 1
       |    THEN greatest(abs(s0), abs(s1), abs(s2), abs(s3)) / 32768.0
       |    ELSE greatest(b0 + b1 + b2, b3 + b4 + b5, b6 + b7 + b8, b9 + b10 + b11)
       |      / 765.0 END, 8) AS f3
       |FROM s ORDER BY asset_id""".stripMargin
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
