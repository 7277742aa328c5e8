package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {

  private lazy val docs = {
    val s = TestSpark.spark
    import s.implicits._
    Seq((0L, "hello world", 11L), (1L, "audio doc", 9L), (2L, "a video doc", 11L))
      .toDF("doc_id", "text", "n_chars")
  }

  // real container sizes: P6 header "P6\n2 2\n255\n" (11) + 12 pixel bytes;
  // RIFF/WAV canonical header (44) + 8 PCM bytes
  private val PpmLen = 11 + 12
  private val WavLen = 44 + 8

  test("assets: REAL container payloads + typed metadata, kind cycles by id") {
    val a = Multimodal.assets(docs).orderBy(col("asset_id")).collect()
    assert(a.map(_.getString(1)).toSeq == Seq("image", "audio", "video"))
    val img = a(0).getAs[Array[Byte]]("data")
    val wav = a(1).getAs[Array[Byte]]("data")
    assert(img.length == PpmLen && img(0) == 'P' && img(1) == '6')
    assert(wav.length == WavLen
      && new String(wav.take(4), "US-ASCII") == "RIFF"
      && new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(a.head.getStruct(3).getInt(0) >= 16) // width
  }

  test("extractFeatures: batched kernel, decoded features in [0,1], deterministic") {
    val f1 = Multimodal.extractFeatures(Multimodal.assets(docs)).orderBy(col("asset_id")).collect()
    val f2 = Multimodal.extractFeatures(Multimodal.assets(docs)).orderBy(col("asset_id")).collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(r => (1 to 4).forall(i => r.getDouble(i) >= 0 && r.getDouble(i) <= 1)))
  }

  test("resize caps metadata without touching payload") {
    val r = Multimodal.resize(Multimodal.assets(docs), 32, 32)
      .select(col("kind"), col("meta.width"), col("meta.height"), length(col("data"))).collect()
    assert(r.forall(x => x.getInt(1) <= 32 && x.getInt(2) <= 32
      && x.getInt(3) == (if (x.getString(0) == "audio") WavLen else PpmLen)))
  }

  test("PPM codec: header round-trip, comments skipped, pixel values exact") {
    val px = Array[Byte](0, 50, 100, -1, -56, 25, 7, 8, 9, 10, 11, 12) // -1 = 255
    val bytes = MediaCodec.ppmHeader(2, 2) ++ px
    val img = MediaCodec.decodePpm(bytes)
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == Seq(0, 50, 100, 255, 200, 25, 7, 8, 9, 10, 11, 12))
    // spec allows comments between header tokens
    val commented = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++ px
    assert(MediaCodec.decodePpm(commented).rgb.toSeq == img.rgb.toSeq)
  }

  test("WAV codec: header round-trip, LE samples, extra chunks tolerated") {
    val hdr = MediaCodec.wavHeader(3, 16000)
    val samples = Array[Short](-32768, 0, 12345)
    val data = samples.flatMap(s => Array((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val wav = MediaCodec.decodeWav(hdr ++ data)
    assert(wav.sampleRate == 16000 && wav.samples.toSeq == samples.toSeq)
    // a LIST chunk between fmt and data must be skipped, not choked on
    val withList = hdr.take(36) ++
      "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII") ++
      hdr.slice(36, 44) ++ data
    assert(MediaCodec.decodeWav(withList).samples.toSeq == samples.toSeq)
  }

  test("PPM giant-header overflow is rejected, not NaN-decoded") {
    // 65536 * 65536 * 3 overflows Int to 0 — must still fail the byte count
    val crafted = "P6\n65536 65536\n255\n".getBytes("US-ASCII")
    val ex = intercept[IllegalArgumentException](MediaCodec.decodePpm(crafted))
    assert(ex.getMessage.contains("pixel bytes"))
  }

  test("WAV odd-sized final chunk may omit its pad byte at EOF") {
    val hdr = MediaCodec.wavHeader(2, 16000)
    val data = Array[Byte](1, 0, 2, 0)
    // trailing 3-byte chunk, no pad byte: spec-tolerable at EOF
    val odd = hdr ++ data ++ "oddc".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](9, 9, 9)
    assert(MediaCodec.decodeWav(odd).samples.toSeq == Seq(1.toShort, 2.toShort))
  }

  test("malformed payloads fail loudly, never decode to garbage") {
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodePpm("JUNK".getBytes)).getMessage.contains("magic"))
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodePpm(MediaCodec.ppmHeader(2, 2) ++ Array[Byte](1, 2, 3)))
      .getMessage.contains("pixel bytes"))
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeWav("RIFFxxxxJUNK".getBytes)).getMessage.contains("WAVE"))
    // a truncated data chunk must not silently yield fewer samples
    val hdr = MediaCodec.wavHeader(4, 16000)
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeWav(hdr ++ Array[Byte](1, 2))).getMessage.contains("claims"))
  }

  test("sampleFrames: only video assets, stride respected, offsets monotonic") {
    val f = Multimodal.sampleFrames(Multimodal.assets(docs), 2).collect()
    assert(f.nonEmpty && f.forall(_.getLong(0) == 2L)) // only doc_id 2 is video
    val offs = f.map(_.getLong(2)).toSeq
    assert(offs == offs.sorted)
    assert(f.map(_.getLong(1)).forall(_ % 2 == 0))
  }

  test("channelHistogram: planted pixel values land in their bins, zero bins omitted") {
    val s = TestSpark.spark
    import s.implicits._
    // 2x2 image: reds 0,63,64,255 → bins 0,0,1,3; greens all 10 → bin 0 x4;
    // blues 100,150,200,250 → bins 1,2,3,3
    val pixels = Seq((0, 10, 100), (63, 10, 150), (64, 10, 200), (255, 10, 250))
    val bytes = MediaCodec.ppmHeader(2, 2) ++
      pixels.flatMap { case (r, g, b) => Seq(r.toByte, g.toByte, b.toByte) }
    val assets = Seq((3L, "image", bytes)).toDF("asset_id", "kind", "data")
    val got = Multimodal.channelHistogram(assets).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    val want = Map((0, 0) -> 2L, (0, 1) -> 1L, (0, 3) -> 1L,
      (1, 0) -> 4L,
      (2, 1) -> 1L, (2, 2) -> 1L, (2, 3) -> 2L)
    assert(got == want, s"histogram diverged: $got")
  }

  test("downsampleAudio: truncating block mean (the shared engine convention), tail dropped") {
    val s = TestSpark.spark
    import s.implicits._
    // 5 samples at factor 2: blocks (-3, 2) and (10, 11), tail 99 dropped.
    // -1 / 2 TRUNCATES to 0 in Scala, Spark div AND DuckDB // (floor
    // would say -1) — this pin holds the kernel to the one convention
    // all engines share
    val samples = Array[Short](-3, 2, 10, 11, 99)
    val data = MediaCodec.wavHeader(5, 16000) ++
      samples.flatMap(x => Array((x & 0xff).toByte, ((x >> 8) & 0xff).toByte))
    val assets = Seq((7L, "audio", data)).toDF("asset_id", "kind", "data")
    val got = Multimodal.downsampleAudio(assets).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getInt(3))))
    assert(got.toSeq == Seq(0L -> ((0L, 8000)), 1L -> ((10L, 8000))), s"${got.toSeq}")
  }

  test("thumbnails: block-average downsample is the floor-mean per source block, per channel") {
    val s = TestSpark.spark
    import s.implicits._
    // hand-built 4x2 PPM: left 2x2 block all (10,20,30) except one (13,20,30)
    // pixel -> floor mean (10, 20, 30); right block values 0..255 mixed
    val left = Seq((10, 20, 30), (13, 20, 30), (10, 20, 30), (10, 20, 30))
    val right = Seq((0, 0, 0), (255, 255, 255), (1, 2, 3), (4, 5, 6))
    // row-major 4x2: row 0 = L0 L1 R0 R1, row 1 = L2 L3 R2 R3
    val pixels = Seq(left(0), left(1), right(0), right(1),
      left(2), left(3), right(2), right(3))
    val bytes = MediaCodec.ppmHeader(4, 2) ++
      pixels.flatMap { case (r, g, b) => Seq(r.toByte, g.toByte, b.toByte) }
    val assets = Seq((0L, "image", bytes))
      .toDF("asset_id", "kind", "data")
    val got = Multimodal.thumbnails(assets, 2, 1).collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // left output pixel: floor((10+13+10+10)/4)=10, channels exact
    assert(got((0L, 0L)) == ((10L, 20L, 30L)), s"$got")
    // right output pixel: floor(260/4)=65, floor(262/4)=65, floor(264/4)=66
    assert(got((1L, 0L)) == ((65L, 65L, 66L)), s"$got")
  }

  // hand-built 8x8 PPM from a per-pixel grayscale level function
  private def ppm8x8(lum: Int => Int): Array[Byte] =
    MediaCodec.ppmHeader(8, 8) ++
      (0 until 64).flatMap(p => Seq.fill(3)(lum(p).toByte)).toArray

  test("mm7: a brightness touch-up pairs within the radius, an inverted image does not") {
    val s = TestSpark.spark
    import s.implicits._
    // A: dark half (lum 30), bright half (lum 240) -> bits 32..63 set
    val a = ppm8x8(p => if (p < 32) 10 else 80)
    // B: same but pixel 0 brightened to lum 270 — the near-identical edit.
    // Planted so only bit 0 flips: 270*64 > new total (8880), and no other
    // block sits near the mean, so hamming(A, B) is exactly 1
    val b = ppm8x8(p => if (p == 0) 90 else if (p < 32) 10 else 80)
    // C: the inversion — every bit differs (hamming 64), never a pair
    val c = ppm8x8(p => if (p < 32) 80 else 10)
    val assets = Seq((1L, "image", a), (2L, "image", b), (3L, "image", c))
      .toDF("asset_id", "kind", "data")
    val hashes = Multimodal.imageHashes(assets).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(hashes(1L)._2 == 64 && hashes(1L)._1 == (0xFFFFFFFFL << 32))
    assert(java.lang.Long.bitCount(hashes(1L)._1 ^ hashes(2L)._1) == 1)
    assert(java.lang.Long.bitCount(hashes(1L)._1 ^ hashes(3L)._1) == 64)
    val pairs = Multimodal.imageHashPairs(assets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1)), s"got ${pairs.toSeq}")
  }

  test("mm7 banding equals brute force on the fixture — exact within the radius") {
    val s = TestSpark.spark
    val fixture = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val assets = Multimodal.hashAssets(fixture)
    val hs = Multimodal.imageHashes(assets).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val brute = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      d = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if d <= Multimodal.HashMaxHamming
    } yield (hs(i)._1, hs(j)._1, d)).sorted
    val banded = Multimodal.imageHashPairs(assets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(banded == brute, s"banded=$banded brute=$brute")
    assert(brute.nonEmpty, "fixture must plant at least one near-dup pair")
    // every planted retouch pair survives banding (it must: <=3 bits differ)
    val planted = brute.filter { case (ia, ib, _) =>
      ib == ia + Multimodal.VariantOffset }
    assert(planted.nonEmpty)
  }

  // hand-built mono PCM16 WAV from sample values (LE two's complement)
  private def wav(samples: Seq[Int]): Array[Byte] =
    MediaCodec.wavHeader(samples.length, 16000) ++
      samples.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray

  test("mm8: audioHash is sign-of-energy-delta, strictly — and volume-invariant") {
    // energies |s| = [0, 5, 3, 3, 10]: deltas up,down,TIE,up -> bits 0 and 3
    val (h, nb) = Multimodal.audioHash(MediaCodec.decodeWav(wav(Seq(0, 5, -3, 3, 10))))
    assert(nb == 4 && h == 9L, s"h=$h nb=$nb")
    // positive rescaling preserves every strict comparison AND every tie
    val (h3, _) = Multimodal.audioHash(MediaCodec.decodeWav(wav(Seq(0, 15, -9, 9, 30))))
    assert(h3 == h)
    // an edit to sample i touches only the two deltas around it — here
    // silencing sample 1 can flip bits 0 and 1, nothing else
    val (hc, _) = Multimodal.audioHash(MediaCodec.decodeWav(wav(Seq(0, 0, -3, 3, 10))))
    assert((h ^ hc) == ((h ^ hc) & 3L))
  }

  test("mm8: clipped-intro variant pairs within the radius, reversed audio does not") {
    val s = TestSpark.spark
    import s.implicits._
    // first delta is DOWN (200 < 300), so clipping sample 0 to silence
    // flips exactly bit 0 (200 > 0) and nothing else
    val base = Seq(300, 200, 50, 300, 250, 400, 10, 500, 450, 600,
      20, 700, 650, 800, 30, 900, 850, 1000, 40, 1100)
    val a = wav(base)
    val b = wav(0 +: base.tail)           // clipped first sample
    val c = wav(base.reverse)             // every delta direction flips
    val assets = Seq((1L, "audio", a), (2L, "audio", b), (3L, "audio", c))
      .toDF("asset_id", "kind", "data")
    val pairs = Multimodal.audioHashPairs(assets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1)), s"got ${pairs.toSeq}")
  }

  test("mm8 banding equals brute force on the fixture — exact within the radius") {
    val s = TestSpark.spark
    val fixture = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val assets = Multimodal.audioHashAssets(fixture)
    val hs = Multimodal.audioHashes(assets).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val brute = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      d = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if d <= Multimodal.HashMaxHamming
    } yield (hs(i)._1, hs(j)._1, d)).sorted
    val banded = Multimodal.audioHashPairs(assets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(banded == brute, s"banded=$banded brute=$brute")
    val planted = brute.filter { case (ia, ib, _) =>
      ib == ia + Multimodal.VariantOffset }
    assert(planted.nonEmpty)
  }

  // hand-built 4x4 PPM frame from a per-pixel grayscale level function
  private def ppm4x4(lum: Int => Int): Array[Byte] =
    MediaCodec.ppmHeader(4, 4) ++
      (0 until 16).flatMap(p => Seq.fill(3)(lum(p).toByte)).toArray

  test("mm9: the reel parser walks concatenated frames; a torn frame fails loudly") {
    val reel = ppm4x4(_ => 10) ++ ppm4x4(p => p * 10) ++ ppm4x4(_ => 200)
    val frames = MediaCodec.decodePpmReel(reel)
    assert(frames.length == 3)
    assert(frames.forall(f => f.width == 4 && f.height == 4))
    assert(frames(2).rgb.forall(_ == 200))
    intercept[IllegalArgumentException] {
      MediaCodec.decodePpmReel(reel.dropRight(5))
    }
  }

  test("mm9: a one-frame glitch still pairs at 7/8; unrelated videos do not") {
    val s = TestSpark.spark
    import s.implicits._
    def frame(f: Int, inverted: Boolean): Array[Byte] =
      ppm4x4 { p =>
        val bright = (p + f) % 2 == 0
        if (bright ^ inverted) 80 else 10
      }
    val a = (0 until 8).map(f => frame(f, inverted = false))
      .reduce(_ ++ _)
    val b = (0 until 8).map(f => frame(f, inverted = f == 3))
      .reduce(_ ++ _)
    val c = (0 until 8).map(_ => ppm4x4(_ => 50)).reduce(_ ++ _)
    val assets = Seq((1L, "video", a), (2L, "video", b), (3L, "video", c))
      .toDF("asset_id", "kind", "data")
    val pairs = Multimodal.videoNearDupPairs(assets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(pairs.toSeq == Seq((1L, 2L, 7L, 0.875)), s"got ${pairs.toSeq}")
  }

  test("mm9 fixture: every planted re-encode variant pairs with its base") {
    val s = TestSpark.spark
    val fixture = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val pairs = Multimodal.videoNearDupPairs(Multimodal.videoHashAssets(fixture))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (ia, ib, n) =>
      ib == ia + Multimodal.VariantOffset && n >= 7 })
  }

  test("mm10: a repeat-then-cut reel yields exactly one boundary; a static reel yields none") {
    val s = TestSpark.spark
    import s.implicits._
    // checkerboard scene then inverted checkerboard: hashes are bitwise
    // complements (hamming 16) — one cut at the transition, zeros inside
    def scene(inv: Boolean): Array[Byte] = ppm4x4 { p =>
      if ((p % 2 == 0) ^ inv) 80 else 10
    }
    val cutReel = (Seq.fill(4)(scene(false)) ++ Seq.fill(4)(scene(true))).reduce(_ ++ _)
    val staticReel = Seq.fill(8)(scene(false)).reduce(_ ++ _)
    val assets = Seq((1L, "video", cutReel), (2L, "video", staticReel))
      .toDF("asset_id", "kind", "data")
    val got = Multimodal.shotBoundaries(assets).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    val cuts = got.filter(_._4)
    assert(cuts.toSeq == Seq((1L, 4, 16, true)), s"cuts diverged: ${cuts.toSeq}")
    assert(got.count(!_._4) == 13, s"expected 13 quiet transitions: ${got.toSeq}")
    assert(got.filter(x => !x._4).forall(_._3 == 0), s"within-shot hamming must be 0")
  }

  test("mm12/mm13: shard probes find exactly the full-corpus pairs that touch the shard") {
    val s = TestSpark.spark
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val cut = docs.count() * 4 / 5
    def base(id: Long): Long =
      if (id >= Multimodal.VariantOffset) id - Multimodal.VariantOffset else id
    // audio: band probe against the saved fingerprints
    val savedA = Multimodal.audioHashes(
      Multimodal.audioHashAssets(docs.filter(col("doc_id") < cut)))
    val gotA = Multimodal.audioShardNearDup(savedA,
        Multimodal.audioHashAssets(docs.filter(col("doc_id") >= cut)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullA = Multimodal.audioHashPairs(Multimodal.audioHashAssets(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expA = fullA.filter(p => base(p._1) >= cut || base(p._2) >= cut)
    assert(gotA.nonEmpty, "fixture must plant shard-side audio pairs")
    assert(gotA == expA, s"missing=${expA -- gotA} extra=${gotA -- expA}")
    // video: frame-position probe against the saved frame hashes
    val savedV = Multimodal.videoFrameHashes(
      Multimodal.videoHashAssets(docs.filter(col("doc_id") < cut)))
    val gotV = Multimodal.videoShardNearDup(savedV,
        Multimodal.videoHashAssets(docs.filter(col("doc_id") >= cut)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullV = Multimodal.videoNearDupPairs(Multimodal.videoHashAssets(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expV = fullV.filter(p => base(p._1) >= cut || base(p._2) >= cut)
    assert(gotV.nonEmpty, "fixture must plant shard-side video pairs")
    assert(gotV == expV, s"missing=${expV -- gotV} extra=${gotV -- expV}")
  }
}
