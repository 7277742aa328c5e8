package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal kernel: binary PPM (P6) for
  * image/video payloads and RIFF/PCM WAV for audio — two real, public
  * container formats simple enough to parse without codec libraries, which
  * is exactly what this sandbox has. The DECODERS are complete for the
  * formats' spec'd layout and fail loudly on malformed bytes; the encoder
  * side emits the headers the fixture generator wraps around payload
  * bytes, so every asset in the pipeline is a genuine file another tool
  * could open.
  */
object MediaCodec {

  // ------------------------------------------------------------------ PPM

  /** P6 header: magic, decimal width/height, maxval 255, single newline
    * separators — the canonical binary-PPM framing.
    */
  def ppmHeader(w: Int, h: Int): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII")

  /** Decoded P6 image: dims + flat RGB triples (0-255). */
  final case class Ppm(width: Int, height: Int, rgb: Array[Int])

  /** Parse a binary PPM: magic "P6", whitespace-separated width, height,
    * maxval (comments `#...` allowed per spec), ONE whitespace byte, then
    * exactly width*height*3 sample bytes.
    */
  def decodePpm(bytes: Array[Byte]): Ppm = {
    val (ppm, next) = decodePpmAt(bytes, 0)
    require(next == bytes.length,
      s"PPM: ${bytes.length - next} trailing bytes after pixel data")
    ppm
  }

  /** Parse ONE P6 image starting at `start`, returning it plus the offset
    * one past its pixel data — the cursor form [[decodePpmReel]] walks a
    * concatenated-frame payload with; [[decodePpm]] is the exact-length
    * special case.
    */
  def decodePpmAt(bytes: Array[Byte], start: Int): (Ppm, Int) = {
    require(bytes.length - start >= 2 &&
      bytes(start) == 'P' && bytes(start + 1) == '6',
      s"not a P6 PPM: bad magic at byte $start")
    var pos = start + 2
    def skipSeparators(): Unit = {
      var more = true
      while (more && pos < bytes.length) {
        val c = bytes(pos).toChar
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else more = false
      }
    }
    def readInt(): Int = {
      skipSeparators()
      val start = pos
      while (pos < bytes.length && bytes(pos).toChar.isDigit) pos += 1
      require(pos > start, s"PPM: expected integer at byte $start")
      new String(bytes, start, pos - start, "US-ASCII").toInt
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    require(w > 0 && h > 0, s"PPM: bad dimensions ${w}x$h")
    require(maxval == 255, s"PPM: only maxval 255 supported, got $maxval")
    require(pos < bytes.length && bytes(pos).toChar.isWhitespace,
      "PPM: missing separator before pixel data")
    pos += 1 // exactly one whitespace byte, per spec
    // Long math: a crafted 65536x65536 header would overflow w*h*3 to 0 and
    // sail past the byte-count check into NaN features downstream
    val n = w.toLong * h * 3
    require(bytes.length.toLong - pos >= n,
      s"PPM: expected $n pixel bytes, got ${bytes.length - pos}")
    val p = pos
    (Ppm(w, h, Array.tabulate(n.toInt)(i => bytes(p + i) & 0xff)), p + n.toInt)
  }

  /** Parse a "reel": back-to-back complete P6 images in one payload (the
    * frame-major layout a raw video dump concatenates). Walks headers with
    * the cursor parser — frames may differ in size; a torn final frame
    * fails loudly inside [[decodePpmAt]]'s byte-count check.
    */
  def decodePpmReel(bytes: Array[Byte]): Seq[Ppm] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Ppm]
    var pos = 0
    while (pos < bytes.length) {
      val (ppm, next) = decodePpmAt(bytes, pos)
      out += ppm
      pos = next
    }
    out.toSeq
  }

  // ------------------------------------------------------------------ WAV

  /** 44-byte canonical RIFF/WAVE header for 16-bit mono PCM. */
  def wavHeader(nSamples: Int, sampleRate: Int): Array[Byte] = {
    val dataSize = nSamples * 2
    val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                   // PCM
      .putShort(1)                   // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)        // byte rate = sr * ch * 16/8
      .putShort(2)                   // block align
      .putShort(16)                  // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    b.array()
  }

  /** Decoded PCM WAV: sample rate + signed 16-bit samples. */
  final case class Wav(sampleRate: Int, samples: Array[Short])

  /** Parse a RIFF/WAVE file: validates the RIFF envelope, walks chunks to
    * `fmt ` (requires 16-bit mono PCM) and `data`, tolerating extra chunks
    * (LIST, fact, ...) in any spec-legal order.
    */
  def decodeWav(bytes: Array[Byte]): Wav = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
    }
    require(bytes.length >= 12, "not a WAV: too short for a RIFF envelope")
    require(fourcc() == "RIFF", "not a WAV: bad RIFF magic")
    b.getInt() // envelope size; trust the buffer bound instead
    require(fourcc() == "WAVE", "not a WAV: RIFF form is not WAVE")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (b.remaining() >= 8) {
      val id = fourcc()
      val size = b.getInt()
      require(size >= 0 && size <= b.remaining(),
        s"WAV: chunk '$id' claims $size bytes, ${b.remaining()} remain")
      // word alignment: an odd-sized final chunk may legally omit its pad
      // byte at EOF — clamp instead of letting position() throw a raw
      // buffer error on a file that is otherwise spec-complete
      val next = math.min(b.position() + size + (size & 1), b.limit())
      id match {
        case "fmt " =>
          require(size >= 16, s"WAV: fmt chunk too short ($size)")
          val fmt = b.getShort(); val ch = b.getShort()
          sampleRate = b.getInt(); b.getInt(); b.getShort()
          val bits = b.getShort()
          require(fmt == 1, s"WAV: only PCM supported, got format $fmt")
          require(ch == 1, s"WAV: only mono supported, got $ch channels")
          require(bits == 16, s"WAV: only 16-bit supported, got $bits")
        case "data" =>
          require(sampleRate > 0, "WAV: data chunk before fmt chunk")
          require(size % 2 == 0, s"WAV: odd data size $size for 16-bit samples")
          samples = Array.fill(size / 2)(b.getShort())
        case _ => () // spec-legal extra chunk; skip
      }
      b.position(next)
    }
    require(samples != null, "WAV: no data chunk")
    Wav(sampleRate, samples)
  }
}
