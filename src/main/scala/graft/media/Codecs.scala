package graft.media

/** Dependency-free binary codecs for the multimodal column pipeline:
  * 24-bit BMP (BITMAPINFOHEADER, bottom-up or top-down) and 16-bit PCM
  * WAV (RIFF chunk walk). These are real format parsers — byte-level
  * headers, row padding, BGR order, little-endian samples — so the
  * multimodal operators decode genuine media payloads instead of a stub;
  * the container simply carries no *compressed* codec libraries, and
  * these two formats need none.
  *
  * Everything here is plain JVM code called from `mapPartitions`
  * batches, so it distributes exactly like any other row-level decode.
  */
object Codecs {

  // ------------------------------------------------------------ helpers

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  // ---------------------------------------------------------------- BMP

  /** Decoded image: pixels row-major TOP-DOWN, packed 0xRRGGBB. */
  final case class Bmp(width: Int, height: Int, pixels: Array[Int])

  /** Encode a 24-bit bottom-up BMP (the standard orientation): 14-byte
    * file header + 40-byte BITMAPINFOHEADER + BGR rows padded to 4-byte
    * boundaries. `rgb(x, y)` is queried in top-down coordinates. */
  def encodeBmp(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putI32(out, 2, out.length)
    putI32(out, 10, 54) // pixel data offset
    putI32(out, 14, 40) // info header size
    putI32(out, 18, width)
    putI32(out, 22, height) // positive = bottom-up
    putU16(out, 26, 1) // planes
    putU16(out, 28, 24) // bpp
    putI32(out, 30, 0) // BI_RGB
    putI32(out, 34, dataSize)
    putI32(out, 38, 2835); putI32(out, 42, 2835) // 72 dpi
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * rowSize // bottom-up storage
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        val p = rowOff + x * 3
        out(p) = (b & 0xff).toByte // BGR order
        out(p + 1) = (g & 0xff).toByte
        out(p + 2) = (r & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24-bit uncompressed BMP. Honours the pixel-data offset
    * from the header (extra header bytes / palettes are skipped), the
    * row padding, BGR byte order, and both orientations (positive
    * height = bottom-up, negative = top-down). */
  def decodeBmp(bytes: Array[Byte]): Bmp = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val dataOffset = i32(bytes, 10)
    val width = i32(bytes, 18)
    val rawHeight = i32(bytes, 22)
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    require(bpp == 24, s"unsupported BMP bpp $bpp (only 24-bit)")
    require(compression == 0, s"unsupported BMP compression $compression")
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    val rowSize = ((width * 3 + 3) / 4) * 4
    require(bytes.length >= dataOffset + rowSize * height, "truncated BMP")
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      val rowOff = dataOffset + srcRow * rowSize
      var x = 0
      while (x < width) {
        val p = rowOff + x * 3
        val b = bytes(p) & 0xff
        val g = bytes(p + 1) & 0xff
        val r = bytes(p + 2) & 0xff
        px(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    Bmp(width, height, px)
  }

  /** Nearest-neighbour resize (the floor mapping
    * `src = dst * srcDim / dstDim`, the standard NN convention). Pure
    * pixel-domain transform — encode the result with [[encodeBmp]] to
    * get a file back. */
  def resizeNearestBmp(img: Bmp, w: Int, h: Int): Bmp = {
    require(w > 0 && h > 0, "target dims must be positive")
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val sy = y * img.height / h
      var x = 0
      while (x < w) {
        px(y * w + x) = img.pixels(sy * img.width + (x * img.width / w))
        x += 1
      }
      y += 1
    }
    Bmp(w, h, px)
  }

  // ---------------------------------------------------------------- WAV

  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Decimate by an integer factor (every k-th sample, rate divided) —
    * the audio analog of a nearest-neighbour resize. */
  def decimateWav(wav: Wav, factor: Int): Wav = {
    require(factor > 0, "factor must be positive")
    val n = (wav.samples.length + factor - 1) / factor
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = wav.samples(i * factor); i += 1 }
    Wav(wav.sampleRate / factor, wav.channels, out)
  }

  /** Encode mono 16-bit PCM as a canonical RIFF/WAVE file:
    * `RIFF <size> WAVE` + `fmt ` (PCM, 16-bit) + `data`. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putI32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putI32(out, 16, 16) // fmt chunk size
    putU16(out, 20, 1) // PCM
    putU16(out, 22, 1) // mono
    putI32(out, 24, sampleRate)
    putI32(out, 28, sampleRate * 2) // byte rate
    putU16(out, 32, 2) // block align
    putU16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putI32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      putU16(out, 44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode 16-bit PCM WAV by walking the RIFF chunk list (unknown
    * chunks — LIST, fact, cue — skip with even-byte padding, as the
    * format requires), validating the fmt chunk (PCM, 16-bit) and
    * reading little-endian signed samples from `data`. */
  def decodeWavPcm16(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 44 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "not a RIFF/WAVE payload")
    var off = 12
    var sampleRate = -1
    var channels = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length && (sampleRate < 0 || samples == null)) {
      val id = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = i32(bytes, off + 4)
      // a corrupt negative size would stall or reverse the walk
      require(size >= 0, s"corrupt WAV chunk '$id' size $size")
      id match {
        case "fmt " =>
          val fmt = u16(bytes, off + 8)
          require(fmt == 1, s"unsupported WAV format code $fmt (only PCM)")
          channels = u16(bytes, off + 10)
          sampleRate = i32(bytes, off + 12)
          val bits = u16(bytes, off + 22)
          require(bits == 16, s"unsupported WAV bit depth $bits (only 16)")
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = u16(bytes, off + 8 + i * 2).toShort
            i += 1
          }
        case _ => // skip unknown chunk
      }
      off += 8 + size + (size & 1) // chunks are even-aligned
    }
    require(sampleRate >= 0, "WAV fmt chunk missing")
    require(samples != null, "WAV data chunk missing")
    Wav(sampleRate, channels, samples)
  }
}
