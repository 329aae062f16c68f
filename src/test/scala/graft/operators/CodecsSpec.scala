package graft.operators

import graft.media.Codecs
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level contracts of the dependency-free BMP/WAV codecs. */
class CodecsSpec extends AnyFunSuite {

  test("bmp: header bytes, bottom-up storage, BGR order, row padding") {
    // 2×2 with distinct per-pixel channels
    val enc = Codecs.encodeBmp(2, 2, (x, y) => (10 * (y * 2 + x) + 1, 10 * (y * 2 + x) + 2, 10 * (y * 2 + x) + 3))
    assert(enc(0) == 'B' && enc(1) == 'M')
    // data offset 54; row size 2*3=6 padded to 8; file = 54 + 16
    assert(enc.length == 70)
    // bottom-up: first stored row is y=1 (pixels 2,3); BGR order
    assert((enc(54) & 0xff) == 23 && (enc(55) & 0xff) == 22 && (enc(56) & 0xff) == 21)
    // second stored row at offset 54+8 is y=0 (pixel 0)
    assert((enc(62) & 0xff) == 3 && (enc(63) & 0xff) == 2 && (enc(64) & 0xff) == 1)
    val dec = Codecs.decodeBmp(enc)
    assert(dec.width == 2 && dec.height == 2)
    // decoded pixels are top-down row-major 0xRRGGBB
    assert(dec.pixels.toSeq == (0 until 4).map(i =>
      ((10 * i + 1) << 16) | ((10 * i + 2) << 8) | (10 * i + 3)))
  }

  test("bmp: negative height (top-down) decodes with rows unflipped") {
    val enc = Codecs.encodeBmp(2, 2, (x, y) => (y * 2 + x, 0, 0))
    val topDown = enc.clone()
    // height := -2, little-endian at offset 22
    topDown(22) = 0xfe.toByte; topDown(23) = 0xff.toByte
    topDown(24) = 0xff.toByte; topDown(25) = 0xff.toByte
    val up = Codecs.decodeBmp(enc).pixels.toSeq
    val down = Codecs.decodeBmp(topDown).pixels.toSeq
    // same bytes interpreted top-down = vertical flip of the bottom-up read
    assert(down == up.grouped(2).toSeq.reverse.flatten)
  }

  test("bmp: rejects wrong magic and unsupported bpp") {
    val enc = Codecs.encodeBmp(1, 1, (_, _) => (1, 2, 3))
    val bad = enc.clone(); bad(0) = 'X'
    assertThrows[IllegalArgumentException](Codecs.decodeBmp(bad))
    val bad2 = enc.clone(); bad2(28) = 8 // 8bpp
    assertThrows[IllegalArgumentException](Codecs.decodeBmp(bad2))
  }

  test("wav: round-trip with negative samples; unknown chunks skipped") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val enc = Codecs.encodeWavPcm16(22050, samples)
    val dec = Codecs.decodeWavPcm16(enc)
    assert(dec.sampleRate == 22050 && dec.channels == 1)
    assert(dec.samples.toSeq == samples.toSeq)

    // splice an odd-sized JUNK chunk between WAVE and fmt — the walker
    // must skip it with even-byte padding
    val junkPayload = Array[Byte](9, 9, 9) // size 3, padded to 4
    val out = new java.io.ByteArrayOutputStream()
    out.write(enc, 0, 12)
    out.write("JUNK".getBytes("US-ASCII"))
    out.write(Array[Byte](3, 0, 0, 0)) // size 3 LE
    out.write(junkPayload)
    out.write(0) // pad byte
    out.write(enc, 12, enc.length - 12)
    val dec2 = Codecs.decodeWavPcm16(out.toByteArray)
    assert(dec2.sampleRate == 22050 && dec2.samples.toSeq == samples.toSeq)
  }

  test("wav: corrupt negative chunk size fails fast instead of looping") {
    val enc = Codecs.encodeWavPcm16(8000, Array[Short](1, 2))
    val bad = enc.clone()
    // fmt chunk size := -8 (0xFFFFFFF8 LE) — an unguarded walk would
    // advance by 8 + (-8) = 0 forever
    bad(16) = 0xf8.toByte; bad(17) = 0xff.toByte
    bad(18) = 0xff.toByte; bad(19) = 0xff.toByte
    assertThrows[IllegalArgumentException](Codecs.decodeWavPcm16(bad))
  }

  test("bmp: nearest-neighbour resize uses the floor mapping") {
    // 4×2 source with distinct pixels; downsize to 2×1 → picks (0,0),(2,0)
    val src = Codecs.Bmp(4, 2, Array(1, 2, 3, 4, 5, 6, 7, 8))
    val small = Codecs.resizeNearestBmp(src, 2, 1)
    assert(small.width == 2 && small.height == 1 && small.pixels.toSeq == Seq(1, 3))
    // upsize replicates: 1×1 → 2×2
    val up = Codecs.resizeNearestBmp(Codecs.Bmp(1, 1, Array(9)), 2, 2)
    assert(up.pixels.toSeq == Seq(9, 9, 9, 9))
  }

  test("wav: decimation keeps every k-th sample and divides the rate") {
    val w = Codecs.Wav(8000, 1, Array[Short](10, 20, 30, 40, 50))
    val h = Codecs.decimateWav(w, 2)
    assert(h.sampleRate == 4000 && h.samples.toSeq == Seq[Short](10, 30, 50))
  }

  test("wav: rejects non-PCM format codes and missing chunks") {
    val enc = Codecs.encodeWavPcm16(8000, Array[Short](1, 2))
    val bad = enc.clone(); bad(20) = 3 // IEEE float format code
    assertThrows[IllegalArgumentException](Codecs.decodeWavPcm16(bad))
    assertThrows[IllegalArgumentException](
      Codecs.decodeWavPcm16("RIFFxxxxWAVE".getBytes("US-ASCII") ++ new Array[Byte](40)))
  }

  test("m7 guard: a zero-sample decode degrades per-record, not job-fatally") {
    assert(Multimodal.loudnessOf(7L, Array.emptyShortArray)
      === Multimodal.Loudness(7L, 0L, -1L, 0L))
    // one window's worth still picks index 0
    assert(Multimodal.loudnessOf(1L, Array[Short](3, -4)).loud_idx === 0L)
  }
}
