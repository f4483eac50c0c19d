package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** ADTS (AAC) frame walk: writer round-trips across profiles/rates/
  * channel configs, CRC-frame counting, duration arithmetic, and the
  * strict whole-stream rejection contract.
  */
class AdtsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("header chains round-trip: frames, duration, crc counts") {
    Seq((2, 3, 2, 10), (1, 4, 1, 7), (0, 11, 6, 3)).foreach {
      case (profile, rateIdx, ch, n) =>
        val blob = Multimodal.syntheticAdts(5L, n, profile, rateIdx, ch)
        val m = Multimodal.parseAdts(5L, blob.content)
        assert(m.decode_ok, s"p=$profile ri=$rateIdx")
        assert(m.profile == profile && m.channels == ch)
        assert(m.frames == n)
        assert(m.crc_frames == (0 until n).count(_ % 3 == 0))
        val rate = Seq(96000, 88200, 64000, 48000, 44100, 32000, 24000,
          22050, 16000, 12000, 11025, 8000, 7350)(rateIdx)
        assert(m.sample_rate == rate)
        assert(m.duration_ms == n.toLong * 1024 * 1000 / rate)
    }
  }

  test("rejection: bad sync, truncated tail frame, reserved rate " +
    "index, mid-stream parameter change") {
    val good = Multimodal.syntheticAdts(1L, 5, 2, 4, 2).content
    assert(Multimodal.parseAdts(1L, good).decode_ok)
    val badSync = good.clone(); badSync(0) = 0x12
    assert(!Multimodal.parseAdts(1L, badSync).decode_ok)
    assert(!Multimodal.parseAdts(1L,
      java.util.Arrays.copyOf(good, good.length - 5)).decode_ok)
    val badRate = good.clone()
    badRate(2) = ((2 << 6) | (13 << 2)).toByte // reserved index 13
    assert(!Multimodal.parseAdts(1L, badRate).decode_ok)
    val mixed = Multimodal.syntheticAdts(1L, 2, 2, 4, 2).content
    // rewrite the SECOND frame's profile bits in place
    val firstLen = {
      val b3 = mixed(3) & 0xff; val b4 = mixed(4) & 0xff
      val b5 = mixed(5) & 0xff
      ((b3 & 3) << 11) | (b4 << 3) | ((b5 >> 5) & 7)
    }
    mixed(firstLen + 2) =
      ((1 << 6) | (mixed(firstLen + 2) & 0x3f)).toByte
    assert(!Multimodal.parseAdts(1L, mixed).decode_ok)
  }
}
