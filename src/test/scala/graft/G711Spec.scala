package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** G.711 µ-law/A-law WAV: ITU expansion-formula pins at the segment
  * extremes, container round-trips through wavStats, stereo channel
  * separation, and the unsupported-format rejection.
  */
class G711Spec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("expansion pins: segment extremes match the ITU tables") {
    // µ-law: 0x00 → -32124, 0x80 → +32124, 0xFF/0x7F → 0
    assert(Multimodal.ulawToPcm(0x00) == -32124)
    assert(Multimodal.ulawToPcm(0x80) == 32124)
    assert(Multimodal.ulawToPcm(0xff) == 0)
    assert(Multimodal.ulawToPcm(0x7f) == 0)
    // A-law: 0x55 → -8, 0xD5 → +8, 0x2A → -32256, 0xAA → +32256
    assert(Multimodal.alawToPcm(0x55) == -8)
    assert(Multimodal.alawToPcm(0xd5) == 8)
    assert(Multimodal.alawToPcm(0x2a) == -32256)
    assert(Multimodal.alawToPcm(0xaa) == 32256)
    // both expansions are odd-symmetric around the sign bit
    (0 until 128).foreach { i =>
      assert(Multimodal.ulawToPcm(i) == -Multimodal.ulawToPcm(i | 0x80))
      assert(Multimodal.alawToPcm(i) == -Multimodal.alawToPcm(i | 0x80))
    }
  }

  test("companded WAVs fold per-channel stats over the expanded " +
    "samples; stereo interleave splits correctly") {
    Seq(true, false).foreach { ulaw =>
      val ch = 2
      val n = 46
      val payload = Array.tabulate(n)(k => ((k * 37 + 5) % 256).toByte)
      val wav = Multimodal.wavG711Bytes(8000, ch, ulaw, payload)
      val rows = Multimodal.wavStats(9L, wav)
      assert(rows.length == 2 && rows.forall(_.decode_ok))
      (0 until ch).foreach { c =>
        val samples = (0 until n).filter(_ % ch == c).map { k =>
          val v = payload(k) & 0xff
          if (ulaw) Multimodal.ulawToPcm(v) else Multimodal.alawToPcm(v)
        }
        val r = rows(c)
        assert(r.n_samples == n / ch)
        assert(r.peak == samples.map(math.abs).max)
        assert(r.sum_abs == samples.map(s => math.abs(s).toLong).sum)
        assert(r.sum_sq == samples.map(s => s.toLong * s).sum)
      }
    }
  }

  test("metadata still parses for G.711 containers; an unsupported " +
    "format code routes stats (not metadata) to the sentinel") {
    val wav = Multimodal.wavG711Bytes(8000, 1, ulaw = true,
      Array.tabulate(40)(_.toByte))
    val meta = Multimodal.parseWav(3L, wav)
    assert(meta.decode_ok && meta.sample_rate == 8000 &&
      meta.bits_per_sample == 8)
    // flip the format code to 3 (IEEE float): stats must reject
    val bad = wav.clone()
    bad(20) = 3
    assert(Multimodal.parseWav(3L, bad).decode_ok)
    val rows = Multimodal.wavStats(3L, bad)
    assert(rows.length == 1 && !rows.head.decode_ok)
  }
}
