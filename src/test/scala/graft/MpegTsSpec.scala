package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** MPEG-TS inventory: writer round-trips (PAT→PMT→PES, PTS spans,
  * stream types), 33-bit PTS marker coding at the extremes, CRC-gated
  * PSI, continuity-error detection, and the sentinel contracts.
  */
class MpegTsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("single-program captures inventory back: pids, types, packet/" +
    "PES counts, PTS spans") {
    val ts = Multimodal.syntheticMpegTs(1L, videoPes = 12, audioPes = 7,
      ptsBase = 900000L, ptsDelta = 3003L)
    val rows = Multimodal.parseMpegTs(1L, ts)
    assert(rows.length == 2)
    val v = rows.find(_.pid == 0x101).get
    val a = rows.find(_.pid == 0x102).get
    assert(v.stream_type == 0x1b && a.stream_type == 0x0f)
    assert(v.ts_packets == 12 && v.pes_packets == 12)
    assert(a.ts_packets == 7 && a.pes_packets == 7)
    assert(v.first_pts == 900000L && v.last_pts == 900000L + 11 * 3003L)
    assert(a.first_pts == 901500L && a.last_pts == 901500L + 6 * 3003L)
    assert(v.cc_errors == 0 && a.cc_errors == 0)
  }

  test("33-bit PTS survives the marker-bit coding at the extremes") {
    Seq(0L, 1L, (1L << 32) + 12345L, (1L << 33) - 1L).foreach { pts =>
      val ts = Multimodal.syntheticMpegTs(2L, videoPes = 1, audioPes = 0,
        ptsBase = pts, ptsDelta = 0L)
      val v = Multimodal.parseMpegTs(2L, ts).head
      assert(v.first_pts == pts, s"pts=$pts")
    }
  }

  test("a dropped continuity counter is exactly one cc_error on the " +
    "affected pid") {
    val ts = Multimodal.syntheticMpegTs(3L, videoPes = 10, audioPes = 4,
      ptsBase = 0L, ptsDelta = 100L, dropVideoCc = true)
    val rows = Multimodal.parseMpegTs(3L, ts)
    assert(rows.find(_.pid == 0x101).get.cc_errors == 1)
    assert(rows.find(_.pid == 0x102).get.cc_errors == 0)
  }

  test("a corrupted PMT CRC or a truncated capture collapses to the " +
    "sentinel; video-only programs work") {
    val ts = Multimodal.syntheticMpegTs(4L, videoPes = 3, audioPes = 0,
      ptsBase = 500L, ptsDelta = 10L)
    val rows = Multimodal.parseMpegTs(4L, ts)
    assert(rows.length == 1 && rows.head.pid == 0x101 && rows.head.ok)
    val corrupt = ts.clone()
    // the writer right-aligns PSI payloads behind adaptation
    // stuffing: flip a byte near the END of the PMT packet (inside
    // the CRC-covered section, not the 0xff stuffing)
    corrupt(2 * 188 - 10) = (corrupt(2 * 188 - 10) ^ 0x01).toByte
    val bad = Multimodal.parseMpegTs(4L, corrupt)
    assert(bad.length == 1 && !bad.head.ok)
    assert(Multimodal.parseMpegTs(4L, ts.take(100)).head.ok == false)
  }

  test("tsAudioAac reassembles PES payloads into the elementary " +
    "stream and the ADTS walk yields the same facts as the bare " +
    "stream — PES chunks deliberately not frame-aligned") {
    val id = 6L
    Seq(97, 300, 184, 1000).foreach { pesChunk =>
      val ts = Multimodal.syntheticMpegTsAac(id, frames = 9,
        profile = 1, rateIdx = 3, channels = 2, pesChunk = pesChunk)
      val a = Multimodal.tsAudioAac(id, ts)
      assert(a.decode_ok, s"pesChunk=$pesChunk")
      val bare = Multimodal.parseAdts(id,
        Multimodal.syntheticAdts(id, 9, 1, 3, 2).content)
      assert(a == bare.copy(media_id = id), s"pesChunk=$pesChunk")
      assert(a.frames == 9L && a.sample_rate == 48000)
    }
    // the inventory still sees both PIDs on the same capture
    val ts = Multimodal.syntheticMpegTsAac(id, 9, 1, 3, 2)
    val inv = Multimodal.parseMpegTs(id, ts)
    assert(inv.map(_.stream_type).toSet == Set(0x1b, 0x0f))
    // malformations route to the sentinel: a lost audio TS packet
    // breaks the ADTS chain; a video-only capture has no AAC PID
    val dropped = {
      val nPkts = ts.length / 188
      val audioPkts = (0 until nPkts).filter { k =>
        val pid = ((ts(k * 188 + 1) & 0x1f) << 8) | (ts(k * 188 + 2) & 0xff)
        pid == 0x102
      }
      val cut = audioPkts(audioPkts.length / 2)
      ts.take(cut * 188) ++ ts.drop((cut + 1) * 188)
    }
    assert(!Multimodal.tsAudioAac(id, dropped).decode_ok)
    val videoOnly = Multimodal.syntheticMpegTs(id, videoPes = 3,
      audioPes = 0, ptsBase = 0L, ptsDelta = 3000L)
    assert(!Multimodal.tsAudioAac(id, videoOnly).decode_ok)
  }
}
