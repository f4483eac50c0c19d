package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** MP4/ISO-BMFF sample-table expansion: stsc×stsz×stco/co64 →
  * per-sample byte locations, stss keyframe marking, and the
  * row-property failure contract.
  */
class Mp4SampleSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def expectedSizes(id: Long): Array[Int] =
    Array.tabulate(12)(k => 20 + ((id * 7 + k * 13) % 40).toInt)

  test("syntheticMp4WithSamples expands to 12 located samples whose " +
    "offsets point at the real payload bytes; moov size is the " +
    "pinned constant (mdat base 496)") {
    for (id <- Seq(0L, 1L, 2L, 17L, 149L)) {
      val b = Multimodal.syntheticMp4WithSamples(id)
      val rows = Multimodal.parseMp4Samples(id, b.content)
      assert(rows.length == 12)
      val sizes = expectedSizes(id)
      val g = 2 + (id % 3).toInt
      var expOff = 496L
      rows.zipWithIndex.foreach { case (r, k) =>
        assert(r.track_id == 1 && r.sample_no == k + 1)
        assert(r.size == sizes(k), s"id=$id k=$k")
        assert(r.offset == expOff, s"id=$id k=$k")
        assert(r.chunk_no == (if (k < 3) 1 else if (k < 6) 2
          else if (k < 8) 3 else if (k < 10) 4 else 5))
        assert(r.keyframe ==
          Set(1, 1 + g, 1 + 2 * g).contains(k + 1), s"id=$id k=$k")
        // the offset really addresses the sample's first byte
        assert((b.content(r.offset.toInt) & 0xff) ==
          ((id * 31 + k * 7) & 0xff).toInt, s"id=$id k=$k payload")
        expOff += r.size
      }
      // co64 form locates identically
      val b64v = Multimodal.syntheticMp4WithSamples(id, co64 = true)
      val rows64 = Multimodal.parseMp4Samples(id, b64v.content)
      assert(rows64.map(r => (r.sample_no, r.chunk_no, r.size,
        r.keyframe)) == rows.map(r => (r.sample_no, r.chunk_no,
        r.size, r.keyframe)))
      // co64 moov is larger, so offsets shift by the box growth (4
      // bytes per chunk entry) but stay payload-consistent
      rows64.foreach { r =>
        assert((b64v.content(r.offset.toInt) & 0xff) ==
          ((id * 31 + (r.sample_no - 1) * 7) & 0xff).toInt)
      }
      // parseMp4 still reads the metadata off the same blob
      val meta = Multimodal.parseMp4(id, b.content)
      assert(meta.decode_ok && meta.codec == "avc1" &&
        meta.n_tracks == 1)
    }
  }

  test("no stss box means every sample is a keyframe; uniform stsz " +
    "expands without a size table") {
    // hand-build a minimal one-track table: 4 samples of 10 bytes in
    // 2 chunks of 2, no stss
    def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
      val len = 8 + parts.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len).put(typ.getBytes("US-ASCII"))
      parts.foreach(bb.put)
      bb.array()
    }
    def ints(vs: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(bb.putInt)
      bb.array()
    }
    val tkhd = box("tkhd", ints(7, 0, 0, 9, 0) ++ new Array[Byte](64))
    val stbl = box("stbl",
      box("stsc", ints(0, 1, 1, 2, 1)),
      box("stsz", ints(0, 10, 4)),            // uniform size 10
      box("stco", ints(0, 2, 100, 120)))
    val trak = box("trak", tkhd,
      box("mdia", box("minf", stbl)))
    val file = box("moov", trak) ++ new Array[Byte](200)
    val rows = Multimodal.parseMp4Samples(5L, file)
    assert(rows.length == 4)
    assert(rows.forall(_.keyframe))
    assert(rows.forall(_.size == 10L))
    assert(rows.map(_.offset) == Seq(100L, 110L, 120L, 130L))
    assert(rows.map(_.chunk_no) == Seq(1, 1, 2, 2))
    assert(rows.forall(_.track_id == 9))
  }

  test("malformation is a row property: truncation, out-of-order " +
    "stsc runs, counts past the table — zero rows, never a throw") {
    val good = Multimodal.syntheticMp4WithSamples(3L).content
    assert(Multimodal.parseMp4Samples(3L, good.take(40)).isEmpty)
    assert(Multimodal.parseMp4Samples(3L, good.take(200)).isEmpty)
    assert(Multimodal.parseMp4Samples(3L, Array.emptyByteArray).isEmpty)
    // corrupt the stsc first_chunk of the second run to descend
    val idx = {
      // find "stsc" 4CC
      (0 until good.length - 4).find(i =>
        good(i) == 's' && good(i + 1) == 't' && good(i + 2) == 's' &&
          good(i + 3) == 'c').get
    }
    val bad = good.clone()
    // second run's first_chunk field: 4CC + ver/flags(4) + count(4) +
    // run1(12) + 3 bytes → set to 0 (< run1's 1)
    bad(idx + 4 + 8 + 12 + 3) = 0.toByte
    assert(Multimodal.parseMp4Samples(3L, bad).isEmpty)
  }

  test("mp4SampleTable is partition-wise over a blob Dataset") {
    import spark.implicits._
    val blobs = (0L until 6L).map { id =>
      val b = Multimodal.syntheticMp4WithSamples(id)
      if (id == 4L) b.copy(content = b.content.take(30)) else b
    }.toDS()
    val rows = Multimodal.mp4SampleTable(blobs).collect()
    assert(rows.length == 5 * 12)
    assert(!rows.exists(_.media_id == 4L))
  }

  test("parseMp4Aac composes esds AudioSpecificConfig + sample table " +
    "down to codec rows: frames, exact duration, sliced payload sum") {
    val id = 9L
    val blob = Multimodal.syntheticMp4Aac(id, nFrames = 10, aot = 2,
      rateIdx = 4, channels = 2) // 44100
    val a = Multimodal.parseMp4Aac(id, blob.content)
    assert(a.decode_ok)
    assert(a.object_type == 2 && a.sample_rate == 44100 &&
      a.channels == 2 && a.n_frames == 10L)
    assert(a.duration_ms == 10L * 1024 * 1000 / 44100)
    // payload sum replays the writer's id-derived byte formula
    var expect = 0L
    (0 until 10).foreach { k =>
      val sz = 24 + ((id * 11 + k * 17) % 48).toInt
      (0 until sz).foreach(i => expect += (id * 37 + k * 13 + i) & 0xff)
    }
    assert(a.payload_sum == expect)
    // odd rate index exercises the ASC bit split across bytes
    val b7 = Multimodal.syntheticMp4Aac(3L, 5, aot = 2, rateIdx = 7,
      channels = 1) // 22050
    val a7 = Multimodal.parseMp4Aac(3L, b7.content)
    assert(a7.decode_ok && a7.sample_rate == 22050 && a7.channels == 1)
    // a video trak in the same moov must NOT leak into the AAC
    // facts: identical rows with and without it (track-id scoping)
    val mixed = Multimodal.syntheticMp4Aac(id, 10, 2, 4, 2,
      withVideoTrack = true)
    val am = Multimodal.parseMp4Aac(id, mixed.content)
    assert(am == a)
    // ...and the sample table does see both tracks
    val tracks = Multimodal.parseMp4Samples(id, mixed.content)
      .map(_.track_id).toSet
    assert(tracks == Set(1, 2))
    // malformations: truncation, a video-only MP4, a bad rate index
    assert(!Multimodal.parseMp4Aac(id,
      blob.content.take(60)).decode_ok)
    assert(!Multimodal.parseMp4Aac(id,
      Multimodal.syntheticMp4WithSamples(id).content).decode_ok)
    val badRate = blob.content.clone()
    // find the 2-byte ASC right after the 0x05 0x02 descriptor header
    val at = (0 until badRate.length - 4).find(i =>
      badRate(i) == 0x05 && badRate(i + 1) == 0x02).get
    badRate(at + 2) = ((2 << 3) | (14 >> 1)).toByte // rateIdx 14
    badRate(at + 3) = (((14 & 1) << 7) | (2 << 3)).toByte
    assert(!Multimodal.parseMp4Aac(id, badRate).decode_ok)
  }


  test("parseAvif recovers brand/dims/depth/items/av1C from FOREIGN " +
    "AVIF files (independent encoder stack; 4:4:4, 4:2:0, odd dims, " +
    "10-bit), and malformation routes to the sentinel") {
    val fx = graft.multimodal.AvifForeignStreams.all
    val expect = Seq((64, 48, 8), (33, 21, 8), (16, 16, 10))
    fx.zip(expect).foreach { case (f, (w, h, d)) =>
      val bytes = java.util.Base64.getDecoder.decode(f.avifB64)
      assert(Multimodal.sniffFormat(bytes) == "avif")
      val a = Multimodal.parseAvif(9L, bytes)
      assert(a.decode_ok, s"$w x$h rejected")
      assert(a.brand == "avif" && a.width == w && a.height == h)
      assert(a.depth == d && a.n_items == 1 && a.has_av1c)
      assert(!a.animated)
      // dispatch integration: the avif leg carries the same facts
      val dm = Multimodal.dispatchOne(9L, bytes)
      assert(dm.format == "avif" && dm.decode_ok &&
        dm.width == w && dm.height == h && dm.channels == 1 &&
        dm.frames == d)
      // truncation is a row property
      assert(!Multimodal.parseAvif(9L, bytes.take(40)).decode_ok)
    }
    // a plain MP4 must NOT sniff as avif, and parseAvif rejects it
    val mp4 = Multimodal.syntheticMp4WithSamples(1L).content
    assert(Multimodal.sniffFormat(mp4) == "mp4")
    assert(!Multimodal.parseAvif(1L, mp4).decode_ok)
  }
}
