package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** `brand` = ftyp major brand; `duration_ms` from mvhd
  * duration/timescale (floor); `width`/`height` from the FIRST tkhd
  * with nonzero 16.16 dims (the video track — audio tkhd carries
  * zeros); `codec` = the first stsd sample-entry 4CC in track order.
  */
case class Mp4Meta(media_id: Long, brand: String, timescale: Int,
                   duration_ms: Long, n_tracks: Int, width: Int,
                   height: Int, codec: String, decode_ok: Boolean)

/** MP4 / ISO-BMFF: box walk (ftyp/mvhd/tkhd/stsd) and a genuine minimal writer.
  *
  * One slice of [[Multimodal]] (mixed in there; call sites use
  * `Multimodal.*`) — split per codec for reviewability, no behavior
  * change.
  */
private[multimodal] trait Mp4Codec extends Serializable {
  // MP4 / ISO-BMFF: the metadata video leg. Y4M is an interchange
  // format; 100 TB crawl video is MP4/MOV. A box walk (ftyp brand,
  // moov/mvhd timescale+duration, trak/tkhd dims, stsd sample-entry
  // 4CC) needs NO codec decode and makes dispatch honest on real
  // video columns — the parseJpeg pattern: Long-checked bounds, any
  // truncation or impossible size is a row property.
  // ------------------------------------------------------------------


  private val BadMp4 =
    Mp4Meta(0L, "", -1, -1L, -1, -1, -1, "", decode_ok = false)

  /** ISO-BMFF box walk, metadata only. Box sizes are read as unsigned
    * (64-bit `largesize` honored, `size = 0` extends to the enclosing
    * end) and every bound is validated BEFORE use: a header past the
    * parent, a size smaller than its own header, or a payload past the
    * buffer routes the whole blob to decode_ok=false — truncated
    * crawl video must be a row property, never an
    * ArrayIndexOutOfBounds in a task.
    */
  def parseMp4(id: Long, bytes: Array[Byte]): Mp4Meta = {
    val n = bytes.length.toLong
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def ascii(i: Int, len: Int): String =
      new String(bytes, i, len, "US-ASCII")

    var brand = ""; var timescale = -1; var durMs = -1L
    var tracks = 0; var w = -1; var h = -1; var codec = ""
    var bad = false

    def walk(start: Long, end: Long)(
        f: (String, Long, Long) => Unit): Unit = {
      var off = start
      while (off < end && !bad) {
        if (off + 8 > end) { bad = true; return }
        var size = u32(off.toInt)
        val typ = ascii(off.toInt + 4, 4)
        var hdr = 8L
        if (size == 1L) {
          if (off + 16 > end) { bad = true; return }
          size = u64(off.toInt + 8); hdr = 16L
        } else if (size == 0L) size = end - off
        if (size < hdr || size > end - off) { bad = true; return }
        f(typ, off + hdr, off + size)
        off += size
      }
    }

    if (n < 8) return BadMp4.copy(media_id = id)
    walk(0L, n) { (t, s, e) =>
      t match {
        case "ftyp" =>
          if (e - s >= 4) brand = ascii(s.toInt, 4) else bad = true
        case "moov" => walk(s, e) { (t2, s2, e2) =>
          t2 match {
            case "mvhd" =>
              val ver = if (e2 - s2 >= 1) bytes(s2.toInt) & 0xff else -1
              if (ver == 1 && e2 - s2 >= 32) {
                val ts = u32(s2.toInt + 20)
                if (ts > 0 && ts <= Int.MaxValue) {
                  timescale = ts.toInt
                  durMs = u64(s2.toInt + 24) * 1000L / ts
                } else bad = true
              } else if (ver == 0 && e2 - s2 >= 20) {
                val ts = u32(s2.toInt + 12)
                if (ts > 0 && ts <= Int.MaxValue) {
                  timescale = ts.toInt
                  durMs = u32(s2.toInt + 16) * 1000L / ts
                } else bad = true
              } else bad = true
            case "trak" =>
              tracks += 1
              walk(s2, e2) { (t3, s3, e3) =>
                t3 match {
                  case "tkhd" =>
                    if (e3 - s3 >= 8) {
                      val tw = (u32((e3 - 8).toInt) >> 16).toInt
                      val th = (u32((e3 - 4).toInt) >> 16).toInt
                      if (tw > 0 && th > 0 && w < 0) { w = tw; h = th }
                    } else bad = true
                  case "mdia" => walk(s3, e3) { (t4, s4, e4) =>
                    if (t4 == "minf") walk(s4, e4) { (t5, s5, e5) =>
                      if (t5 == "stbl") walk(s5, e5) { (t6, s6, e6) =>
                        if (t6 == "stsd") {
                          if (e6 - s6 >= 16) {
                            if (codec.isEmpty)
                              codec = ascii(s6.toInt + 12, 4)
                          } else bad = true
                        }
                      }
                    }
                  }
                  case _ =>
                }
              }
            case _ =>
          }
        }
        case _ => // mdat, free, skip...
      }
    }
    if (bad || brand.isEmpty || timescale <= 0)
      BadMp4.copy(media_id = id)
    else Mp4Meta(id, brand, timescale, durMs, tracks, w, h, codec,
      decode_ok = true)
  }

  /** Partition-wise MP4 metadata decode — the [[decodeWav]] contract:
    * one parser pass per partition, blobs never shuffle.
    */
  def decodeMp4(blobs: Dataset[MediaBlob]): Dataset[Mp4Meta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => parseMp4(b.media_id, b.content)))
  }

  /** Genuine minimal ISO-BMFF file: ftyp + moov(mvhd + video trak
    * (tkhd dims + mdia/minf/stbl/stsd sample entry) [+ audio trak]) +
    * a small mdat. `v1` emits the 64-bit mvhd form. Deterministic per
    * id; any box-walking tool reads it back.
    */
  def syntheticMp4(id: Long, brand: String, timescale: Int,
                   duration: Long, width: Int, height: Int,
                   codec: String, v1: Boolean = false,
                   audioTrack: Boolean = false): MediaBlob = {
    require(timescale > 0 && duration >= 0 && width > 0 && height > 0)
    require(brand.length == 4 && codec.length == 4)
    def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
      val len = 8 + parts.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len).put(typ.getBytes("US-ASCII"))
      parts.foreach(bb.put)
      bb.array()
    }
    val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(12)
      .put(brand.getBytes("US-ASCII")).putInt(0)
      .put(brand.getBytes("US-ASCII")).array())
    val mvhdBody =
      if (v1) {
        val bb = java.nio.ByteBuffer.allocate(4 + 16 + 12 + 80)
        bb.put(1.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        bb.putLong(0L).putLong(0L)           // creation, modification
        bb.putInt(timescale).putLong(duration)
        bb.putInt(0x00010000).putShort(0x0100.toShort) // rate, volume
        bb.array()                            // rest zeros (matrix...)
      } else {
        val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 + 80)
        bb.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        bb.putInt(0).putInt(0)
        bb.putInt(timescale).putInt(duration.toInt)
        bb.putInt(0x00010000).putShort(0x0100.toShort)
        bb.array()
      }
    def tkhd(trackId: Int, tw: Int, th: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.put(0.toByte).put(0.toByte).put(0.toByte).put(7.toByte)
      bb.putInt(0).putInt(0).putInt(trackId).putInt(0)
      bb.putInt(duration.toInt)
      bb.position(bb.position() + 52)        // reserved/layer/matrix
      bb.putInt(tw << 16).putInt(th << 16)   // 16.16 fixed
      box("tkhd", bb.array())
    }
    def stsdTrak(trackId: Int, tw: Int, th: Int,
                 fmt: String): Array[Byte] = {
      val entry = java.nio.ByteBuffer.allocate(16)
        .putInt(16).put(fmt.getBytes("US-ASCII"))
        .putInt(0).putInt(0).array()
      val stsd = box("stsd", java.nio.ByteBuffer.allocate(8)
        .putInt(0).putInt(1).array(), entry)
      box("trak", tkhd(trackId, tw, th),
        box("mdia", box("minf", box("stbl", stsd))))
    }
    val traks =
      if (audioTrack)
        // audio tkhd carries zero 16.16 dims by spec — the parser's
        // "first NONZERO dims win" rule is what this exercises
        Seq(stsdTrak(1, width, height, codec),
          stsdTrak(2, 0, 0, "mp4a"))
      else Seq(stsdTrak(1, width, height, codec))
    val moov = box("moov", box("mvhd", mvhdBody) +: traks: _*)
    val mdat = box("mdat", Array.tabulate[Byte](16)(i =>
      ((id * 31 + i) & 0xff).toByte))
    val all = ftyp ++ moov ++ mdat
    MediaBlob(id, "video/mp4", all)
  }

}
