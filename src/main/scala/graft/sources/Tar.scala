package graft.sources

import org.apache.spark.sql.Dataset
import graft.multimodal.Multimodal.MediaBlob

/** One archive member: `type_flag` ∈ {"file","dir"}; `digest` = md5
  * hex of the member bytes (files only — the downstream dedup key);
  * a malformed archive yields ONE all-sentinel row with ok=false.
  */
case class TarEntry(media_id: Long, entry_no: Int, name: String,
                    size: Long, type_flag: String, digest: String,
                    ok: Boolean)

/** USTAR (POSIX tar) member walk — the OTHER crawl envelope next to
  * [[Warc]]: corpus dumps and model-data drops ship as tarballs, and
  * a 100 TB ingest wants the member inventory (names, sizes, content
  * digests) without untarring to a filesystem. Pure header
  * arithmetic — 512-byte blocks, octal size fields, checksum over a
  * spaced-out chksum field — one partition-local pass, blobs never
  * shuffle. Any bound violation, bad magic, unparseable octal or
  * checksum mismatch is a ROW property (a single ok=false row), never
  * a task failure.
  */
object Tar {

  private val BadEntry = TarEntry(0L, 0, "", -1L, "", "", ok = false)

  def parse(id: Long, bytes: Array[Byte]): Seq[TarEntry] = {
    def bad = Seq(BadEntry.copy(media_id = id))
    val out = Seq.newBuilder[TarEntry]
    var off = 0
    var no = 0
    var done = false
    while (!done) {
      if (off + 512 > bytes.length) return bad
      var allZero = true
      var i = 0
      while (allZero && i < 512) {
        if (bytes(off + i) != 0) allZero = false; i += 1
      }
      if (allZero) done = true
      else {
        // magic "ustar" at 257 ("ustar\0" POSIX or "ustar " GNU)
        if (!(bytes(off + 257) == 'u' && bytes(off + 258) == 's' &&
          bytes(off + 259) == 't' && bytes(off + 260) == 'a' &&
          bytes(off + 261) == 'r')) return bad
        def str(at: Int, len: Int): String = {
          var end = at
          while (end < at + len && bytes(off + end) != 0) end += 1
          new String(bytes, off + at, end - at, "US-ASCII")
        }
        def octal(at: Int, len: Int): Long = {
          val s = str(at, len).trim
          if (s.isEmpty || !s.forall(c => c >= '0' && c <= '7')) -1L
          else java.lang.Long.parseLong(s, 8)
        }
        val size = octal(124, 12)
        val stored = octal(148, 8)
        if (size < 0 || stored < 0) return bad
        // checksum: header bytes summed with the chksum field spaced
        var sum = 0L
        i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) 0x20
            else bytes(off + i) & 0xff)
          i += 1
        }
        if (sum != stored) return bad
        val flag = bytes(off + 156)
        val name = str(0, 100)
        val dataStart = off + 512
        val padded = ((size + 511) / 512) * 512
        if (size > 0 && dataStart + size > bytes.length) return bad
        if (flag == '5') out += TarEntry(id, no, name, 0L, "dir", "",
          ok = true)
        else if (flag == '0' || flag == 0) {
          val md = java.security.MessageDigest.getInstance("MD5")
          md.update(bytes, dataStart, size.toInt)
          val digest = md.digest().map("%02x".format(_)).mkString
          out += TarEntry(id, no, name, size, "file", digest, ok = true)
        }
        // other typeflags (links, pax headers) skipped, not errors
        no += 1
        off = dataStart + padded.toInt
      }
    }
    val r = out.result()
    if (r.isEmpty) bad else r
  }

  /** Partition-wise member walk — the [[Warc.records]] contract. */
  def entries(blobs: Dataset[MediaBlob]): Dataset[TarEntry] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap(b => parse(b.media_id, b.content)))
  }

  /** Genuine USTAR archive: correct octal fields, checksums, 512-byte
    * padding, two terminating zero blocks — any tar tool lists it.
    * A member named with a trailing '/' is written as a directory.
    */
  def synthetic(id: Long,
                members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, data) =>
      val isDir = name.endsWith("/")
      val hdr = new Array[Byte](512)
      val nb = name.getBytes("US-ASCII")
      System.arraycopy(nb, 0, hdr, 0, math.min(nb.length, 100))
      def put(at: Int, s: String): Unit = {
        val b = s.getBytes("US-ASCII")
        System.arraycopy(b, 0, hdr, at, b.length)
      }
      put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
      put(124, f"${if (isDir) 0 else data.length}%011o")
      put(136, "00000000000")
      hdr(156) = if (isDir) '5' else '0'
      put(257, "ustar"); put(263, "00")
      java.util.Arrays.fill(hdr, 148, 156, 0x20.toByte)
      var sum = 0L
      hdr.foreach(b => sum += b & 0xff)
      put(148, f"$sum%06o")
      hdr(155) = 0x20
      out.write(hdr)
      if (!isDir && data.nonEmpty) {
        out.write(data)
        val pad = ((data.length + 511) / 512) * 512 - data.length
        out.write(new Array[Byte](pad))
      }
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }
}
