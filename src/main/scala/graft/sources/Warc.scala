package graft.sources

import org.apache.spark.sql.Dataset

import graft.multimodal.Multimodal.MediaBlob

/** One parsed WARC record: envelope headers + a payload checksum.
  * `digest` is the payload's lowercase-hex MD5 — exchanges move
  * METADATA, never the payload bytes (the blob-operator contract).
  */
case class WarcRecord(media_id: Long, rec_no: Int, warc_type: String,
                      target_uri: String, content_length: Long,
                      digest: String, ok: Boolean)

/** WARC (ISO 28500) record walk — the crawl SOURCE format itself:
  * 100 TB text pipelines start from WARC/WET archives (the reference
  * fetches live pages one by one, extract_utils.py; at corpus scale
  * the same content arrives as WARC members). Each record is
  * `WARC/x.y` + CRLF headers + empty line + Content-Length payload
  * bytes + CRLF CRLF. The walk is strict: a missing version line, a
  * header without a colon, a bad/absent Content-Length, a payload
  * running past the buffer, or a missing record terminator emits ONE
  * `ok=false` row at the failing record index and stops — truncated
  * archives are a row property, never a task failure, and the records
  * BEFORE the cut still surface.
  *
  * Gzip framing composes upstream: real `.warc.gz` members route
  * through [[graft.multimodal.Multimodal.gunzip]] first.
  */
object Warc {
  private val Bad = WarcRecord(0L, 0, "", "", -1L, "", ok = false)

  def parse(id: Long, bytes: Array[Byte]): Seq[WarcRecord] =
    parseFull(id, bytes).map(_._1)

  /** [[parse]] plus each record's payload bytes (empty for the bad
    * row) — the composition seam for same-pass payload decoding.
    */
  def parseFull(id: Long, bytes: Array[Byte])
      : Seq[(WarcRecord, Array[Byte])] = {
    val out = Seq.newBuilder[(WarcRecord, Array[Byte])]
    def line(at: Int): Option[(String, Int)] = {
      var i = at
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) None
      else Some((new String(bytes, at, i - at, "UTF-8"), i + 2))
    }
    var off = 0
    var rec = 0
    var done = false
    while (!done && off < bytes.length) {
      var ok = true
      var wtype = ""; var uri = ""; var clen = -1L
      line(off) match {
        case Some((v, afterVersion)) if v.startsWith("WARC/") =>
          var p = afterVersion
          var headersDone = false
          while (ok && !headersDone) {
            line(p) match {
              case Some(("", nx)) => headersDone = true; p = nx
              case Some((h, nx)) =>
                val ci = h.indexOf(':')
                if (ci < 0) ok = false
                else {
                  h.substring(0, ci).trim.toLowerCase match {
                    case "warc-type" => wtype = h.substring(ci + 1).trim
                    case "warc-target-uri" =>
                      uri = h.substring(ci + 1).trim
                    case "content-length" =>
                      clen = try h.substring(ci + 1).trim.toLong
                      catch { case _: NumberFormatException => -1L }
                    case _ => // WARC-Record-ID, WARC-Date, ...
                  }
                  p = nx
                }
              case None => ok = false
            }
          }
          // payload + the CRLFCRLF record terminator, bounds first
          if (ok && (clen < 0 || p.toLong + clen + 4 > bytes.length))
            ok = false
          if (ok) {
            val t = (p + clen).toInt
            if (bytes(t) != '\r' || bytes(t + 1) != '\n' ||
              bytes(t + 2) != '\r' || bytes(t + 3) != '\n') ok = false
            else {
              val payload = java.util.Arrays.copyOfRange(bytes, p, t)
              val md = java.security.MessageDigest.getInstance("MD5")
              val hex = md.digest(payload).map("%02x".format(_)).mkString
              out += ((WarcRecord(id, rec, wtype, uri, clen, hex,
                ok = true), payload))
              off = t + 4
              rec += 1
            }
          }
          if (!ok) {
            out += ((Bad.copy(media_id = id, rec_no = rec),
              Array.emptyByteArray))
            done = true
          }
        case _ =>
          out += ((Bad.copy(media_id = id, rec_no = rec),
            Array.emptyByteArray))
          done = true
      }
    }
    val res = out.result()
    if (res.isEmpty) Seq((Bad.copy(media_id = id), Array.emptyByteArray))
    else res
  }

  /** Partition-wise record walk — one parser pass per partition,
    * archives never shuffle; one output row per record.
    */
  def records(blobs: Dataset[MediaBlob]): Dataset[WarcRecord] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap(b => parse(b.media_id, b.content)))
  }

  /** The WET ingest capstone row: envelope metadata + the payload
    * decoded through [[graft.multimodal.Multimodal.detectAndDecodeText]]
    * — `digest` hashes the decoded text's UTF-8 re-encoding (NOT the
    * raw payload; a Latin-1 and a UTF-8 spelling of the same text
    * hash identically here).
    */
  case class WarcTextRecord(media_id: Long, rec_no: Int,
                            warc_type: String, target_uri: String,
                            encoding: String, n_chars: Long,
                            digest: String, ok: Boolean)

  /** Gzip-unwrap (if framed) → record walk → per-payload charset
    * detect+decode, all in ONE partition-local pass — payload bytes
    * never cross an operator boundary, never shuffle, and are freed
    * record by record. This is the honest 100 TB WET-ingest shape: a
    * .warc.gz column in, decoded-text metadata out.
    */
  def textRecords(blobs: Dataset[MediaBlob]): Dataset[WarcTextRecord] = {
    import blobs.sparkSession.implicits._
    val m = graft.multimodal.Multimodal
    blobs.mapPartitions(_.flatMap { b =>
      val raw =
        if (m.sniffFormat(b.content) == "gzip")
          m.gunzip(b.content).orNull
        else b.content
      if (raw == null)
        Seq(WarcTextRecord(b.media_id, 0, "", "", "", -1L, "",
          ok = false))
      else parseFull(b.media_id, raw).map { case (r, payload) =>
        if (!r.ok)
          WarcTextRecord(b.media_id, r.rec_no, "", "", "", -1L, "",
            ok = false)
        else {
          val tb = m.detectAndDecodeText(b.media_id, payload)
          WarcTextRecord(b.media_id, r.rec_no, r.warc_type,
            r.target_uri, tb.encoding, tb.n_chars, tb.digest,
            ok = tb.decode_ok)
        }
      }
    })
  }

  /** Genuine minimal WARC archive from explicit records
    * (type, target-uri, payload bytes). Any WARC tool reads it back.
    */
  def syntheticRecords(id: Long,
                       recs: Seq[(String, String, Array[Byte])])
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    recs.zipWithIndex.foreach { case ((wtype, uri, payload), r) =>
      val hdr = "WARC/1.0\r\n" +
        s"WARC-Type: $wtype\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"WARC-Record-ID: <urn:uuid:$id-$r>\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n"
      bos.write(hdr.getBytes("UTF-8"))
      bos.write(payload)
      bos.write("\r\n\r\n".getBytes("UTF-8"))
    }
    bos.toByteArray
  }

  /** Deterministic n-record archive with closed-form payloads —
    * [[syntheticRecords]] specialized for the q158 fixture.
    */
  def synthetic(id: Long, nRecords: Int): Array[Byte] = {
    val types = Array("response", "request", "metadata")
    syntheticRecords(id, (0 until nRecords).map { r =>
      (types(r % 3), s"http://ex.com/$id/$r",
        (("payload-" + id + "-" + r + ";") *
          (1 + ((id + r) % 5)).toInt).getBytes("UTF-8"))
    })
  }
}
