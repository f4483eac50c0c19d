package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Decoded-text row. `encoding` ∈ utf-8 / utf-16le / utf-16be /
  * latin-1 (empty string for empty input, decode_ok=false);
  * `n_chars` counts BMP chars (= codepoints for the web's working
  * set); `digest` is MD5 over the UTF-8 re-encoding.
  */
case class TextBlob(media_id: Long, encoding: String,
                    has_bom: Boolean, n_chars: Long, digest: String,
                    decode_ok: Boolean)

/** Charset detection + decode: BOM, strict UTF-8 validation, Latin-1 fallback.
  *
  * One slice of [[Multimodal]] (mixed in there; call sites use
  * `Multimodal.*`) — split per codec for reviewability, no behavior
  * change.
  */
private[multimodal] trait TextCharsetCodec extends Serializable {
  // Text encoding: crawl text lies about its charset (or says
  // nothing). Detection order is the practical web rule: BOM wins;
  // else strict UTF-8 validation; else Latin-1 (which decodes any
  // byte string). The decoded CONTENT is the cross-engine contract —
  // length + MD5 of the UTF-8 re-encoding — never the raw bytes.
  // ------------------------------------------------------------------


  /** BOM sniff → strict UTF-8 validation (CharsetDecoder REPORT mode
    * — overlong forms, bare surrogates and truncated sequences all
    * fail) → Latin-1 fallback. A UTF-16 stream with a BOM but an odd
    * byte count is malformed and falls through to Latin-1 rather than
    * dropping bytes silently.
    */
  def detectAndDecodeText(id: Long, bytes: Array[Byte]): TextBlob = {
    import java.nio.charset.{CharacterCodingException, StandardCharsets}
    if (bytes.isEmpty)
      return TextBlob(id, "", has_bom = false, -1L, "",
        decode_ok = false)
    def u(i: Int): Int = bytes(i) & 0xff
    def md5utf8(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    def strictUtf8(from: Int): Option[String] =
      try {
        val dec = StandardCharsets.UTF_8.newDecoder()
        Some(dec.decode(java.nio.ByteBuffer
          .wrap(bytes, from, bytes.length - from)).toString)
      } catch { case _: CharacterCodingException => None }
    val (enc, bom, text) =
      if (bytes.length >= 3 && u(0) == 0xef && u(1) == 0xbb &&
        u(2) == 0xbf) {
        strictUtf8(3) match {
          case Some(t) => ("utf-8", true, t)
          case None => ("latin-1", false,
            new String(bytes, StandardCharsets.ISO_8859_1))
        }
      } else if (bytes.length >= 2 && bytes.length % 2 == 0 &&
        u(0) == 0xff && u(1) == 0xfe) {
        ("utf-16le", true, new String(bytes, 2, bytes.length - 2,
          StandardCharsets.UTF_16LE))
      } else if (bytes.length >= 2 && bytes.length % 2 == 0 &&
        u(0) == 0xfe && u(1) == 0xff) {
        ("utf-16be", true, new String(bytes, 2, bytes.length - 2,
          StandardCharsets.UTF_16BE))
      } else strictUtf8(0) match {
        case Some(t) => ("utf-8", false, t)
        case None => ("latin-1", false,
          new String(bytes, StandardCharsets.ISO_8859_1))
      }
    TextBlob(id, enc, bom, text.length.toLong, md5utf8(text),
      decode_ok = true)
  }

  /** Partition-wise charset detection+decode — the [[decodeWav]]
    * contract: blobs never shuffle, output is metadata.
    */
  def decodeTextBlobs(blobs: Dataset[MediaBlob]): Dataset[TextBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b =>
      detectAndDecodeText(b.media_id, b.content)))
  }

}
