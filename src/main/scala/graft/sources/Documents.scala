package graft.sources

import org.apache.spark.sql.Dataset
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaBlob

/** One document-column row: `kind` ∈ {"pdf", "epub", "docx", "html",
  * "zip", ""}; `n_units` counts the format's natural text unit
  * (pages / chapters / paragraphs / 1), `n_chars` total extracted
  * characters. A recognized container whose body fails keeps its kind
  * with ok=false; an unrecognized blob is the "" sentinel.
  */
case class DocText(media_id: Long, kind: String, n_units: Long,
                   n_chars: Long, ok: Boolean)

/** Heterogeneous DOCUMENT dispatch — the text-corpus capstone the way
  * the envelope dispatch is for archives: one crawl column carries
  * PDFs next to EPUBs next to DOCX next to raw HTML, and the curation
  * funnel wants (kind, units, chars) per blob in ONE partition-wise
  * pass. Routing is sniff-shaped: `%PDF-` → the scan-based page
  * extractor; `PK..` → ZIP, then `word/document.xml` claims DOCX and
  * `META-INF/container.xml` claims EPUB (a ZIP that is neither stays
  * `kind=zip, ok=false` — an archive, not a document); a leading `<`
  * (after whitespace/BOM) → HTML main-text. Each leg reuses its
  * dedicated extractor verbatim — this operator adds only the
  * routing, so every format fact here is already under its own
  * oracle (q200/q202/q203).
  */
object Documents {

  private val Bad = DocText(0L, "", -1L, -1L, ok = false)

  def docTextOne(id: Long, bytes: Array[Byte]): DocText = {
    if (bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-') {
      Multimodal.pdfExtractPages(bytes) match {
        case Some(pages) =>
          DocText(id, "pdf", pages.length.toLong,
            pages.map(_._2.length.toLong).sum, ok = true)
        case None => DocText(id, "pdf", -1L, -1L, ok = false)
      }
    } else if (bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K' &&
      bytes(2) == 3 && bytes(3) == 4) {
      val names = scala.collection.mutable.Set.empty[String]
      val entries = Zip.parse(id, bytes, onMember = (n, _) => names += n)
      if (entries.length == 1 && !entries.head.ok)
        DocText(id, "zip", -1L, -1L, ok = false)
      else if (names("word/document.xml")) {
        val paras = Docx.parse(id, bytes)
        if (paras.forall(_.ok))
          DocText(id, "docx", paras.length.toLong,
            paras.map(_.n_chars).sum, ok = true)
        else DocText(id, "docx", -1L, -1L, ok = false)
      } else if (names("META-INF/container.xml")) {
        val chapters = Epub.parse(id, bytes)
        if (chapters.forall(_.ok))
          DocText(id, "epub", chapters.length.toLong,
            chapters.map(_.n_chars).sum, ok = true)
        else DocText(id, "epub", -1L, -1L, ok = false)
      } else DocText(id, "zip", -1L, -1L, ok = false)
    } else {
      val text = new String(bytes, "UTF-8")
      val trimmed = text.dropWhile(c => c.isWhitespace || c == '\ufeff')
      if (trimmed.startsWith("<")) {
        val main = Epub.stripHtml(trimmed)
        DocText(id, "html", 1L, main.length.toLong, ok = true)
      } else Bad.copy(media_id = id)
    }
  }

  /** Partition-wise document dispatch — the [[Tar.entries]] contract */
  def docTextDispatch(blobs: Dataset[MediaBlob]): Dataset[DocText] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => docTextOne(b.media_id, b.content)))
  }
}
