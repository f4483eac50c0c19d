package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Documents, Docx, Epub, Zip}
import graft.multimodal.Multimodal

/** Heterogeneous document dispatch: each kind routes to its extractor,
  * non-document ZIPs and unknown blobs take their sentinels, broken
  * bodies keep their kind with ok=false.
  */
class DocumentsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("routing: pdf, epub, docx, html, plain zip, junk, broken pdf") {
    val pdf = Multimodal.syntheticPdf(1L, Seq(Seq("one"), Seq("two", "3")))
    val r1 = Documents.docTextOne(1L, pdf)
    assert(r1.kind == "pdf" && r1.ok && r1.n_units == 2)
    assert(r1.n_chars == "one\n".length + "two\n3\n".length)

    val epub = Epub.synthetic(2L, Seq(Seq("a", "bb"), Seq("ccc")))
    val r2 = Documents.docTextOne(2L, epub)
    assert(r2.kind == "epub" && r2.ok && r2.n_units == 2)
    assert(r2.n_chars == "a bb".length + "ccc".length)

    val docx = Docx.synthetic(3L, Seq("hello", "world!"))
    val r3 = Documents.docTextOne(3L, docx)
    assert(r3.kind == "docx" && r3.ok && r3.n_units == 2)
    assert(r3.n_chars == 11)

    val html = "﻿ <html><head><script>junk</script></head>" +
      "<body><p>hi</p> <p>there</p></body></html>"
    val r4 = Documents.docTextOne(4L, html.getBytes("UTF-8"))
    assert(r4.kind == "html" && r4.ok && r4.n_units == 1)
    assert(r4.n_chars == "hi there".length)

    val zip = Zip.synthetic(5L,
      Seq(("data.bin", Array[Byte](1, 2, 3), "deflate")))
    val r5 = Documents.docTextOne(5L, zip)
    assert(r5.kind == "zip" && !r5.ok)

    val r6 = Documents.docTextOne(6L, "plain words".getBytes("UTF-8"))
    assert(r6.kind == "" && !r6.ok)

    val r7 = Documents.docTextOne(7L, pdf.take(pdf.length / 2))
    assert(r7.kind == "pdf" && !r7.ok)
  }

  test("docTextDispatch over a mixed blob column") {
    val s = spark
    import s.implicits._
    val blobs = spark.range(0, 10).as[Long].map { id =>
      val b = (id % 3) match {
        case 0 => Multimodal.syntheticPdf(id, Seq(Seq(s"p$id")))
        case 1 => Epub.synthetic(id, Seq(Seq(s"e$id")))
        case _ => Docx.synthetic(id, Seq(s"d$id"))
      }
      Multimodal.MediaBlob(id, "application/octet-stream", b)
    }
    val rows = Documents.docTextDispatch(blobs).collect()
      .sortBy(_.media_id)
    (0L until 10L).foreach { id =>
      val exp = Seq("pdf", "epub", "docx")((id % 3).toInt)
      assert(rows(id.toInt).kind == exp && rows(id.toInt).ok)
      assert(rows(id.toInt).n_units == 1)
    }
  }
}
