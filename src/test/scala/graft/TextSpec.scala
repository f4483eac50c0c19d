package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Golden tests for the scalar text kernels, anchored to the
  * reference's own fixture strings (src/tests/test_embedding.py:4-8,
  * extract_utils.py:63-82).
  */
class TextSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def one(col: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("x").select(col.as("r")).head.getString(0)

  test("slugify folds Vietnamese diacritics and drops spaces") {
    assert(one(Text.slugify($"x"), "Tuổi Trẻ") == "tuoitre")
    assert(one(Text.slugify($"x"), "Thể thao") == "thethao")
    assert(one(Text.slugify($"x"), "Giáo dục") == "giaoduc")
    assert(one(Text.slugify($"x"), "Sức khỏe") == "suckhoe")
    assert(one(Text.slugify($"x"), "Đời sống") == "doisong")
    assert(one(Text.slugify($"x"), "VnExpress") == "vnexpress")
  }

  test("aliasFromTopic takes lowercased initials") {
    assert(one(Text.aliasFromTopic($"x"), "Thể thao") == "tt")
    assert(one(Text.aliasFromTopic($"x"), "Khoa học Công nghệ") == "khcn")
    assert(one(Text.aliasFromTopic($"x"), "  padded   words ") == "pw")
  }

  test("htmlUnescapeTwice decodes double-encoded entities") {
    assert(one(Text.htmlUnescapeTwice($"x"), "Tom &amp;amp; Jerry")
      == "Tom & Jerry")
    assert(one(Text.htmlUnescapeTwice($"x"), "a &amp;lt;b&amp;gt; c")
      == "a <b> c")
    assert(one(Text.htmlUnescapeTwice($"x"), "x &amp; y") == "x & y")
    assert(one(Text.htmlUnescapeTwice($"x"), "plain") == "plain")
  }

  test("cleanText: reference golden — dedup sentences, drop photo credit") {
    // reference test_embedding.py:5-8 golden assertion
    assert(one(Text.cleanText($"x"), "Đây là câu. Đây là câu. Ảnh: Hoài Thanh")
      == "Đây là câu. ")
  }

  test("cleanText collapses whitespace and dot runs") {
    assert(one(Text.cleanText($"x"), "  nhiều   khoảng   trắng  . chấm..câu  ")
      == "nhiều khoảng trắng. chấm. câu. ")
  }

  test("md5Uuid is UUID-shaped and deterministic") {
    val u = one(Text.md5Uuid($"x"), "https://example.com/a")
    assert(u.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
    assert(u == one(Text.md5Uuid($"x"), "https://example.com/a"))
  }

  test("parseDateLenient handles RFC-822 and ISO variants") {
    val df = Seq(
      "Mon, 05 Aug 2024 10:30:00 +0700",
      "2024-08-05T03:30:00Z",
      "2024-08-05 03:30:00",
      "2024-08-05",
      "garbage").toDF("x")
      .select(Text.parseDateLenient($"x").as("ts"))
    val rows = df.collect().map(r => Option(r.get(0)).map(_.toString))
    assert(rows(0).contains("2024-08-05 03:30:00.0")) // +0700 → UTC
    assert(rows(1).contains("2024-08-05 03:30:00.0"))
    assert(rows(2).contains("2024-08-05 03:30:00.0"))
    assert(rows(3).contains("2024-08-05 00:00:00.0"))
    assert(rows(4).isEmpty)
  }

  test("firstImgSrc extracts the first img URL") {
    assert(one(Text.firstImgSrc($"x"),
      """<p>x</p><img alt="a" src="http://a/b.jpg"><img src="http://c.png">""")
      == "http://a/b.jpg")
  }

  test("hrefUrls extracts every anchor target, case-insensitive, " +
    "fragment-stripped, ignoring non-anchor hrefs") {
    val html = """<A HREF="http://a/x">1</A><link href="http://css">
      |<a class=l href='http://b/y#frag'>2</a><a name=z>no href</a>
      |<a data-x="1" href="HTTPS://c/z?q=1">3</a>""".stripMargin
    val r = Seq(html).toDF("x")
      .select(Text.hrefUrls($"x").as("r")).head.getSeq[String](0)
    assert(r == Seq("http://a/x", "http://b/y", "HTTPS://c/z?q=1"))
  }

  test("collocations: hand-computed PMI lift, min-count cut, " +
    "punctuation-split adjacency") {
    import graft.operators.TextAnalysis
    val docs = Seq("New York! new york.", "york city, new york")
      .toDF("text")
    // unigrams: new=3 york=4 city=1, N=8; (new,york)=3 (others 1)
    val rows = TextAnalysis.collocations(docs, "text",
        minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.toSeq == Seq(("new", "york", 3L, 3L, 4L, 2.0)))
  }

  test("summaryBullets splits, trims, drops empties") {
    val r = Seq("a\n\n  b \nc").toDF("x")
      .select(Text.summaryBullets($"x").as("r")).head.getSeq[String](0)
    assert(r == Seq("a", "b", "c"))
  }

  test("cleanSummary strips boilerplate intro and bullets") {
    val in = "Here are the 4 points:\n• first\n- second\n\n\nthird"
    assert(one(Text.cleanSummary($"x"), in) == "first\nsecond\nthird")
  }

  test("viSegment: greedy maximal matching joins lexical compounds, " +
    "longest match wins, unknown syllables pass through") {
    import graft.operators.TextAnalysis
    def seg(s: String): Seq[String] =
      Seq(s).toDF("x").select(TextAnalysis.viSegment($"x").as("w"))
        .head.getSeq[String](0)
    // 2-syllable compounds join; singles pass through
    assert(seg("học sinh giỏi") == Seq("học_sinh", "giỏi"))
    assert(seg("em là sinh viên đại học") ==
      Seq("em", "là", "sinh_viên", "đại_học"))
    // longest match wins over a 2-syllable prefix: "sách giáo khoa"
    // (3) outranks "giáo viên" never forming at position 2
    assert(seg("sách giáo khoa mới") == Seq("sách_giáo_khoa", "mới"))
    // case-insensitive matching, original case preserved in output
    assert(seg("Việt Nam vô địch") == Seq("Việt_Nam", "vô", "địch"))
    // greedy left-to-right: once a compound consumes a syllable the
    // next match starts after it
    assert(seg("công nghệ thông tin") == Seq("công_nghệ", "thông_tin"))
    // whitespace runs collapse; empty → empty
    assert(seg("  thời   gian  ") == Seq("thời_gian"))
    assert(seg("") == Seq.empty)
  }

  test("viSegment null contract: null text yields null (not a crash " +
    "or empty array), matching the other scan-side expressions") {
    import graft.operators.TextAnalysis
    val out = Seq(Some("học sinh"), None).toDF("x")
      .select(TextAnalysis.viSegment($"x").as("w")).collect()
    assert(out(0).getSeq[String](0) == Seq("học_sinh"))
    assert(out(1).isNullAt(0))
  }

  test("bpePieceCount: frozen-vocab merges produce known counts, and " +
    "the Column path equals the JVM twin on varied inputs") {
    import graft.operators.TextAnalysis
    // "the" = th+e→the (1 piece); "and" = an+d→and (1 piece);
    // punctuation and digits are boundaries, never pieces
    assert(TextAnalysis.bpePieces("the and") == 2)
    assert(TextAnalysis.bpePieces("The, AND! 42") == 2)
    assert(TextAnalysis.bpePieces("") == 0)
    assert(TextAnalysis.bpePieces("a") == 1)
    // merges never span word boundaries: "t h" stays two pieces
    assert(TextAnalysis.bpePieces("t h") == 2)
    // a literal '<' in the input cannot forge a piece
    assert(TextAnalysis.bpePieces("<<<>>>") == 0)
    val samples = Seq("the station is internal", "spark window shuffle dup",
      "Ingestion pipelines, 2026!", "", "xyzzy qwrt", "<a><b>")
    val jvm = samples.map(t => TextAnalysis.bpePieces(t))
    val col = samples.toDF("x")
      .select(TextAnalysis.bpePieceCount($"x")).as[Int].collect().toSeq
    assert(col == jvm)
  }

  test("viLexiconFrom loads a lexicon from a table/file with entries " +
    "the built-in lacks, and the cap throws instead of truncating") {
    import graft.operators.TextAnalysis
    // "trí tuệ nhân tạo" (artificial intelligence) is not in the
    // built-in list: unsegmented without the loaded lexicon
    val builtIn = Seq("trí tuệ nhân tạo mới").toDF("x")
      .select(TextAnalysis.viSegment($"x").as("w")).head.getSeq[String](0)
    assert(builtIn == Seq("trí", "tuệ", "nhân", "tạo", "mới"))
    val lexTbl = (TextAnalysis.viLexicon ++
      Seq("trí tuệ nhân tạo", "  ", null)).toDF("entry")
    val loaded = TextAnalysis.viLexiconFrom(lexTbl, "entry")
    val seg = Seq("trí tuệ nhân tạo mới và học sinh").toDF("x")
      .select(TextAnalysis.viSegment($"x", loaded).as("w"))
      .head.getSeq[String](0)
    assert(seg == Seq("trí_tuệ_nhân_tạo", "mới", "và", "học_sinh"))
    // the file form reads one entry per line
    val tmp = java.nio.file.Files.createTempDirectory("graft-vilex")
    val f = tmp.resolve("lex.txt")
    java.nio.file.Files.write(f,
      "trí tuệ nhân tạo\nhọc sinh\n".getBytes("UTF-8"))
    val fromFile = TextAnalysis.viLexiconFromFile(spark, f.toString)
    assert(fromFile.toSet == Set("trí tuệ nhân tạo", "học sinh"))
    // over-cap sources throw — a silently partial dictionary would
    // silently change segmentations
    val err = intercept[IllegalArgumentException] {
      TextAnalysis.viLexiconFrom(lexTbl, "entry", maxEntries = 10)
    }
    assert(err.getMessage.contains("cap"))
  }

  test("viTokenCount budgets on words, not syllables — the chunker's " +
    "G3 token proxy undercounts compounds without it") {
    import graft.operators.TextAnalysis
    val df = Seq("học sinh việt nam yêu khoa học").toDF("x")
    val (vi, ws) = df.select(
        TextAnalysis.viTokenCount($"x").as("vi"),
        TextAnalysis.wsTokenCount($"x").as("ws"))
      .as[(Int, Int)].head()
    assert(ws == 7)
    assert(vi == 4) // học_sinh, việt_nam, yêu, khoa_học
  }

  test("canonicalUrl: scheme-aware ports, www strip, tracking-param " +
    "removal with order preserved, query-emptied trailing slash") {
    import org.apache.spark.sql.functions.col
    def canon(u: String): String =
      Seq(u).toDF("u")
        .select(graft.functions.Text.canonicalUrl(col("u")))
        .head.getString(0)
    // case + www + default port + fragment
    assert(canon("HTTP://WWW.Ex.COM:80/A/b#frag") == "http://ex.com/A/b")
    // https keeps :80 (NOT its default), strips :443
    assert(canon("https://ex.com:80/x") == "https://ex.com:80/x")
    assert(canon("https://ex.com:443/x") == "https://ex.com/x")
    // tracking params go, order of the rest preserved, ? kept
    assert(canon("http://ex.com/p?b=2&utm_source=s&a=1&gclid=g") ==
      "http://ex.com/p?b=2&a=1")
    // utm-only query: ? dropped AND the trailing slash rule fires
    assert(canon("http://ex.com/p/?utm_campaign=c") == "http://ex.com/p")
    // trailing slash BEFORE a surviving query is part of the path
    assert(canon("http://ex.com/p/?a=1") == "http://ex.com/p/?a=1")
    // path case preserved; bare host; fbclid
    assert(canon("http://Ex.com/CaseSensitive") ==
      "http://ex.com/CaseSensitive")
    assert(canon("http://ex.com/?fbclid=z") == "http://ex.com")
    assert(canon("http://ex.com") == "http://ex.com")
  }
}
