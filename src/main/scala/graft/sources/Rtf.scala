package graft.sources

/** Minimal clean-room RTF 1.x text extractor (Microsoft's published
  * Rich Text Format spec; reference behavior: briefly ingests crawl
  * documents as opaque text — RTF is one of the long-tail office
  * formats a heterogeneous corpus column carries).
  *
  * Supported subset — the part that determines PLAIN TEXT:
  *  - group nesting `{}` with state inheritance
  *  - control words `\word[-]N` with the spec's one-optional-space
  *    delimiter rule; unknown words are ignored (their group is kept)
  *  - destination groups are SKIPPED: the generic `{\*\...}` form and
  *    the common named destinations (fonttbl, colortbl, stylesheet,
  *    info, pict, header, footer, generator)
  *  - `\par` and `\line` → paragraph / line break; `\tab` → tab
  *  - `\'hh` hex escapes (cp1252 ≈ latin-1 for the bytes we emit)
  *  - `\uN` unicode escapes with the `\ucN` fallback-skip protocol
  *  - `\{ \} \\` literal escapes; raw CR/LF in the source is ignored
  *    (RTF writers wrap lines freely)
  *
  * Anything outside the subset degrades safely: unknown control words
  * drop, unknown destinations keep their text only when not in the
  * skip list — same failure envelope as every shipping extractor.
  */
object Rtf {

  private val SkipDestinations = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict",
    "header", "footer", "generator", "themedata", "datastore")

  /** Extract plain text paragraphs (split on `\par`, empties dropped).
    * None when the blob is not RTF (`{\rtf` prefix) or groups are
    * unbalanced past the root.
    */
  def extractParagraphs(bytes: Array[Byte]): Option[Seq[String]] = {
    val s = new String(bytes, "ISO-8859-1")
    if (!s.startsWith("{\\rtf")) return None
    val text = new StringBuilder
    var i = 0
    var depth = 0
    // destination skipping: depth at which a skipped group started
    // (-1 = not skipping); \ucN is group-scoped, tracked by a stack
    var skipAt = -1
    var ucStack = List(1)
    var uc = 1
    var pendingUcSkip = 0
    def emit(c: Char): Unit = {
      if (skipAt < 0) {
        if (pendingUcSkip > 0) pendingUcSkip -= 1
        else text.append(c)
      }
    }
    while (i < s.length) {
      s(i) match {
        case '{' =>
          depth += 1; ucStack = uc :: ucStack; i += 1
          // the {\* form marks ANY destination — skip unless already
          if (skipAt < 0 && i + 1 < s.length && s(i) == '\\' &&
            s(i + 1) == '*') skipAt = depth
        case '}' =>
          if (depth == 0) return None
          if (skipAt == depth) skipAt = -1
          depth -= 1
          ucStack match {
            case h :: t if t.nonEmpty => uc = h; ucStack = t
            case _ => ()
          }
          i += 1
        case '\\' if i + 1 < s.length =>
          val c = s(i + 1)
          if (c == '{' || c == '}' || c == '\\') { emit(c); i += 2 }
          else if (c == '\'') {
            if (i + 3 < s.length) {
              val hex = s.substring(i + 2, i + 4)
              try emit(Integer.parseInt(hex, 16).toChar)
              catch { case _: NumberFormatException => () }
              i += 4
            } else i = s.length
          } else if (c == '*') { i += 2 } // handled at group open
          else if (c == '~') { emit(' '); i += 2 }
          else if (c.isLetter) {
            var j = i + 1
            while (j < s.length && s(j).isLetter) j += 1
            val word = s.substring(i + 1, j)
            var k = j
            var neg = false
            if (k < s.length && s(k) == '-') { neg = true; k += 1 }
            var param = 0L
            var hasParam = false
            while (k < s.length && s(k).isDigit) {
              param = param * 10 + (s(k) - '0'); hasParam = true; k += 1
            }
            if (neg) param = -param
            // the spec's delimiter: ONE space after the word is part
            // of the control, not text
            if (k < s.length && s(k) == ' ') k += 1
            word match {
              case "par" | "line" => emit('\n')
              case "tab" => emit('\t')
              case "uc" => if (hasParam) uc = param.toInt.max(0)
              case "u" =>
                if (hasParam) {
                  val cp = if (param < 0) param + 65536 else param
                  emit(cp.toChar)
                  // the NEXT uc chars are the ANSI fallback — skip
                  if (skipAt < 0) pendingUcSkip = uc
                }
              case w if SkipDestinations(w) =>
                if (skipAt < 0) skipAt = depth
              case _ => () // formatting word: ignored
            }
            i = k
          } else i += 2 // \<digit>, \; etc — drop
        case '\r' | '\n' => i += 1 // writers wrap freely; not text
        case ch =>
          emit(ch); i += 1
      }
    }
    Some(text.result().split('\n').toSeq.filter(_.nonEmpty))
  }

  /** Deterministic RTF writer for fixtures: a header with a fonttbl
    * and a `{\*\generator}` destination (both must be skipped), then
    * each paragraph terminated by `\par`, with every '-' encoded as a
    * `\'2d` hex escape so the escape path sits under the oracle.
    */
  def synthetic(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map { p =>
      p.flatMap {
        case '-' => "\\'2d"
        case '\\' | '{' | '}' => "" // keep fixtures in the simple set
        case c => c.toString
      } + "\\par "
    }.mkString
    ("{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Times New Roman;}}" +
      "{\\*\\generator graft 1.0;}\\f0\\fs24 " + body + "}")
      .getBytes("ISO-8859-1")
  }
}
