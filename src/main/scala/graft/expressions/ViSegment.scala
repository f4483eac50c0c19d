package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vietnamese word segmentation by greedy maximal matching against a
  * compound-word lexicon — the public baseline algorithm behind
  * vnTokenizer-family segmenters (longest-match over a word list; the
  * reference's `ViTokenizer` step, chunk_splitter.py:14-24, adds a
  * statistical layer on top of exactly this backbone). Vietnamese
  * writes one SYLLABLE per space-delimited unit, but the lexical word
  * is often 2-3 syllables ("học sinh" = student); token counting and
  * chunk boundaries computed on raw syllables mis-size both. Output:
  * array of words, multi-syllable matches joined with '_' (the
  * conventional segmented form: "học_sinh").
  *
  * Greedy longest-match, left to right: at each syllable, take the
  * longest lexicon entry (≤ maxN syllables, matched case-insensitively)
  * starting there, else the syllable alone. Scan-side, codegen'd, no
  * shuffle; the lexicon rides as ONE codegen reference object (the
  * NearestCells pattern), not inlined literals.
  */
case class ViSegment(child: Expression, lexicon: Array[String])
    extends UnaryExpression {

  override def prettyName: String = "graft_vi_segment"
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.sql}")
  }

  @transient private lazy val dict: ViSegment.Dict =
    ViSegment.compile(lexicon)

  override def nullSafeEval(v: Any): Any =
    ViSegment.segment(v.asInstanceOf[UTF8String], dict)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.addReferenceObj("viDict", dict,
        classOf[ViSegment.Dict].getName)
      s"${ev.value} = graft.expressions.ViSegment.segment($c, $d);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ViSegment {

  /** Compiled lexicon: lowercase space-joined entries + the longest
    * entry's syllable count (bounds the match window).
    */
  final class Dict(val words: java.util.HashSet[String], val maxN: Int)
    extends Serializable

  def compile(lexicon: Array[String]): Dict = {
    val set = new java.util.HashSet[String]()
    var maxN = 1
    lexicon.foreach { w =>
      // Locale.ROOT: default-locale lowercasing diverges for dotted-I
      // under tr/az JVM locales, flipping matches vs the oracle's
      // locale-independent lower()
      val norm = w.trim.toLowerCase(java.util.Locale.ROOT)
      if (norm.nonEmpty) {
        set.add(norm)
        maxN = math.max(maxN, norm.split(' ').length)
      }
    }
    new Dict(set, maxN)
  }

  /** JVM kernel shared by interpreted eval and codegen. */
  def segment(s: UTF8String, dict: Dict): ArrayData = {
    val syl = s.toString.split("\\s+").filter(_.nonEmpty)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](syl.length)
    var i = 0
    while (i < syl.length) {
      var n = math.min(dict.maxN, syl.length - i)
      var matched = 1
      // longest match wins; ties cannot occur (one length matches first)
      while (n >= 2 && matched == 1) {
        val cand = syl.slice(i, i + n).mkString(" ")
          .toLowerCase(java.util.Locale.ROOT)
        if (dict.words.contains(cand)) matched = n
        n -= 1
      }
      out += UTF8String.fromString(syl.slice(i, i + matched).mkString("_"))
      i += matched
    }
    new GenericArrayData(out.toArray[Any])
  }
}
