package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Text

/** NfcNormalize: codegen'd Unicode NFC canonical composition.
  * All fixtures are escape-built so the source file stays ASCII.
  */
class NfcSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  // "cafe" + combining acute (U+0301) -> NFC 4-char cafe-with-acute
  private val decomposed = "cafe\u0301"
  // o + circumflex (U+0302) + dot-below (U+0323): canonical reordering
  // puts the dot first, then both compose -> 5-char Vietnamese "ruong"
  private val viet = "ruo\u0302\u0323ng"

  test("nfc composes decomposed sequences like java.text.Normalizer") {
    val in = Seq(decomposed, viet, "plain ascii", "", "a\u030aX")
    val out = in.toDF("s").select(Text.nfc($"s")).as[String].collect()
    val exp = in.map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(out.toSeq == exp)
    assert(out(0) == "caf\u00e9" && out(0).length == 4)
    assert(out(1) == "ru\u1ed9ng" && out(1).length == 5)
    assert(out(4) == "\u00e5X")
  }

  test("nfc is idempotent and null-preserving") {
    val df = Seq(Some(decomposed), None).toDF("s")
    val once = df.select(Text.nfc($"s").as("n"))
    val twice = once.select(Text.nfc($"n").as("n"))
    assert(once.as[Option[String]].collect().toSeq ==
      twice.as[Option[String]].collect().toSeq)
    assert(twice.filter($"n".isNull).count() == 1)
  }

  test("graft_nfc is reachable from SQL and composes to the short form") {
    val n = spark.sql(
      "SELECT length(graft_nfc('cafe\u0301')) AS l").as[Int].head()
    assert(n == 4)
  }
}
