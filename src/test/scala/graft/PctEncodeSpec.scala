package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rules.RuleCompiler

/** The custom codegen PctEncode expression must be byte-identical to
  * the built-in chain it replaced (url_encode + fixups) — this spec IS
  * the promotion condition SURVEY.md §7.3 set for custom expressions.
  */
class PctEncodeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  def viaCustom(ss: Seq[String]): Seq[String] =
    ss.toDF("s").select(RuleCompiler.pctEncode(col("s"))).as[String].collect().toSeq

  def viaBuiltin(ss: Seq[String]): Seq[String] =
    ss.toDF("s").select(RuleCompiler.pctEncodeBuiltin(col("s"))).as[String].collect().toSeq

  test("fixed corners: reserved, unreserved, spaces, unicode, empty") {
    val in = Seq("", "abc", "a b", "a/b?c#d", "A-Z_a~z.0",
      "Brunei Darussalam", "naïve £ 中文", "100%", "+plus+", "*star*",
      "tab\there", "quote\"bs\\")
    val got = viaCustom(in)
    assert(got == viaBuiltin(in))
    assert(got(2) == "a%20b")
    assert(got(3) == "a%2Fb%3Fc%23d")
    assert(got(4) == "A-Z_a~z.0")
    assert(got(8) == "%2Bplus%2B")
  }

  test("property: custom == builtin chain on random unicode strings (seeded)") {
    val rnd = new scala.util.Random(4242)
    def randString(): String = {
      val n = rnd.nextInt(24)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        val c = rnd.nextInt(4) match {
          case 0 => (' ' + rnd.nextInt(95)).toChar        // ascii printable
          case 1 => (0xa0 + rnd.nextInt(400)).toChar      // latin supplement+
          case 2 => (0x4e00 + rnd.nextInt(1000)).toChar   // CJK
          case _ => "-_.~%+*/?#&=@:".charAt(rnd.nextInt(14))
        }
        sb.append(c)
      }
      sb.toString
    }
    val in = (0 until 400).map(_ => randString())
    assert(viaCustom(in) == viaBuiltin(in))
  }

  test("null flows through; codegen and interpreted paths agree") {
    val df = Seq(Some("a b"), None).toDF("s")
    val out = df.select(RuleCompiler.pctEncode(col("s"))).collect()
    assert(out(0).getString(0) == "a%20b" && out(1).isNullAt(0))
    // interpreted path (eval): call the expression directly
    val e = graft.functions.PctEncode(
      org.apache.spark.sql.catalyst.expressions.Literal("x y/z"))
    assert(e.eval(null).toString == "x%20y%2Fz")
  }
}
