package graft

import graft.checks.{NetOps, RowChecks}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Differential parity: the [[NetOps.ipv4Valid]] byte-scan kernel must decide
  * EXACTLY what `rlike(RowChecks.Ipv4Regex)` decides — java.util.regex
  * `find()` with an anchored pattern, including the `$`-before-final-line-
  * terminator acceptance (LF / CR / CRLF / NEL / LS / PS) that a naive
  * "parse to end of string" scan would get wrong.
  */
class Ipv4KernelSpec extends AnyFunSuite {

  private val pattern = java.util.regex.Pattern.compile(RowChecks.Ipv4Regex)
  private def regexSays(s: String): Boolean = pattern.matcher(s).find()
  private def kernelSays(s: String): Boolean = NetOps.ipv4Valid(UTF8String.fromString(s))
  private def check(s: String): Unit =
    assert(kernelSays(s) == regexSays(s),
      s"kernel=${kernelSays(s)} regex=${regexSays(s)} on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")

  test("closed-form corpus: octet ranges, leading zeros, shape errors") {
    val cases = Seq(
      "0.0.0.0", "255.255.255.255", "1.2.3.4", "10.0.0.1", "192.168.1.100",
      "249.199.99.9", "250.4.5.6", "256.1.1.1", "1.256.1.1", "1.1.1.256",
      "999.1.2.3", "300.1.2.3", "26.27.28.29",
      "01.2.3.4", "1.02.3.4", "1.2.03.4", "1.2.3.04", "00.0.0.0", "0.00.0.0",
      "1.2.3", "1.2.3.4.5", "1.2.3.", ".1.2.3.4", "1..2.3", "....", "",
      "1.2.3.4x", "x1.2.3.4", " 1.2.3.4", "1.2.3.4 ", "1 .2.3.4", "1. 2.3.4",
      "a.b.c.d", "1,2,3,4", "1:2:3:4", "1234.1.2.3", "1.2.3.1234",
      "+1.2.3.4", "-1.2.3.4", "1.2.3.+4", "１.2.3.4" // fullwidth digit
    )
    cases.foreach(check)
  }

  test("trailing line terminators: the java regex $ subtlety") {
    val base = Seq("1.2.3.4", "256.1.1.1", "01.2.3.4")
    val tails = Seq("", "\n", "\r", "\r\n", "\n\r", "\n\n", "\r\r",
      "", " ", " ", "\n", "\n",
      " \n", "\n ", "\t", "", "", "x\n")
    for (b <- base; t <- tails) check(b + t)
    // terminators elsewhere in the string
    check("1.2\n.3.4"); check("\n1.2.3.4"); check("1.2.3.4\n1.2.3.4")
  }

  test("fuzz: random strings over the confusable alphabet agree") {
    val alpha = Gen.oneOf('0', '1', '2', '5', '9', '.', '\n', '\r', ' ', 'a', '')
    val g = for {
      n <- Gen.chooseNum(0, 16)
      cs <- Gen.listOfN(n, alpha)
    } yield cs.mkString
    var checked = 0
    (0 until 3000).foreach { _ => g.sample.foreach { s => check(s); checked += 1 } }
    assert(checked > 2000)
    // and random near-valid quads with random perturbations
    val quad = for {
      a <- Gen.chooseNum(0, 300); b <- Gen.chooseNum(0, 300)
      c <- Gen.chooseNum(0, 300); d <- Gen.chooseNum(0, 300)
      pad <- Gen.oneOf("", "0", "\n", ".", " ")
    } yield s"$a.$b.$c.$pad$d"
    (0 until 2000).foreach(_ => quad.sample.foreach(check))
  }
}
