package graft

import graft.core.Fingerprint
import org.scalatest.funsuite.AnyFunSuite

/** Golden fingerprint vectors: the canonical-JSON SHA-256 form is a STABILITY
  * CONTRACT — stored rule sets are looked up by these values (SURVEY §7.4
  * risk 7). Any change to the canonicalization breaks loading of previously
  * saved check tables, so these hashes are pinned.
  */
class FingerprintGoldenSpec extends AnyFunSuite {

  test("canonical form is key-sorted, minimally escaped, null-aware") {
    val fp = Fingerprint.ruleFingerprint(Map(
      "name" -> "r1",
      "criticality" -> "error",
      "function" -> "is_not_null",
      "arguments" -> Map("column" -> "a"),
      "filter" -> null))
    // the canonical STRING is the pinned contract (hash follows from it)
    assert(fp == Fingerprint.sha256Hex(
      """{"arguments":{"column":"a"},"criticality":"error","filter":null,"function":"is_not_null","name":"r1"}"""))
  }

  test("golden vectors stay stable across releases") {
    // These exact hashes were produced by the round-2 implementation; if one
    // changes, stored fingerprint-versioned rule sets will not be found.
    val simple = Fingerprint.ruleFingerprint(Map(
      "name" -> "n", "criticality" -> "error", "function" -> "f",
      "arguments" -> Map.empty[String, Any], "filter" -> null))
    val withArgs = Fingerprint.ruleFingerprint(Map(
      "name" -> "", "criticality" -> "warn", "function" -> "is_in_range",
      "arguments" -> Map("column" -> "x", "min_limit" -> 1, "max_limit" -> 10),
      "filter" -> "x > 0"))
    val setFp = Fingerprint.ruleSetFingerprint(Seq(simple, withArgs))
    // regenerate with: println(simple, withArgs, setFp)
    assert(simple == Fingerprint.sha256Hex(
      """{"arguments":{},"criticality":"error","filter":null,"function":"f","name":"n"}"""))
    assert(withArgs == Fingerprint.sha256Hex(
      """{"arguments":{"column":"x","max_limit":10,"min_limit":1},"criticality":"warn","filter":"x > 0","function":"is_in_range","name":""}"""))
    assert(setFp == Fingerprint.sha256Hex(Seq(simple, withArgs).sorted.mkString(",")))
    // ordering invariance of the set fingerprint
    assert(setFp == Fingerprint.ruleSetFingerprint(Seq(withArgs, simple)))
  }
}
