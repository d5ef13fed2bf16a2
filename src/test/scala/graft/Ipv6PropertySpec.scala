package graft

import graft.checks.Ipv6Util
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property tests: our strict IPv6 parser vs Guava's InetAddresses (textual
  * parse, no DNS) on generated addresses, plus round-trip and CIDR laws.
  */
class Ipv6PropertySpec extends AnyFunSuite {

  // minimal forAll over scalacheck Gens (scalatestplus bridge not bundled)
  private def forAll[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i => g.sample.foreach(f) }
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 300).foreach { _ => for (a <- g1.sample; b <- g2.sample) f(a, b) }

  private val group = Gen.chooseNum(0, 0xFFFF)
  private val fullAddr: Gen[String] =
    Gen.listOfN(8, group).map(_.map(g => f"$g%x").mkString(":"))

  private val compressedAddr: Gen[String] = for {
    left <- Gen.chooseNum(0, 5)
    right <- Gen.chooseNum(0, 5 - math.min(left, 5))
    ls <- Gen.listOfN(left, group)
    rs <- Gen.listOfN(right, group)
  } yield ls.map(g => f"$g%x").mkString(":") + "::" + rs.map(g => f"$g%x").mkString(":")

  test("agrees with Guava on fully-specified addresses") {
    forAll(fullAddr) { s =>
      val ours = Ipv6Util.parse(s)
      val guava = com.google.common.net.InetAddresses.isInetAddress(s)
      assert(ours.isDefined == guava, s"disagree on $s")
      ours.foreach { bytes =>
        val ref = com.google.common.net.InetAddresses.forString(s).getAddress
        assert(bytes.toSeq == ref.toSeq, s"byte mismatch on $s")
      }
    }
  }

  test("agrees with Guava on ::-compressed addresses") {
    forAll(compressedAddr) { s =>
      val ours = Ipv6Util.parse(s)
      val guava = com.google.common.net.InetAddresses.isInetAddress(s)
      assert(ours.isDefined == guava, s"disagree on $s")
      ours.foreach { bytes =>
        val ref = com.google.common.net.InetAddresses.forString(s).getAddress
        // Guava collapses IPv4-mapped (::ffff:a.b.c.d) to 4 bytes; compare tail
        if (ref.length == 4) assert(bytes.takeRight(4).toSeq == ref.toSeq, s"tail mismatch on $s")
        else assert(bytes.toSeq == ref.toSeq, s"byte mismatch on $s")
      }
    }
  }

  test("rejects malformed IPv6 strings (Guava comparison for ':'-containing ones)") {
    // plain IPv4 is a valid inet address to Guava but NOT a valid IPv6 — our
    // parser is IPv6-specific by design
    val bad = Seq("", ":::", "1:2:3:4:5:6:7:8:9", "g::1", "1::2::3",
      "12345::", "1.2.3.4", "::ffff:999.1.1.1", "fe80::1%eth0",
      // embedded IPv4 not in the final 32 bits of the address
      "1.2.3.4::", "1:2:3:1.2.3.4::5", "::1.2.3.4:5")
    bad.foreach(s => assert(Ipv6Util.parse(s).isEmpty, s"should reject '$s'"))
    bad.filter(s => s.contains(':') && !s.contains('%')).foreach { s =>
      assert(!com.google.common.net.InetAddresses.isInetAddress(s), s"Guava accepts '$s'?")
    }
  }

  test("allocation-free validBytes agrees with parse on every input class") {
    import org.apache.spark.unsafe.types.UTF8String
    def check(s: String): Unit =
      assert(Ipv6Util.validBytes(UTF8String.fromString(s)) == Ipv6Util.parse(s).isDefined,
        s"validBytes disagrees with parse on '$s'")
    val bad = Seq("", ":::", "1:2:3:4:5:6:7:8:9", "g::1", "1::2::3", "12345::",
      "1.2.3.4", "::ffff:999.1.1.1", "fe80::1%eth0", "1.2.3.4::",
      "1:2:3:1.2.3.4::5", "::1.2.3.4:5", "::", "::1", "1::", "1:", ":1",
      " ::1 ", "\t1::2\n", "01.2.3.4", "::ffff:1.2.3.4", "0:0:0:0:0:0:1.2.3.4",
      "1:2:3:4:5:6:7::8", "abcd::efg", "ABCD:ef01::", "1::2:3:4:5:6:7",
      "x", "a:b", "::0.0.0.0", "::00.1.2.3", "::255.255.255.255", "::256.1.1.1")
    bad.foreach(check)
    forAll(fullAddr)(check)
    forAll(compressedAddr)(check)
    // random noise over the ipv6 alphabet
    val noise = Gen.listOf(Gen.oneOf(('0' to '9') ++ Seq(':', '.', 'a', 'f', 'g', ' ')))
      .map(_.mkString)
    forAll(noise, 500)(check)
  }

  test("CIDR membership: address always within its own /128 and /0") {
    forAll(fullAddr) { s =>
      val b = Ipv6Util.parse(s).get
      assert(Ipv6Util.inCidr(b, b, 128))
      assert(Ipv6Util.inCidr(b, new Array[Byte](16), 0))
    }
  }

  test("CIDR membership: flipping a bit inside the prefix excludes") {
    forAll(fullAddr, Gen.chooseNum(1, 128)) { (s, prefix) =>
      val b = Ipv6Util.parse(s).get
      val flipped = b.clone()
      val bitIdx = prefix - 1 // last bit inside the prefix
      flipped(bitIdx / 8) = (flipped(bitIdx / 8) ^ (1 << (7 - bitIdx % 8))).toByte
      assert(!Ipv6Util.inCidr(flipped, b, prefix))
      assert(Ipv6Util.inCidr(b, b, prefix))
    }
  }
}
