package graft.checks

import graft.core.CheckUtils._
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Network-address checks.
  *
  * The reference implements IPv4-in-CIDR with string bit-math expressions
  * (check_funcs.py:4690-4711) and IPv6 via pandas UDFs (check_funcs.py:4726,
  * :4753). Here: IPv4 as pure long-arithmetic Catalyst expressions (codegen'd,
  * no string bits), IPv6 as a small custom Catalyst expression over
  * java.net-style parsing — no Python worker round-trip at any scale.
  */
object NetChecks {

  /** Parse `a.b.c.d/n` on the driver → (networkStart, networkEnd) as unsigned longs. */
  private def cidrV4Range(cidr: String): (Long, Long) = {
    val Array(ip, prefixStr) = cidr.split("/")
    val prefix = prefixStr.toInt
    require(prefix >= 0 && prefix <= 32, s"Invalid IPv4 CIDR prefix: $cidr")
    val octets = ip.split("\\.").map(_.toLong)
    require(octets.length == 4 && octets.forall(o => o >= 0 && o <= 255), s"Invalid IPv4 CIDR: $cidr")
    val base = octets(0) * 16777216L + octets(1) * 65536L + octets(2) * 256L + octets(3)
    val mask = if (prefix == 0) 0L else (0xFFFFFFFFL << (32 - prefix)) & 0xFFFFFFFFL
    val lo = base & mask
    val hi = lo | (~mask & 0xFFFFFFFFL)
    (lo, hi)
  }

  /** check_funcs.py:1559 — IPv4 not within CIDR block fails.
    *
    * Uses a single-eval custom expression: the Column-level regex+split chain
    * gets inlined by CollapseProject into every reference (~12 split evals per
    * row measured); the expression parses the dotted quad once.
    */
  def isIpv4AddressInCidr(c: Column, cidrBlock: String): Column = {
    val (lo, hi) = cidrV4Range(cidrBlock)
    import org.apache.spark.sql.GraftColumnBridge
    val inRange = GraftColumnBridge.column(
      Ipv4InRange(GraftColumnBridge.expression(c.cast("string")), lo, hi))
    makeCondition(c.isNotNull && !inRange,
      concat(lit(s"Value '"), valueText(c),
        lit(s"' in column '${c.toString}' is not in CIDR block $cidrBlock")))
  }

  /** check_funcs.py:1610 — invalid IPv6 fails. */
  def isValidIpv6Address(c: Column): Column =
    makeCondition(c.isNotNull && !ipv6Valid(c),
      concat(lit(s"Value '"), valueText(c), lit(s"' in column '${c.toString}' is not a valid IPv6 address")))

  /** check_funcs.py:1641 — IPv6 not within CIDR block fails. */
  def isIpv6AddressInCidr(c: Column, cidrBlock: String): Column = {
    val Array(net, prefixStr) = cidrBlock.split("/")
    val prefix = prefixStr.toInt
    require(prefix >= 0 && prefix <= 128, s"Invalid IPv6 CIDR prefix: $cidrBlock")
    val netBytes = Ipv6Util.parse(net).getOrElse(
      throw new IllegalArgumentException(s"Invalid IPv6 CIDR: $cidrBlock"))
    import org.apache.spark.sql.GraftColumnBridge
    val inCidr = GraftColumnBridge.column(
      Ipv6InCidr(GraftColumnBridge.expression(c.cast("string")), netBytes, prefix))
    makeCondition(c.isNotNull && !coalesce(inCidr, lit(false)),
      concat(lit(s"Value '"), valueText(c),
        lit(s"' in column '${c.toString}' is not in CIDR block $cidrBlock")))
  }

  private def ipv6Valid(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(Ipv6Valid(GraftColumnBridge.expression(c.cast("string"))))
  }
}

/** Strict textual IPv6 parser (no DNS lookups — never use InetAddress.getByName
  * on untrusted data). Returns the 16-byte address.
  */
object Ipv6Util {
  def parse(s0: String): Option[Array[Byte]] = {
    val s = s0.trim
    if (s.isEmpty || s.contains("%")) return None
    val parts = s.split("::", -1)
    if (parts.length > 2) return None
    // Embedded IPv4 must occupy the FINAL 32 bits of the whole address: it can
    // only appear as the last group of the last non-empty part ('1.2.3.4::' is
    // invalid — the '::' expands zeros after it).
    def groups(p: String, isTail: Boolean): Option[Seq[Int]] = {
      if (p.isEmpty) return Some(Seq.empty)
      val gs = p.split(":", -1)
      if (gs.exists(_.isEmpty)) return None
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      for ((g, i) <- gs.zipWithIndex) {
        if (g.contains(".")) {
          if (!isTail || i != gs.length - 1) return None
          val oct = g.split("\\.", -1)
          if (oct.length != 4) return None
          val vals = oct.map { o =>
            if (o.isEmpty || o.length > 3 || !o.forall(_.isDigit)) return None
            val v = o.toInt
            if (v > 255 || (o.length > 1 && o.head == '0')) return None
            v
          }
          out += (vals(0) << 8 | vals(1)); out += (vals(2) << 8 | vals(3))
        } else {
          if (g.length > 4 || !g.forall(ch => Character.digit(ch, 16) >= 0)) return None
          out += Integer.parseInt(g, 16)
        }
      }
      Some(out.toSeq)
    }
    val left = groups(parts(0), isTail = parts.length == 1).getOrElse(return None)
    val right = if (parts.length == 2) groups(parts(1), isTail = true).getOrElse(return None) else Seq.empty
    val total = left.length + right.length
    val full: Seq[Int] =
      if (parts.length == 2) {
        if (total > 7) return None
        left ++ Seq.fill(8 - total)(0) ++ right
      } else {
        if (total != 8) return None
        left
      }
    val bytes = new Array[Byte](16)
    for (i <- 0 until 8) {
      bytes(2 * i) = ((full(i) >> 8) & 0xFF).toByte
      bytes(2 * i + 1) = (full(i) & 0xFF).toByte
    }
    Some(bytes)
  }

  def inCidr(addr: Array[Byte], net: Array[Byte], prefix: Int): Boolean = {
    var bitsLeft = prefix
    var i = 0
    while (bitsLeft > 0 && i < 16) {
      val take = math.min(8, bitsLeft)
      val mask = (0xFF << (8 - take)) & 0xFF
      if ((addr(i) & mask) != (net(i) & mask)) return false
      bitsLeft -= take
      i += 1
    }
    true
  }
}

/** Catalyst expression: IPv4 string parses (strict dotted quad, no leading
  * zeros) AND its 32-bit value lies in [lo, hi]. False when unparseable.
  */
case class Ipv4InRange(child: Expression, lo: Long, hi: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var value = 0L
    var octets = 0
    var i = 0
    val n = s.length
    while (i < n && octets < 4) {
      var d = 0
      var len = 0
      val start = i
      while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9' && len < 3) {
        d = d * 10 + (s.charAt(i) - '0'); i += 1; len += 1
      }
      if (len == 0 || d > 255 || (len > 1 && s.charAt(start) == '0')) return false
      value = (value << 8) | d
      octets += 1
      if (octets < 4) {
        if (i >= n || s.charAt(i) != '.') return false
        i += 1
      }
    }
    octets == 4 && i == n && value >= lo && value <= hi
  }

  override protected def withNewChildInternal(c: Expression): Ipv4InRange = copy(child = c)
}

/** Catalyst expression: is the string a valid IPv6 address. */
case class Ipv6Valid(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    Ipv6Util.parse(v.asInstanceOf[UTF8String].toString).isDefined
  override protected def withNewChildInternal(c: Expression): Ipv6Valid = copy(child = c)
}

/** Catalyst expression: IPv6 string within the given network/prefix. */
case class Ipv6InCidr(child: Expression, net: Array[Byte], prefix: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    Ipv6Util.parse(v.asInstanceOf[UTF8String].toString) match {
      case Some(addr) => Ipv6Util.inCidr(addr, net, prefix)
      case None => null
    }
  override def nullable: Boolean = true
  override protected def withNewChildInternal(c: Expression): Ipv6InCidr = copy(child = c)
}
