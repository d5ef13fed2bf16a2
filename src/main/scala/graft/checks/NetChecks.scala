package graft.checks

import graft.core.CheckUtils._
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen
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

  /** Allocation-free validity walk over UTF8 bytes — semantics identical to
    * `parse(s).isDefined` (property-tested equal), without the per-row String
    * + split-array allocations that dominated the 100M-row check cost.
    */
  def validBytes(s: UTF8String): Boolean = {
    val n0 = s.numBytes()
    var lo = 0
    var hi = n0
    while (lo < hi && (s.getByte(lo) & 0xFF) <= ' ') lo += 1
    while (hi > lo && (s.getByte(hi - 1) & 0xFF) <= ' ') hi -= 1
    if (lo >= hi) return false
    var i = lo
    var groups = 0          // 16-bit groups consumed (IPv4 tail counts as 2)
    var compressAt = -1     // group index where "::" sits, -1 if none
    var sawV4 = false
    def byteAt(p: Int): Int = if (p < hi) s.getByte(p) & 0xFF else -1
    def isHex(b: Int): Boolean =
      (b >= '0' && b <= '9') || (b >= 'a' && b <= 'f') || (b >= 'A' && b <= 'F')
    // leading "::"
    if (byteAt(i) == ':') {
      if (byteAt(i + 1) != ':') return false
      compressAt = 0
      i += 2
      if (i == hi) return true // "::"
    }
    while (i < hi) {
      if (sawV4) return false // nothing may follow an embedded IPv4
      // one group: 1-4 hex digits, or a dotted quad (strict octets)
      val start = i
      var len = 0
      while (isHex(byteAt(i)) && len < 5) { i += 1; len += 1 }
      if (len == 0 || len > 4) return false
      if (byteAt(i) == '.') {
        // re-scan as IPv4: 4 strict decimal octets
        i = start
        var oct = 0
        while (oct < 4) {
          var d = 0
          var dl = 0
          var lead = false
          while (dl < 3 && { val b = byteAt(i); b >= '0' && b <= '9' }) {
            if (dl == 0 && byteAt(i) == '0') lead = true
            d = d * 10 + (byteAt(i) - '0'); i += 1; dl += 1
          }
          if (dl == 0 || d > 255 || (dl > 1 && lead)) return false
          oct += 1
          if (oct < 4) {
            if (byteAt(i) != '.') return false
            i += 1
          }
        }
        if (i != hi) return false // IPv4 must end the address
        groups += 2
        sawV4 = true
      } else {
        groups += 1
        if (i < hi) {
          if (byteAt(i) != ':') return false
          if (byteAt(i + 1) == ':') {
            if (compressAt >= 0) return false // second "::"
            compressAt = groups
            i += 2
            if (i == hi) return groups <= 7 // trailing "::"
          } else {
            i += 1
            if (i == hi) return false // trailing single ':'
          }
        }
      }
    }
    if (compressAt >= 0) groups <= 7 else groups == 8
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

/** Static (Java-callable) evaluation helpers for the codegen'd network
  * expressions: whole-stage codegen emits direct calls to these, keeping the
  * net checks inside the fused loop (CodegenFallback would break the span AND
  * pay interpreted dispatch per row — measured ~3x on the 10M-row suite).
  */
object NetOps {
  /** Exact replay of `rlike(RowChecks.Ipv4Regex)` over UTF8 bytes — the
    * regex cost ~0.9 s of the 10M-row suite (r15 interleaved probe) for a
    * fixed grammar a byte scan decides in ~1/10th the time. Semantics parity
    * (pinned by Ipv4KernelSpec's differential corpus + fuzz vs the regex):
    * strict dotted quad, octets 0-255 with no leading zeros, and — because
    * java.util.regex `$` without MULTILINE also matches before a FINAL line
    * terminator — one optional trailing LF, CR, CRLF, NEL (U+0085), LS
    * (U+2028) or PS (U+2029) is accepted, exactly like the regex.
    */
  def ipv4Valid(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var end = n
    if (end >= 1) {
      val last = s.getByte(end - 1) & 0xFF
      if (last == '\n') {
        end -= 1
        if (end >= 1 && (s.getByte(end - 1) & 0xFF) == '\r') end -= 1
      } else if (last == '\r') end -= 1
      else if (last == 0x85 && end >= 2 && (s.getByte(end - 2) & 0xFF) == 0xC2) end -= 2
      else if ((last == 0xA8 || last == 0xA9) && end >= 3 &&
        (s.getByte(end - 3) & 0xFF) == 0xE2 && (s.getByte(end - 2) & 0xFF) == 0x80) end -= 3
    }
    var octets = 0
    var i = 0
    while (octets < 4) {
      var d = 0
      var len = 0
      var leadingZero = false
      while (i < end && len < 3 && {
        val b = s.getByte(i); b >= '0' && b <= '9'
      }) {
        val b = s.getByte(i)
        if (len == 0 && b == '0') leadingZero = true
        d = d * 10 + (b - '0'); i += 1; len += 1
      }
      if (len == 0 || d > 255 || (len > 1 && leadingZero)) return false
      octets += 1
      if (octets < 4) {
        if (i >= end || s.getByte(i) != '.') return false
        i += 1
      }
    }
    i == end
  }

  /** Strict dotted-quad parse over UTF8 bytes (no String alloc), range test. */
  def ipv4InRange(s: UTF8String, lo: Long, hi: Long): Boolean = {
    val n = s.numBytes()
    var value = 0L
    var octets = 0
    var i = 0
    while (i < n && octets < 4) {
      var d = 0
      var len = 0
      var leadingZero = false
      while (i < n && len < 3 && {
        val b = s.getByte(i); b >= '0' && b <= '9'
      }) {
        val b = s.getByte(i)
        if (len == 0 && b == '0') leadingZero = true
        d = d * 10 + (b - '0'); i += 1; len += 1
      }
      if (len == 0 || d > 255 || (len > 1 && leadingZero)) return false
      value = (value << 8) | d
      octets += 1
      if (octets < 4) {
        if (i >= n || s.getByte(i) != '.') return false
        i += 1
      }
    }
    octets == 4 && i == n && value >= lo && value <= hi
  }

  def ipv6Valid(s: UTF8String): Boolean = Ipv6Util.validBytes(s)

  /** null (unparseable) / TRUE / FALSE as a boxed Boolean for codegen. */
  def ipv6InCidr(s: UTF8String, net: Array[Byte], prefix: Int): java.lang.Boolean =
    Ipv6Util.parse(s.toString) match {
      case Some(addr) => java.lang.Boolean.valueOf(Ipv6Util.inCidr(addr, net, prefix))
      case None => null
    }
}

/** Catalyst expression: IPv4 string parses (strict dotted quad, no leading
  * zeros) AND its 32-bit value lies in [lo, hi]. False when unparseable.
  */
case class Ipv4InRange(child: Expression, lo: Long, hi: Long)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any =
    NetOps.ipv4InRange(v.asInstanceOf[UTF8String], lo, hi)

  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.checks.NetOps.ipv4InRange($c, ${lo}L, ${hi}L)")

  override protected def withNewChildInternal(c: Expression): Ipv4InRange = copy(child = c)
}

/** Catalyst expression: is the string a valid IPv4 dotted quad — the exact
  * byte-scan replay of `rlike(RowChecks.Ipv4Regex)` (see [[NetOps.ipv4Valid]]).
  */
case class Ipv4Valid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any =
    NetOps.ipv4Valid(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.checks.NetOps.ipv4Valid($c)")

  override protected def withNewChildInternal(c: Expression): Ipv4Valid = copy(child = c)
}

/** Catalyst expression: is the string a valid IPv6 address. */
case class Ipv6Valid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any = NetOps.ipv6Valid(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.checks.NetOps.ipv6Valid($c)")

  override protected def withNewChildInternal(c: Expression): Ipv6Valid = copy(child = c)
}

/** Catalyst expression: IPv6 string within the given network/prefix; NULL for
  * unparseable addresses.
  */
case class Ipv6InCidr(child: Expression, net: Array[Byte], prefix: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    NetOps.ipv6InCidr(v.asInstanceOf[UTF8String], net, prefix)

  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val childGen = child.genCode(ctx)
    val netRef = ctx.addReferenceObj("net", net, "byte[]")
    val boxed = ctx.freshName("inCidr")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;
        if (!${childGen.isNull}) {
          java.lang.Boolean $boxed = graft.checks.NetOps.ipv6InCidr(${childGen.value}, $netRef, $prefix);
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.booleanValue(); }
        }""")
  }

  override protected def withNewChildInternal(c: Expression): Ipv6InCidr = copy(child = c)
}
