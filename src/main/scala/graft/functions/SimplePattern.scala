package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compile-time fast path for the validation engine's hottest regexes.
  *
  * JSON-Schema `pattern` constraints are usually tiny anchored shapes
  * (`^c[0-9]+$`, `^[a-z][a-z0-9_]*$`). Spark's `RLike` runs
  * java.util.regex per row, which costs a UTF8String->String copy plus
  * matcher allocation — measured ~45% of the whole fused validation
  * pass. [[SimplePattern.compile]] recognizes a safe subset:
  *
  *   ^ (literal-char | [class] [+*]?)+ $
  *
  * with ASCII-only literals/classes (ranges + chars, no negation), and
  * greedy quantifiers ONLY where greedy matching cannot require
  * backtracking (the quantified class is last, or disjoint from the
  * next token's first-char set). Anything else returns None and the
  * caller uses `rlike` — so the fast path can never change semantics.
  * ASCII-only patterns make byte-wise UTF8String matching exact: any
  * multi-byte character has its high bit set and matches no ASCII
  * literal/class, exactly like java.util.regex.
  */
object SimplePattern {

  sealed trait Tok
  final case class Lit(c: Char) extends Tok
  /** ASCII membership bitmap + quantifier: 1 = exactly once, '+', '*'. */
  final case class Cls(bits: Array[Boolean], quant: Char) extends Tok

  def compile(pattern: String): Option[List[Tok]] = {
    if (!pattern.startsWith("^") || !pattern.endsWith("$") || pattern.length < 2) return None
    val body = pattern.substring(1, pattern.length - 1)
    if (body.contains("$") || body.isEmpty) return None
    val toks = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '[' =>
          val close = body.indexOf(']', i + 1)
          if (close < 0) return None
          val inner = body.substring(i + 1, close)
          if (inner.isEmpty || inner.startsWith("^")) return None
          val bits = new Array[Boolean](128)
          var j = 0
          while (j < inner.length) {
            val c = inner.charAt(j)
            if (c >= 128 || c == '\\') return None
            if (j + 2 < inner.length && inner.charAt(j + 1) == '-') {
              val hi = inner.charAt(j + 2)
              if (hi >= 128 || hi < c) return None
              (c to hi).foreach(ch => bits(ch) = true)
              j += 3
            } else { bits(c) = true; j += 1 }
          }
          i = close + 1
          val quant = if (i < body.length && (body.charAt(i) == '+' || body.charAt(i) == '*')) {
            val q = body.charAt(i); i += 1; q
          } else '1'
          toks += Cls(bits, quant)
        case c if "\\.*+?()|{}^".contains(c) => return None // meta outside class
        case c if c < 128 =>
          i += 1
          if (i < body.length && (body.charAt(i) == '+' || body.charAt(i) == '*')) {
            val q = body.charAt(i); i += 1
            val bits = new Array[Boolean](128); bits(c) = true
            toks += Cls(bits, q)
          } else toks += Lit(c)
        case _ => return None
      }
    }
    val list = toks.toList
    // greedy-without-backtracking safety: a quantified class must be the
    // last token, or disjoint from the next token's possible first chars
    def firstChars(t: Tok): Set[Char] = t match {
      case Lit(c)       => Set(c)
      case Cls(bits, _) => bits.zipWithIndex.collect { case (true, i) => i.toChar }.toSet
    }
    val safe = list.zipWithIndex.forall {
      case (Cls(bits, q), idx) if q != '1' && idx + 1 < list.length =>
        firstChars(list(idx + 1)).forall(c => c >= 128 || !bits(c))
      case _ => true
    }
    // a '*'-quantified token that is also skippable complicates "first
    // char" analysis of ITS successor chain — only allow '*' at the end
    val starSafe = list.zipWithIndex.forall {
      case (Cls(_, '*'), idx) => idx == list.length - 1
      case _                  => true
    }
    if (safe && starSafe && list.nonEmpty) Some(list) else None
  }

  /** Interpreted matcher over UTF8String bytes (also the semantics the
    * codegen mirrors).
    */
  def matches(s: UTF8String, toks: List[Tok]): Boolean = {
    val bytes = s.getBytes
    var pos = 0
    val n = bytes.length
    def at(i: Int): Int = bytes(i) & 0xff
    var rest = toks
    while (rest.nonEmpty) {
      rest.head match {
        case Lit(c) =>
          if (pos >= n || at(pos) != c.toInt) return false
          pos += 1
        case Cls(bits, '1') =>
          if (pos >= n || at(pos) >= 128 || !bits(at(pos))) return false
          pos += 1
        case Cls(bits, '+') =>
          if (pos >= n || at(pos) >= 128 || !bits(at(pos))) return false
          pos += 1
          while (pos < n && at(pos) < 128 && bits(at(pos))) pos += 1
        case Cls(bits, '*') =>
          while (pos < n && at(pos) < 128 && bits(at(pos))) pos += 1
      }
      rest = rest.tail
    }
    endsAtInput(bytes, pos, n)
  }

  /** java.util.regex `$` (no MULTILINE) matches at the end of input OR
    * just before a single FINAL line terminator (LF, CR, CRLF,
    * NEL U+0085, LS U+2028, PS U+2029). The rlike fallback inherits that, so the fast path
    * must too or "c1\n" would flip between paths. UTF-8 bytes:
    * 0A | 0D | 0D 0A | C2 85 | E2 80 A8 | E2 80 A9.
    */
  def endsAtInput(bytes: Array[Byte], pos: Int, n: Int): Boolean = (n - pos) match {
    case 0 => true
    case 1 =>
      val b = bytes(pos) & 0xff; b == 0x0A || b == 0x0D
    case 2 =>
      val b0 = bytes(pos) & 0xff; val b1 = bytes(pos + 1) & 0xff
      (b0 == 0x0D && b1 == 0x0A) || (b0 == 0xC2 && b1 == 0x85)
    case 3 =>
      val b0 = bytes(pos) & 0xff; val b1 = bytes(pos + 1) & 0xff
      val b2 = bytes(pos + 2) & 0xff
      b0 == 0xE2 && b1 == 0x80 && (b2 == 0xA8 || b2 == 0xA9)
    case _ => false
  }
}

/** Codegen'd anchored simple-pattern match: byte loop over the
  * UTF8String, no String copy, no java.util.regex.
  */
case class SimplePatternMatch(child: Expression, pattern: String)
    extends UnaryExpression {

  @transient private lazy val toks: List[SimplePattern.Tok] =
    SimplePattern.compile(pattern)
      .getOrElse(throw new IllegalArgumentException(s"unsupported simple pattern: $pattern"))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"simple_pattern needs string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simple_pattern"

  override def nullSafeEval(v: Any): Any =
    SimplePattern.matches(v.asInstanceOf[UTF8String], toks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the token table as class fields: membership bitmaps as
    // boolean[128], token kinds/chars as parallel arrays
    val kinds = toks.map {
      case SimplePattern.Lit(_)        => 'L'
      case SimplePattern.Cls(_, quant) => quant
    }.mkString // e.g. "L+" -> literal then plus-class
    val litChars = toks.map { case SimplePattern.Lit(c) => c.toInt; case _ => -1 }
    val bitmapsName = ctx.addMutableState("boolean[][]", "spBitmaps",
      v => {
        val rows = toks.map {
          case SimplePattern.Cls(bits, _) =>
            bits.map(b => if (b) "true" else "false").mkString("{", ",", "}")
          case _ => "null"
        }.mkString("{", ",", "}")
        s"$v = new boolean[][] $rows;"
      }, forceInline = false, useFreshName = true)
    val litsName = ctx.addMutableState("int[]", "spLits",
      v => s"$v = new int[] ${litChars.mkString("{", ",", "}")};",
      forceInline = false, useFreshName = true)
    val kindsName = ctx.addMutableState("String", "spKinds",
      v => s"""$v = "$kinds";""", forceInline = false, useFreshName = true)

    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val pos = ctx.freshName("pos")
      val nb = ctx.freshName("nb")
      val ok = ctx.freshName("ok")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      s"""
         |byte[] $bytes = $s.getBytes();
         |int $pos = 0;
         |int $nb = $bytes.length;
         |boolean $ok = true;
         |for (int $t = 0; $ok && $t < $kindsName.length(); $t++) {
         |  char k = $kindsName.charAt($t);
         |  if (k == 'L') {
         |    if ($pos >= $nb || ($bytes[$pos] & 0xff) != $litsName[$t]) { $ok = false; }
         |    else { $pos++; }
         |  } else if (k == '1') {
         |    int $b = $pos < $nb ? ($bytes[$pos] & 0xff) : 999;
         |    if ($b >= 128 || !$bitmapsName[$t][$b]) { $ok = false; } else { $pos++; }
         |  } else if (k == '+') {
         |    int $b = $pos < $nb ? ($bytes[$pos] & 0xff) : 999;
         |    if ($b >= 128 || !$bitmapsName[$t][$b]) { $ok = false; }
         |    else {
         |      $pos++;
         |      while ($pos < $nb && ($bytes[$pos] & 0xff) < 128 && $bitmapsName[$t][$bytes[$pos] & 0xff]) $pos++;
         |    }
         |  } else { // '*'
         |    while ($pos < $nb && ($bytes[$pos] & 0xff) < 128 && $bitmapsName[$t][$bytes[$pos] & 0xff]) $pos++;
         |  }
         |}
         |${ev.value} = $ok && graft.functions.SimplePattern.endsAtInput($bytes, $pos, $nb);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimplePatternMatch {
  /** Column for `pattern` if the fast path supports it. */
  def tryColumn(c: Column, pattern: String): Option[Column] =
    SimplePattern.compile(pattern).map { _ =>
      org.apache.spark.sql.GraftSqlBridge.column(
        SimplePatternMatch(org.apache.spark.sql.GraftSqlBridge.expression(c), pattern))
    }
}
