package graft.functions

import java.util.regex.Pattern
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** [[FormatMatchers]] must be EXACTLY the java-regex predicates they
  * replaced in the validator: property-fuzzed (scalacheck generators
  * driven explicitly, the JsonPointerSpec pattern) over adversarial
  * alphabets — multibyte characters, every line-terminator variant,
  * '@'/'.'/'-'/':' runs, length-boundary strings — plus targeted
  * goldens for each regex's corner semantics ('$' before a final
  * terminator, second '@', leading-zero octets, 63/253 hostname
  * limits).
  */
class FormatMatchersSpec extends AnyFlatSpec with Matchers {

  private val regexes: Map[String, (String, UTF8String => Boolean)] = Map(
    "email" -> ("^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$", FormatMatchers.email),
    "hostname" -> ("^(?=.{1,253}$)[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?(\\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$",
      FormatMatchers.hostname),
    "ipv4" -> ("^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
      FormatMatchers.ipv4),
    "uri" -> ("^[A-Za-z][A-Za-z0-9+.-]*:", FormatMatchers.uri),
    "ipv6charset" -> ("^[0-9A-Fa-f:.]+$", FormatMatchers.ipv6Charset))

  private def check(fmt: String, s: String): Unit = {
    val (re, fn) = regexes(fmt)
    val expected = Pattern.compile(re).matcher(s).find()
    val got = fn(UTF8String.fromString(s))
    withClue(s"$fmt mismatch on ${s.map(c => f"\\u$c%04x").mkString} (${s.take(80)}): ") {
      got shouldBe expected
    }
  }

  behavior of "FormatMatchers"

  it should "agree with the java regexes on targeted goldens" in {
    val terms = Seq("", "\n", "\r", "\r\n", "", " ", " ", "\n\n", "\rx")
    val emails = Seq("a@b.c", "a@b.", "a@.b", "@b.c", "a@b", "a@b@c.d", "a b@c.d",
      "a@b.c.d", "ü@ö.de", "a@b\tc.d", "aa@bb.cc", "a@@b.c", "x@y.z.", "a.b@c.d.e")
    val hosts = Seq("a", "a-b", "-ab", "ab-", "a.b", "a..b", "a.", ".a", "a" * 63,
      "a" * 64, (("a" * 63) + ".") * 3 + "a" * 61, (("a" * 63) + ".") * 3 + "a" * 62,
      "xn--test", "a_b", "Host9", "a.b-c.d9")
    val ips = Seq("1.2.3.4", "255.255.255.255", "256.1.1.1", "249.1.1.1", "01.2.3.4",
      "001.002.003.004", "1.2.3", "1.2.3.4.5", "1..2.3", "1.2.3.", "300.1.1.1",
      "199.1.1.1", "099.1.1.1", "999.1.1.1", "25.26.27.28", "1234.1.1.1")
    val uris = Seq("http://x", "a:", ":", "1http:", "h+t.p-9:rest", "h", "h:",
      "h\nx:", "hät:p", "mailto:a@b")
    val ip6s = Seq("fe80::1", "::", "g::1", "1.2.3.4", "ABCDEF:0123", "", ":")
    for (t <- terms) {
      emails.foreach(e => check("email", e + t))
      hosts.foreach(h => check("hostname", h + t))
      ips.foreach(i => check("ipv4", i + t))
      uris.foreach(u => check("uri", u + t))
      ip6s.foreach(i => check("ipv6charset", i + t))
    }
  }

  it should "agree with the java regexes under property fuzz" in {
    // adversarial alphabet: class members, class breakers, terminators,
    // multibyte, boundary runs
    val alphabet = Seq("a", "Z", "9", "@", ".", "-", "+", ":", "_", " ", "\t",
      "\n", "\r", "", " ", " ", "", "\f", "ü", "漢", "f", "F")
    val gen = for {
      n <- org.scalacheck.Gen.chooseNum(0, 12)
      parts <- org.scalacheck.Gen.listOfN(n, org.scalacheck.Gen.oneOf(alphabet))
    } yield parts.mkString
    val params = org.scalacheck.Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(20260822L)
    (1 to 4000).foreach { _ =>
      val s = gen.apply(params, seed).getOrElse("")
      seed = seed.next
      regexes.keys.foreach(f => check(f, s))
    }
    // long-string boundaries for the hostname length lookahead
    (250 to 256).foreach { n =>
      check("hostname", "a" * n)
      check("hostname", ("ab." * (n / 3)).take(n))
    }
  }
}
