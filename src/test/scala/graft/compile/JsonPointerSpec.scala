package graft.compile

import java.net.URI
import org.json4s._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.pointer._

/** Re-expresses the reference's RFC 6901 conformance suite
  * (`/root/reference/src/test/scala/json/pointer/JsonPointerResolverTest.scala:45-111`).
  */
class JsonPointerSpec extends AnyFlatSpec with Matchers {

  private val json = Js.parse("""{"a": {"b": 1, "c": [1,2,3,4]}}""").toOption.get

  private def resolve(p: String): Either[String, JValue] =
    JsonPointer.parse(p).flatMap(JsonPointerResolver(_)(json))

  "JsonPointer" should "point to root for empty pointer" in {
    resolve("") shouldBe Right(json)
  }

  it should "resolve /<key> chains" in {
    resolve("/a/b") shouldBe Right(JInt(1))
  }

  it should "resolve numeric steps into arrays" in {
    resolve("/a/c/2") shouldBe Right(JInt(3))
  }

  it should "fail for unknown keys" in {
    resolve("/f").left.getOrElse("") should include("f not found")
  }

  it should "fail for out-of-bounds indexes" in {
    resolve("/a/c/10").left.getOrElse("") should include("10 not found")
  }

  private val spec = Js.parse(
    """{
      "foo": ["bar", "baz"],
      "": 0,
      "a/b": 1,
      "c%d": 2,
      "e^f": 3,
      "g|h": 4,
      "i\\j": 5,
      "k\"l": 6,
      " ": 7,
      "m~n": 8
    }""").toOption.get

  it should "satisfy the RFC 6901 example document" in {
    val cases: List[(String, JValue)] = List(
      "" -> spec,
      "/foo" -> JArray(List(JString("bar"), JString("baz"))),
      "/foo/0" -> JString("bar"),
      "/" -> JInt(0),
      "/a~1b" -> JInt(1),
      "/c%d" -> JInt(2),
      "/e^f" -> JInt(3),
      "/g|h" -> JInt(4),
      "/i\\j" -> JInt(5),
      "/k\"l" -> JInt(6),
      "/ " -> JInt(7),
      "/m~0n" -> JInt(8))
    cases.foreach { case (p, expected) =>
      JsonPointer.parse(p).flatMap(JsonPointerResolver(_)(spec)) shouldBe Right(expected)
    }
  }

  it should "satisfy the URI-encoded RFC 6901 examples" in {
    val cases: List[(String, JValue)] = List(
      "#" -> spec,
      "#/foo" -> JArray(List(JString("bar"), JString("baz"))),
      "#/foo/0" -> JString("bar"),
      "#/" -> JInt(0),
      "#/a~1b" -> JInt(1),
      "#/c%25d" -> JInt(2),
      "#/e%5Ef" -> JInt(3),
      "#/g%7Ch" -> JInt(4),
      "#/i%5Cj" -> JInt(5),
      "#/k%22l" -> JInt(6),
      "#/%20" -> JInt(7),
      "#/m~0n" -> JInt(8))
    cases.foreach { case (u, expected) =>
      JsonPointerResolver(new URI(u))(spec) shouldBe Right(expected)
    }
  }

  it should "decode ~01 to the literal ~1 per RFC (left-to-right escapes)" in {
    JsonPointer.unescape("~01") shouldBe "~1"
    JsonPointer.unescape("~10") shouldBe "/0"
  }

  it should "round-trip escape/unescape for arbitrary keys" in {
    // scalacheck-style property, driven explicitly (scalatestplus bridge
    // is not on the offline classpath)
    val gen = org.scalacheck.Gen.listOf(
      org.scalacheck.Gen.oneOf(org.scalacheck.Gen.alphaNumChar,
        org.scalacheck.Gen.oneOf('~', '/', '0', '1', ' '))).map(_.mkString)
    val seed0 = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed0)(_.next).take(500).foreach { seed =>
      val s = gen.pureApply(org.scalacheck.Gen.Parameters.default, seed)
      JsonPointer.unescape(JsonPointer.escape(s)) shouldBe s
    }
  }

  it should "normalize empty fragments in resolveAsPointer (reference JsonPointer.scala:85-89)" in {
    JsonPointer.resolveAsPointer(new URI("http://x.y.z/root.json#"), new URI("other.json"))
      .toString shouldBe "http://x.y.z/other.json#"
    JsonPointer.resolveAsPointer(new URI("http://x.y.z/root.json#"), new URI("#foo"))
      .toString shouldBe "http://x.y.z/root.json#foo"
  }
}
