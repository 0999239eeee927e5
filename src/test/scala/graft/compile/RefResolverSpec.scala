package graft.compile

import java.net.URI
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Re-expresses the reference's dereference suite
  * (`/root/reference/src/test/scala/json/reference/ReferenceResolverTest.scala:35-178`),
  * including cycle-safety and local-file references (fixture pair
  * `/root/reference/src/test/resources/json/reference/source.json`,
  * `referred.json` — used read-only as golden inputs).
  */
class RefResolverSpec extends AnyFlatSpec with Matchers {

  private val rootUri = new URI("#")

  private def resolveFrom(s: String): Either[String, org.json4s.JValue] =
    Js.parse(s).flatMap(RefResolver.resolveFrom(rootUri, _))

  private def shouldResolve(from: String, to: String): Unit =
    resolveFrom(from) shouldBe Js.parse(to)

  "RefResolver" should "not change a document without references" in {
    shouldResolve(
      """{ "source": "sourcedata", "target": "source" }""",
      """{ "source": "sourcedata", "target": "source" }""")
  }

  it should "resolve fragment references from the current doc" in {
    shouldResolve(
      """{ "source": "sourcedata", "$ref": "#/source" }""",
      """ "sourcedata" """)
  }

  it should "resolve fragment references in nested nodes" in {
    shouldResolve(
      """{ "source": "sourcedata", "target": { "$ref": "#/source" } }""",
      """{ "source": "sourcedata", "target": "sourcedata" }""")
  }

  it should "fail to resolve unknown references" in {
    resolveFrom("""{ "a": { "$ref": "#/b" } }""")
      .left.getOrElse("") should include("reference #/b not found")
    resolveFrom("""{ "a": { "$ref": "http://google.com/somedoc" } }""")
      .left.getOrElse("") should include("reference http://google.com/somedoc not found")
  }

  it should "leave cyclic references unresolved (terminates)" in {
    // reference ReferenceResolverTest.scala:138-155 — the doc maps to itself
    shouldResolve(
      """{ "a": {"$ref": "#/b"}, "b": {"$ref": "#/c"}, "c": {"$ref": "#/a"} }""",
      """{ "a": {"$ref": "#/b"}, "b": {"$ref": "#/c"}, "c": {"$ref": "#/a"} }""")
  }

  it should "fail on invalid reference URIs" in {
    resolveFrom("""{ "a": { "$ref": " invalid reference " } }""")
      .left.getOrElse("") should include("invalid reference")
  }

  it should "resolve references to local files" in {
    // vendored copy of the reference's fixture (src/test/resources/corpus)
    val f = new java.io.File(getClass.getResource("/corpus/json/reference/source.json").toURI)
    val result = Js.parseFile(f).flatMap(RefResolver.resolveFrom(f.toURI, _))
    result shouldBe Js.parse("""{ "source": "value" }""")
  }
}
