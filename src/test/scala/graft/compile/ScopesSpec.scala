package graft.compile

import java.net.URI
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Golden rewrite tests re-expressed from the reference's
  * `ExpandReferencesTest.scala:21-105` and `ScopeDiscoveryTest.scala:39-77`.
  */
class ScopesSpec extends AnyFlatSpec with Matchers {

  private val root = new URI("http://x.y.z/rootschema.json#")

  private def expand(s: String) =
    Js.parse(s).flatMap(ExpandReferences.expand(root, _))

  "ExpandReferences" should "expand references to absolute based on parent scopes" in {
    expand("""
      {
        "id": "http://x.y.z/rootschema.json#",
        "schema1": {
          "id": "#foo",
          "schema1.1": { "$ref": "#anotherfoo" }
        },
        "schema2": { "$ref": "anotherroot.json#" }
      }""") shouldBe Js.parse("""
      {
        "id": "http://x.y.z/rootschema.json#",
        "schema1": {
          "id": "http://x.y.z/rootschema.json#foo",
          "schema1.1": { "$ref": "http://x.y.z/rootschema.json#anotherfoo" }
        },
        "schema2": { "$ref": "http://x.y.z/anotherroot.json#" }
      }""")
  }

  it should "expand references with the file's scope if no id" in {
    expand("""
      {
        "schema1": {
          "id": "#foo",
          "schema1.1": { "$ref": "#anotherfoo" }
        },
        "schema2": { "$ref": "anotherroot.json#" }
      }""") shouldBe Js.parse("""
      {
        "schema1": {
          "id": "http://x.y.z/rootschema.json#foo",
          "schema1.1": { "$ref": "http://x.y.z/rootschema.json#anotherfoo" }
        },
        "schema2": { "$ref": "http://x.y.z/anotherroot.json#" }
      }""")
  }

  it should "expand references in nested scopes" in {
    expand("""
      {
        "schema1": {
          "id": "foo",
          "schema1.1": { "$ref": "#anotherfoo" }
        }
      }""") shouldBe Js.parse("""
      {
        "schema1": {
          "id": "http://x.y.z/foo#",
          "schema1.1": { "$ref": "http://x.y.z/foo#anotherfoo" }
        }
      }""")
  }

  private val discoveryDoc = Js.parse("""
    {
      "id": "http://my.site/myschema#",
      "definitions": {
        "schema1": { "id": "schema1", "type": "integer" },
        "schema2": { "type": "array", "items": { "$ref": "schema1" } },
        "schema2.1": {
          "schema3": { "id": "#pointeroverride", "type": "number" }
        }
      }
    }""").toOption.get

  private val scopeMap = ScopeDiscovery.scopes(new URI("http://myuri"), discoveryDoc)

  "ScopeDiscovery" should "record the root under its own id scope" in {
    scopeMap.map(_(new URI("http://my.site/myschema#"))) shouldBe Right(discoveryDoc)
  }

  it should "resolve sub-scopes against parent scopes, with the reference's threaded-scope leak" in {
    scopeMap.map(_(new URI("http://my.site/schema1#"))) shouldBe
      Js.parse("""{ "id": "schema1", "type": "integer" }""")
    // schema1's scope leaks to the later sibling subtree schema2.1/schema3
    // (reference ScopeDiscoveryTest.scala:56-63 pins this)
    scopeMap.map(_(new URI("http://my.site/schema1#pointeroverride"))) shouldBe
      Js.parse("""{ "id": "#pointeroverride", "type": "number" }""")
  }

  it should "use the document root uri if no root id is provided" in {
    val doc = Js.parse("""
      { "definitions": { "schema1": { "id": "schema1", "type": "integer" } } }""").toOption.get
    ScopeDiscovery.scopes(new URI("http://myuri"), doc).map(_(new URI("http://myuri"))) shouldBe Right(doc)
  }
}
