package graft.compile

import java.net.InetSocketAddress
import com.sun.net.httpserver.HttpServer
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** The `http(s):` branch of [[SchemaSources]] (reference
  * `JsonSource.scala:44-56`), exercised against a loopback server — the
  * sandbox has no egress, so the mock is the live-HTTP stand-in.
  */
class HttpSourceSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private var server: HttpServer = _
  private def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def serve(path: String, status: Int, body: String): Unit =
      server.createContext(path, exchange => {
        val bytes = body.getBytes("UTF-8")
        exchange.sendResponseHeaders(status, bytes.length)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      })
    serve("/remote-schema.json", 200,
      """{ "id": "http://example.test/remote-schema.json#",
        |  "type": "object",
        |  "properties": { "x": { "type": "integer", "minimum": 0 } } }""".stripMargin)
    serve("/broken.json", 404, "gone")
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private val networked = SchemaSources(Map.empty, allowNetwork = true)

  "SchemaSources" should "load a remote document over HTTP and resolve $refs into it" in {
    val schema =
      s"""{ "id": "http://example.test/root#",
         |  "type": "object",
         |  "properties": { "v": { "$$ref": "$base/remote-schema.json#/properties/x" } } }""".stripMargin
    val parsed = SchemaParser.parseString(schema, sources = networked)
    parsed.isRight shouldBe true
    val doc = parsed.toOption.get
    val v = doc.obj.get.properties("v").schema
    v.types should contain(graft.model.SimpleType.integer)
    v.number.get.range.min.get.value shouldBe BigDecimal(0)
  }

  it should "surface non-2xx responses as load errors" in {
    val schema =
      s"""{ "id": "http://example.test/root2#",
         |  "type": "object",
         |  "properties": { "v": { "$$ref": "$base/broken.json#" } } }""".stripMargin
    val parsed = SchemaParser.parseString(schema, sources = networked)
    parsed.isLeft shouldBe true
    parsed.left.getOrElse("") should include("cannot load")
    parsed.left.getOrElse("") should include("404")
  }

  it should "refuse network fetches unless explicitly opted in (SSRF/egress guard)" in {
    val schema =
      s"""{ "id": "http://example.test/root4#",
         |  "type": "object",
         |  "properties": { "v": { "$$ref": "$base/remote-schema.json#" } } }""".stripMargin
    // default SchemaSources: same live server, but allowNetwork=false
    val parsed = SchemaParser.parseString(schema, sources = SchemaSources.empty)
    parsed.isLeft shouldBe true
    parsed.left.getOrElse("") should include("network fetching is disabled")
  }

  it should "prefer registered in-memory documents over the network" in {
    // URI never served by the mock: must come from the registered map
    val remote = Js.parse("""{ "type": "string", "maxLength": 3 }""").toOption.get
    val sources = SchemaSources(Map(
      new java.net.URI("http://unreachable.test/doc.json#") -> remote))
    val schema =
      """{ "id": "http://example.test/root3#",
        |  "type": "object",
        |  "properties": { "v": { "$ref": "http://unreachable.test/doc.json#" } } }""".stripMargin
    val parsed = SchemaParser.parseString(schema, sources = sources)
    parsed.isRight shouldBe true
    parsed.toOption.get.obj.get.properties("v").schema.string.get.maxLength shouldBe Some(3)
  }
}
