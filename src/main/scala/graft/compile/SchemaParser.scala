package graft.compile

import java.net.URI
import org.json4s._
import graft.model.SchemaDoc

/** The compile pipeline: load -> expand -> scope-discover -> dereference
  * -> decode (reference
  * `/root/reference/src/main/scala/json/schema/parser/JsonSchemaParser.scala:55-82`).
  *
  * Runs entirely driver-side; the resulting [[SchemaDoc]] is bound to
  * table columns by [[TableSchemaCompiler]] and compiled into Catalyst
  * expressions by [[graft.exprs.ConstraintCompiler]] — the compiled plan
  * (not this object) is what ships to executors.
  */
object SchemaParser {

  val defaultUri = new URI("#")

  /** expand + scopes + dereference, without decoding. */
  def read(rootUri: URI, json: JValue, sources: SchemaSources = SchemaSources.empty): Either[String, JValue] =
    for {
      expanded <- ExpandReferences.expand(rootUri, json)
      scopeMap <- ScopeDiscovery.scopes(rootUri, expanded)
      resolved <- new ScopeRefResolver(scopeMap, sources)
        .dereferenceInline(rootUri, expanded, rootUri, Nil)
    } yield resolved

  def parse(rootUri: URI, json: JValue, sources: SchemaSources = SchemaSources.empty): Either[String, SchemaDoc] =
    read(rootUri, json, sources).flatMap(SchemaDecoder.decode(rootUri, _))

  def parseString(schema: String, rootUri: URI = defaultUri, sources: SchemaSources = SchemaSources.empty): Either[String, SchemaDoc] =
    Js.parse(schema).flatMap(parse(rootUri, _, sources))

  def parseFile(f: java.io.File, sources: SchemaSources = SchemaSources.empty): Either[String, SchemaDoc] =
    Js.parseFile(f).flatMap(parse(f.toURI, _, sources))
}
