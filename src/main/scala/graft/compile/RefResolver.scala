package graft.compile

import java.net.URI
import org.json4s._
import graft.pointer.{JsonPointer, JsonPointerResolver}

/** JSON-Reference dereferencing with cycle safety.
  *
  * Re-expresses the reference's resolver
  * (`/root/reference/src/main/scala/json/reference/ReferenceResolver.scala:25-53`)
  * and traverser (`ReferenceTraverser.scala:21-104`):
  *  - every object node with a *string* `$ref` field is replaced by the
  *    resolved target; the replacement is NOT re-traversed (the target was
  *    dereferenced recursively on its own);
  *  - a `$ref` already on the in-progress stack is left as the literal
  *    `{"$ref": "<uri>"}` node — cycles terminate unresolved
  *    (reference `ReferenceResolver.scala:26-27`);
  *  - fragment-only refs (`#...`) resolve against the current document
  *    root; absolute refs load via the loader after
  *    `resolveAsPointer(rootURI, ref)`;
  *  - resolution failures surface as `reference <uri> not found: <cause>`.
  */
class RefResolver(sources: SchemaSources) {

  type Loader = URI => Either[String, (JValue, URI)]

  // memoized loads keyed by fragment-stripped URI (reference JsonSource.scala:60-72)
  private val cache = scala.collection.mutable.Map.empty[URI, JValue]

  protected def defaultLoader: Loader = { uri =>
    val key = uri.resolve("#")
    cache.get(key).map(j => Right((j, uri))).getOrElse {
      sources.load(key).map { j => cache(key) = j; (j, uri) }
    }
  }

  def dereference(reference: URI, rootURI: URI, loader: Loader, inprogress: List[URI]): Either[String, JValue] =
    if (inprogress.contains(reference))
      Right(JObject(List("$ref" -> JString(reference.toString))))
    else
      loader(reference).flatMap { case (root, updatedReference) =>
        JsonPointerResolver(updatedReference)(root).flatMap { pointedNode =>
          val stack = reference :: inprogress
          traverse(pointedNode) { ref =>
            val resolved =
              if (ref.toString.startsWith("#"))
                dereferenceInline(ref, root, rootURI, stack)
              else
                dereference(JsonPointer.resolveAsPointer(rootURI, ref), rootURI, defaultLoader, stack)
            resolved.left.map(cause => s"reference $ref not found: $cause")
          }
        }
      }

  def dereferenceInline(pointer: URI, root: JValue, rootURI: URI, inprogress: List[URI]): Either[String, JValue] =
    dereference(pointer, rootURI, _ => Right((root, pointer)), inprogress)

  /** Replace every string-`$ref` object node via `resolve`. */
  private def traverse(node: JValue)(resolve: URI => Either[String, JValue]): Either[String, JValue] =
    node match {
      case obj @ JObject(fields) =>
        Js.stringField(obj, "$ref") match {
          case Some(refStr) =>
            Js.parseUri(refStr).flatMap(resolve)
          case None =>
            fields.foldRight(Right(Nil): Either[String, List[JField]]) { case ((k, v), acc) =>
              for (t <- acc; nv <- traverse(v)(resolve)) yield (k -> nv) :: t
            }.map(JObject(_))
        }
      case JArray(elems) =>
        elems.foldRight(Right(Nil): Either[String, List[JValue]]) { (v, acc) =>
          for (t <- acc; nv <- traverse(v)(resolve)) yield nv :: t
        }.map(JArray(_))
      case other => Right(other)
    }
}

object RefResolver {
  /** Entry point matching the reference's `ReferenceResolver.resolveFrom`
    * (`ReferenceResolver.scala:59-66`).
    */
  def resolveFrom(rootURI: URI, root: JValue, sources: SchemaSources = SchemaSources.empty): Either[String, JValue] =
    new RefResolver(sources).dereferenceInline(rootURI, root, rootURI, Nil)
}

/** Scope-aware resolver (reference `JsonSchemaParser.scala:22-53`):
  * prefers the discovered scope map over loading; loaded documents are
  * re-expanded against the reference they were loaded from; every
  * dereferenced object result is stamped with the loading reference in
  * its `id` field when absent (behavior pinned by the reference's
  * `JsonSchemaParserTest.scala:254-274`).
  */
class ScopeRefResolver(resolutionScope: Map[URI, JValue], sources: SchemaSources)
    extends RefResolver(sources) {

  override protected def defaultLoader: Loader = { reference =>
    val referenceRootDoc = reference.resolve("#")
    val fromScope: Either[String, (JValue, URI)] =
      resolutionScope.get(reference).map(j => (j, referenceRootDoc))
        .orElse(resolutionScope.get(referenceRootDoc).map(j => (j, reference)))
        .toRight(s"no scope $reference")
    fromScope.left.flatMap(_ => super.defaultLoader(reference)).flatMap {
      case (json, ref) => ExpandReferences.expand(ref, json).map((_, ref))
    }
  }

  override def dereference(reference: URI, rootURI: URI, loader: Loader, inprogress: List[URI]): Either[String, JValue] =
    super.dereference(reference, rootURI, loader, inprogress).map {
      case obj @ JObject(fields) if !fields.exists(_._1 == "id") =>
        JObject(fields :+ ("id" -> JString(reference.toString)))
      case other => other
    }
}

/** Where `$ref`s may load documents from — the analogue of the
  * reference's `JsonSource` instances (`JsonSource.scala:44-56`:
  * in-memory string, `file:`, and `http(s):` via a URL stream).
  * Registered in-memory documents take precedence (tests and offline
  * runs pre-register remote documents); then `file:`; then — ONLY when
  * `allowNetwork` is explicitly enabled — a live `http(s):` GET.
  * Network fetching is opt-in because a driver-side GET for any
  * unregistered remote `$ref` is an SSRF/egress vector for untrusted
  * schema documents, and a remote document change silently changes the
  * compiled constraints (non-reproducible validation runs). All
  * failures surface as `cannot load <uri>: <cause>` so callers can
  * classify offline-only failures.
  */
final case class SchemaSources(docs: Map[URI, JValue], allowNetwork: Boolean = false) {
  def load(uri: URI): Either[String, JValue] = {
    val key = uri.resolve("#")
    docs.get(key).map(Right(_)).getOrElse {
      uri.getScheme match {
        case "file" => Js.parseFile(new java.io.File(uri.getPath))
        case "http" | "https" =>
          if (allowNetwork) SchemaSources.fetchHttp(key)
          else Left(s"cannot load $uri: network fetching is disabled " +
            "(pre-register the document, or opt in with SchemaSources(..., allowNetwork = true))")
        case other => Left(s"cannot load $uri: unsupported scheme $other")
      }
    }
  }
}

object SchemaSources {
  val empty: SchemaSources = SchemaSources(Map.empty)

  // schema compilation is a rare driver-side step; one shared client.
  // Timeouts stay short: in an offline environment an unregistered
  // remote ref should fail fast, not hang the compile.
  private lazy val httpClient = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(3))
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .build()

  /** Cap on a fetched schema document (schemas are small; an unbounded
    * read into a String would let a misbehaving server OOM the driver).
    */
  private val maxSchemaBytes = 8 * 1024 * 1024

  private[compile] def fetchHttp(uri: URI): Either[String, JValue] =
    try {
      val req = java.net.http.HttpRequest.newBuilder(uri)
        .timeout(java.time.Duration.ofSeconds(10)).GET().build()
      val resp = httpClient.send(req, java.net.http.HttpResponse.BodyHandlers.ofInputStream())
      try {
        if (resp.statusCode() / 100 != 2) Left(s"cannot load $uri: HTTP ${resp.statusCode()}")
        else {
          val bytes = resp.body().readNBytes(maxSchemaBytes + 1)
          if (bytes.length > maxSchemaBytes)
            Left(s"cannot load $uri: document exceeds $maxSchemaBytes bytes")
          else Js.parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
        }
      } finally resp.body().close()
    } catch {
      case scala.util.control.NonFatal(e) => Left(s"cannot load $uri: ${e.getMessage}")
    }
}
