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

/** Where `$ref`s may load documents from. The sandbox has no network;
  * the reference's HTTP `JsonSource[URI]` maps to registered in-memory
  * documents plus local files (`file:` URIs).
  */
final case class SchemaSources(docs: Map[URI, JValue]) {
  def load(uri: URI): Either[String, JValue] = {
    val key = uri.resolve("#")
    docs.get(key).map(Right(_)).getOrElse {
      if (uri.getScheme == "file")
        Js.parseFile(new java.io.File(uri.getPath))
      else Left(s"cannot load $uri: unknown document (no network in sandbox)")
    }
  }
}

object SchemaSources {
  val empty: SchemaSources = SchemaSources(Map.empty)
}
