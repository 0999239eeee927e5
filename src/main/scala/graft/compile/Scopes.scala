package graft.compile

import java.net.URI
import org.json4s._
import graft.pointer.JsonPointer

/** `id`/`$ref` absolutization and scope discovery.
  *
  * Re-expresses the reference's defunctionalized stack-machine traversers
  * (`/root/reference/src/main/scala/json/schema/scope/ExpandReferences.scala:19-75`,
  * `ScopeDiscovery.scala:18-71`, shared walker `package.scala:16-91`)
  * as plain recursion with explicitly *threaded* scope state.
  *
  * Semantics pinned from the reference:
  *  - an object with a *string* `id` field switches the scope to
  *    `resolveAsPointer(currentScope, id)` and rewrites `id` to that
  *    absolute URI; an object *without* `id` but with a string `$ref`
  *    gets `$ref` rewritten to `resolveAsPointer(currentScope, ref)`
  *    (a node with both only gets its `id` rewritten);
  *  - non-string `id`/`$ref` values are ignored; unparseable URIs abort;
  *  - **scope state threads linearly through the traversal**: after an
  *    `id`-bearing subtree, the scope is NOT restored for later-visited
  *    siblings — it leaks (the reference's state machine carries one
  *    global scope; pinned by `ScopeDiscoveryTest.scala:39-77`, which
  *    expects `schema1`'s scope to apply to a later sibling's child id:
  *    `http://my.site/schema1#pointeroverride`). This diverges from the
  *    JSON-Schema spec's lexical scoping, but reference fidelity wins;
  *  - object fields are visited in insertion order; **arrays are visited
  *    right-to-left** (reference `TArray(length-1, …)` counts down).
  *
  * In the full parse pipeline the leak is mostly invisible: expansion
  * rewrites all ids absolute first, and absolute ids resolve identically
  * under any scope.
  */
object ExpandReferences {

  def expand(rootScope: URI, json: JValue): Either[String, JValue] =
    walk(rootScope, json).map(_._2)

  /** Returns (scope-after-subtree, rewritten-node). */
  private def walk(scope: URI, node: JValue): Either[String, (URI, JValue)] = node match {
    case obj @ JObject(_) =>
      Js.stringField(obj, "id") match {
        case Some(idStr) =>
          Js.parseUri(idStr).flatMap { id =>
            val newScope = JsonPointer.resolveAsPointer(scope, id)
            val rewritten = Js.setField(obj, "id", JString(newScope.toString))
            walkObjectChildren(newScope, rewritten)
          }
        case None =>
          val withRef: Either[String, JObject] = Js.stringField(obj, "$ref") match {
            case Some(refStr) =>
              Js.parseUri(refStr).map { ref =>
                Js.setField(obj, "$ref", JString(JsonPointer.resolveAsPointer(scope, ref).toString))
              }
            case None => Right(obj)
          }
          withRef.flatMap(walkObjectChildren(scope, _))
      }
    case JArray(elems) =>
      // right-to-left, threading scope, preserving element positions
      elems.reverse.foldLeft(Right((scope, List.empty[JValue])): Either[String, (URI, List[JValue])]) {
        case (acc, elem) =>
          acc.flatMap { case (s, done) => walk(s, elem).map { case (s2, e2) => (s2, e2 :: done) } }
      }.map { case (s, rebuilt) => (s, JArray(rebuilt)) }
    case other => Right((scope, other))
  }

  private def walkObjectChildren(scope: URI, obj: JObject): Either[String, (URI, JValue)] =
    obj.obj.foldLeft(Right((scope, List.empty[JField])): Either[String, (URI, List[JField])]) {
      case (acc, (k, v)) =>
        acc.flatMap { case (s, done) =>
          v match {
            case _: JObject | _: JArray => walk(s, v).map { case (s2, v2) => (s2, done :+ (k -> v2)) }
            case _                      => Right((s, done :+ (k -> v)))
          }
        }
    }.map { case (s, fields) => (s, JObject(fields)) }
}

/** Builds the `Map[URI -> JValue]` of every `id`-bearing subtree, with the
  * root document pre-seeded at the root scope (reference
  * `ScopeDiscovery.scala:65-71`). Same threaded-scope semantics as
  * [[ExpandReferences]] (see the scope-leak note there). Recorded nodes
  * are the subtrees as-is (the pipeline runs discovery on the already
  * expanded document, so recorded ids are absolute).
  */
object ScopeDiscovery {

  private final case class S(scope: URI, scopes: Map[URI, JValue])

  def scopes(rootScope: URI, json: JValue): Either[String, Map[URI, JValue]] =
    // seed the root under BOTH the verbatim uri and its empty-fragment
    // form: java.net.URI treats "s.json" and "s.json#" as unequal, and
    // the resolver looks up reference.resolve("#") — without the alias
    // an id-less in-hand document missed its own scope and fell through
    // to (re)loading from SchemaSources
    walk(S(rootScope, Map(rootScope -> json, rootScope.resolve("#") -> json)), json)
      .map(_.scopes)

  private def walk(state: S, node: JValue): Either[String, S] = node match {
    case obj @ JObject(fields) =>
      Js.stringField(obj, "id") match {
        case Some(idStr) =>
          Js.parseUri(idStr).flatMap { id =>
            val newScope = JsonPointer.resolveAsPointer(state.scope, id)
            walkAll(S(newScope, state.scopes + (newScope -> obj)), fields.map(_._2))
          }
        case None => walkAll(state, fields.map(_._2))
      }
    case JArray(elems) => walkAll(state, elems.reverse)
    case _             => Right(state)
  }

  private def walkAll(state: S, nodes: List[JValue]): Either[String, S] =
    nodes.foldLeft(Right(state): Either[String, S])((e, n) => e.flatMap(walk(_, n)))
}
