package graft.pointer

import java.net.URI
import org.json4s._

/** RFC 6901 JSON Pointer: parse, escape, resolve.
  *
  * Re-expresses the semantics of the reference's combinator parser
  * (`/root/reference/src/main/scala/json/pointer/JsonPointer.scala:19-89`)
  * and resolver (`JsonPointerResolver.scala:18-44`) without the parser
  * machinery:
  *  - empty pointer string -> root pointer
  *  - each step starts with '/'; escapes `~1`->'/' and `~0`->'~'
  *    (decoded left-to-right, so "~01" -> "~1" per RFC)
  *  - an all-digits token is a numeric (array index) step, anything else
  *    a string (object key) step — matching the reference's
  *    `numeric | string` alternation under `phrase`.
  */
sealed trait Step
case object RootStep extends Step { override def toString = "[root]" }
final case class KeyStep(key: String) extends Step { override def toString = s"field $key" }
final case class IndexStep(index: Int) extends Step { override def toString = s"index $index" }

final case class JsonPointer(steps: List[Step])

object JsonPointer {

  val root: JsonPointer = JsonPointer(List(RootStep))

  /** Decode one reference-token's escapes, left-to-right. */
  def unescape(token: String): String = {
    val sb = new StringBuilder(token.length)
    var i = 0
    while (i < token.length) {
      val c = token.charAt(i)
      if (c == '~' && i + 1 < token.length && token.charAt(i + 1) == '1') { sb += '/'; i += 2 }
      else if (c == '~' && i + 1 < token.length && token.charAt(i + 1) == '0') { sb += '~'; i += 2 }
      else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Escape a raw key for embedding in a pointer: '~'->"~0", '/'->"~1". */
  def escape(key: String): String =
    key.replace("~", "~0").replace("/", "~1")

  private val allDigits = "[0-9]+".r

  def parse(pointer: String): Either[String, JsonPointer] =
    if (pointer.isEmpty) Right(root)
    else if (!pointer.startsWith("/"))
      Left(s"json pointer must start with '/': [$pointer]")
    else {
      // split preserving empty tokens ("/a//b" has an empty middle key)
      val tokens = pointer.substring(1).split("/", -1).toList
      val steps = tokens.map {
        case t if allDigits.matches(t) => IndexStep(t.toInt)
        case t                         => KeyStep(unescape(t))
      }
      Right(JsonPointer(steps))
    }

  /** Pointer from a URI fragment (reference `JsonPointer.scala:80-83`):
    * absent fragment -> root.
    */
  def fromUri(uri: URI): Either[String, JsonPointer] =
    Option(uri.getFragment).map(parse).getOrElse(Right(root))

  /** `parent.resolve(sub)`, normalizing an empty/missing fragment to `#`
    * (reference `JsonPointer.scala:85-89`).
    */
  def resolveAsPointer(parent: URI, sub: URI): URI = {
    val resolved = parent.resolve(sub)
    val frag = Option(resolved.getFragment)
    if (frag.forall(_.isEmpty)) resolved.resolve("#") else resolved
  }
}

/** Walks a pointer down a json4s document (reference
  * `JsonPointerResolver.scala:27-44`): numeric steps index arrays,
  * string steps select object fields; failures report the step and the
  * node it failed in.
  */
object JsonPointerResolver {

  def apply(uriPointer: URI)(json: JValue): Either[String, JValue] =
    JsonPointer.fromUri(uriPointer).flatMap(p => apply(p)(json))

  def apply(pointer: JsonPointer)(json: JValue): Either[String, JValue] = {
    @annotation.tailrec
    def go(steps: List[Step], node: JValue): Either[String, JValue] = steps match {
      case Nil => Right(node)
      case step :: rest =>
        val next: Option[JValue] = step match {
          case RootStep => Some(node)
          case KeyStep(k) =>
            node match {
              case JObject(fields) => fields.collectFirst { case (`k`, v) => v }
              case _               => None
            }
          case IndexStep(i) =>
            node match {
              case JArray(elems) if i >= 0 && i < elems.length => Some(elems(i))
              case _                                           => None
            }
        }
        next match {
          case Some(n) => go(rest, n)
          case None    => Left(s"$step not found in ${graft.compile.Js.compact(node)}")
        }
    }
    go(pointer.steps, json)
  }
}
