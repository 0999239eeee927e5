package graft.cli

import java.io.File
import java.net.URI
import graft.compile.{SchemaParser, TableSchemaCompiler}

/** CLI schema validator — semantics of the reference's
  * `json/schema/validator/JsonSchemaValidator.scala:13-31`:
  * one argument, tried as URI then as File; prints
  * `valid schema at <addr>` to stdout or `invalid schema at <addr>: <err>`
  * to stderr; wrong arg count prints usage and exits 1.
  * `--table` additionally requires the schema to bind to a flat table
  * (root object with properties), printing the bound columns.
  */
object SchemaValidatorMain {

  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    val unknownFlags = flags.filterNot(_ == "--table")
    positional.toList match {
      case _ if unknownFlags.nonEmpty =>
        // a typo like --tables must not silently skip the table-binding
        // check and report success
        System.err.println(s"unknown flag(s): ${unknownFlags.mkString(", ")}")
        System.err.println("usage: SchemaValidatorMain [--table] <schema-uri-or-file>")
        System.exit(1)
      case addr :: Nil =>
        val parsed =
          parseAddr(addr).flatMap { doc =>
            if (flags.contains("--table"))
              TableSchemaCompiler.compile(doc).map { ts =>
                s"valid schema at $addr (table columns: ${ts.columns.keys.mkString(", ")})"
              }
            else Right(s"valid schema at $addr")
          }
        parsed match {
          case Right(msg) => println(msg)
          case Left(err) =>
            System.err.println(s"invalid schema at $addr: $err")
            System.exit(2)
        }
      case _ =>
        System.err.println("usage: SchemaValidatorMain [--table] <schema-uri-or-file>")
        System.exit(1)
    }
  }

  private def parseAddr(addr: String) = {
    val asFile = new File(addr)
    if (asFile.exists()) SchemaParser.parseFile(asFile)
    else
      // URI addresses resolve only for file: scheme offline
      graft.compile.Js.parseUri(addr) match {
        // opaque file: URIs ("file:x.json") have a null path — guard it
        // or new File(null) NPEs past the error protocol
        case Right(u) if u.getScheme == "file" && u.getPath != null =>
          SchemaParser.parseFile(new File(u.getPath))
        case _ => Left(s"cannot open $addr (not a file; no network in sandbox)")
      }
  }
}
