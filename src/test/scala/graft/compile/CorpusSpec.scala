package graft.compile

import java.io.File
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Corpus conformance: the reference's 32 real-world valid schemas and 5
  * cyclic/recursive schemas (`/root/reference/src/test/resources/json/schema/parser/{valid,recursive}/`,
  * asserted en masse by `JsonSchemaParserTest.scala:289-311`) must compile
  * — or, offline, fail only because a remote document cannot be fetched
  * (the reference test ran with live HTTP; this sandbox has none).
  * Recursive schemas additionally pin cycle-safe termination.
  */
class CorpusSpec extends AnyFlatSpec with Matchers {

  // The corpus' only remote dependencies are json.schemastore.org docs
  // the reference fetched over live HTTP; the same documents ship in the
  // corpus, so register them as in-memory sources (exercising the
  // remote-load path offline).
  private val sources: SchemaSources = {
    val base = "/root/reference/src/test/resources/json/schema/parser/valid"
    val docs = Seq("grunt-task", "jshintrc").flatMap { name =>
      val f = new File(s"$base/$name.json")
      if (f.exists())
        Some(new java.net.URI(s"http://json.schemastore.org/$name#") -> Js.parseFile(f).toOption.get)
      else None
    }
    SchemaSources(docs.toMap)
  }

  private def parseAll(dir: String): Seq[(String, Either[String, graft.model.SchemaDoc])] = {
    val d = new File(dir)
    assume(d.isDirectory)
    d.listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName).toSeq
      .map(f => f.getName -> SchemaParser.parseFile(f, sources))
  }

  "SchemaParser" should "compile the reference's valid-schema corpus" in {
    val results = parseAll("/root/reference/src/test/resources/json/schema/parser/valid")
    results should not be empty
    val failures = results.collect { case (n, Left(e)) => (n, e) }
    failures.foreach { case (n, e) => info(s"offline-failure $n: ${e.take(160)}") }
    // offline-only failures must be remote-load errors, nothing else
    failures.filterNot(_._2.contains("cannot load")) shouldBe empty
    val succeeded = results.count(_._2.isRight)
    succeeded shouldBe results.size // 32/32 with grunt-task registered
  }

  it should "terminate on the recursive corpus (cyclic schemas)" in {
    val results = parseAll("/root/reference/src/test/resources/json/schema/parser/recursive")
    results.size shouldBe 5
    val failures = results.collect { case (n, Left(e)) => (n, e) }
    failures.filterNot(_._2.contains("cannot load")) shouldBe empty
  }
}
