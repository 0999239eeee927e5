package graft.compile

import java.io.File
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Corpus conformance: the reference's 32 real-world valid schemas and 5
  * cyclic/recursive schemas (vendored into
  * `src/test/resources/corpus/json/schema/parser/{valid,recursive}/` from
  * the reference's public test resources, asserted en masse by its
  * `JsonSchemaParserTest.scala:289-311`) must compile — or, offline, fail
  * only because a remote document cannot be fetched (the reference test
  * ran with live HTTP; this sandbox has none). Recursive schemas
  * additionally pin cycle-safe termination. The suite is self-contained:
  * it does not require the reference tree to be mounted.
  */
class CorpusSpec extends AnyFlatSpec with Matchers {

  private def corpusDir(sub: String): File =
    new File(getClass.getResource(s"/corpus/json/schema/parser/$sub").toURI)

  // The corpus' only remote dependencies are json.schemastore.org docs
  // the reference fetched over live HTTP; the same documents ship in the
  // corpus, so register them as in-memory sources (exercising the
  // remote-load path offline).
  private val sources: SchemaSources = {
    val docs = Seq("grunt-task", "jshintrc").map { name =>
      val f = new File(corpusDir("valid"), s"$name.json")
      new java.net.URI(s"http://json.schemastore.org/$name#") -> Js.parseFile(f).toOption.get
    }
    SchemaSources(docs.toMap)
  }

  private def parseAll(d: File): Seq[(String, Either[String, graft.model.SchemaDoc])] = {
    d.listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName).toSeq
      .map(f => f.getName -> SchemaParser.parseFile(f, sources))
  }

  "SchemaParser" should "compile the reference's valid-schema corpus" in {
    val results = parseAll(corpusDir("valid"))
    results should not be empty
    val failures = results.collect { case (n, Left(e)) => (n, e) }
    failures.foreach { case (n, e) => info(s"offline-failure $n: ${e.take(160)}") }
    // offline-only failures must be remote-load errors, nothing else
    failures.filterNot(_._2.contains("cannot load")) shouldBe empty
    val succeeded = results.count(_._2.isRight)
    succeeded shouldBe results.size // 32/32 with grunt-task registered
  }

  it should "terminate on the recursive corpus (cyclic schemas)" in {
    val results = parseAll(corpusDir("recursive"))
    results.size shouldBe 5
    val failures = results.collect { case (n, Left(e)) => (n, e) }
    failures.filterNot(_._2.contains("cannot load")) shouldBe empty
  }
}
