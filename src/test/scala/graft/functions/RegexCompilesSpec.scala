package graft.functions

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge
import graft.SparkTestBase

/** `format: "regex"` expression: verdicts, null behavior, codegen path,
  * and cache-boundedness (distinct patterns beyond the LRU capacity).
  */
class RegexCompilesSpec extends AnyFlatSpec with Matchers {

  private lazy val spark = SparkTestBase.spark

  private def rc(c: org.apache.spark.sql.Column) =
    GraftSqlBridge.column(RegexCompiles(GraftSqlBridge.expression(c)))

  "RegexCompiles" should "accept compiling patterns and reject broken ones" in {
    import spark.implicits._
    val cases = Seq(
      "^v1[0-9]+$" -> true,
      ""            -> true,  // empty pattern compiles
      "a+b"         -> true,
      "(unclosed[4" -> false, // unclosed class
      "*dangling"   -> false, // dangling metacharacter
      "(?<name>x)"  -> true,  // Java named group
      "a{2,1}"      -> false) // inverted repetition range
    val got = cases.map(_._1).toDF("p")
      .select(col("p"), rc(col("p")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (p, want) => withClue(p) { got(p) shouldBe want } }
  }

  it should "be null on null input and run on the codegen path" in {
    import spark.implicits._
    Seq(Option.empty[String]).toDF("p").select(rc(col("p")))
      .collect()(0).isNullAt(0) shouldBe true
    // non-foldable source so the expression really goes through WSCG
    val n = spark.range(3000)
      .select(rc(concat(lit("^pat"), col("id").cast("string"), lit("[0-9]$"))).as("ok"))
      .filter(col("ok")).count()
    n shouldBe 3000 // 3000 distinct compiling patterns > LRU capacity: bounded cache, same verdicts
    spark.range(500)
      .select(rc(concat(lit("(broken[" ), col("id").cast("string"))).as("ok"))
      .filter(!col("ok")).count() shouldBe 500
  }

  it should "classify a deeply nested pattern as invalid instead of crashing the task" in {
    import spark.implicits._
    // Pattern.compile's recursive-descent parser overflows the stack on
    // thousands of nested groups; the validator must flag, not die
    val bomb = "(" * 20000
    Seq(bomb).toDF("p").select(rc(col("p")).as("ok"))
      .collect()(0).getBoolean(0) shouldBe false
  }
}
