package graft.functions

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import graft.SparkTestBase

/** [[ForAllExpr]] must be drop-in equivalent to Spark's `forall` HOF
  * (including three-valued logic: false beats null beats true) while
  * staying on the whole-stage-codegen path.
  */
class ForAllSpec extends AnyFlatSpec with Matchers {

  private lazy val spark = SparkTestBase.spark

  private def intArrays = {
    import spark.implicits._
    Seq(
      (0L, Seq[Integer](1, 2, 3)),
      (1L, Seq[Integer](2, 4, 6)),
      (2L, Seq[Integer]()),
      (3L, Seq[Integer](2, null, 4)),   // null element, rest true -> null
      (4L, Seq[Integer](2, null, 5)),   // null element + false -> false
      (5L, null.asInstanceOf[Seq[Integer]]), // null array -> null
      (6L, Seq[Integer](null))
    ).toDF("id", "xs")
  }

  // three-valued predicate: null for odd elements, x > 2 for even ones
  private def pred(x: org.apache.spark.sql.Column) =
    when(x % 2 === 0, x > 2).otherwise(lit(null).cast("boolean"))

  it should "match forall() on ints for every null/empty shape" in {
    val rows = intArrays.select(
      col("id"),
      forall(col("xs"), pred).as("hof"),
      ForAllFunctions.forallCodegen(col("xs"), IntegerType, pred).as("cg"))
      .collect()
    rows.foreach { r =>
      withClue(s"id=${r.getLong(0)}: ")(r.isNullAt(2) shouldBe r.isNullAt(1))
      if (!r.isNullAt(1))
        withClue(s"id=${r.getLong(0)}: ")(r.getBoolean(2) shouldBe r.getBoolean(1))
    }
  }

  it should "match forall() in interpreted mode (codegen disabled)" in {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val rows = intArrays.select(
        col("id"),
        forall(col("xs"), pred).as("hof"),
        ForAllFunctions.forallCodegen(col("xs"), IntegerType, pred).as("cg"))
        .collect()
      rows.foreach { r =>
        withClue(s"id=${r.getLong(0)}: ")(r.isNullAt(2) shouldBe r.isNullAt(1))
        if (!r.isNullAt(1))
          withClue(s"id=${r.getLong(0)}: ")(r.getBoolean(2) shouldBe r.getBoolean(1))
      }
    } finally {
      // restore the PRIOR values — the session is a shared singleton, and
      // leaving CODEGEN_ONLY behind would turn later suites' codegen
      // fallbacks into order-dependent failures
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  it should "agree with forall() on randomized string arrays and predicates" in {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = (0 until 500).map { i =>
      val n = rnd.nextInt(6)
      val xs = Seq.fill(n)(if (rnd.nextInt(8) == 0) null
        else rnd.alphanumeric.take(1 + rnd.nextInt(5)).mkString)
      (i.toLong, if (rnd.nextInt(20) == 0) null else xs)
    }.toDF("id", "xs")
    def p(x: org.apache.spark.sql.Column) = x.isNull ||
      (org.apache.spark.sql.functions.length(x) <= 3 && x.rlike("^[a-zA-Z]"))
    val rows = data.select(
      forall(col("xs"), p).as("hof"),
      ForAllFunctions.forallCodegen(col("xs"), StringType, p).as("cg")).collect()
    rows.foreach { r =>
      r.isNullAt(1) shouldBe r.isNullAt(0)
      if (!r.isNullAt(0)) r.getBoolean(1) shouldBe r.getBoolean(0)
    }
  }

  it should "run on a codegen-capable plan (spark.range source) without fallback" in {
    // spark.range keeps the plan inside WholeStageCodegen (a literal
    // DataFrame folds to LocalTableScan with no codegen span)
    val df = spark.range(1000).select(
      ForAllFunctions.forallCodegen(
        array(col("id") % 7, col("id") % 5), org.apache.spark.sql.types.LongType,
        x => x < 6).as("ok"))
    val plan = df.queryExecution.executedPlan
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen
    // stage; the Project carrying forall_codegen must be inside one
    plan.toString.linesIterator.next().trim should startWith("*(")
    // correctness of the windowed result
    val n = df.filter(col("ok")).count()
    // ok == (id%7 < 6 && id%5 < 6) == id%7 != 6
    n shouldBe (0 until 1000).count(i => i % 7 < 6)
  }

  it should "compile under splitExpressions (large predicate, row-based codegen)" in {
    // Regression: a predicate large enough that CaseWhen's codegen calls
    // splitExpressionsWithCurrentInputs in row-based (GeneratePredicate)
    // mode extracts helper methods that only receive the input row. When
    // the element value/isNull were method-locals, those helpers
    // referenced them out of scope and janino rejected the class
    // ("faElemIsNull_0 is not an rvalue"), silently falling back to
    // interpreted mode. Element vars are now class fields; this pins it
    // by calling GeneratePredicate.generate directly — it THROWS on a
    // compile failure instead of falling back.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BindReferences
    import org.apache.spark.sql.catalyst.expressions.codegen.GeneratePredicate
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}

    // scalatest's Matchers shadows functions.length
    val strlen = org.apache.spark.sql.functions.length _
    def bigPred(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val first = when(x === "s0", lit(true))
      (1 until 60).foldLeft(first) { (acc, i) =>
        acc.when(x === s"s$i" || strlen(x) > i + 100, lit(true))
      }.otherwise(strlen(x) <= lit(2))
    }

    // spark.range (not a literal DF): ConvertToLocalRelation would fold
    // a LocalRelation filter away before any codegen happened
    val filtered = spark.range(50)
      .select(array(concat(lit("s"), col("id")), concat(lit("t"), col("id"))).as("xs"))
      .filter(ForAllFunctions.forallCodegen(col("xs"), StringType, bigPred))
    val lf: LFilter = filtered.queryExecution.optimizedPlan.collectFirst {
      case f: LFilter => f
    }.getOrElse(fail("expected a Filter in the optimized plan"))
    val bound = BindReferences.bindReference(
      lf.condition,
      new org.apache.spark.sql.catalyst.expressions.AttributeSeq(lf.child.output))

    // (a) the shape genuinely splits: helper methods get extracted
    val ctx = GeneratePredicate.newCodeGenContext()
    bound.genCode(ctx)
    ctx.declareAddedFunctions() should include("private")

    // (b) the generated class compiles (throws on janino failure)...
    val predicate = GeneratePredicate.generate(bound, false)
    predicate.initialize(0)

    // (c) ...and evaluates correctly through the generated code. The
    // optimizer pushes the Filter below the Project, so the bound
    // condition's input row is range's (id: bigint); xs = [s{id}, t{id}]
    // and the predicate holds iff every element matches a branch or has
    // length <= 2 — i.e. iff id < 10 ("t10" is the first 3-char miss).
    predicate.eval(InternalRow(5L)) shouldBe true
    predicate.eval(InternalRow(9L)) shouldBe true
    predicate.eval(InternalRow(10L)) shouldBe false
    predicate.eval(InternalRow(42L)) shouldBe false
  }

  it should "reject a mistyped element at analysis" in {
    import spark.implicits._
    val df = Seq((1L, Seq("a"))).toDF("id", "xs")
    val ex = intercept[Exception] {
      df.select(ForAllFunctions.forallCodegen(col("xs"), IntegerType, _ > 0)).collect()
    }
    ex.getMessage.toLowerCase should include("forall_codegen")
  }
}
