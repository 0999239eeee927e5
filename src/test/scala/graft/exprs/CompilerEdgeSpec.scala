package graft.exprs

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase
import graft.compile.TableSchemaCompiler

/** Edge-case semantics of the constraint compiler:
  * heterogeneous combinators, additionalProperties with non-scalar
  * sub-schemas, DATE columns under format:date-time, and exact-decimal
  * bound comparisons.
  */
class CompilerEdgeSpec extends AnyFlatSpec with Matchers {

  private lazy val spark = SparkTestBase.spark

  private def validate(schemaJson: String, df: org.apache.spark.sql.DataFrame) = {
    val ts = TableSchemaCompiler.compileString(schemaJson)
      .fold(e => throw new IllegalArgumentException(e), identity)
    Validator.violations(df, ts, Seq("conv_id", "turn_idx"))
      .collect().map(r => (r.getAs[Int]("turn_idx"), r.getAs[String]("constraint"))).toSet
  }

  "combinators" should "treat a type-incompatible branch as non-matching, not a compile error" in {
    import spark.implicits._
    // classic draft-4 idiom: oneOf over heterogeneous types; on a string
    // column the integer branch is simply false
    val schema = """
    {
      "type": "object",
      "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id":  { "type": "string" },
        "turn_idx": { "type": "integer" },
        "v": { "oneOf": [ { "type": "string", "pattern": "^ok" }, { "type": "integer" } ] }
      }
    }"""
    val df = Seq(
      ("c1", 0, "ok_value"), // matches string branch only -> exactly one
      ("c1", 1, "nope")      // matches neither -> oneOf violation
    ).toDF("conv_id", "turn_idx", "v")
    validate(schema, df) shouldBe Set((1, "oneOf"))
  }

  it should "evaluate not(incompatible-branch) as passing" in {
    import spark.implicits._
    val schema = """
    {
      "type": "object",
      "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id":  { "type": "string" },
        "turn_idx": { "type": "integer" },
        "v": { "not": { "type": "integer" } }
      }
    }"""
    val df = Seq(("c1", 0, "anything")).toDF("conv_id", "turn_idx", "v")
    validate(schema, df) shouldBe Set.empty
  }

  "additionalProperties" should "compile combinator-form sub-schemas (no fail-open)" in {
    import spark.implicits._
    val schema = """
    {
      "type": "object",
      "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id":  { "type": "string" },
        "turn_idx": { "type": "integer" },
        "attrs": {
          "type": "object",
          "properties": { "kind": {} },
          "additionalProperties": { "not": { "type": "string", "pattern": "^bad" } }
        }
      }
    }"""
    val df = Seq(
      ("c1", 0, Map("kind" -> "bad_is_fine_here", "k" -> "good")), // clean
      ("c1", 1, Map("k" -> "bad_value"))                           // caught via `not`
    ).toDF("conv_id", "turn_idx", "attrs")
    validate(schema, df) shouldBe Set((1, "additionalProperties"))
  }

  it should "exempt patternProperties-matched keys (draft-4 §5.4.4)" in {
    import spark.implicits._
    val schema = """
    {
      "type": "object",
      "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id":  { "type": "string" },
        "turn_idx": { "type": "integer" },
        "attrs": {
          "type": "object",
          "patternProperties": { "^x_": { "type": "string", "pattern": "^[0-9]+$" } },
          "additionalProperties": { "type": "string", "maxLength": 4 }
        }
      }
    }"""
    val df = Seq(
      ("c1", 0, Map("x_1" -> "123456789")), // matches ^x_ -> NOT additional, passes pattern
      ("c1", 1, Map("other" -> "toolong")) // truly additional -> maxLength
    ).toDF("conv_id", "turn_idx", "attrs")
    validate(schema, df) shouldBe Set((1, "additionalProperties"))
  }

  it should "still treat the permissive schema as absent" in {
    import spark.implicits._
    val schema = """
    {
      "type": "object",
      "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id":  { "type": "string" },
        "turn_idx": { "type": "integer" },
        "attrs": { "type": "object", "additionalProperties": true }
      }
    }"""
    val df = Seq(("c1", 0, Map("anything" -> "goes"))).toDF("conv_id", "turn_idx", "attrs")
    validate(schema, df) shouldBe Set.empty
  }

  "type:string + format:date-time" should "accept a physical DATE column" in {
    import spark.implicits._
    val schema = """
    {
      "type": "object",
      "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id":  { "type": "string" },
        "turn_idx": { "type": "integer" },
        "d": { "type": "string", "format": "date-time" }
      }
    }"""
    val df = Seq(("c1", 0, java.sql.Date.valueOf("2026-01-01")))
      .toDF("conv_id", "turn_idx", "d")
    df.schema("d").dataType shouldBe DateType
    validate(schema, df) shouldBe Set.empty
  }

  "decimal bounds" should "compare in exact decimal arithmetic" in {
    import spark.implicits._
    // 1.000000000000000001 > 1.0 only in decimal; as a double both are 1.0
    val df = Seq(("c1", 0, BigDecimal("1.000000000000000001")),
                 ("c1", 1, BigDecimal("1.000000000000000000")))
      .toDF("conv_id", "turn_idx", "v")
      .withColumn("v", col("v").cast(DecimalType(38, 18)))
    val schema = """
    {
      "type": "object",
      "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id":  { "type": "string" },
        "turn_idx": { "type": "integer" },
        "v": { "type": "number", "maximum": 1.0 }
      }
    }"""
    validate(schema, df) shouldBe Set((0, "maximum"))
  }

  """type:"null"""" should "make the nullable oneOf idiom work and flag non-null values standalone" in {
    import spark.implicits._
    val df = Seq(
      ("c1", 0, Some("short")),
      ("c1", 1, None: Option[String]),
      ("c1", 2, Some("definitely too long"))
    ).toDF("conv_id", "turn_idx", "v")
    // oneOf [string(maxLength), null]: null row passes, short passes,
    // long fails — previously EVERY non-null row matched both branches
    val nullable = """
    {
      "type": "object", "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id": { "type": "string" }, "turn_idx": { "type": "integer" },
        "v": { "oneOf": [ { "type": "string", "maxLength": 8 }, { "type": "null" } ] }
      }
    }"""
    validate(nullable, df) shouldBe Set((2, "oneOf"))
    // bare type:"null": every NON-null value violates (was fail-open)
    val nullOnly = """
    {
      "type": "object", "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id": { "type": "string" }, "turn_idx": { "type": "integer" },
        "v": { "type": "null" }
      }
    }"""
    validate(nullOnly, df) shouldBe Set((0, "type:null"), (2, "type:null"))
  }

  "integral literals beyond the column's range" should "match nothing instead of truncating" in {
    import spark.implicits._
    val df = Seq(("c1", 0, 1L), ("c1", 1, 2L)).toDF("conv_id", "turn_idx", "v")
    // enum:[1.5] on a long column: NO long equals 1.5 -> both rows
    // violate (bd.toLong used to truncate 1.5 to 1 and accept row 0)
    val enumFrac = """
    {
      "type": "object", "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id": { "type": "string" }, "turn_idx": { "type": "integer" },
        "v": { "enum": [1.5] }
      }
    }"""
    validate(enumFrac, df) shouldBe Set((0, "enum"), (1, "enum"))
    // enum may carry null (draft-4): dropped, nulls pass anyway
    val enumNull = """
    {
      "type": "object", "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id": { "type": "string" }, "turn_idx": { "type": "integer" },
        "v": { "enum": [1, null] }
      }
    }"""
    validate(enumNull, df) shouldBe Set((1, "enum"))
    // minimum 2^63 (beyond Long): EVERY long violates (used to wrap to
    // Long.MinValue and pass everything)
    val bigMin = """
    {
      "type": "object", "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id": { "type": "string" }, "turn_idx": { "type": "integer" },
        "v": { "type": "integer", "minimum": 9223372036854775808 }
      }
    }"""
    validate(bigMin, df) shouldBe Set((0, "minimum"), (1, "minimum"))
  }

  "multipleOf on a double column" should "classify out-of-decimal-range values instead of crashing (ANSI)" in {
    import spark.implicits._
    val df = Seq(("c1", 0, 1.0e30), ("c1", 1, 0.3)).toDF("conv_id", "turn_idx", "v")
    val schema = """
    {
      "type": "object", "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id": { "type": "string" }, "turn_idx": { "type": "integer" },
        "v": { "type": "number", "multipleOf": 0.5 }
      }
    }"""
    // 1e30 overflows decimal(38,12): falls back to double remainder
    // (it IS a multiple of 0.5) instead of an ANSI CAST_OVERFLOW crash
    validate(schema, df) shouldBe Set((1, "multipleOf"))
  }

  "one-entry tuple items" should "constrain only element 0 and honor additionalItems" in {
    import spark.implicits._
    val df = Seq(
      ("c1", 0, Seq("a1", "b2")),  // [schema] form: element 1 unconstrained
      ("c1", 1, Seq("b2")),        // element 0 violates the positional schema
      ("c1", 2, Seq("a1"))         // clean
    ).toDF("conv_id", "turn_idx", "v")
    val tupleOne = """
    {
      "type": "object", "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id": { "type": "string" }, "turn_idx": { "type": "integer" },
        "v": { "type": "array", "items": [ { "type": "string", "pattern": "^a" } ] }
      }
    }"""
    // previously the [s] form compiled as schema-form and flagged "b2"
    // in row 0 too
    validate(tupleOne, df) shouldBe Set((1, "items[0]"))
    val tupleNoExtra = """
    {
      "type": "object", "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id": { "type": "string" }, "turn_idx": { "type": "integer" },
        "v": { "type": "array", "items": [ { "type": "string", "pattern": "^a" } ], "additionalItems": false }
      }
    }"""
    // ...and additionalItems:false was silently dropped for 1-entry tuples
    validate(tupleNoExtra, df) shouldBe Set((0, "additionalItems"), (1, "items[0]"))
  }

  "bindReport" should "classify every declared and physical column in one diagnostic view" in {
    val schema = TableSchemaCompiler.compileString("""
      { "type": "object", "required": ["conv_id"],
        "properties": {
          "conv_id":  { "type": "string" },
          "turn_idx": { "type": "integer" },
          "gone_req": { "type": "string" },
          "gone_opt": { "type": "string" },
          "badbind":  { "type": "string", "enum": [1, 2] } } }""").toOption.get
    // required is a PROPERTY attribute in draft-4's root "required" list:
    // re-mark gone_req required through the table compiler contract
    val schemaReq = schema.copy(columns = schema.columns.map {
      case (n, p) if n == "gone_req" => n -> p.copy(required = true)
      case other => other
    })
    val physical = StructType(Seq(
      StructField("conv_id", StringType),
      StructField("turn_idx", IntegerType),
      StructField("badbind", StringType),
      StructField("surprise", DoubleType)))
    val rows = ConstraintCompiler.bindReport(schemaReq, physical)
      .map(b => b.column -> b.status).toMap
    rows("conv_id") shouldBe "ok"
    rows("turn_idx") shouldBe "ok"
    rows("gone_req") shouldBe "missing_required"
    rows("gone_opt") shouldBe "missing_optional"
    rows("badbind") shouldBe "uncompilable" // numeric enum on a string column
    rows("surprise") shouldBe "undeclared"
    // the diagnostic view reports ALL problems where compile fails at the first
    ConstraintCompiler.compile(schemaReq, physical).isLeft shouldBe true
  }

  it should "surface dependency references to missing columns as compile errors, not AnalysisException" in {
    val schema = TableSchemaCompiler.compileString("""
      { "type": "object",
        "properties": { "a": { "type": "string" } },
        "dependencies": { "a": ["ghost"] } }""").toOption.get
    val physical = StructType(Seq(StructField("a", StringType)))
    val err = ConstraintCompiler.compile(schema, physical)
    err.isLeft shouldBe true
    err.left.toOption.get should include("ghost")
    // and the bind report carries the same diagnosis
    ConstraintCompiler.bindReport(schema, physical)
      .find(_.column == "<dependencies>").map(_.status) shouldBe Some("uncompilable")
    // trigger column absent from the table: dependency is vacuous, not an error
    val schemaVacuous = TableSchemaCompiler.compileString("""
      { "type": "object",
        "properties": { "b": { "type": "string" } },
        "dependencies": { "gone": ["b"] } }""").toOption.get
    val phys2 = StructType(Seq(StructField("b", StringType)))
    ConstraintCompiler.compile(schemaVacuous, phys2).isRight shouldBe true
  }
}
