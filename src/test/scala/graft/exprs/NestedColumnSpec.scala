package graft.exprs

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.SparkTestBase
import graft.compile.TableSchemaCompiler

/** Array- and map-typed column constraints (SURVEY §2b items /
  * additionalItems / uniqueItems / minItems / maxItems and properties /
  * patternProperties / additionalProperties / min-maxProperties rows).
  */
class NestedColumnSpec extends AnyFlatSpec with Matchers {

  private lazy val spark = SparkTestBase.spark

  private def validate(schemaJson: String, df: org.apache.spark.sql.DataFrame) = {
    val ts = TableSchemaCompiler.compileString(schemaJson)
      .fold(e => throw new IllegalArgumentException(e), identity)
    Validator.violations(df, ts, Seq("conv_id", "turn_idx"))
      .collect().map(r => (r.getAs[Int]("turn_idx"), r.getAs[String]("constraint"))).toSet
  }

  private val arraySchema = """
  {
    "type": "object",
    "required": ["conv_id", "turn_idx"],
    "properties": {
      "conv_id":  { "type": "string" },
      "turn_idx": { "type": "integer" },
      "tags": {
        "type": "array",
        "minItems": 1, "maxItems": 4, "uniqueItems": true,
        "items": { "type": "string", "pattern": "^[a-z]+$", "maxLength": 8 }
      }
    }
  }"""

  "array constraints" should "check size bounds, uniqueness, and per-element schemas" in {
    import spark.implicits._
    val df = Seq(
      ("c1", 0, Seq("ok", "fine")),            // clean
      ("c1", 1, Seq.empty[String]),            // minItems
      ("c1", 2, Seq("a", "b", "c", "d", "e")), // maxItems
      ("c1", 3, Seq("dup", "dup")),            // uniqueItems
      ("c1", 4, Seq("UPPER")),                 // items: pattern
      ("c1", 5, Seq("waytoolongtag"))          // items: maxLength
    ).toDF("conv_id", "turn_idx", "tags")
    validate(arraySchema, df) shouldBe Set(
      (1, "minItems"), (2, "maxItems"), (3, "uniqueItems"),
      (4, "items"), (5, "items"))
  }

  it should "check tuple-form items positionally with additionalItems" in {
    import spark.implicits._
    val schema = """
    {
      "type": "object",
      "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id":  { "type": "string" },
        "turn_idx": { "type": "integer" },
        "pair": {
          "type": "array",
          "items": [ { "type": "string", "pattern": "^k" }, { "type": "string", "pattern": "^v" } ],
          "additionalItems": false
        }
      }
    }"""
    val df = Seq(
      ("c1", 0, Seq("key", "val")),          // clean
      ("c1", 1, Seq("bad", "val")),          // items[0]
      ("c1", 2, Seq("key", "bad")),          // items[1]
      ("c1", 3, Seq("key", "val", "extra")) // additionalItems: false
    ).toDF("conv_id", "turn_idx", "pair")
    validate(schema, df) shouldBe Set(
      (1, "items[0]"), (2, "items[1]"), (3, "additionalItems"))
  }

  private val mapSchema = """
  {
    "type": "object",
    "required": ["conv_id", "turn_idx"],
    "properties": {
      "conv_id":  { "type": "string" },
      "turn_idx": { "type": "integer" },
      "attrs": {
        "type": "object",
        "minProperties": 1, "maxProperties": 3,
        "required": ["kind"],
        "properties": { "kind": { "type": "string", "enum": ["a", "b"] } },
        "patternProperties": { "^x_": { "type": "string", "pattern": "^[0-9]+$" } }
      }
    }
  }"""

  "map constraints" should "check key counts, required keys, and pattern-keyed values" in {
    import spark.implicits._
    val df = Seq(
      ("c1", 0, Map("kind" -> "a", "x_1" -> "42")),   // clean
      ("c1", 1, Map.empty[String, String]),            // minProperties + required kind
      ("c1", 2, Map("kind" -> "z")),                   // properties/kind enum
      ("c1", 3, Map("kind" -> "a", "x_1" -> "oops")),  // patternProperties
      ("c1", 4, Map("kind" -> "a", "p" -> "1", "q" -> "2", "r" -> "3")) // maxProperties
    ).toDF("conv_id", "turn_idx", "attrs")
    validate(mapSchema, df) shouldBe Set(
      (1, "minProperties"), (1, "properties/kind"),
      (2, "properties/kind"), (3, "patternProperties"), (4, "maxProperties"))
  }

  it should "enforce additionalProperties schema over undeclared keys" in {
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
          "additionalProperties": { "type": "string", "maxLength": 3 }
        }
      }
    }"""
    val df = Seq(
      ("c1", 0, Map("kind" -> "anything", "s" -> "ok")), // clean (kind declared)
      ("c1", 1, Map("other" -> "toolong"))               // additionalProperties
    ).toDF("conv_id", "turn_idx", "attrs")
    validate(schema, df) shouldBe Set((1, "additionalProperties"))
  }

  // ---- object schemas bound to STRUCT-typed columns (presence = field
  // non-null; the key set is static so checks are per-field getField) ----

  private val structSchema = """
  {
    "type": "object",
    "required": ["conv_id", "turn_idx"],
    "properties": {
      "conv_id":  { "type": "string" },
      "turn_idx": { "type": "integer" },
      "meta": {
        "type": "object",
        "minProperties": 1, "maxProperties": 3,
        "required": ["kind"],
        "properties": { "kind": { "type": "string", "enum": ["a", "b"] },
                        "note": { "type": "string", "maxLength": 6 } },
        "patternProperties": { "^x_": { "type": "string", "pattern": "^[0-9]+$" } },
        "additionalProperties": { "type": "string", "maxLength": 4 }
      }
    }
  }"""

  import NestedColumnSpec.Meta

  "struct constraints" should "check presence, per-field schemas, and property counts" in {
    import spark.implicits._
    val df = Seq(
      ("c1", 0, Meta("a", "ok", "42", null)),          // clean
      ("c1", 1, Meta(null, null, null, null)),         // required kind + minProperties
      ("c1", 2, Meta("z", null, null, null)),          // properties/kind enum
      ("c1", 3, Meta("a", "waytoolong", null, null)),  // properties/note maxLength
      ("c1", 4, Meta("a", null, "oops", null)),        // patternProperties
      ("c1", 5, Meta("a", null, null, "toolong")),     // additionalProperties
      ("c1", 6, Meta("a", "ok", "1", "hm"))            // maxProperties (4 present)
    ).toDF("conv_id", "turn_idx", "meta")
    validate(structSchema, df) shouldBe Set(
      (1, "properties/kind"), (1, "minProperties"),
      (2, "properties/kind"), (3, "properties/note"),
      (4, "patternProperties"), (5, "additionalProperties"),
      (6, "maxProperties"))
  }

  it should "pass a wholly-null struct through value checks (required is column-level)" in {
    import spark.implicits._
    val df = Seq(("c1", 0, Option.empty[Meta]))
      .toDF("conv_id", "turn_idx", "meta")
    validate(structSchema, df) shouldBe Set.empty
  }

  it should "render struct actual in lockstep with to_json when ignoreNullFields is off" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_json}
    // all-null fields: minProperties fires and its `actual` renders the
    // whole struct — "{}" under the default conf (null fields omitted),
    // every field as null when ignoreNullFields=false. The compiler must
    // fall back from JsonRender (which pins default semantics) to
    // to_json for struct-bearing trees under the non-default conf, or
    // the two renderers would disagree within one plan.
    val df = Seq(("c1", 1, NestedColumnSpec.Meta(null, null, null, null)))
      .toDF("conv_id", "turn_idx", "meta")
    def minPropsActual(): String = {
      val ts = TableSchemaCompiler.compileString(structSchema)
        .fold(e => throw new IllegalArgumentException(e), identity)
      Validator.violations(df, ts, Seq("conv_id", "turn_idx"))
        .filter(col("constraint") === "minProperties")
        .select(col("actual")).collect().map(_.getString(0)).head
    }
    def toJsonRendered(): String =
      df.select(to_json(col("meta"))).collect().head.getString(0)

    minPropsActual() shouldBe toJsonRendered() // default conf (JsonRender path)
    val key = "spark.sql.jsonGenerator.ignoreNullFields"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try {
      val a = minPropsActual()
      a shouldBe toJsonRendered() // conf off: compiler falls back to to_json
      a should include("null")    // and null fields are genuinely rendered
    } finally spark.conf.set(key, prev)
  }

  it should "reject at compile time a required property the struct cannot carry" in {
    import spark.implicits._
    val schema = """
    {
      "type": "object",
      "required": ["conv_id", "turn_idx"],
      "properties": {
        "conv_id":  { "type": "string" },
        "turn_idx": { "type": "integer" },
        "meta": { "type": "object", "required": ["missing_field"],
                  "properties": { "missing_field": { "type": "string" } } }
      }
    }"""
    val df = Seq(("c1", 0, Meta("a", null, null, null))).toDF("conv_id", "turn_idx", "meta")
    val ex = intercept[IllegalArgumentException](validate(schema, df))
    ex.getMessage should include("missing_field")
    ex.getMessage should include("missing from struct")
  }
}

object NestedColumnSpec {
  // top-level so Spark can derive an Encoder (inner classes need an outer scope)
  final case class Meta(kind: String, note: String, x_n: String, zz: String)
}
