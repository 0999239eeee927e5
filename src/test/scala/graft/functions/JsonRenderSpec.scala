package graft.functions

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, GraftSqlBridge}
import graft.SparkTestBase

/** JsonRender must be byte-identical to to_json on its supported type
  * tree — it replaces to_json in violation emission, and the v_arrays/
  * v_maps/v_structs oracles compare the rendered `actual` strings
  * value-exactly.
  */
class JsonRenderSpec extends AnyFlatSpec with Matchers {

  private lazy val spark = SparkTestBase.spark

  private def jr(c: Column) =
    GraftSqlBridge.column(JsonRender(GraftSqlBridge.expression(c)))

  private def assertParity(df: org.apache.spark.sql.DataFrame, c: Column): Unit = {
    val rows = df.select(to_json(c).as("want"), jr(c).as("got")).collect()
    rows.foreach { r =>
      withClue(s"want=${r.get(0)} ") { r.get(1) shouldBe r.get(0) }
    }
  }

  "JsonRender" should "match to_json on arrays, incl. null elements and escapes" in {
    import spark.implicits._
    val df = Seq(
      Seq("ok", "fine"),
      Seq.empty[String],
      Seq("with \"quotes\"", "back\\slash", "tab\there", "nl\nthere"),
      Seq("controlchar", "Ünïcödé ✓"),
      null.asInstanceOf[Seq[String]]).toDF("a")
    assertParity(df.filter(col("a").isNotNull), col("a"))
    // null top-level: both null -> coalesce handles it at the call site
    df.filter(col("a").isNull).select(jr(col("a"))).collect()(0).isNullAt(0) shouldBe true
    // null elements inside the array
    val withNulls = Seq(Seq(Some("x"), None, Some("y"))).toDF("a")
    assertParity(withNulls, col("a"))
    // numeric + nested arrays
    assertParity(Seq(Seq(1L, 2L, 3L)).toDF("a"), col("a"))
    assertParity(Seq(Seq(1.5, 2.0, -0.25, 1e300)).toDF("a"), col("a"))
    assertParity(Seq(Seq(Seq(1, 2), Seq(3))).toDF("a"), col("a"))
  }

  it should "match to_json on maps (null values) and structs (omitted null fields)" in {
    import spark.implicits._
    val m = Seq(
      Map("kind" -> "a", "x_1" -> "42"),
      Map.empty[String, String],
      Map("k\"ey" -> "v\\al")).toDF("m")
    assertParity(m, col("m"))
    assertParity(Seq(Map("k" -> Option.empty[String], "j" -> Some("x"))).toDF("m"), col("m"))
    val s = Seq(
      ("a", Some("note"), Option.empty[String]),
      ("b", None, Some("zz"))).toDF("kind", "note", "zz")
      .select(struct(col("kind"), col("note"), col("zz")).as("s"))
    assertParity(s, col("s"))
    // all-null struct renders {}
    val empty = Seq(1).toDF("i").select(struct(
      lit(null).cast("string").as("a"), lit(null).cast("string").as("b")).as("s"))
    assertParity(empty, col("s"))
    // struct containing array containing map
    val nested = Seq(1).toDF("i").select(struct(
      array(map(lit("k"), lit("v"))).as("am"), lit(7L).as("n")).as("s"))
    assertParity(nested, col("s"))
    // booleans and bytes/shorts
    val prim = Seq(1).toDF("i").select(struct(
      lit(true).as("b"), lit(3.toByte).as("y"), lit(9.toShort).as("h"),
      lit(1.25f).as("f")).as("s"))
    assertParity(prim, col("s"))
    // non-finite floats: to_json quotes them (Jackson
    // QUOTE_NON_NUMERIC_NUMBERS default) — parity must hold
    val nonFinite = Seq((Double.NaN, Float.PositiveInfinity, Double.NegativeInfinity))
      .toDF("d", "f", "n").select(struct(col("d"), col("f"), col("n")).as("s"))
    assertParity(nonFinite, col("s"))
    assertParity(Seq(Seq(Double.NaN, 1.0, Double.PositiveInfinity)).toDF("a"), col("a"))
  }

  it should "run on the codegen path over a non-foldable source" in {
    val df = spark.range(1000).select(
      struct(concat(lit("v\""), col("id").cast("string")).as("kind"),
        array(col("id").cast("string"), lit(null).cast("string")).as("tags"),
        map(lit("id"), col("id").cast("string")).as("attrs")).as("s"))
    val rows = df.select(to_json(col("s")).as("want"), jr(col("s")).as("got")).collect()
    rows.length shouldBe 1000
    rows.foreach(r => r.getString(1) shouldBe r.getString(0))
  }

  it should "hold parity against to_json on randomized nested values" in {
    import org.scalacheck.{Gen, Test => ScTest, Prop}
    import spark.implicits._
    // adversarial strings: escapes, controls, unicode, empties
    val strGen: Gen[String] = Gen.frequency(
      (6, Gen.listOf(Gen.frequency(
        (10, Gen.alphaNumChar),
        (2, Gen.oneOf('"', '\\', '\n', '\t', '\r', '\b', '\f', '/', 'é', '✓')),
        (1, Gen.choose(0.toChar, 0x1f.toChar)))).map(_.mkString)),
      (1, Gen.const("")))
    val rowGen: Gen[(Seq[Option[String]], Map[String, Option[String]],
                     Option[String], Option[Double])] = for {
      arr <- Gen.listOfN(3, Gen.option(strGen))
      m <- Gen.mapOfN(2, Gen.zip(strGen, Gen.option(strGen)))
      sf <- Gen.option(strGen)
      d <- Gen.option(Gen.oneOf(Gen.chooseNum(-1e9, 1e9),
        Gen.oneOf(Double.NaN, Double.PositiveInfinity, 0.0, -0.0, 1e-300)))
    } yield (arr, m, sf, d)
    val p = Prop.forAll(Gen.listOfN(8, rowGen)) { rows =>
      val df = rows.toDF("a", "m", "sf", "d")
        .select(struct(col("a"), col("m"), col("sf"), col("d")).as("s"))
      df.select(to_json(col("s")).as("want"), jr(col("s")).as("got"))
        .collect().forall(r => r.getString(1) == r.getString(0))
    }
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), p)
    withClue(r.status.toString)(r.passed shouldBe true)
  }

  it should "declare support only for the parity-tested type tree" in {
    import org.apache.spark.sql.types._
    JsonRender.supports(ArrayType(StringType)) shouldBe true
    JsonRender.supports(MapType(StringType, LongType)) shouldBe true
    JsonRender.supports(new StructType().add("a", DoubleType)) shouldBe true
    JsonRender.supports(TimestampType) shouldBe false
    JsonRender.supports(MapType(IntegerType, StringType)) shouldBe false // non-string keys
    JsonRender.supports(ArrayType(DecimalType(10, 2))) shouldBe false
  }
}
