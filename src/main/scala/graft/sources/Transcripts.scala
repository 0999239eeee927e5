package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transcript-table sources.
  *
  * The engine's input shape (BASELINE.json `input_hint`):
  * `(conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp)`. Two providers:
  *
  *  - [[TranscriptGen]] — deterministic synthetic generator built on
  *    `spark.range` (fully distributed: every column is arithmetic over
  *    the row id, no driver-side loops, no RNG — the same expression
  *    tree generates 1k rows locally or 10^12 rows on a cluster).
  *    Defects are planted by deterministic modulus rules (FIXTURES.md §1).
  *
  *  - [[TranscriptDerive]] — derives transcripts from the driver-written
  *    TPC-H `lineitem`/`orders` parquet via SQL-expressible rules, so the
  *    DuckDB oracle can build the *identical* table (see
  *    [[TranscriptDerive.duckdbCte]]) and every validation operator gets
  *    an exact cross-engine correctness check.
  */
object TranscriptGen {

  final case class Defects(
      duplicates: Boolean = false,     // duplicate (conv_id, turn_idx) rows
      orphans: Boolean = false,        // convs with no turn_idx=0 root
      badEnumRole: Boolean = false,    // role = 'operator'
      nullRole: Boolean = false,
      emptyText: Boolean = false,
      negativeTurnIdx: Boolean = false,
      toolOnNonTool: Boolean = false,  // tool set on a non-tool row
      badConvPattern: Boolean = false) // conv_id failing ^c[0-9]+$

  val clean: Defects = Defects()
  val all: Defects = Defects(duplicates = true, orphans = true, badEnumRole = true,
    nullRole = true, emptyText = true, negativeTurnIdx = true,
    toolOnNonTool = true, badConvPattern = true)

  /** numConvs x turnsPerConv grid. `skewTopConvFraction` > 0 redirects
    * roughly that fraction of all rows onto conv 0 (Zipf-head proxy for
    * skew testing).
    */
  def generate(spark: SparkSession, numConvs: Long, turnsPerConv: Int,
               defects: Defects = clean, skewTopConvFraction: Double = 0.0): DataFrame = {
    val n = numConvs * turnsPerConv
    val base = spark.range(0, n, 1)
      // integer division (div), NOT double division — exact at 10^12 ids
      .withColumn("conv", expr(s"id div $turnsPerConv"))
      .withColumn("turn", (col("id") % turnsPerConv).cast("int"))

    val conv0 = if (skewTopConvFraction > 0) {
      val k = math.max(2L, math.round(1.0 / skewTopConvFraction))
      when(col("conv") % k === 0, lit(0L)).otherwise(col("conv"))
    } else col("conv")

    val convIdCol = {
      val cid = concat(lit("c"), conv0.cast("string"))
      if (defects.badConvPattern) when(col("conv") % 97 === 13, concat(lit("z"), conv0.cast("string"))).otherwise(cid)
      else cid
    }
    val roleBase = when(col("turn") === 0, "system")
      .otherwise(element_at(array(lit("user"), lit("assistant"), lit("tool")),
        (col("id") % 3 + 1).cast("int")))
    val roleCol = {
      var r = roleBase
      if (defects.badEnumRole) r = when(col("id") % 131 === 7, lit("operator")).otherwise(r)
      if (defects.nullRole) r = when(col("id") % 149 === 11, lit(null)).otherwise(r)
      r
    }
    val textBase = concat(lit("turn "), col("conv").cast("string"), lit(":"),
      col("turn").cast("string"), lit(" "),
      repeat(lit("x"), (col("id") % 50).cast("int")))
    val textCol =
      if (defects.emptyText) when(col("id") % 53 === 17, lit("")).otherwise(textBase) else textBase
    val turnIdxCol =
      if (defects.negativeTurnIdx) when(col("id") % 211 === 5, lit(-1)).otherwise(col("turn"))
      else col("turn")
    val toolBase = when(roleBase === "tool",
      element_at(array(lit("search"), lit("code_run"), lit("fetch_url"), lit("calc")),
        (col("id") % 4 + 1).cast("int"))).otherwise(lit(null))
    val toolCol =
      if (defects.toolOnNonTool) when(col("id") % 173 === 23, lit("rogue_tool")).otherwise(toolBase)
      else toolBase
    val tsCol = timestamp_seconds(lit(1700000000L) + col("conv") * 3600 + col("turn") * 7)

    var df = base.select(
      convIdCol.as("conv_id"), turnIdxCol.as("turn_idx"), roleCol.as("role"),
      textCol.as("text"), toolCol.as("tool"), tsCol.as("ts"))

    if (defects.orphans) {
      // ghost conversations: ids beyond numConvs, turns starting at 1
      val ghosts = spark.range(0, math.max(1L, numConvs / 50) * 3, 1)
        .withColumn("gconv", expr("id div 3") + numConvs)
        .withColumn("gturn", (col("id") % 3).cast("int") + 1)
        .select(
          concat(lit("c"), col("gconv").cast("string")).as("conv_id"),
          col("gturn").as("turn_idx"),
          lit("user").as("role"),
          lit("orphan turn").as("text"),
          lit(null).cast("string").as("tool"),
          timestamp_seconds(lit(1700000000L) + col("gconv") * 3600).as("ts"))
      df = df.unionByName(ghosts)
    }
    if (defects.duplicates)
      df = df.unionByName(df.filter(crc32(concat_ws(":", col("conv_id"), col("turn_idx"))) % 251 === 17))
    df
  }
}

object TranscriptDerive {

  /** Transcripts derived from lineitem — defects planted by modulus rules.
    * MUST stay in lockstep with [[duckdbCte]].
    *
    * `balance = true` routes the read through [[BalancedInput]] (scan
    * repartitioned when the file layout under-splits the session; no-op
    * on sane layouts). Callers opt in per operator: it pays when the
    * downstream per-row work is compute-dense and single-pass (measured
    * per query in OPTIMIZATION_r07.md) and costs an extra exchange per
    * job otherwise.
    */
  def fromLineitem(spark: SparkSession, sfDir: String,
                   balance: Boolean = false): DataFrame = {
    val li =
      if (balance) BalancedInput.parquet(spark, s"$sfDir/lineitem.parquet")
      else spark.read.parquet(s"$sfDir/lineitem.parquet")
    val roleBase = element_at(
      array(lit("system"), lit("user"), lit("assistant"), lit("tool")),
      ((col("l_partkey") + col("l_linenumber")) % 4 + 1).cast("int"))
    val base = li.select(
      when(col("l_orderkey") % 97 === 13, concat(lit("z"), col("l_orderkey").cast("string")))
        .otherwise(concat(lit("c"), col("l_orderkey").cast("string"))).as("conv_id"),
      when(col("l_partkey") % 211 === 5, lit(-1))
        .otherwise(col("l_linenumber") - 1).as("turn_idx"),
      when(col("l_suppkey") % 131 === 7, lit("operator"))
        .when(col("l_suppkey") % 131 === 19, lit(null))
        .otherwise(roleBase).as("role"),
      when(col("l_orderkey") % 53 === 11, lit(""))
        .otherwise(concat(lit("turn "), col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"))).as("text"),
      when(roleBase === "tool",
        when(col("l_partkey") % 3 === 0, lit("web_search")).otherwise(lit("code_run")))
        .when(col("l_suppkey") % 173 === 23, lit("Bad-Tool"))
        .otherwise(lit(null)).as("tool"),
      col("l_shipdate").as("ts"))
    // planted duplicates: re-emit a deterministic slice
    base.unionByName(
      li.filter(col("l_orderkey") % 251 === 17 && col("l_linenumber") === 1)
        .select(
          concat(lit("c"), col("l_orderkey").cast("string")).as("conv_id"),
          (col("l_linenumber") - 1).as("turn_idx"),
          lit("user").as("role"),
          lit("dup row").as("text"),
          lit(null).cast("string").as("tool"),
          col("l_shipdate").as("ts")))
  }

  /** CTE referencing the driver's `lineitem` view (the driver registers
    * each parquet table under its bare name before running oracle SQL).
    */
  val duckdbCteTable: String = duckdbCteFrom("lineitem")

  /** The identical derivation as a DuckDB CTE body (oracle side).
    * Column-for-column, rule-for-rule the same as [[fromLineitem]].
    */
  def duckdbCte(sfDir: String): String =
    duckdbCteFrom(s"read_parquet('$sfDir/lineitem.parquet')")

  private def duckdbCteFrom(li: String): String = {
    s"""transcripts AS (
       |  SELECT
       |    CASE WHEN l_orderkey % 97 = 13 THEN 'z' || CAST(l_orderkey AS VARCHAR)
       |         ELSE 'c' || CAST(l_orderkey AS VARCHAR) END AS conv_id,
       |    CASE WHEN l_partkey % 211 = 5 THEN -1 ELSE l_linenumber - 1 END AS turn_idx,
       |    CASE WHEN l_suppkey % 131 = 7 THEN 'operator'
       |         WHEN l_suppkey % 131 = 19 THEN NULL
       |         ELSE ['system','user','assistant','tool'][CAST((l_partkey + l_linenumber) % 4 + 1 AS INT)] END AS role,
       |    CASE WHEN l_orderkey % 53 = 11 THEN ''
       |         ELSE 'turn ' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) END AS text,
       |    CASE WHEN ['system','user','assistant','tool'][CAST((l_partkey + l_linenumber) % 4 + 1 AS INT)] = 'tool'
       |         THEN (CASE WHEN l_partkey % 3 = 0 THEN 'web_search' ELSE 'code_run' END)
       |         WHEN l_suppkey % 173 = 23 THEN 'Bad-Tool'
       |         ELSE NULL END AS tool,
       |    l_shipdate AS ts
       |  FROM $li
       |  UNION ALL
       |  SELECT 'c' || CAST(l_orderkey AS VARCHAR), l_linenumber - 1, 'user', 'dup row', NULL, l_shipdate
       |  FROM $li WHERE l_orderkey % 251 = 17 AND l_linenumber = 1
       |)""".stripMargin
  }
}
