package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dirty-column table derived from the driver's TPC-H `lineitem` for
  * oracle-checking the long tail of the keyword vocabulary (SURVEY.md
  * §2b rows that round 1 covered only by unit tests): string lengths,
  * formats, combinators, `type:integer`-over-fractional, and the
  * array-/map-typed constraints.
  *
  * Every column is planted by a deterministic modulus rule on
  * `(l_orderkey, l_linenumber)`, expressed once in Spark SQL
  * ([[fromLineitem]]) and once in DuckDB SQL ([[duckdbCte]]) — the two
  * MUST stay in lockstep (same discipline as [[TranscriptDerive]]).
  *
  * Keys are `(l_orderkey, l_linenumber)`; note `(k, n)` below.
  */
object DirtyDerive {

  /** Spark-side derivation. Array/map columns are built as literals per
    * branch so the violation row's `actual` (`to_json`) is a fixed string
    * the oracle can emit verbatim.
    *
    * `balance` as in [[TranscriptDerive.fromLineitem]]: per-operator
    * opt-in scan balancing, no-op on sane file layouts.
    */
  def fromLineitem(spark: SparkSession, sfDir: String,
                   balance: Boolean = false): DataFrame =
    (if (balance) BalancedInput.parquet(spark, s"$sfDir/lineitem.parquet")
     else spark.read.parquet(s"$sfDir/lineitem.parquet")).selectExpr(
      "l_orderkey",
      "l_linenumber",
      // ---- lengths: len(code) = n + 1, n in 1..7 -> 2..8 ----
      "concat('k', repeat('x', l_linenumber)) AS code",
      // ---- type:integer over a fractional physical column ----
      "CAST(l_orderkey % 1000 AS DOUBLE) + (CASE WHEN l_orderkey % 9 = 2 THEN 0.5 ELSE 0.0 END) AS frac",
      // ---- formats ----
      """CASE WHEN l_orderkey % 7 = 0 THEN concat('user', l_orderkey, '.example.com')
              ELSE concat('u', l_orderkey, '@example.com') END AS email""",
      """CASE WHEN l_orderkey % 5 = 0 THEN concat('300.1.1.', l_linenumber)
              ELSE concat('10.', l_orderkey % 200, '.0.', l_linenumber) END AS ip""",
      """CASE WHEN l_orderkey % 11 = 3 THEN 'no scheme here'
              ELSE concat('https://x.io/', l_orderkey) END AS url""",
      """CASE WHEN l_orderkey % 13 = 4 THEN 'not-a-time'
              ELSE concat('2024-03-0', l_linenumber, ' 12:00:00') END AS dt_str""",
      """CASE WHEN l_orderkey % 23 = 9 THEN '-bad..host-'
              ELSE concat('node-', l_orderkey, '.example.org') END AS host""",
      """CASE WHEN l_orderkey % 31 = 6 THEN 'gggg::zz'
              ELSE concat('fe80::', l_linenumber) END AS ip6""",
      // format:regex — values that are themselves regex sources; the two
      // invalid branches fail java.util.regex compilation (unclosed
      // class; dangling metacharacter), the default branch compiles
      """CASE WHEN l_orderkey % 37 = 8 THEN concat('(unclosed[', l_linenumber)
              WHEN l_orderkey % 37 = 9 THEN '*dangling'
              ELSE concat('^v', l_linenumber, '[0-9]+$') END AS rgx""",
      // ---- combinators ----
      """CASE WHEN l_orderkey % 17 = 0 THEN concat('ab', l_linenumber)
              WHEN l_orderkey % 17 = 1 THEN concat('a', l_linenumber)
              ELSE concat('b', l_linenumber) END AS onec""",
      """CASE WHEN l_orderkey % 19 = 2 THEN 'ab'
              WHEN l_orderkey % 19 = 3 THEN 'xy'
              ELSE 'abcdef' END AS anyc""",
      """CASE WHEN l_orderkey % 23 = 5 THEN 'q_bad'
              WHEN l_orderkey % 23 = 6 THEN 'p_toolong'
              ELSE 'pok' END AS allc""",
      "CASE WHEN l_orderkey % 29 = 7 THEN 'forbidden' ELSE 'fine' END AS notc",
      // ---- arrays ----
      """CASE WHEN l_orderkey % 11 = 0 THEN array()
              WHEN l_orderkey % 11 = 1 THEN array('ok', 'fine', 'aa', 'bb', 'cc')
              WHEN l_orderkey % 11 = 2 THEN array('dup', 'dup')
              WHEN l_orderkey % 11 = 3 THEN array('UPPER')
              ELSE array('ok', 'fine') END AS tags""",
      """CASE WHEN l_orderkey % 13 = 0 THEN array('bad', 'val')
              WHEN l_orderkey % 13 = 1 THEN array('key', 'bad')
              WHEN l_orderkey % 13 = 2 THEN array('key', 'val', 'extra')
              ELSE array('key', 'val') END AS pair""",
      // ---- array of oneOf-constrained elements ('n1' matches only
      // ^n[0-9]+$, 'x9' only 9$, 'n9' BOTH (not exactly-one), 'zz' neither) ----
      """CASE WHEN l_orderkey % 27 = 0 THEN array('zz', 'x9')
              WHEN l_orderkey % 27 = 1 THEN array('n9')
              ELSE array('n1', 'x9') END AS mix""",
      // ---- maps (branch literals; key order pins to_json output) ----
      """CASE WHEN l_orderkey % 9 = 0 THEN map()
              WHEN l_orderkey % 9 = 1 THEN map('kind', 'z')
              WHEN l_orderkey % 9 = 2 THEN map('kind', 'a', 'x_1', 'oops')
              WHEN l_orderkey % 9 = 3 THEN map('kind', 'a', 'zz', 'waytoolong')
              WHEN l_orderkey % 9 = 4 THEN map('kind', 'a', 'p', '1', 'q', '2', 'r', '3')
              ELSE map('kind', 'a', 'x_1', '42') END AS attrs""",
      // ---- structs (fixed field set kind/note/x_1/zz; a field is a
      // "present property" when non-null; to_json drops null fields, so
      // each branch's actual string is a fixed literal) ----
      """CASE WHEN l_orderkey % 8 = 0 THEN named_struct('kind', CAST(NULL AS STRING), 'note', CAST(NULL AS STRING), 'x_1', CAST(NULL AS STRING), 'zz', CAST(NULL AS STRING))
              WHEN l_orderkey % 8 = 1 THEN named_struct('kind', 'z', 'note', CAST(NULL AS STRING), 'x_1', CAST(NULL AS STRING), 'zz', CAST(NULL AS STRING))
              WHEN l_orderkey % 8 = 2 THEN named_struct('kind', 'a', 'note', 'waytoolong', 'x_1', CAST(NULL AS STRING), 'zz', CAST(NULL AS STRING))
              WHEN l_orderkey % 8 = 3 THEN named_struct('kind', 'a', 'note', CAST(NULL AS STRING), 'x_1', 'oops', 'zz', CAST(NULL AS STRING))
              WHEN l_orderkey % 8 = 4 THEN named_struct('kind', 'a', 'note', CAST(NULL AS STRING), 'x_1', CAST(NULL AS STRING), 'zz', 'toolong')
              WHEN l_orderkey % 8 = 5 THEN named_struct('kind', 'a', 'note', 'ok', 'x_1', '1', 'zz', 'hm')
              ELSE named_struct('kind', 'a', 'note', CAST(NULL AS STRING), 'x_1', CAST(NULL AS STRING), 'zz', CAST(NULL AS STRING)) END AS meta""")

  /** Rule-for-rule identical derivation for the DuckDB oracle. Array and
    * map columns are NOT materialized oracle-side; the per-branch
    * violation conditions and `actual` JSON strings are emitted directly
    * from the branch rules (the branches, not the container values, are
    * the ground truth).
    */
  val duckdbCte: String =
    """dirty AS (
      |  SELECT
      |    l_orderkey,
      |    l_linenumber,
      |    'k' || repeat('x', l_linenumber) AS code,
      |    CAST(l_orderkey % 1000 AS DOUBLE) + (CASE WHEN l_orderkey % 9 = 2 THEN 0.5 ELSE 0.0 END) AS frac,
      |    CASE WHEN l_orderkey % 7 = 0 THEN 'user' || l_orderkey || '.example.com'
      |         ELSE 'u' || l_orderkey || '@example.com' END AS email,
      |    CASE WHEN l_orderkey % 5 = 0 THEN '300.1.1.' || l_linenumber
      |         ELSE '10.' || (l_orderkey % 200) || '.0.' || l_linenumber END AS ip,
      |    CASE WHEN l_orderkey % 11 = 3 THEN 'no scheme here'
      |         ELSE 'https://x.io/' || l_orderkey END AS url,
      |    CASE WHEN l_orderkey % 13 = 4 THEN 'not-a-time'
      |         ELSE '2024-03-0' || l_linenumber || ' 12:00:00' END AS dt_str,
      |    CASE WHEN l_orderkey % 23 = 9 THEN '-bad..host-'
      |         ELSE 'node-' || l_orderkey || '.example.org' END AS host,
      |    CASE WHEN l_orderkey % 31 = 6 THEN 'gggg::zz'
      |         ELSE 'fe80::' || l_linenumber END AS ip6,
      |    CASE WHEN l_orderkey % 37 = 8 THEN '(unclosed[' || l_linenumber
      |         WHEN l_orderkey % 37 = 9 THEN '*dangling'
      |         ELSE '^v' || l_linenumber || '[0-9]+$' END AS rgx,
      |    CASE WHEN l_orderkey % 17 = 0 THEN 'ab' || l_linenumber
      |         WHEN l_orderkey % 17 = 1 THEN 'a' || l_linenumber
      |         ELSE 'b' || l_linenumber END AS onec,
      |    CASE WHEN l_orderkey % 19 = 2 THEN 'ab'
      |         WHEN l_orderkey % 19 = 3 THEN 'xy'
      |         ELSE 'abcdef' END AS anyc,
      |    CASE WHEN l_orderkey % 23 = 5 THEN 'q_bad'
      |         WHEN l_orderkey % 23 = 6 THEN 'p_toolong'
      |         ELSE 'pok' END AS allc,
      |    CASE WHEN l_orderkey % 29 = 7 THEN 'forbidden' ELSE 'fine' END AS notc
      |  FROM lineitem
      |)""".stripMargin
}
