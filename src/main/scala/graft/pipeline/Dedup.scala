package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, each scaling by
  * a different mechanism:
  *
  *  - exact: hash-groupBy — one shuffle keyed by content hash; map-side
  *    combine bounds hot-hash skew.
  *  - MinHash+LSH: shingle -> k minhashes -> b bands; only rows sharing
  *    a band bucket become candidate pairs (candidates << n^2), then
  *    exact Jaccard verifies. The shuffle is keyed by band hash, so work
  *    scales with near-duplicate density, not with the cross product.
  *  - SimHash: 64-bit fingerprint via bitwise token-hash voting, built
  *    entirely from higher-order array functions (no explode, no
  *    shuffle); banding the fingerprint gives hamming-distance
  *    candidates.
  *  - n-gram Jaccard: exact verification metric for candidate pairs.
  */
object Dedup {

  /** Exact duplicate groups by md5(text): (hash, dup_count, keeper). */
  def exactGroups(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("keep_id"))
      .filter(col("dup_count") > 1)

  /** Survivors after exact dedup: the min-id row of each hash group.
    * Two-phase: map-side combine then min — no row data shuffled beyond
    * (hash, id) pairs.
    */
  def exactSurvivors(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"))

  /** Word n-gram shingles as an array column (codegen'd HOFs). */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val toks = split(trim(lower(textCol)), "\\s+")
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** k MinHash signatures: min over shingles of xxhash64(shingle, seed).
    * Seeds are baked literals — the signature is deterministic across
    * runs and cluster sizes.
    */
  def minhashSignature(sh: Column, k: Int = 16): Column =
    array((0 until k).map { seed =>
      array_min(transform(sh, s => xxhash64(s, lit(seed))))
    }: _*)

  /** LSH candidate pairs: signatures banded into `bands` groups of
    * rows; same (band index, band hash) -> candidate. Returns
    * (id_a, id_b, jaccard) for verified pairs with jaccard >= threshold.
    */
  def minhashPairs(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                   k: Int = 16, bands: Int = 4, threshold: Double = 0.7): DataFrame = {
    require(k % bands == 0)
    val rowsPerBand = k / bands
    val withSig = df.select(col(idCol).as("id"), shingles(col(textCol)).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))

    val banded = withSig.select(
      col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))).as(Seq("band", "bandHash")))

    // candidate pairs within a bucket (id_a < id_b de-dups the pair space)
    val a = banded.select(col("band"), col("bandHash"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bandHash"), col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = a.join(b, Seq("band", "bandHash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()

    candidates
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard similarity of two shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(array_distinct(a), array_distinct(b))).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** 64-bit SimHash from token hashes, explode-free: per bit position,
    * tokens vote +1/-1; the fingerprint sets bits with positive vote.
    * Entirely higher-order functions -> stays in the scan.
    */
  def simhash64(textCol: Column): Column = {
    val toks = split(trim(lower(textCol)), "\\s+")
    val hashes = transform(toks, t => xxhash64(t))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, bitVotes(h), (x, y) => x + y))
    // fold bits 62..0 MSB->LSB (never overflows a long), then OR in the
    // sign bit — ANSI mode rejects the wrapping acc*2 at bit 63
    val low = aggregate(reverse(slice(votes, 1, 63)), lit(0L),
      (acc, v) => acc * 2 + when(v > 0, lit(1L)).otherwise(lit(0L)))
    low.bitwiseOR(when(element_at(votes, 64) > 0, lit(Long.MinValue)).otherwise(lit(0L)))
  }

  private def bitVotes(h: Column): Column =
    array((0 until 64).map { i =>
      when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))
    }: _*)

  /** SimHash near-duplicate candidates: 4 bands of 16 bits; same band
    * value -> candidate; verified by hamming distance <= maxHamming.
    */
  def simhashPairs(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                   maxHamming: Int = 3): DataFrame = {
    val withSim = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("simhash"))
    val banded = withSim.select(
      col("id"), col("simhash"),
      posexplode(array((0 until 4).map { b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))
      }: _*)).as(Seq("band", "bandVal")))
    val a = banded.select(col("band"), col("bandVal"), col("id").as("id_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("bandVal"), col("id").as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "bandVal"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
