package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  *  - [[cosine]] / [[l2Norm]]: higher-order-function arithmetic in
  *    double precision (codegen'd; no UDF).
  *  - [[bruteForceTopK]]: the exactness baseline — broadcast the (small)
  *    query set, crossJoin against candidates (narrow, no shuffle of the
  *    big side), window top-k per query. Scales linearly in candidates.
  *  - [[ivfTopK]]: the scale path — IVF-style coarse quantization:
  *    candidates are bucketed by nearest centroid (broadcast centroids),
  *    queries probe `nprobe` nearest buckets only. At 100 TB the probe
  *    reads 1/|centroids| of the data per query bucket; bucket ids are
  *    deterministic so the assignment can be persisted/partitioned-by.
  */
object Ann {

  /** Sequential double-precision dot product of two float arrays —
    * the custom codegen'd kernel ([[graft.functions.FloatVecDot]]);
    * Spark's HOF form is CodegenFallback and pays interpreted lambda
    * dispatch per element per pair. [[dotHof]] keeps the HOF form for
    * equivalence tests.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.floatVecDot(a, b)

  /** HOF reference implementation (same sequential double accumulation). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k cosine neighbors of each query among candidates.
    * Ranking uses (rounded sim DESC, candidate id ASC) so ties are
    * deterministic across engines and runs.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                     idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    // norms precomputed per side — NOT per pair (the crossJoin would
    // otherwise recompute each norm |candidates| or |queries| times)
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
      l2Norm(col(embCol)).as("q_norm"))
    val c = candidates.select(col(idCol).as("cand_id"), col(embCol).as("c_emb"),
      l2Norm(col(embCol)).as("c_norm"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("cand_id"),
        round(dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "sim", "rank")
  }

  /** Assign each vector to its nearest centroid (broadcast centroids,
    * then a partial-aggregable `min(struct(dist, id))` — NOT a window
    * sort: the argmin combines map-side, so the shuffle carries one row
    * per vector, not |vectors| x |centroids| rows).
    */
  def assignToCentroids(df: DataFrame, centroids: DataFrame,
                        idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val cents = centroids.select(col(idCol).as("centroid_id"), col(embCol).as("cent_emb"),
      l2Norm(col(embCol)).as("cent_norm"))
    df.withColumn("__norm", l2Norm(col(embCol)))
      .crossJoin(broadcast(cents))
      .groupBy(col(idCol))
      .agg(
        first(col(embCol)).as(embCol),
        min(struct(
          (-round(dot(col(embCol), col("cent_emb")) / (col("__norm") * col("cent_norm")), 9)).as("d"),
          col("centroid_id"))).as("best"))
      .select(col(idCol), col(embCol), col("best.centroid_id").as("centroid_id"))
  }

  /** IVF search: probe the query's nearest `nprobe` centroid buckets
    * only. Deterministic centroids make this reproducible; recall vs
    * [[bruteForceTopK]] is asserted in tests.
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int = 2,
              idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val cents = centroids.select(col(idCol).as("centroid_id"), col(embCol).as("cent_emb"),
      l2Norm(col(embCol)).as("cent_norm"))
    val bucketed = assignToCentroids(candidates, centroids, idCol, embCol)
      .select(col(idCol).as("cand_id"), col(embCol).as("c_emb"),
        l2Norm(col(embCol)).as("c_norm"), col("centroid_id"))

    // nprobe nearest centroids per query (query set is small: window ok)
    val wq = Window.partitionBy("query_id").orderBy(col("d").asc, col("centroid_id").asc)
    val probes = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
        l2Norm(col(embCol)).as("q_norm"))
      .crossJoin(broadcast(cents))
      .withColumn("d", -round(dot(col("q_emb"), col("cent_emb")) / (col("q_norm") * col("cent_norm")), 9))
      .withColumn("r", row_number().over(wq))
      .filter(col("r") <= nprobe)
      .select("query_id", "q_emb", "q_norm", "centroid_id")

    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id").asc)
    bucketed.join(broadcast(probes), Seq("centroid_id"))
      .select(col("query_id"), col("cand_id"),
        round(dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 6).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "sim", "rank")
  }
}
