package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 optimization instrumentation (guide §1) — SEPARATE from the
  * frozen [[Bench]] harness. Three modes:
  *
  *  - `explain <suffix> <query>...` — write `.explain("formatted")` for
  *    each named SparkEntry query to `plans/r07/<query>_<suffix>.txt`
  *    (the judge-facing plan evidence; suffix = before/after).
  *  - `noop <query>...` — time each named query with the noop sink
  *    (guide §1.4: computes every column, no optimizer pruning like
  *    `count()`), best-of-N (SPARK_GRAFT_REPS, default 3).
  *  - `stages-keys` — per-stage wall times inside the key_candidates
  *    plan family (pass-1 wide agg vs each exact probe), to attribute
  *    the query's cost before/after the hash-prefilter rewrite.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = BenchSession.open(cpus)
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", java.lang.Double.valueOf(v))
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

    args.toList match {
      case "explain" :: suffix :: names =>
        val dir = new java.io.File("plans/r07"); dir.mkdirs()
        names.foreach { name =>
          spark.sparkContext.setJobDescription(s"explain $name")
          val df = SparkEntry.queries(name)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val out = new java.io.PrintWriter(new java.io.File(dir, s"${name}_$suffix.txt"), "UTF-8")
          try out.println(plan) finally out.close()
          println(s"EXPLAIN $name -> plans/r07/${name}_$suffix.txt (${plan.length} chars)")
        }

      case "noop" :: names =>
        names.foreach { name =>
          val fn = SparkEntry.queries(name)
          spark.sparkContext.setJobDescription(s"noop $name")
          fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
          val times = (1 to reps).map(_ => time(
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()))
          println(s"NOOP $name min=${fmt(times.min)} " +
            times.map(fmt).mkString("[", ",", "]"))
        }

      case "stages-keys" :: _ =>
        val t = graft.sources.TranscriptDerive.fromLineitem(spark, sfDir)
        val candidates = Seq(
          Seq("conv_id"), Seq("conv_id", "turn_idx"),
          Seq("conv_id", "turn_idx", "role"), Seq("conv_id", "turn_idx", "text"))
        // replicate suggestKeys' stages one at a time
        val idx = t.columns.zipWithIndex.toMap
        val sdf = t.toDF(t.columns.indices.map(i => s"__c$i"): _*)
        def safeCols(cs: Seq[String]) = cs.map(c => col(s"__c${idx(c)}"))
        val aggs = count(lit(1)).as("__total") +: candidates.zipWithIndex.flatMap { case (cs, i) =>
          val anyNull = safeCols(cs).map(_.isNull).reduce(_ || _)
          Seq(sum(anyNull.cast("long")).as(s"__nulls_$i"),
            approx_count_distinct(struct(safeCols(cs): _*), 0.01).as(s"__hll_$i"))
        }
        // warm-up (codegen + listing)
        sdf.agg(aggs.head, aggs.tail: _*).collect()
        (1 to reps).foreach { _ =>
          println("STAGE pass1_agg " + fmt(time(sdf.agg(aggs.head, aggs.tail: _*).collect())))
        }
        Seq(Seq("conv_id", "turn_idx"), Seq("conv_id", "turn_idx", "text")).foreach { cs =>
          val label = cs.mkString("+")
          def probeOld() = sdf.groupBy(safeCols(cs): _*).agg(count(lit(1)).as("__n"))
            .filter(col("__n") > 1L).isEmpty
          probeOld() // warm
          (1 to reps).foreach { _ =>
            println(s"STAGE probe_old_$label " + fmt(time(probeOld())))
          }
          def probeHash() = {
            val h = xxhash64(safeCols(cs): _*)
            sdf.select(h.as("__h")).groupBy("__h").agg(count(lit(1)).as("__n"))
              .filter(col("__n") > 1L).isEmpty
          }
          probeHash() // warm
          (1 to reps).foreach { _ =>
            println(s"STAGE probe_hash_$label " + fmt(time(probeHash())))
          }
        }

      case "plans-keys" :: _ =>
        // key_candidates is driver-orchestrated (its RESULT is a tiny
        // parallelized frame), so the judge-relevant plans are the
        // pass-1 aggregation and the exact-probe jobs. Write the
        // round-6 shapes (reconstructed verbatim from the r06 code) as
        // _before and the current SchemaInfer shapes as _after.
        val dir = new java.io.File("plans/r07"); dir.mkdirs()
        val t = graft.sources.TranscriptDerive.fromLineitem(spark, sfDir)
        val idx = t.columns.zipWithIndex.toMap
        val sdf = t.toDF(t.columns.indices.map(i => s"__c$i"): _*)
        def safeCols(cs: Seq[String]) = cs.map(c => col(s"__c${idx(c)}"))
        val cands = Seq(
          Seq("conv_id"), Seq("conv_id", "turn_idx"),
          Seq("conv_id", "turn_idx", "role"), Seq("conv_id", "turn_idx", "text"))
        def planOf(df: DataFrame) = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        def write(file: String, sections: Seq[(String, String)]): Unit = {
          val out = new java.io.PrintWriter(new java.io.File(dir, file), "UTF-8")
          try sections.foreach { case (h, s) => out.println(s"==== $h ====\n$s") }
          finally out.close()
          println(s"PLANS -> plans/r07/$file")
        }
        val probeCols = Seq("conv_id", "turn_idx", "text")
        // ---- round-6 shapes ----
        val aggsOld = count(lit(1)).as("__total") +: cands.zipWithIndex.flatMap { case (cs, i) =>
          val anyNull = safeCols(cs).map(_.isNull).reduce(_ || _)
          Seq(sum(anyNull.cast("long")).as(s"__nulls_$i"),
            approx_count_distinct(struct(safeCols(cs): _*), 0.01).as(s"__hll_$i"))
        }
        val probeOld = sdf.groupBy(safeCols(probeCols): _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1L)
        write("key_candidates_before.txt", Seq(
          "pass-1 wide agg (r06: rsd-0.01 HLL on the value struct)" ->
            planOf(sdf.agg(aggsOld.head, aggsOld.tail: _*)),
          s"exact probe on (${probeCols.mkString(",")}) (r06: groupBy over the FULL key payload -- text shuffles)" ->
            planOf(probeOld)))
        // ---- current shapes ----
        val aggsNew = count(lit(1)).as("__total") +: cands.zipWithIndex.flatMap { case (cs, i) =>
          val anyNull = safeCols(cs).map(_.isNull).reduce(_ || _)
          Seq(sum(anyNull.cast("long")).as(s"__nulls_$i"),
            approx_count_distinct(xxhash64(safeCols(cs): _*)).as(s"__hll_$i"))
        }
        val h = xxhash64(safeCols(probeCols): _*)
        val hashProbe = sdf.select(h.as("__h")).groupBy("__h").agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1L).select("__h")
        val dupHashes = hashProbe.localCheckpoint()
        val confirm = sdf.withColumn("__h", h)
          .join(broadcast(dupHashes), Seq("__h"), "left_semi")
          .groupBy(safeCols(probeCols): _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1L)
        write("key_candidates_after.txt", Seq(
          "pass-1 wide agg (r07: default-precision HLL on xxhash64(key))" ->
            planOf(sdf.agg(aggsNew.head, aggsNew.tail: _*)),
          s"probe stage 1 on (${probeCols.mkString(",")}) (r07: 8-byte hash groupBy -- no payload in the exchange)" ->
            planOf(hashProbe),
          "probe stage 2 (only when stage 1 finds duplicated hashes): broadcast semi-join, exact groupBy over suspects only" ->
            planOf(confirm)))
        org.apache.spark.sql.GraftSqlBridge.unpersistCheckpoint(dupHashes)

      case "hll" :: _ =>
        // attribute pass1's cost: HLL-on-struct vs HLL-on-hash vs rsd vs
        // no-HLL, on the SAME derived input
        val t = graft.sources.TranscriptDerive.fromLineitem(spark, sfDir)
        val cands = Seq(
          Seq("conv_id"), Seq("conv_id", "turn_idx"),
          Seq("conv_id", "turn_idx", "role"), Seq("conv_id", "turn_idx", "text"))
        def run(label: String, mk: (Seq[String], Int) => Seq[org.apache.spark.sql.Column]): Unit = {
          val aggs = count(lit(1)).as("__total") +: cands.zipWithIndex.flatMap { case (cs, i) => mk(cs, i) }
          t.agg(aggs.head, aggs.tail: _*).collect() // warm
          (1 to reps).foreach { _ =>
            println(s"HLL $label " + fmt(time(t.agg(aggs.head, aggs.tail: _*).collect())))
          }
        }
        def nullsOf(cs: Seq[String], i: Int) =
          sum(cs.map(col(_).isNull).reduce(_ || _).cast("long")).as(s"__nulls_$i")
        run("nulls_only", (cs, i) => Seq(nullsOf(cs, i)))
        run("struct_rsd001", (cs, i) => Seq(nullsOf(cs, i),
          approx_count_distinct(struct(cs.map(col): _*), 0.01).as(s"__hll_$i")))
        run("struct_rsd005", (cs, i) => Seq(nullsOf(cs, i),
          approx_count_distinct(struct(cs.map(col): _*)).as(s"__hll_$i")))
        run("hash_rsd001", (cs, i) => Seq(nullsOf(cs, i),
          approx_count_distinct(xxhash64(cs.map(col): _*), 0.01).as(s"__hll_$i")))
        run("hash_rsd005", (cs, i) => Seq(nullsOf(cs, i),
          approx_count_distinct(xxhash64(cs.map(col): _*)).as(s"__hll_$i")))

      case "stages-minhash" :: _ =>
        // attribute minhash_pairs' cost across its stages (all on the
        // same dedupPool input, k=24 bands=12 as gated)
        import graft.pipeline.Dedup
        val pool = SparkEntry.dedupPool(spark, sfDir)
        def t3(label: String)(f: => Unit): Unit = {
          f // warm
          (1 to reps).foreach(_ => println(s"STAGE $label " + fmt(time(f))))
        }
        t3("pool_count") { pool.count(); () }
        val sig = Dedup.minhashSigTable(pool, "text", "doc_id", 24)
        t3("sig_table") { sig.count(); () }
        val rowsPerBand = 2
        val bandHashes = (0 until 12).map { b =>
          hash((b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"m$i")): _*)
        }
        val bandedRaw = sig.select(col("id"), posexplode(array(bandHashes: _*)).as(Seq("band", "bandHash")))
        t3("banded_raw") { bandedRaw.count(); () }
        val bandedCounts = bandedRaw.groupBy(col("band"), col("bandHash"))
          .agg(count(lit(1)).as("__bucket_n"))
          .filter(col("__bucket_n") <= 4096)
        val banded = bandedRaw.join(bandedCounts, Seq("band", "bandHash")).drop("__bucket_n")
        t3("banded_capped") { banded.count(); () }
        val a = banded.select(col("band"), col("bandHash"), col("id").as("id_a"))
        val b = banded.select(col("band"), col("bandHash"), col("id").as("id_b"))
        val candidates = a.join(b, Seq("band", "bandHash"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct()
        t3("candidates") { candidates.count(); () }
        val docsA = pool.select(col("doc_id").as("id_a"), col("text").as("text_a"))
        val docsB = pool.select(col("doc_id").as("id_b"), col("text").as("text_b"))
        val verified = candidates.join(docsA, "id_a").join(docsB, "id_b")
          .withColumn("jaccard",
            Dedup.jaccard(Dedup.shingles(col("text_a"), 3), Dedup.shingles(col("text_b"), 3)))
          .filter(col("jaccard") >= 0.5)
          .select("id_a", "id_b", "jaccard")
        t3("verified") { verified.count(); () }
        println("POOLROWS " + pool.count() + " CANDROWS " + candidates.count())
        val full = Dedup.minhashPairs(pool, k = 24, bands = 12, threshold = 0.5)
        t3("full_pairs") { full.count(); () }

      case other =>
        System.err.println(s"unknown BenchExtra mode: $other")
        sys.exit(1)
    }
    spark.stop()
  }
}
