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

      case "stages-infer" :: _ =>
        // attribute schema_infer's cost: derive scan, the wide profile
        // agg (with and without its components), the enum pass
        val t = graft.sources.TranscriptDerive.fromLineitem(spark, sfDir)
        def t3(label: String)(f: => Unit): Unit = {
          f // warm
          (1 to reps).foreach(_ => println(s"STAGE $label " + fmt(time(f))))
        }
        t3("derive_count") { t.count(); () }
        t3("full_infer") {
          graft.stats.SchemaInfer.inferConstraints(t, enumMaxDistinct = 16).count(); ()
        }
        // component aggs over the safe frame
        val sdf = t.toDF(t.columns.indices.map(i => s"__c$i"): _*)
        val strCols = t.schema.fields.zipWithIndex.collect {
          case (f, i) if f.dataType == org.apache.spark.sql.types.StringType => i
        }.toSeq
        val menu = graft.stats.SchemaInfer.patternMenu
        val terms = Seq("\n", "\r", "", " ", " ")
        def agg1(label: String, aggs: Seq[org.apache.spark.sql.Column]): Unit =
          t3(label) { sdf.agg(aggs.head, aggs.tail: _*).collect(); () }
        agg1("nulls_minmax", sdf.columns.toSeq.flatMap(c =>
          Seq(sum(col(c).isNull.cast("long")), min(col(c)).cast("string"), max(col(c)).cast("string"))))
        agg1("hll_only", sdf.columns.toSeq.map(c => approx_count_distinct(col(c))))
        agg1("pattern_sums", strCols.flatMap { i =>
          menu.zipWithIndex.map { case (p, k) =>
            val c = col(s"__c$i")
            val hit = graft.functions.SimplePatternMatch.tryColumn(c, p).getOrElse(c.rlike(p)) &&
              terms.map(x => !c.contains(x)).reduce(_ && _)
            sum((c.isNotNull && !hit).cast("long")).as(s"__c${i}__pm_$k")
          }
        })

      case "plan-vs-exec" :: names =>
        // split a query's wall time into (plan+codegen) vs (execute):
        // executedPlan forces analysis/optimization/physical planning;
        // a second count() on the SAME DataFrame reuses all of it
        names.foreach { name =>
          val fn = SparkEntry.queries(name)
          fn(spark, sfDir).count() // warm (janino cache, file listing)
          (1 to reps).foreach { _ =>
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir)
            df.queryExecution.executedPlan // force planning
            val t1 = System.nanoTime()
            df.count()
            val t2 = System.nanoTime()
            df.count() // plan fully reused
            val t3 = System.nanoTime()
            println(s"PLANEXEC $name plan=${fmt((t1 - t0) / 1e9)} " +
              s"exec1=${fmt((t2 - t1) / 1e9)} exec2=${fmt((t3 - t2) / 1e9)}")
          }
        }

      case "barrier-violations" :: _ =>
        // test whether filter/projection pushdown through the derive
        // projection multiplies derive-expression evaluation inside the
        // check predicates: same validator over (a) the inline derive,
        // (b) a localCheckpoint barrier (attributes only)
        val schema = graft.compile.TableSchemaCompiler
          .compileString(SparkEntry.querySchema).toOption.get
        val t = graft.sources.TranscriptDerive.fromLineitem(spark, sfDir)
        def t3(label: String)(f: => Unit): Unit = {
          f // warm
          (1 to reps).foreach(_ => println(s"STAGE $label " + fmt(time(f))))
        }
        t3("inline_derive") {
          graft.exprs.Validator.validateTranscripts(t, schema).count(); ()
        }
        val ck = t.localCheckpoint()
        t3("checkpoint_barrier") {
          graft.exprs.Validator.validateTranscripts(ck, schema).count(); ()
        }
        org.apache.spark.sql.GraftSqlBridge.unpersistCheckpoint(ck)

      case "stages-formats" :: _ =>
        // bisect v_formats: one single-format schema per column
        val d = graft.sources.DirtyDerive.fromLineitem(spark, sfDir)
        def t3(label: String)(f: => Unit): Unit = {
          f // warm
          (1 to reps).foreach(_ => println(s"STAGE $label " + fmt(time(f))))
        }
        t3("derive_count") { d.count(); () }
        val fmts = Seq("email" -> "email", "ip" -> "ipv4", "url" -> "uri",
          "dt_str" -> "date-time", "host" -> "hostname", "ip6" -> "ipv6", "rgx" -> "regex")
        fmts.foreach { case (cn, f) =>
          val sj = s"""{ "type": "object", "required": ["l_orderkey", "l_linenumber"],
            "properties": { "l_orderkey": {"type": "integer"}, "l_linenumber": {"type": "integer"},
              "$cn": { "type": "string", "format": "$f" } } }"""
          val ts = graft.compile.TableSchemaCompiler.compileString(sj).toOption.get
          t3(s"fmt_$f") {
            graft.exprs.Validator.violations(d, ts, Seq("l_orderkey", "l_linenumber")).count(); ()
          }
        }

      case "repart" :: _ =>
        // single-row-group scans are 1-task: measure the effect of a
        // round-robin repartition right after the read (guide §2.5)
        def t3(label: String)(f: => Unit): Unit = {
          f // warm
          (1 to reps).foreach(_ => println(s"STAGE $label " + fmt(time(f))))
        }
        val fmtsSchema = graft.compile.TableSchemaCompiler.compileString(s"""
          { "type": "object", "required": ["l_orderkey", "l_linenumber"],
            "properties": {
              "l_orderkey": {"type": "integer"}, "l_linenumber": {"type": "integer"},
              "email":  { "type": "string", "format": "email" },
              "ip":     { "type": "string", "format": "ipv4" },
              "url":    { "type": "string", "format": "uri" },
              "dt_str": { "type": "string", "format": "date-time" },
              "host":   { "type": "string", "format": "hostname" },
              "ip6":    { "type": "string", "format": "ipv6" },
              "rgx":    { "type": "string", "format": "regex" } } }""").toOption.get
        val d0 = graft.sources.DirtyDerive.fromLineitem(spark, sfDir)
        t3("formats_1task") {
          graft.exprs.Validator.violations(d0, fmtsSchema, Seq("l_orderkey", "l_linenumber")).count(); ()
        }
        val li32 = spark.read.parquet(s"$sfDir/lineitem.parquet").repartition(32)
        // DirtyDerive reads internally; emulate on the repartitioned frame
        val d32names = d0.columns
        val d32 = {
          // re-run the derive selectExpr over the repartitioned lineitem
          val exprs = classOf[graft.sources.DirtyDerive.type] // placeholder, not used
          graft.sources.DirtyDerive.fromLineitem(spark, sfDir) // cannot inject; approximate below
        }
        // approximate: repartition AFTER derive (same per-row work moved)
        val dR = d0.repartition(32)
        t3("formats_repart_after_derive") {
          graft.exprs.Validator.violations(dR, fmtsSchema, Seq("l_orderkey", "l_linenumber")).count(); ()
        }
        val t0 = graft.sources.TranscriptDerive.fromLineitem(spark, sfDir)
        t3("convstats_1task") {
          t0.groupBy(col("conv_id")).agg(count(col("tool")).as("n"),
            countDistinct(col("tool")).as("d")).filter(col("n") > 0).count(); ()
        }
        val tR = t0.repartition(32)
        t3("convstats_repart") {
          tR.groupBy(col("conv_id")).agg(count(col("tool")).as("n"),
            countDistinct(col("tool")).as("d")).filter(col("n") > 0).count(); ()
        }
        // dump the AQE-final plan of the repartitioned formats variant +
        // a task-count listener reading
        val stats = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
            stats.put(e.stageInfo.stageId, e.stageInfo.numTasks)
        }
        spark.sparkContext.addSparkListener(listener)
        val q = graft.exprs.Validator.violations(dR, fmtsSchema, Seq("l_orderkey", "l_linenumber"))
        q.count()
        Thread.sleep(1000)
        println("TASKS per stage: " + stats)
        println(q.queryExecution.executedPlan.toString.take(3000))
        spark.sparkContext.removeSparkListener(listener)

      case "stagetimes" :: names =>
        // per-stage (numTasks, total task runtime, max task runtime) for
        // one execution of each named query
        names.foreach { name =>
          val fn = SparkEntry.queries(name)
          fn(spark, sfDir).count() // warm
          val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              val si = e.stageInfo
              val ms = si.taskMetrics
              rows.add(s"stage=${si.stageId} tasks=${si.numTasks} " +
                s"runtimeMs=${ms.executorRunTime} cpuMs=${ms.executorCpuTime / 1000000} " +
                s"input=${ms.inputMetrics.recordsRead} " +
                s"sRead=${ms.shuffleReadMetrics.recordsRead} " +
                s"sWrite=${ms.shuffleWriteMetrics.recordsWritten} " +
                s"name=${si.name.take(60)}")
            }
          }
          spark.sparkContext.addSparkListener(listener)
          val w = time(fn(spark, sfDir).count())
          Thread.sleep(1500)
          spark.sparkContext.removeSparkListener(listener)
          println(s"STAGETIMES $name wall=${fmt(w)}")
          rows.forEach(r => println(s"  $r"))
        }

      case "finalplan" :: names =>
        val captured = new java.util.concurrent.atomic.AtomicReference[String]("")
        val ql = new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
                                 qe: org.apache.spark.sql.execution.QueryExecution,
                                 durationNs: Long): Unit =
            captured.set(qe.executedPlan.toString)
          override def onFailure(funcName: String,
                                 qe: org.apache.spark.sql.execution.QueryExecution,
                                 exception: Exception): Unit = ()
        }
        spark.listenerManager.register(ql)
        names.foreach { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          df.count()
          Thread.sleep(1500)
          println(s"==== FINALPLAN $name (of the count() execution) ====")
          // show operator tree skeleton only: strip expression detail
          captured.get().linesIterator
            .map(_.take(140)).take(60).foreach(println)
        }
        spark.listenerManager.unregister(ql)

      case "abkeyhash" :: _ =>
        // A/B on suggestKeys' pass-1 agg: flat xxhash64(cols...) per
        // candidate (prefix columns re-hashed per candidate) vs nested
        // prefix-sharing hashes (any 64-bit fingerprint is valid — the
        // exact confirm stage makes hash choice correctness-neutral)
        val tk = graft.sources.TranscriptDerive.fromLineitem(spark, sfDir)
        val sdfk = tk.toDF(tk.columns.indices.map(i => s"__c$i"): _*)
        val idxK = tk.columns.zipWithIndex.toMap
        def ck(n: String) = col(s"__c${idxK(n)}")
        val cands = Seq(
          Seq("conv_id"), Seq("conv_id", "turn_idx"),
          Seq("conv_id", "turn_idx", "role"), Seq("conv_id", "turn_idx", "text"))
        def t3k(label: String)(f: => Unit): Unit = {
          f
          (1 to reps).foreach(_ => println(s"ABKEYHASH $label " + fmt(time(f))))
        }
        t3k("flat") {
          val aggs = count(lit(1)).as("__total") +: cands.zipWithIndex.flatMap { case (cs, i) =>
            val sc = cs.map(ck)
            Seq(sum(sc.map(_.isNull).reduce(_ || _).cast("long")).as(s"__nulls_$i"),
              approx_count_distinct(xxhash64(sc: _*)).as(s"__hll_$i"))
          }
          sdfk.agg(aggs.head, aggs.tail: _*).collect(); ()
        }
        t3k("nested") {
          val h1 = xxhash64(ck("conv_id"))
          val h2 = xxhash64(h1, ck("turn_idx"))
          val h3 = xxhash64(h2, ck("role"))
          val h4 = xxhash64(h2, ck("text"))
          val hs = Seq(h1, h2, h3, h4)
          val aggs = count(lit(1)).as("__total") +: cands.zipWithIndex.flatMap { case (cs, i) =>
            val sc = cs.map(ck)
            Seq(sum(sc.map(_.isNull).reduce(_ || _).cast("long")).as(s"__nulls_$i"),
              approx_count_distinct(hs(i)).as(s"__hll_$i"))
          }
          sdfk.agg(aggs.head, aggs.tail: _*).collect(); ()
        }

      case "abpattern" :: _ =>
        // A/B: pattern conditional sums as aggregate expressions (the
        // noTerm conjunct re-evaluated per pattern) vs pattern bits
        // hoisted into a projection below the agg (codegen subexpression
        // elimination shares the 5-contains terminator check per column)
        val t0 = graft.sources.TranscriptDerive.fromLineitem(spark, sfDir)
        val sdf0 = t0.toDF(t0.columns.indices.map(i => s"__c$i"): _*)
        val strIdx = t0.schema.fields.zipWithIndex.collect {
          case (f, i) if f.dataType == org.apache.spark.sql.types.StringType => i
        }.toSeq
        val menu0 = graft.stats.SchemaInfer.patternMenu
        val terms0 = Seq("\n", "\r", "", " ", " ")
        def hit0(c: org.apache.spark.sql.Column, p: String) =
          graft.functions.SimplePatternMatch.tryColumn(c, p).getOrElse(c.rlike(p)) &&
            terms0.map(x => !c.contains(x)).reduce(_ && _)
        def t3b(label: String)(f: => Unit): Unit = {
          f
          (1 to reps).foreach(_ => println(s"ABPATTERN $label " + fmt(time(f))))
        }
        // A: current form (agg-side conjuncts)
        t3b("agg_side") {
          val aggs = strIdx.flatMap { i =>
            menu0.zipWithIndex.map { case (p, k) =>
              val c = col(s"__c$i")
              sum((c.isNotNull && !hit0(c, p)).cast("long")).as(s"__c${i}__pm_$k")
            }
          }
          sdf0.agg(aggs.head, aggs.tail: _*).collect(); ()
        }
        // B: projection-hoisted bits
        t3b("proj_hoisted") {
          val bits = strIdx.flatMap { i =>
            menu0.zipWithIndex.map { case (p, k) =>
              val c = col(s"__c$i")
              (c.isNotNull && !hit0(c, p)).as(s"__b${i}_$k")
            }
          }
          val proj = sdf0.select(bits: _*)
          val aggs = strIdx.flatMap { i =>
            menu0.indices.map(k => sum(col(s"__b${i}_$k").cast("long")).as(s"__c${i}__pm_$k"))
          }
          proj.agg(aggs.head, aggs.tail: _*).collect(); ()
        }
        // C: projection-hoisted noTerm only (pattern matchers stay agg-side)
        t3b("noterm_hoisted") {
          val withNt = sdf0.select(col("*") +: strIdx.map { i =>
            val c = col(s"__c$i")
            terms0.map(x => !c.contains(x)).reduce(_ && _).as(s"__nt$i")
          }: _*)
          val aggs = strIdx.flatMap { i =>
            menu0.zipWithIndex.map { case (p, k) =>
              val c = col(s"__c$i")
              val hp = graft.functions.SimplePatternMatch.tryColumn(c, p).getOrElse(c.rlike(p)) &&
                col(s"__nt$i")
              sum((c.isNotNull && !hp).cast("long")).as(s"__c${i}__pm_$k")
            }
          }
          withNt.agg(aggs.head, aggs.tail: _*).collect(); ()
        }

      case "abregex" :: _ =>
        // controlled test: same derive+regex work, scan-fused (1 task)
        // vs post-shuffle (32 tasks), fence vs no fence — report total
        // stage CPU via listener
        val cpu = new java.util.concurrent.atomic.AtomicLong(0)
        val listener2 = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
            cpu.addAndGet(e.stageInfo.taskMetrics.executorCpuTime / 1000000)
        }
        spark.sparkContext.addSparkListener(listener2)
        def cpuOf(f: => Unit): (Double, Long) = {
          f // warm
          Thread.sleep(500); cpu.set(0)
          val w = time(f)
          Thread.sleep(1000)
          (w, cpu.get())
        }
        val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
        def derive(df: DataFrame) = df.selectExpr("l_orderkey", "l_linenumber",
          """CASE WHEN l_orderkey % 7 = 0 THEN concat('user', l_orderkey, '.example.com')
                  ELSE concat('u', l_orderkey, '@example.com') END AS email""")
        def q(df: DataFrame, fenced: Boolean) = {
          val pred = !col("email").rlike("^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$")
          derive(df).filter(if (fenced) graft.functions.PushdownFence.fence(pred) else pred).count()
        }
        Seq(
          ("scan_nofence", () => q(raw, false)),
          ("scan_fence", () => q(raw, true)),
          ("shuffle_nofence", () => q(raw.repartition(32), false)),
          ("shuffle_fence", () => q(raw.repartition(32), true))
        ).foreach { case (label, f) =>
          val (w, c) = cpuOf { f(); () }
          println(s"ABREGEX $label wall=${fmt(w)} cpuTotalMs=$c")
        }
        spark.sparkContext.removeSparkListener(listener2)
        val cap = new java.util.concurrent.atomic.AtomicReference[String]("")
        val ql2 = new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(n: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
            cap.set(qe.executedPlan.toString)
          override def onFailure(n: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
        }
        spark.listenerManager.register(ql2)
        q(raw.repartition(32), true)
        Thread.sleep(1500)
        println("==== shuffle_fence executed plan ====")
        cap.get().linesIterator.map(_.take(160)).take(30).foreach(println)
        spark.listenerManager.unregister(ql2)

      case "dbgbarrier" :: _ =>
        val schema = graft.compile.TableSchemaCompiler
          .compileString(SparkEntry.querySchema).toOption.get
        val t = graft.sources.TranscriptDerive.fromLineitem(spark, sfDir)
        val checks = graft.exprs.ConstraintCompiler.compile(schema, t.schema)
          .fold(e => throw new IllegalArgumentException(e), identity)
        val refs = checks.flatMap(ch => Seq(ch.ok, ch.actual))
          .map(org.apache.spark.sql.GraftSqlBridge.expression)
          .flatMap(_.collect {
            case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name
            case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a.name
          })
        println("DBG checkRefs distinct = " + refs.distinct.mkString(","))
        println("DBG df.columns = " + t.columns.mkString(","))
        val e0 = org.apache.spark.sql.GraftSqlBridge.expression(col("x").isNotNull)
        println("DBG expr class = " + e0.getClass.getName)
        println("DBG expr tree = " + e0.treeString)
        println("DBG nodes = " + e0.collect { case n => n.getClass.getSimpleName }.mkString(","))

      case other =>
        System.err.println(s"unknown BenchExtra mode: $other")
        sys.exit(1)
    }
    spark.stop()
  }
}
