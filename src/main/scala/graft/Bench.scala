package graft

import org.apache.spark.sql.SparkSession

/** Shared local[N] benchmark session: Bench and BenchOne MUST use the
  * same configuration or BenchOne's focused timings stop being
  * comparable to the gate numbers it exists to bisect.
  */
private[graft] object BenchSession {
  def open(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // benchmark inputs are single small parquet files; split them so
      // all cores engage (at real scale the 128m default is correct)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count() // JVM/codegen warm-up
    spark
  }
}

/** Per-round benchmark: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line (driver contract).
  * Also reports flagship validation throughput (turns/sec over the
  * derived transcripts table) as extra keys.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = BenchSession.open(cpus)

    // interleaved fixed-work CPU calibration probe (round-6 verdict
    // item): the sandbox host's throughput fluctuates ~3x between
    // hypervisor windows, invisible in guest loadavg. A fixed-cost
    // single-thread hash loop timed at the start, between query blocks,
    // and at the end ships in the JSON — cross-round comparisons can
    // normalize by (or at least see) the host window instead of
    // forensically re-deriving it from scan-shaped queries.
    def calibProbe(): Double = {
      val t0 = System.nanoTime()
      var acc = 1469598103934665603L // FNV offset basis; fixed work, ~0.2 s nominal
      var i = 0L
      while (i < 200000000L) { acc = (acc ^ i) * 1099511628211L; i += 1 }
      if (acc == 42L) print("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    val calib = scala.collection.mutable.ArrayBuffer(calibProbe())

    // best-of-2 per query: the first run pays JIT/codegen/file-listing;
    // the host VM's throughput also fluctuates (BENCH.md methodology).
    // The per-query spread (max/min of the two runs) ships in the JSON so
    // a host-noise outlier is self-diagnosing instead of needing a replay.
    // a throwing query must NOT enter the timing stats (its fail-fast
    // wall time would masquerade as the suite's fastest query); it is
    // reported by name in an `errors` array instead
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    val attempts = sorted.zipWithIndex.map { case ((name, fn), idx) =>
      if (idx > 0 && idx % 25 == 0) calib += calibProbe()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      (name, times)
    }
    calib += calibProbe()
    val errors = attempts.collect { case (name, ts) if ts.exists(!_._1) => name }
    val results = attempts.collect { case (name, ts) if ts.forall(_._1) =>
      val secs = ts.map(_._2)
      (name, secs.min, secs.max / math.max(secs.min, 1e-9))
    }

    // flagship throughput: validated turns/sec over a MATERIALIZED
    // transcripts table. The lazy fixture derivation (regex/concat over
    // lineitem) is ~85% of an un-cached run's wall time (round-4 probe:
    // derive+validate 3.17 s vs 0.42 s validation on cached input at
    // sf0.1) — timing it would benchmark the fixture generator, not the
    // engine; production reads parquet, as ClusterScalingBench does.
    val transcripts = graft.sources.TranscriptDerive.fromLineitem(spark, sfDir).cache()
    val nTurns = transcripts.count()
    val schema = graft.compile.TableSchemaCompiler
      .compileString(SparkEntry.querySchema).toOption.get
    graft.exprs.Validator.validateTranscripts(transcripts, schema).count() // warm
    val tV0 = System.nanoTime()
    graft.exprs.Validator.validateTranscripts(transcripts, schema).count()
    val vSec = (System.nanoTime() - tV0) / 1e9
    val turnsPerSec = nTurns / vSec
    transcripts.unpersist()

    // the driver records only the last ~2000 chars of the log, so the
    // metric line must be (a) LAST and (b) short enough to fit there
    // whole: per-query secs rounded to 3 decimals, and the diagnostic
    // spread map on its own earlier line (fine if the tail clips it)
    def r3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f",
      java.lang.Double.valueOf(v)) // Locale.ROOT: a comma decimal separator would break the JSON
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val spreads = results.map { case (k, _, s) =>
      "\"" + k + "\":" + (math.round(s * 100) / 100.0)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    // calibration summary: per-probe seconds (diagnostic line) plus the
    // min and max/min drift ratio (ships on the metric lines). drift
    // near 1.0 = stable window; >> 1.0 = the host moved mid-run and
    // per-query numbers need the per-probe timeline to adjudicate
    val calibArr = calib.map(r3).mkString("[", ",", "]")
    val calibMin = calib.min
    val calibDrift = calib.max / math.max(calib.min, 1e-9)
    println(s"""{"calib_probes":$calibArr}""")
    println(s"""{"spread":$spreads}""")
    // full per-query map on its own earlier line (fine if the tail clips it)
    println(
      s"""{"metric":"total_full","value":${r3(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"${sfDir.replace("\\", "\\\\").replace("\"", "\\\"")}","turns":$nTurns,"validate_sec":${r3(vSec)},"turns_per_sec":${turnsPerSec.round},"calib_sec":${r3(calibMin)},"calib_drift":${(math.round(calibDrift * 100) / 100.0)}}""")
    // The driver keeps only the last ~2000 chars of the log and regex-
    // parses the metric JSON out of that window; sbt appends ~80 chars
    // of "[success] Total time ..." after us. With 60+ queries the full
    // map alone is ~1800 chars, so a full-map line can START outside
    // the window and parse as null (rounds 1-4). The LAST line is a
    // compact variant: same shape, `queries` capped to the most
    // expensive entries under a byte budget, remainder counted in
    // "queries_omitted" (full map is on the line above).
    val byCost = results.sortBy { case (_, v, _) => -v }
      .map { case (k, v, _) => "\"" + k + "\":" + r3(v) }
    val budget = 1100
    val kept = new scala.collection.mutable.ArrayBuffer[String]
    var used = 0
    byCost.foreach { e =>
      if (used + e.length + 1 <= budget) { kept += e; used += e.length + 1 }
    }
    val qsCompact = kept.mkString("{", ",", "}")
    val omitted = results.size - kept.size
    println(
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qsCompact,"queries_omitted":$omitted,"errors":$errs,"sf":"${sfDir.replace("\\", "\\\\").replace("\"", "\\\"")}","turns":$nTurns,"validate_sec":${r3(vSec)},"turns_per_sec":${turnsPerSec.round},"calib_sec":${r3(calibMin)},"calib_drift":${(math.round(calibDrift * 100) / 100.0)}}""")
    spark.stop()
  }
}

/** Focused per-query timing for regression bisection: runs the named
  * SparkEntry queries N times each (default 5) on SPARK_GRAFT_SF_DIR
  * and prints per-run seconds — used to separate a real plan regression
  * from the host's ~1.2-3x throughput windows (BENCH.md methodology).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = BenchSession.open(cpus)
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      def fmt(p: String, v: Double) =
        String.format(java.util.Locale.ROOT, p, java.lang.Double.valueOf(v))
      println(s"BENCHONE $name min=${fmt("%.3f", times.min)} " +
        times.map(t => fmt("%.2f", t)).mkString("[", ",", "]"))
    }
    spark.stop()
  }
}

/** Cluster-mode scaling evidence: the same validation job on the same
  * parquet input under `local-cluster[N,cores,mem]` — Spark forks REAL
  * executor JVMs (own heap, own GC, own codegen cache), so N=1 vs N=4
  * executors is the closest in-sandbox analogue of the north_rule's
  * "N and 4N executors" criterion. Prints one JSON line.
  */
/** Scaffolding shared by the local-cluster scaling benches: executor
  * classpath resolution, the session recipe, and the generate-if-absent
  * input guard — in ONE place so a fix to any of them (e.g. the
  * stopped-cluster starvation workaround, the relative-classpath bug)
  * cannot silently diverge between the scan-shaped and shuffle-shaped
  * benches.
  */
private[graft] object LocalClusterBench {
  // resolve from this class's own code source so the bench works from
  // any CWD (a relative path gave executors an empty classpath)
  lazy val classesDir: String = Option(getClass.getProtectionDomain.getCodeSource)
    .map(cs => new java.io.File(cs.getLocation.toURI).getAbsolutePath)
    .getOrElse(new java.io.File("target/scala-2.13/classes").getAbsolutePath)

  def coresPerExec: Int = sys.env.getOrElse("SPARK_GRAFT_EXEC_CORES", "4").toInt
  def execMemMb: Int = sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "8192").toInt

  def session(executors: Int, shufflePartitions: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local-cluster[$executors,$coresPerExec,$execMemMb]")
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Generate `input` with a plain local session if absent, leaving no
    * active/default session behind (a leftover would shadow the
    * local-cluster session the measurement needs).
    */
  def ensureInput(input: String)(write: SparkSession => Unit): Unit =
    if (!new java.io.File(s"$input/_SUCCESS").exists()) {
      val gen = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false").getOrCreate()
      gen.sparkContext.setLogLevel("WARN")
      write(gen)
      gen.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

  def teardown(s: SparkSession): Unit = {
    s.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
  }
}

object ClusterScalingBench {
  def main(args: Array[String]): Unit = {
    import LocalClusterBench._
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "32000000").toLong
    // default dir keyed by row count: the two scaling benches previously
    // shared one dir with different default sizes, and the _SUCCESS check
    // silently reused whichever input was generated first
    val input = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", s"/tmp/graft_scaling_input_$rows")

    def session(executors: Int): SparkSession =
      LocalClusterBench.session(executors, executors * coresPerExec)

    ensureInput(input) { gen =>
      graft.sources.TranscriptGen
        .generate(gen, rows / 8, 8, graft.sources.TranscriptGen.all)
        .repartition(128).write.mode("overwrite").parquet(input)
    }
    val schema = graft.compile.TableSchemaCompiler
      .compileString(SparkEntry.querySchema).toOption.get

    def run(executors: Int): (Long, Double) = {
      val s = session(executors)
      try {
        val df = s.read.parquet(input)
        graft.exprs.Validator.validateTranscripts(df, schema).count() // warm-up
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          graft.exprs.Validator.validateTranscripts(df, schema).count()
          (System.nanoTime() - t0) / 1e9
        }
        (df.count(), times.min)
      } finally teardown(s)
    }

    args.headOption match {
      case Some(e) =>
        // one measurement per JVM — a stopped local-cluster leaves master
        // state that starves follow-up clusters in the same process
        val executors = e.toInt
        val (n, sec) = run(executors)
        println(s"""{"metric":"cluster_scaling_single","executors":$executors,"cores_per_executor":$coresPerExec,"input_rows":$n,"sec":$sec,"turns_per_sec":${(n / sec).round}}""")
      case None =>
        // refuse to measure multiple local-clusters in one JVM: a stopped
        // local-cluster leaves master state that starves follow-up
        // clusters in-process, so an all-in-one run would produce the
        // inflated t4 this mode exists to avoid (BENCH.md methodology:
        // one level per JVM, alternate 1/4 pairs, best-of per level)
        System.err.println(
          "usage: ClusterScalingBench <executors> -- one measurement per JVM; " +
            "alternate `1` and `4` invocations and take best-of per level")
        sys.exit(1)
    }
  }
}

/** Scaling evidence (BASELINE.md): the same validation job on the same
  * parquet input at local[N] vs local[4N] — the thread-level sandbox
  * proxy (north_rule: efficiency >= 0.8). Prints one JSON line
  * with both throughputs and the efficiency.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "8000000").toLong
    val input = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", s"/tmp/graft_scaling_input_$rows")

    def session(threads: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$threads]")
        .config("spark.sql.shuffle.partitions", threads.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    // generate the shared input once (128 files so both levels have
    // enough splits; deterministic -> identical bytes either way).
    // Session only when generation is needed — warm re-runs shouldn't
    // pay a full SparkSession start/stop on a host-noise-sensitive bench
    if (!new java.io.File(s"$input/_SUCCESS").exists()) {
      val gen = session(32)
      graft.sources.TranscriptGen
        .generate(gen, rows / 8, 8, graft.sources.TranscriptGen.all)
        .repartition(128)
        .write.mode("overwrite").parquet(input)
      gen.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    val schema = graft.compile.TableSchemaCompiler
      .compileString(SparkEntry.querySchema).toOption.get

    def run(threads: Int): (Long, Double) = {
      val s = session(threads)
      try {
        val df = s.read.parquet(input)
        // warm-up pass (JIT + codegen + file listing), then timed best-of-2
        graft.exprs.Validator.validateTranscripts(df, schema).count()
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n = graft.exprs.Validator.validateTranscripts(df, schema).count()
          (n, (System.nanoTime() - t0) / 1e9)
        }
        val nRows = df.count()
        (nRows, times.map(_._2).min)
      } finally {
        s.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }

    args.headOption match {
      case Some(t) =>
        // single-level mode: run under `taskset -c 0-(t-1)` so the WHOLE
        // JVM (worker threads + GC + IO) sees exactly t CPUs — an honest
        // proxy for a t-core cluster slice
        val threads = t.toInt
        val (n, sec) = run(threads)
        println(s"""{"metric":"scaling_single","threads":$threads,"input_rows":$n,"sec":$sec,"turns_per_sec":${(n / sec).round}}""")
      case None =>
        // N vs 4N thread pairing. Default 4 vs 16 on the 32-core sandbox
        // box: both levels leave headroom for GC/background threads, so
        // the ratio measures the JOB's scaling, not the host's
        // saturation behavior (override with SPARK_GRAFT_SCALE_N).
        val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "4").toInt
        // alternate the two levels and keep the best time per level: the
        // sandbox host's throughput fluctuates ~3x over minutes, and
        // best-vs-best pairs the levels at comparable host conditions
        val trials = (1 to 3).map(_ => (run(n), run(4 * n)))
        val (nr1, t1) = trials.map(_._1).minBy(_._2)
        val (nr4, t4) = trials.map(_._2).minBy(_._2)
        require(nr1 == nr4)
        val thr1 = nr1 / t1
        val thr4 = nr4 / t4
        val efficiency = thr4 / (4.0 * thr1)
        println(
          s"""{"metric":"scaling","n_threads":$n,"input_rows":$nr1,"localN_sec":$t1,"local4N_sec":$t4,""" +
            s""""localN_turns_per_sec":${thr1.round},"local4N_turns_per_sec":${thr4.round},""" +
            s""""speedup":${(thr4 / thr1 * 1000).round / 1000.0},"efficiency":${(efficiency * 1000).round / 1000.0}}""")
    }
  }
}

/** A/B micro-bench for the int8 quantization kernel (BENCH.md round 5):
  * codegen [[graft.functions.QuantizeInt8Codes]] vs the interpreted-HOF
  * reference formulation, on a cached synthetic embedding table so only
  * the quantize stage is timed. Prints per-variant best-of seconds.
  */
object QuantBench {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = BenchSession.open(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val df = spark.range(n).select(col("id").as("vec_id"),
      array((0 until dim).map(i =>
        ((xxhash64(col("id"), lit(i)) % 1000).cast("float") / lit(100.0f)).cast("float")): _*)
        .as("embedding")).cache()
    df.count()
    def time(f: => Long): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", java.lang.Double.valueOf(v))
    // element_at forces the whole q array to be computed; the filter
    // count materializes every row without collecting data
    def drive(q: org.apache.spark.sql.DataFrame): Long =
      q.filter(element_at(col("q"), 1) =!= 126 || col("scale") > -1f).count()
    val variants = Seq(
      "codegen" -> (() => drive(graft.pipeline.Ann.quantizeInt8(df))),
      "hof" -> (() => drive(graft.pipeline.Ann.quantizeInt8Hof(df))))
    variants.foreach { case (name, f) => f() } // warm both plans
    val results = variants.map { case (name, f) =>
      name -> (1 to reps).map(_ => time(f())).min
    }
    val Seq(cg, hof) = results.map(_._2)
    println(s"""QUANTBENCH {"rows":$n,"dim":$dim,"codegen_sec":${fmt(cg)},"hof_sec":${fmt(hof)},"speedup":${fmt(hof / cg)}}""")
    spark.stop()
  }
}

/** Scaling evidence for the WINDOW+AGG-shaped plan family (round-6
  * verdict item: scan-shaped flagship and shuffle-join plans were
  * measured; the third physical family — one conversation-keyed
  * exchange feeding a partitioned window and a per-key aggregation —
  * was not). Runs [[graft.pipeline.Conversations.convDigest]] (the
  * gated conv_digest plan, verbatim) over a generated transcripts
  * table at N executor JVMs: one cluster per JVM, alternating N/4N
  * best-of pairs, the same methodology as [[ClusterScalingBench]].
  * The digest count is printed and must match across levels (the
  * value-check that the timed work is the real work).
  */
object WindowScalingBench {
  def main(args: Array[String]): Unit = {
    import LocalClusterBench._
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "32000000").toLong
    // same generation rule AND row-count-keyed path as ClusterScalingBench:
    // the two benches share one on-disk input instead of storing a
    // byte-identical multi-GB copy each
    val input = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", s"/tmp/graft_scaling_input_$rows")

    ensureInput(input) { gen =>
      graft.sources.TranscriptGen
        .generate(gen, rows / 8, 8, graft.sources.TranscriptGen.all)
        .repartition(128).write.mode("overwrite").parquet(input)
    }

    def run(executors: Int): (Long, Long, Double) = {
      val s = LocalClusterBench.session(executors, executors * coresPerExec)
      try {
        val df = s.read.parquet(input)
        def digest() = graft.pipeline.Conversations.convDigest(df).count()
        val convs = digest() // warm-up (codegen + shuffle services)
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          digest()
          (System.nanoTime() - t0) / 1e9
        }
        (df.count(), convs, times.min)
      } finally teardown(s)
    }

    // one measurement per JVM (stopped local-clusters starve follow-up
    // clusters in-process — same constraint as ClusterScalingBench)
    val executors = args.headOption.getOrElse("1").toInt
    val (n, convs, sec) = run(executors)
    println(s"""{"metric":"window_scaling_single","executors":$executors,"cores_per_executor":$coresPerExec,"input_rows":$n,"convs":$convs,"sec":$sec,"turns_per_sec":${(n / sec).round}}""")
  }
}

/** Scaling evidence for a SHUFFLE-HEAVY operator (round-5 verdict item:
  * the local-cluster efficiency was measured only on the scan-shaped
  * flagship). Runs MinHash-LSH near-dup pair detection — explode +
  * 24 grouped min-aggs (shuffle 1), capped band self-join (shuffle 2),
  * exact shingle-Jaccard verify — over a deterministic synthetic corpus
  * at N executor JVMs, one cluster per JVM, the same alternating N/4N
  * best-of methodology as [[ClusterScalingBench]].
  *
  * Corpus: ~unique 30-token docs from xxhash64(id, j); 10% of docs form
  * planted near-dup pairs (ids 2m/2m+1 with m%10==0 share 28 of 30
  * tokens, shingle J ≈ 0.76 > 0.5 threshold), so the band join carries
  * real skewless work and the verify stage real pairs — bucket
  * population stays 2, the honest large-corpus shape.
  */
object ShuffleScalingBench {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import LocalClusterBench._
    val docs = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_DOCS", "2000000").toLong
    val input = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_DIR", s"/tmp/graft_shuffle_input_$docs")

    def corpus(s: SparkSession, n: Long) = {
      val pairBase = expr("id div 2")
      val planted = pairBase % 10 === 0
      // domain-discriminated hashes: a shared token can never collide
      // with any doc's unique tokens (without the tag, doc id=m aliases
      // the pair (2m, 2m+1)'s shared seeds and forms spurious triples)
      val toks = (0 until 30).map { j =>
        val t =
          if (j < 28)
            when(planted, xxhash64(lit("shared"), pairBase, lit(j)))
              .otherwise(xxhash64(lit("uniq"), col("id"), lit(j)))
          else xxhash64(lit("uniq"), col("id"), lit(j))
        concat(lit("t"), t.cast("string"))
      }
      s.range(n).select(col("id").as("doc_id"), concat_ws(" ", toks: _*).as("text"))
    }
    ensureInput(input) { gen =>
      corpus(gen, docs).repartition(128).write.mode("overwrite").parquet(input)
    }

    def run(executors: Int): (Long, Long, Double) = {
      // 2x cores for the join-heavy plan: the band self-join's exchange
      // benefits from finer partitions than the scan-shaped flagship
      val s = LocalClusterBench.session(executors, executors * coresPerExec * 2)
      try {
        val df = s.read.parquet(input)
        def pairs() = graft.pipeline.Dedup
          .minhashPairs(df, k = 24, bands = 12, threshold = 0.5).count()
        val p = pairs() // warm-up (codegen + shuffle services)
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          pairs()
          (System.nanoTime() - t0) / 1e9
        }
        (df.count(), p, times.min)
      } finally teardown(s)
    }

    // one measurement per JVM (stopped local-clusters starve follow-up
    // clusters in-process — same constraint as ClusterScalingBench)
    val executors = args.headOption.getOrElse("1").toInt
    val (n, p, sec) = run(executors)
    println(s"""{"metric":"shuffle_scaling_single","executors":$executors,"cores_per_executor":$coresPerExec,"input_docs":$n,"pairs":$p,"sec":$sec,"docs_per_sec":${(n / sec).round}}""")
  }
}
