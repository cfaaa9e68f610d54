package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line per run (driver contract).
  *
  * Hardened per round-1 review:
  *   - a warmup pass (flagship query, untimed) absorbs JVM/codegen warmup so
  *     the first timed query isn't a 5 s outlier;
  *   - full materialization through the `noop` sink instead of `count()`
  *     (count lets Catalyst prune every projected column, under-measuring
  *     scan/projection queries);
  *   - failures are NOT swallowed: a failing query reports `-1` timing, is
  *     listed in an `"errors"` map, and the process exits non-zero.
  *
  * Round-4 hardening: each query is timed `Runs` times and the MEDIAN is
  * reported — single timings on this box swing 2-3× with JIT/GC (round-3
  * review: q_embed_topk 0.69→1.88 s with an identical plan), so one-shot
  * numbers are noise, not signal. `"queries"` carries the medians;
  * `"queries_min"` carries the best-of-N for comparison.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warmup, untimed: one representative per engine path (join+agg,
    // window, LSH/HOF, native vector expression) so the first timed
    // query of each shape doesn't absorb its codegen/JIT cost.
    for (w <- Seq("q_top_products", "q_window_rank", "q_doc_neardup",
        "q_embed_topk")) {
      // NonFatal only: an OOM/VM error during warm-up must crash the
      // bench, not let it go on to print a plausible-looking line from
      // a degraded JVM (r10 verdict nit).
      try materialize(w) catch { case scala.util.control.NonFatal(_) => () }
      spark.catalog.clearCache()
    }

    val Runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // GC + settle BETWEEN queries: a heap-heavy query (pagerank's pair
    // graph) otherwise leaves collection debt that the next query pays —
    // round-6 measured q_grouping_sets at 9× its true cost purely from
    // running right after q_graph_pagerank in alphabetical order. Two
    // gc() calls with a pause let a concurrent collector actually finish
    // before the next timing starts.
    def gcSettle(): Unit = {
      spark.catalog.clearCache()
      // drop the state-store providers the previous query's streaming
      // drains left cached (each holds its state maps + maintenance
      // work; across 13+ stateful queries × runs the debt visibly
      // skews later timings — see GraftStreamShim.unloadStateStores)
      try org.apache.spark.sql.graftshim.GraftStreamShim.unloadStateStores()
      catch { case scala.util.control.NonFatal(_) => () }
      System.gc(); Thread.sleep(200)
      System.gc(); Thread.sleep(100)
    }
    // Box-health probe (r13 verdict #7): two fixed queries — one
    // CPU-bound, one streaming/state-bound — timed in ISOLATION before
    // the suite, best-of-3, recorded as a "probe" block in the JSON.
    // Same HEAD, different boxes/windows: probe-ratio ≈ box-ratio, so
    // a 195-vs-250 s suite spread adjudicates mechanically as regime
    // variance instead of by judgment call. scripts/bench_probe runs
    // the same pair standalone for before/after checks.
    val probe = Seq("q_embed_kmeans", "q_stream_window").map { name =>
      gcSettle()
      val times = (1 to 3).flatMap { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { materialize(name); Some((System.nanoTime() - t0) / 1e9) }
        catch { case scala.util.control.NonFatal(_) => None }
      }
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val probeJson = probe
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")

    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, _) =>
      gcSettle()
      val times = (1 to Runs).flatMap { _ =>
        // Queries may cache intermediates (LSH signatures, IVF cells);
        // drop them between runs so timings are independent and the
        // session's memory doesn't ratchet up across 40+ queries.
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { materialize(name); Some((System.nanoTime() - t0) / 1e9) }
        catch { case scala.util.control.NonFatal(e) =>
          errors ::= (name -> e.toString.replaceAll("[\"\\\\\\n\\r]", " ").take(200))
          None
        }
      }
      val med =
        if (times.isEmpty) -1.0
        else {
          val s = times.sorted
          if (s.size % 2 == 1) s(s.size / 2)
          else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
        }
      val best = if (times.isEmpty) -1.0 else times.min
      (name, med, best, times)
    }
    def json(f: ((String, Double, Double, Seq[Double])) => Double): String =
      results.map(r => s"\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val qs = json(_._2)
    val qsMin = json(_._3)
    // Per-run breakdown IN RUN ORDER: the round-9 driver bench showed
    // 2.5× median-vs-min spread on two queries that the judge had to
    // re-time in isolation to adjudicate as load noise — with the raw
    // runs recorded, noise (one outlier run) separates from regression
    // (all runs slow) without anyone re-timing.
    val qsRuns = results
      .map(r => s"\"" + r._1 + "\":" + r._4.mkString("[", ",", "]"))
      .mkString("{", ",", "}")
    // a query failing several runs pushes one entry per run — keep one
    // per query or the emitted JSON object has duplicate keys
    val errJson = errors.reverse.distinctBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _, _) if v >= 0 => v }.sum
    // `cpus` and `heap_mb` record the actual measurement regime:
    // sub-second query medians swing 3-4× between local[4] and local[32]
    // from per-task overhead alone (round-5 "events-family shift" root
    // cause, SURVEY §6.3), and the round-6 driver file showed a 400×
    // "regression" that was entirely a heap/GC-regime shift (SURVEY §6.4)
    // — a bench line without both is not comparable across rounds.
    val heapMb = Runtime.getRuntime.maxMemory / (1024L * 1024L)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","runs":$Runs,"cpus":$cpus,"heap_mb":$heapMb,"probe":$probeJson,"queries":$qs,"queries_min":$qsMin,"queries_runs":$qsRuns,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // The stdout line alone is lossy in practice: the harness's capture
    // keeps only the TAIL of the line, and at 100+ queries that drops
    // the front timings (round-8 kept 65 of 113). Persist the complete
    // JSON to a file too, so cross-round per-query comparisons never
    // depend on anyone's capture window. Best-effort: a read-only CWD
    // must not fail the bench itself.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"bench_full write to $outPath failed: $e") }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
