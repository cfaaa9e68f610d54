package graft

/** Systemic plan guard over the ENTIRE query surface: no query may plan
  * a cartesian product, and nested-loop joins may appear only where a
  * broadcast cross join is the intended shape (1-row scalar broadcast,
  * tiny query/centroid sets against a streaming corpus). Catches the
  * classic silent scale-killer — a join that degrades to all-pairs after
  * an innocent-looking edit. */
class PlanGuardSpec extends SparkSpec {

  /** Queries whose plan legitimately contains BroadcastNestedLoopJoin:
    * the broadcast side is ≤ a few rows (scalar aggregate, ≤10 query
    * vectors, 8 centroids) and the condition is non-equi by design. */
  private val intendedBroadcastNL = Set(
    "q_scalar_subquery", "q_embed_topk", "q_embed_ivf", "q_embed_ivfpq",
    // the persisted-index twins search with the same tiny query-side
    // crosses as their train-inline forms
    "q_embed_ivf_idx", "q_embed_ivfpq_idx", "q_embed_ivf_refresh",
    // multi-probe variants: same tiny query-side crosses, nprobe=2
    "q_embed_ivf_nprobe", "q_embed_ivf_nprobe_idx", "q_embed_ivfpq_nprobe",
    "q_embed_ivfpq_rerank",
    "q_text_colloc",
    // k-row trained-centroid broadcast against the streaming corpus —
    // the same intended assignment cross as q_embed_ivf (semdedup was
    // registered after the last round-7 PlanGuard run; latent until r8)
    "q_embed_kmeans", "q_embed_semdedup",
    // 1-row scalar broadcast (corpus size) against a streaming fact side
    "q_text_tfidf", "q_text_rarity", "q_text_bm25",
    // 1-row total broadcast against the 20-row top-k relation
    "q_skew_profile")

  test("no cartesian products; nested-loop joins only where intended; " +
      "no partitionless windows outside the allowlist") {
    // ONE invocation per query for every plan property: several queries
    // are full lifecycles (streaming drains, scratch-table writes), so
    // building each plan once instead of once per property keeps the
    // sweep's cost from doubling as the surface grows.
    val d = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      spark.catalog.clearCache()
      val qe = fn(spark, d).queryExecution
      val plan = qe.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
      if (!intendedBroadcastNL(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unintended nested-loop join:\n$plan")
      val glob = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      if (intendedGlobalWindow(name))
        assert(glob.nonEmpty,
          s"$name is allowlisted for a global window but plans none — " +
            "remove it from the allowlist")
      else
        assert(glob.isEmpty,
          s"$name plans a partitionless Window (single-task funnel at " +
            s"scale):\n${glob.headOption.getOrElse("")}")
      val hot = PlanGuardSpec.hotKeyWindows(qe.optimizedPlan)
      assert(hot.isEmpty,
        s"$name plans a Window partitioned solely by unbounded-cardinality " +
          s"content column(s) ${hot.mkString(", ")} — a hot content key " +
          "(boilerplate chunk/token) funnels through ONE reducer and " +
          "WindowExec cannot be AQE-skew-split; use " +
          "groupBy(key).agg(...) + join-back instead")
    }
  }

  /** Queries whose plan legitimately contains a partitionless Window:
    * in every case the window input is OUTPUT-sized or domain-bounded,
    * never corpus-sized — a top-k re-rank after TakeOrderedAndProject
    * (20 rows), a share-of-total over histogram bins (≤20 rows), or a
    * cumulative pass over a bounded value domain (≤|domain| rows, 50
    * for l_quantity). Anything NOT on this list that plans a global
    * window is funneling an unbounded relation through one task. */
  private val intendedGlobalWindow = Set(
    "q_text_bm25",      // rank re-derived over the 20-row top-k result
    "q_skew_profile",   // cumulative share over the 20-row top-k result
    "q_histogram",      // share-of-total over 20 bins
    "q_histogram_eqd")  // cumulative counts over the ≤50-value domain

  test("hot-key window canary: a deliberately fp-partitioned window is " +
      "caught by the guard") {
    // Reconstructs the exact round-9 q_chunk_dedup shape — ownership as
    // a window min partitioned by a chunk fingerprint — and asserts the
    // detector flags it. If the detector's column heuristics drift, this
    // canary fails before a real hot-key window can slip back in.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = spark.range(100).toDF("doc_id")
      .withColumn("fp", md5(expr("cast(doc_id % 7 as string)")))
      .withColumn("owner",
        min(col("doc_id")).over(Window.partitionBy(col("fp"))))
    val hot = PlanGuardSpec.hotKeyWindows(df.queryExecution.optimizedPlan)
    assert(hot.nonEmpty, "the fp-partitioned canary window was not flagged")
    // ...and the safe shape (id-keyed window) is NOT flagged.
    val safe = spark.range(100).toDF("doc_id")
      .withColumn("fp", md5(expr("cast(doc_id % 7 as string)")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    assert(PlanGuardSpec.hotKeyWindows(safe.queryExecution.optimizedPlan).isEmpty,
      "an id-keyed window was wrongly flagged as a hot content key")
  }

  test("q_histogram's returned plan scans the input exactly once") {
    // The [min, max] stats pass is collected eagerly at build time, so
    // counting the eager scan the whole query reads the input exactly
    // twice — the returned plan must hold the single binning scan, never
    // extra cross-joined copies of the aggregate.
    val plan = SparkEntry.queries("q_histogram")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"expected exactly 1 input scan, saw $scans:\n$plan")
  }
}

object PlanGuardSpec {
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}

  /** Column names that are content-derived and therefore unbounded-
    * cardinality AND skew-prone: chunk/shingle fingerprints, tokens,
    * terms, n-grams, raw hashes. A window partitioned SOLELY by such
    * columns funnels each hot content key (cookie banners, license
    * headers) through one reducer, and WindowExec — unlike a shuffle
    * join — cannot be AQE-skew-split. */
  private val ContentKey =
    "(?i)^(fp|fingerprint|token|term|chunk|shingle|[a-z0-9_]*gram|word|hash|md5|sig|simhash|minhash|text)$".r

  /** Join-key-shaped / bounded partition columns: per-key row counts are
    * bounded by entity fan-out (a user's events, a query's candidates),
    * not by content popularity. A partition spec containing AT LEAST ONE
    * such column is considered safe. */
  private def isIdShaped(name: String): Boolean =
    name.toLowerCase.stripPrefix("__") match {
      case n if n.endsWith("_id") || n.endsWith("id") || n.endsWith("key") ||
        n.endsWith("_us") => true
      case "pk" | "source" | "grp" | "pshard" | "pid" | "band" | "bucket" => true
      case _ => false
    }

  /** Every Window in `plan` whose partition spec references ONLY
    * content-shaped columns; returns their offending column lists. */
  def hotKeyWindows(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case w: LWindow if w.partitionSpec.nonEmpty =>
        val names = w.partitionSpec.flatMap(_.references.map(_.name)).distinct
        val allContent = names.nonEmpty && names.forall(n =>
          ContentKey.pattern.matcher(n).matches && !isIdShaped(n))
        if (allContent) Some(names.mkString("[", ",", "]")) else None
    }.flatten
}
