package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end specs for the LLM-pipeline operators over a tiny synthetic
  * corpus with PLANTED duplicate structure — proves recall/precision
  * properties the fixture-scale oracle can't (it only proves engine
  * agreement). */
class ExtQueriesSpec extends SparkSpec {
  import spark.implicits._

  /** Writes documents.parquet + embeddings.parquet into a temp sfDir. */
  private lazy val dir: String = {
    val d = tmpDir("extq")
    val base = "spark shuffles data across the cluster when a wide " +
      "dependency requires rows with the same key on the same partition " +
      "and the optimizer cannot avoid it"
    val docs = Seq(
      // 0 & 1: exact duplicates
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src0", base.length.toLong),
      // 2: near-duplicate of 0 (last word changed → only 1 of 23 shingles
      // differs, true jaccard ≈ 0.91)
      (2L, base.replace("avoid it", "avoid that"), "en", "src1",
        base.length.toLong),
      // 3: unrelated
      (3L, "completely different text about cooking pasta with garlic " +
        "and olive oil on a slow flame until golden", "en", "src2", 100L),
      // 4: short doc (exercises the <3-token shingle guard boundary)
      (4L, "tiny doc here", "en", "src3", 13L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")

    def vec(seed: Int): Array[Float] =
      Array.tabulate(16)(i => math.sin(seed * 31 + i).toFloat)
    val nearVec = vec(7).clone(); nearVec(0) = nearVec(0) + 0.001f
    val embs = (0 until 12).map(i => (i.toLong, vec(i), i % 3)) :+
      ((12L, nearVec, 1))
    embs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d.toString
  }

  test("dedupExact groups exact copies under one canonical id") {
    val groups = DedupQueries.dedupExact(spark, dir)
      .filter(col("n_copies") > 1).collect()
    assert(groups.length === 1)
    assert(groups.head.getAs[Long]("canonical_id") === 0L)
    assert(groups.head.getAs[Long]("n_copies") === 2L)
  }

  test("docNeardup finds planted near-dups and nothing else") {
    val pairs = DedupQueries.docNeardup(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "exact dups are also near-dups")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)),
      "one-word-changed doc must be caught")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must not appear")
  }

  test("ngramJaccard verifies candidates with exact set similarity") {
    val rows = DedupQueries.ngramJaccard(spark, dir)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    assert(rows.get((0L, 1L)).contains(1.0), "identical docs → jaccard 1.0")
    val near = rows((0L, 2L))
    assert(near >= 0.8 && near < 1.0, s"near-dup jaccard was $near")
  }

  test("embedTopk ranks the planted near-identical vector first") {
    val top1 = SimilarityQueries.embedTopk(spark, dir)
      .filter(col("query_id") === 7L && col("rank") === 1).head()
    assert(top1.getAs[Long]("neighbor_id") === 12L)
    assert(top1.getAs[Double]("sim") > 0.999)
  }

  test("embedIvf searches only within the query's cell") {
    val out = SimilarityQueries.embedIvf(spark, dir)
    val byQuery = out.groupBy("query_id")
      .agg(countDistinct("cell").as("cells")).collect()
    assert(byQuery.nonEmpty)
    assert(byQuery.forall(_.getAs[Long]("cells") === 1L),
      "every query's neighbors must come from exactly one cell")
  }

  test("textPii counts planted PII and the redaction removes every match") {
    val out = TextQueries.textPii(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 0 is a multiple of 7, 11, AND 13 → gets all three plants
    assert(out(0L).getAs[Int]("n_emails") === 1)
    assert(out(0L).getAs[Int]("n_phones") === 1)
    assert(out(0L).getAs[Int]("n_ips") === 1)
    assert(out(1L).getAs[Int]("n_emails") === 0)
    // a PII-dense probe string must come out with ZERO residual matches
    val probe = Seq(
      "mail a.b+c@ex-1.co.uk or x@y.io, call 555-123-4567, " +
        "host 10.255.0.7 then 1.2.3.4 end").toDF("s")
    val res = probe.select(
      regexp_count(TextQueries.redactPii(col("s")),
        lit("""[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""")).as("e"),
      regexp_count(TextQueries.redactPii(col("s")),
        lit("""\b\d{3}-\d{3}-\d{4}\b""")).as("p"),
      regexp_count(TextQueries.redactPii(col("s")),
        lit("""\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""")).as("i")).head()
    assert(res.getInt(0) === 0 && res.getInt(1) === 0 && res.getInt(2) === 0)
  }

  test("docMix keeps a hash-stable per-source subset at the target rate") {
    val d001 = "/root/testdata/sf0.001"
    val rows = TextQueries.docMix(spark, d001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val expectedRate = 20 + 15 * (src.stripPrefix("src").toInt % 5)
      assert(r.getAs[Int]("rate_pct") === expectedRate, s"rate for $src")
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total"))
    }
    // determinism: a second run keeps the SAME counts (hash, not rand)
    val again = TextQueries.docMix(spark, d001).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    rows.foreach(r => assert(
      again(r.getAs[String]("source")) === r.getAs[Long]("n_kept")))
  }

  test("decontaminate flags only train docs sharing a chunk with the holdout") {
    val d001 = "/root/testdata/sf0.001"
    val flagged = DedupQueries.decontaminate(spark, d001).collect()
    assert(flagged.nonEmpty, "fixture has known train/eval chunk overlap")
    flagged.foreach { r =>
      assert(r.getAs[Long]("n_hits") >= 1L)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_chunks"))
      val ratio = r.getAs[Double]("contamination")
      assert(ratio > 0.0 && ratio <= 1.0)
    }
    // no flagged doc may itself be in the eval holdout
    import org.apache.spark.sql.functions.{conv, concat, substring, md5 => smd5, lit => slit}
    val evalIds = graft.Tables.documents(spark, d001)
      .filter(conv(substring(smd5(concat(col("doc_id").cast("string"),
        slit(":eval"))), 1, 8), 16, 10).cast("bigint") % 100 < 5)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged.forall(r => !evalIds.contains(r.getAs[Long]("doc_id"))))
  }

  test("substrDedup finds maximal cross-doc spans at any offset, " +
    "ignores within-doc repeats") {
    val d = tmpDir("substr")
    val S = (1 to 22).map(i => s"s$i")         // the planted 22-token run
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val docA = words("p", 5) ++ S ++ words("q", 5)          // S at offset 6
    val docB = words("r", 3) ++ S ++ words("t", 8)          // S at offset 4
    val v = words("v", 20)
    val docC = v ++ words("m", 3) ++ v                      // within-doc only
    val docD = words("z", 25)                               // unrelated
    val docE = S.take(20) ++ words("x", 10) ++ S.drop(2)    // two islands
    Seq(0L -> docA, 1L -> docB, 2L -> docC, 3L -> docD, 4L -> docE)
      .map { case (id, ts) =>
        (id, ts.mkString(" "), "en", "srcS", ts.mkString(" ").length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val spans = DedupQueries.substrDedup(spark, d.toString).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_tokens"), r.getAs[Long]("n_windows"))).toSet
    // S is 22 tokens → 3 windows per full copy, merged into ONE maximal
    // span; docE carries two 20-token fragments split by noise → TWO
    // islands; the within-doc repeat (docC) and the unrelated doc (docD)
    // must be absent under the cross-doc rule
    assert(spans === Set(
      (0L, 6L, 22L, 3L),
      (1L, 4L, 22L, 3L),
      (4L, 1L, 20L, 1L),
      (4L, 31L, 20L, 1L)))
  }

  test("substrDedup matches a brute-force span oracle on randomized " +
    "corpora with planted shared runs") {
    val k = 20
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val vocab = (1 to 30).map(i => s"w$i")
      def rand(n: Int) = Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
      // base corpus + two planted runs spliced into overlapping homes
      val runA = rand(k + 5)
      val runB = rand(k)
      val docs: Seq[(Long, Vector[String])] = (0 until 10).map { id =>
        val base = rand(15 + rnd.nextInt(40))
        val at = rnd.nextInt(base.size + 1)
        val toks = id match {
          case 1 | 8 => base.take(at) ++ runA ++ base.drop(at)
          case 2     => base.take(at) ++ runB ++ base.drop(at)
          // one doc carries BOTH runs back-to-back — adjacent spans
          // must merge into one island
          case 5     => base.take(at) ++ runA ++ runB ++ base.drop(at)
          case _     => base
        }
        id.toLong -> toks
      }
      // brute-force oracle: every k-window keyed by its literal text,
      // cross-doc-duplicated keys, per-doc gaps-and-islands merge
      val wins = docs.flatMap { case (id, ts) =>
        (1 to ts.size - k + 1).map(p =>
          (id, p.toLong, ts.slice(p - 1, p - 1 + k).mkString(" ")))
      }
      val dupKeys = wins.groupBy(_._3)
        .filter(_._2.map(_._1).distinct.size >= 2).keySet
      val expected = docs.flatMap { case (id, _) =>
        val ps = wins.filter(w => w._1 == id && dupKeys(w._3))
          .map(_._2).sorted
        val islands = ps.foldLeft(Vector.empty[Vector[Long]]) { (acc, p) =>
          if (acc.nonEmpty && acc.last.last == p - 1)
            acc.init :+ (acc.last :+ p)
          else acc :+ Vector(p)
        }
        islands.map(i =>
          (id, i.head, i.last - i.head + k, i.size.toLong))
      }.toSet
      val d = tmpDir(s"substrprop$trial")
      docs.map { case (id, ts) =>
        (id, ts.mkString(" "), "en", "srcP", ts.mkString(" ").length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$d/documents.parquet")
      val got = DedupQueries.substrDedup(spark, d.toString).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
          r.getAs[Long]("span_tokens"), r.getAs[Long]("n_windows"))).toSet
      assert(got === expected, s"trial $trial")
      assert(expected.nonEmpty, s"trial $trial planted runs must surface")
    }
  }

  test("substrClean excises duplicated spans everywhere but the " +
    "earliest carrier and reassembles the survivors in order") {
    val d = tmpDir("substrclean")
    val S = (1 to 22).map(i => s"s$i")
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val docA = words("p", 5) ++ S ++ words("q", 5)
    val docB = words("r", 3) ++ S ++ words("t", 8)
    val docE = S.take(20) ++ words("x", 10) ++ S.drop(2)
    Seq(0L -> docA, 1L -> docB, 4L -> docE)
      .map { case (id, ts) =>
        (id, ts.mkString(" "), "en", "srcC", ts.mkString(" ").length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    def md5Of(s2: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = DedupQueries.substrClean(spark, d.toString).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_fp"))).toMap
    // the earliest carrier keeps its copy verbatim
    assert(rows(0L) === (32L, 0L, md5Of(docA.mkString(" "))))
    // docB loses exactly the 22-token S copy, survivors stay in order
    assert(rows(1L) === (33L, 22L,
      md5Of((words("r", 3) ++ words("t", 8)).mkString(" "))))
    // docE loses both fragments (covered unions fold the overlap)
    assert(rows(4L) === (50L, 40L, md5Of(words("x", 10).mkString(" "))))
  }

  test("dedupClusters collapses the transitive near-dup chain to one root") {
    // planted pairs are (0,1), (0,2), (1,2) → one cluster rooted at 0
    val rows = DedupQueries.dedupClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Boolean]("is_canonical"))).toMap
    assert(rows.keySet === Set(0L, 1L, 2L))
    assert(rows.values.forall { case (cid, sz, _) => cid === 0L && sz === 3L })
    assert(rows(0L)._3 && !rows(1L)._3 && !rows(2L)._3,
      "exactly the min doc id is canonical")
  }

  test("connectedComponents matches a union-find oracle on random graphs") {
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // min-label normalization: root of each node IS the min reachable
      // id because union always parents the larger root under the smaller
      edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v)).toMap
    }
    // three deterministic pseudo-random graph shapes: sparse, chain-heavy,
    // and denser with self-contained clusters
    val graphs = Seq(7L, 13L, 29L).map { seed =>
      (0 until 40).map { i =>
        val a = (i * seed) % 30
        val b = (i * seed + seed * seed) % 30
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
    }
    graphs.foreach { edges =>
      val df = edges.toDF("a", "b")
      val got = DedupQueries.connectedComponents(df, "a", "b", "node")
        .select("node", "cluster_id").as[(Long, Long)].collect().toMap
      val want = unionFind(30, edges)
      assert(got === want, s"edges=$edges")
    }
  }

  test("embedClusters puts the planted near-identical vectors together") {
    val rows = SimilarityQueries.embedClusters(spark, dir)
      .select("vec_id", "cluster_id", "is_canonical")
      .as[(Long, Long, Boolean)].collect()
    val byId = rows.map(r => r._1 -> r._2).toMap
    assert(byId.contains(12L) && byId(12L) === byId(7L),
      "vector 12 is a perturbed copy of 7 — same cluster")
    rows.foreach { case (v, c, canon) =>
      assert(c <= v, "cluster label is the min reachable id")
      assert(canon === (v == c))
    }
  }

  test("sketchHll tracks exact cardinality within sketch variance") {
    val d001 = "/root/testdata/sf0.001"
    val rows = SketchQueries.sketchHll(spark, d001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("hll_est")
      // m=16 → σ ≈ 26%; 3σ bounds with slack for the small fixture
      assert(est > exact * 0.35 && est < exact * 2.5,
        s"${r.getAs[String]("source")}: est $est vs exact $exact")
    }
    // determinism: identical on a second run
    val again = SketchQueries.sketchHll(spark, d001).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("hll_est")).toMap
    rows.foreach(r => assert(
      again(r.getAs[String]("source")) === r.getAs[Double]("hll_est")))
  }

  test("sketchCms estimates dominate true counts and agree where exact") {
    val rows = SketchQueries.sketchCms(spark, dir)
      .select("term", "est_cnt", "true_cnt").as[(String, Long, Long)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, est, tru) =>
      assert(est >= tru, s"CMS must never undercount ($t: $est < $tru)")
      assert(tru > 0)
    }
    // the top estimate's TRUE count must equal the real corpus count
    val (topTerm, _, topTrue) = rows.head
    val exact = graft.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") === topTerm).count()
    assert(topTrue === exact)
  }

  test("cmsCells maintains the sketch incrementally over a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = SketchQueries
      .cmsCells(in.toDF().withColumnRenamed("value", "term"), "term")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData("a", "b", "a")
      q.processAllAvailable()
      in.addData("b", "c", "a")
      q.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .as[(Int, Long, Long)].collect().toSet
      val batch = SketchQueries
        .cmsCells(Seq("a", "b", "a", "b", "c", "a").toDF("term"), "term")
        .as[(Int, Long, Long)].collect().toSet
      assert(streamed === batch,
        "micro-batch-merged sketch must equal the one-shot batch sketch")
    } finally q.stop()
  }

  test("bloomPrefilter: every build key passes, FPs stay near theory") {
    // deterministic pseudo-random key universe; 60 build keys, 400 probes
    val universe = (0 until 400).map(i => f"key-${(i * 2654435761L) % 100000}%d")
    val build = universe.take(60).toDF("k")
    val probe = universe.toDF("k")
    val tagged = SketchQueries.bloomPrefilter(build, probe, "k")
      .as[(String, Boolean)].collect().toMap
    universe.take(60).foreach(k =>
      assert(tagged(k), s"build key $k may NEVER be filtered (false negative)"))
    val fps = universe.drop(60).count(k => tagged(k))
    // 60 keys * 3 hashes <= 180 of 4096 bits set -> per-probe FP rate
    // <= (180/4096)^3 ~ 8.5e-5; 340 probes -> expect ~0, allow slack
    assert(fps <= 3, s"false-positive count $fps far above theory")
  }

  test("sketchBloom never false-negatives; false positives are counted") {
    val d2 = tmpDir("bloom")
    // 200 docs, 50 distinct texts (4 copies each): holdout docs share
    // fingerprints with non-holdout copies, so true matches exceed the
    // holdout itself
    (0 until 200)
      .map(i => (i.toLong, s"text body number ${i % 50}", "en",
        s"s${i % 4}", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val rows = SketchQueries.sketchBloom(spark, d2.toString)
      .select("source", "n_docs", "n_maybe", "n_true", "n_false_pos")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum === 200L)
    rows.foreach { case (src, _, nMaybe, nTrue, nFp) =>
      assert(nTrue <= nMaybe, s"$src: a Bloom filter may not false-negative")
      assert(nFp === nMaybe - nTrue, src)
    }
    assert(rows.map(_._4).sum > 0, "holdout copies must register as true")
    assert(rows.map(_._3).sum < 200L, "the filter must be selective")
  }

  test("textTfidf surfaces document-distinctive terms first") {
    val rows = TextQueries.textTfidf(spark, dir)
      .select("doc_id", "term", "df", "score", "rnk")
      .as[(Long, String, Long, Double, Int)].collect()
    val byDoc = rows.groupBy(_._1)
    byDoc.values.foreach { ts =>
      assert(ts.length <= 3)
      val ordered = ts.sortBy(_._5)
      assert(ordered.map(-_._4).sorted.toSeq === ordered.map(-_._4).toSeq,
        "scores must be non-increasing in rank")
    }
    // the pasta doc's top terms are unique to it (df = 1) — idf wins
    assert(byDoc(3L).forall(_._3 === 1L))
  }

  test("docStratified derives per-stratum rates from stratum size") {
    // single 5-doc stratum: rate caps at 100 → everything survives
    val small = TextQueries.docStratified(spark, dir)
      .select("rate_pct", "doc_id").as[(Long, Long)].collect()
    assert(small.length === 5 && small.forall(_._1 === 100L))
    // a 600-doc stratum thins to ceil(2400/600) = 4 percent
    val d2 = tmpDir("strat")
    (0 until 600).map(i => (i.toLong, s"doc number $i body", "en", "s0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val big = TextQueries.docStratified(spark, d2.toString)
      .select("rate_pct", "bucket").as[(Long, Long)].collect()
    assert(big.forall(_._1 === 4L), "rate must derive from stratum size")
    assert(big.forall(_._2 < 4L), "membership is the hash-bucket cut")
    assert(big.length > 0 && big.length < 60,
      s"~4% of 600 expected, got ${big.length}")
  }

  test("bandBits grows past the old 16-bit cap and the family covers it") {
    import SimilarityQueries.{MaxBandBits, bandBits, planeFamily}
    // smallest b with 2^b buckets >= n/8, across six orders of magnitude
    assert(bandBits(500) === 6)
    assert(bandBits(262144) === 15)      // where the round-4 cap bound
    assert(bandBits(10000000) === 21)    // past the old 16-bit ceiling
    assert(bandBits(400000000000L) === 36) // ~100 TB of 64-dim float32
    assert(bandBits(Long.MaxValue) === MaxBandBits)
    // monotone — a bigger corpus never gets a narrower band
    val widths = Seq(1L, 1000L, 1000000L, 1000000000L, 1000000000000L)
      .map(bandBits)
    assert(widths === widths.sorted)
    // both bands have a full MaxBandBits of planes to draw from, and the
    // two draws never share a plane
    assert(planeFamily.size === 2 * MaxBandBits)
    assert(planeFamily.distinct.size === planeFamily.size)
  }

  test("textQuality pass gate follows its thresholds") {
    val byId = TextQueries.textQuality(spark, dir)
      .select("doc_id", "n_tokens", "quality_pass").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(!byId(4L)._2, "3-token doc must fail the n_tokens >= 20 gate")
    assert(byId(0L)._2, "long low-stopword doc must pass")
  }

  test("textBm25: docs containing query terms outrank docs without them") {
    // fixture docs 0-2 contain "spark"; 3 and 4 contain no query term
    val got = TextQueries.textBm25(spark, dir)
      .select("doc_id", "score", "rnk")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    assert(got.map(_._1).toSet === Set(0L, 1L, 2L),
      "only term-matching docs are retrieved")
    assert(got.forall(_._2 > 0.0))
    // 0 and 1 are exact duplicates — identical scores, id tiebreak
    val byId = got.map(r => r._1 -> r._2).toMap
    assert(byId(0L) === byId(1L))
    assert(got.map(_._3).toSeq === got.indices.map(_ + 1).toSeq,
      "ranks are contiguous from 1")
  }

  /** Brute-force exact-Jaccard reference over token sets. */
  private def refSimPairs(docs: Seq[(Long, Seq[String])], tauNum: Long,
      tauDen: Long): Set[(Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) => id -> t.toSet }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      union = (sa | sb).size.toLong
      if inter * tauDen >= union * tauNum
    } yield (ia, ib, inter, union)).toSet
  }

  test("setSimJoinOf equals brute force — the prefix filter is lossless") {
    // Overlapping vocab, skewed token frequencies (w0 is a stopword in
    // every doc, so it must never generate the candidate on its own),
    // one exact dup pair, one barely-over pair, one barely-under pair.
    val docs: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("w0", "a", "b", "c"),
      2L -> Seq("w0", "a", "b", "c"),          // dup of 1: J = 1
      3L -> Seq("w0", "a", "b", "d"),          // vs 1: 3/5 ≥ 1/2
      4L -> Seq("w0", "x", "y", "z"),          // vs 1: 1/7 < 1/2
      5L -> Seq("w0", "a", "b", "c", "d", "e"),// vs 1: 4/6 ≥ 1/2
      6L -> Seq("q", "r"),                     // disjoint but for sizes
      7L -> Seq("q", "r", "s", "t", "u", "v")) // vs 6: 2/6 < 1/2
    val df = docs.toDF("doc_id", "toks")
    val got = DedupQueries.setSimJoinOf(df, 1L, 2L)
      .select("doc_a", "doc_b", "n_inter", "n_union")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === refSimPairs(docs, 1L, 2L))
    assert(got.contains((1L, 2L, 4L, 4L)) && got.contains((1L, 3L, 3L, 5L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("setSimJoinOf matches brute force on randomized corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 30).map(i => s"t$i")
    for (trial <- 1 to 3) {
      val docs: Seq[(Long, Seq[String])] = (1L to 40L).map { id =>
        val k = 2 + rnd.nextInt(8)
        id -> rnd.shuffle(vocab).take(k)
      } ++ Seq(100L -> Seq("t0", "t1", "t2"), 101L -> Seq("t0", "t1", "t2"))
      val got = DedupQueries.setSimJoinOf(docs.toDF("doc_id", "toks"), 1L, 2L)
        .select("doc_a", "doc_b", "n_inter", "n_union")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === refSimPairs(docs, 1L, 2L), s"trial $trial diverged")
    }
  }

  test("setSimJoinOf at a stricter threshold (2/3) stays exact") {
    val docs: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("a", "b", "c"),
      2L -> Seq("a", "b", "c", "d"), // 3/4 ≥ 2/3
      3L -> Seq("a", "b", "d", "e")) // vs 1: 2/5; vs 2: 3/5 — both under
    val got = DedupQueries.setSimJoinOf(docs.toDF("doc_id", "toks"), 2L, 3L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }
}
