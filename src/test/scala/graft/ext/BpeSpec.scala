package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE vocabulary induction against a hand-computed reference and its
  * algebraic laws (round-trip, monotone compression, determinism). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) = texts.toDF("text")

  /** Reference single-machine BPE (the textbook algorithm) to check the
    * distributed trainer against, independently implemented. */
  private def referenceBpe(words: Seq[String], k: Int): Seq[(String, String)] = {
    var segs: Seq[Seq[String]] = words.map(w =>
      (w.dropRight(1).map(_.toString) :+ (w.last.toString + Bpe.Eow)).toSeq)
    val out = Seq.newBuilder[(String, String)]
    for (_ <- 1 to k) {
      val counts = segs.flatMap(s => s.zip(s.drop(1)))
        .groupBy(identity).view.mapValues(_.size)
      if (counts.nonEmpty) {
        val (a, b) = counts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }._1
        out += ((a, b))
        segs = segs.map { s =>
          val r = Seq.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
              r += (a + b); i += 2
            } else { r += s(i); i += 1 }
          }
          r.result()
        }
      }
    }
    out.result()
  }

  test("train matches the textbook algorithm on a known corpus") {
    val texts = Seq("low lower lowest", "low low newest newest", "widest")
    val words = texts.flatMap(_.split(" "))
    val expected = referenceBpe(words, 6)
    val learned = Bpe.train(corpus(texts: _*), "text", merges = 6)
    assert(learned === expected)
    assert(learned.head === (("l", "o")), "lo is the most frequent pair")
  }

  test("segment round-trips: concatenated subwords rebuild each word") {
    val texts = Seq("low lower lowest newest")
    val merges = Bpe.train(corpus(texts: _*), "text", merges = 5)
    val rebuilt = Bpe.segment(corpus(texts: _*), "text", merges)
      .select(expr(s"replace(concat_ws('', syms), '${Bpe.Eow}', '')"))
      .as[String].collect().sorted
    assert(rebuilt === texts.head.split(" ").sorted.toSeq)
  }

  test("each merge monotonically shrinks the corpus symbol count") {
    val texts = Seq("aaaa aaaa aa", "abab abab")
    def totalSyms(merges: Seq[(String, String)]): Long =
      Bpe.segment(corpus(texts: _*), "text", merges)
        .agg(sum(size(col("syms")))).as[Long].head()
    val merges = Bpe.train(corpus(texts: _*), "text", merges = 4)
    val sizes = (0 to merges.length).map(i => totalSyms(merges.take(i)))
    assert(sizes.zip(sizes.drop(1)).forall { case (x, y) => y < x },
      s"symbol counts must strictly fall: $sizes")
  }

  test("merges apply left-to-right non-overlapping (aaa -> [aa, a])") {
    val seg = Bpe.segment(corpus("aaa"), "text", Seq(("a", "a")))
      .select("syms").as[Seq[String]].head()
    assert(seg === Seq("aa", s"a${Bpe.Eow}"))
  }

  test("training is deterministic across partitionings") {
    val texts = (1 to 50).map(i => s"alpha beta gamma delta run$i")
    val one = Bpe.train(corpus(texts: _*).repartition(1), "text", 5)
    val many = Bpe.train(corpus(texts: _*).repartition(7), "text", 5)
    assert(one === many)
  }
}
