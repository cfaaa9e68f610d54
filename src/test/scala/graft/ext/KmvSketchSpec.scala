package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class KmvSketchSpec extends AnyFunSuite {
  private val k = new KmvSketch(4)

  test("exact count below k; k smallest distinct kept above k") {
    val small = Seq(9L, 3L, 3L, 7L).foldLeft(k.zero)(k.reduce)
    assert(k.finish(small) === 3.0, "3 distinct < k -> exact")
    val big = Seq(1L, 2L, 5L, 8L, 100L, 2L).foldLeft(k.zero)(k.reduce)
    assert(big.toSeq === Seq(1L, 2L, 5L, 8L), "k smallest distinct only")
    assert(k.finish(big) === 3.0 * 4294967296.0 / 8L)
  }

  test("merge of partial sketches equals the single-pass sketch") {
    val xs = Seq(10L, 20L, 1L, 999L, 5L)
    val ys = Seq(2L, 20L, 99L, 1L)
    val merged = k.merge(
      xs.foldLeft(k.zero)(k.reduce), ys.foldLeft(k.zero)(k.reduce))
    val direct = (xs ++ ys).foldLeft(k.zero)(k.reduce)
    assert(merged === direct)
  }
}
