package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the full MinHash signature of a base-hash
  * array in ONE traversal — `minhash_sig(hs)` ≡
  * `array(array_min(transform(hs, h -> (a1*h+b1) % P)), ...)` for the
  * universal-hash family `(a_j, b_j)` passed at construction.
  *
  * Why (SURVEY §7.4 escalation ladder, same rationale as [[DotProductF]]):
  * the HOF form evaluates `numHashes` interpreted lambdas per element with
  * boxing — the dominant cost of LSH signature computation measured in the
  * dedup queries. This compiles to a tight two-level primitive loop via
  * `doGenCode`, reading each element once, and produces BIT-IDENTICAL
  * signatures (same `(a*h + b) % P` arithmetic in Long), so the DuckDB
  * oracle parity of `q_doc_neardup`/`q_ngram_jaccard` is unchanged.
  *
  * Null contract: null input array → null. Empty arrays yield
  * `Long.MaxValue` per hash (the HOF form yields null there — callers
  * guarantee non-empty shingle arrays via the `array(text)` fallback in
  * `shingled`, so the branch is unreachable in this library).
  */
case class MinHashSig(child: Expression, ab: Seq[(Long, Long)], p: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = Array.fill(ab.size)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < ab.size) {
        val v = (ab(j)._1 * h + ab(j)._2) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val k = ab.size
      val as = ctx.addReferenceObj("as", ab.map(_._1).toArray, "long[]")
      val bs = ctx.addReferenceObj("bs", ab.map(_._2).toArray, "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $hs.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($as[$j] * $h + $bs[$j]) % ${p}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashFunctions {
  /** Register `minhash_sig` bound to this library's hash family. */
  def register(spark: SparkSession, ab: Seq[(Long, Long)], p: Long): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("minhash_sig")))
      reg.createOrReplaceTempFunction(
        "minhash_sig", exprs => MinHashSig(exprs.head, ab, p), "built-in")
  }
}

/** The library's canonical MinHash universal-hash family — single source
  * of truth shared by [[graft.ext.DedupQueries]] (which also generates the
  * DuckDB oracle SQL from it) and [[GraftExtensions]] (which binds the
  * injected `minhash_sig` to it), so the hash family can never drift
  * between the query layer and externally-built sessions. */
object HashFamily {
  /** Mersenne prime 2^31-1; universal-hash modulus. Base hashes are 32-bit
    * (8 hex chars of md5) reduced mod P, multipliers < 2^30, so
    * `a*h + b < 2^61` — no Long overflow in either engine. */
  val P: Long = 2147483647L

  /** 12 universal-hash (a, b) pairs — Knuth multiplicative constants,
    * deterministic so Spark and the oracle share the exact family. */
  val AB: Seq[(Long, Long)] =
    (1 to 12).map { i =>
      ((2654435761L * i) % 1073741789L, (2246822519L * i) % P)
    }
}
