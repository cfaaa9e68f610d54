package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 16-bit SimHash of a token-hash array in
  * ONE traversal — `simhash16(ths)` ≡ the HOF form
  * `sum_j IF(sum_i(2*((h_i>>j)&1)-1) > 0, 1<<j, 0)`.
  *
  * Same escalation rationale as [[MinHashSig]]/[[DotProductF]]
  * (SURVEY §7.4): the HOF form evaluates 16 interpreted bit-vote lambdas
  * per element with boxing; this compiles to a two-level primitive loop
  * over 16 int counters and produces BIT-IDENTICAL fingerprints, so the
  * `q_doc_simhash` oracle parity is unchanged.
  *
  * Null contract: null input array → null; an empty array yields 0 (all
  * votes zero, no bit set — same as the HOF form). */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](16)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 16) {
        votes(j) += (((h >> j) & 1L).toInt * 2) - 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val out = ctx.freshName("out")
      s"""
         |int $n = $hs.numElements();
         |int[] $votes = new int[16];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $j = 0; $j < 16; $j++) {
         |    $votes[$j] += ((int) (($h >> $j) & 1L)) * 2 - 1;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 16; $j++) {
         |  if ($votes[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHashFunctions {
  /** Idempotently register `simhash16`. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("simhash16")))
      reg.createOrReplaceTempFunction(
        "simhash16", exprs => SimHash16(exprs.head), "built-in")
  }
}
