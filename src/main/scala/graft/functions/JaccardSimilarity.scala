package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: exact Jaccard similarity of two 64-bit hash
  * arrays — the verify step of every LSH dedup family (minhash, char-ngram,
  * join.similar), evaluated once per surviving candidate pair.
  *
  * The set intersection genuinely wants a hash table, which doesn't inline
  * into generated Java cleanly — so the codegen path calls the static
  * [[JaccardSimilarity.compute]] over raw `ArrayData` (no Seq/boxed-Long
  * allocation per pair, stays inside the WholeStageCodegen stage), and the
  * interpreted path shares the same helper. Same math as the historical
  * UDF: duplicate elements count once per side, empty-vs-empty = 1.0.
  *
  * Registered as SQL function `jaccard_sim` alongside `cosine_sim`.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sim requires (array<bigint>, array<bigint>), got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.JaccardSimilarity.compute($x, $y);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardSimilarity {
  /** |A ∩ B| / |A ∪ B| over the DISTINCT elements of each side. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val sa = new java.util.HashSet[java.lang.Long](na * 2)
    var i = 0
    while (i < na) { sa.add(a.getLong(i)); i += 1 }
    val sb = new java.util.HashSet[java.lang.Long](nb * 2)
    var inter = 0
    i = 0
    while (i < nb) {
      val x: java.lang.Long = b.getLong(i)
      if (sb.add(x) && sa.contains(x)) inter += 1
      i += 1
    }
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
}
