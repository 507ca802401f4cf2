package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Intersection size of two SORTED (ascending, distinct) string arrays
  * via a linear merge — the hot kernel of pairwise set-similarity
  * verification (n-gram Jaccard, shingle overlap).
  *
  * `array_intersect` builds a hash relation per row; on a candidate-
  * pair stream that's millions of rebuilt hash sets. Sorting each
  * document's set once up-front (array_sort in the doc-side projection)
  * turns every pair verification into an allocation-free two-pointer
  * merge — same count, ~an order of magnitude cheaper, and
  * whole-stage-codegen friendly.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_sorted_intersect_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<string> args")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val na = a.numElements(); val nb = b.numElements()
    var done = false
    while (!done && i < na && j < nb) {
      val ua = if (a.isNullAt(i)) null else a.getUTF8String(i)
      val ub = if (b.isNullAt(j)) null else b.getUTF8String(j)
      // SQL semantics: NULL equals nothing. array_sort places nulls
      // last, so once either side reaches a null element nothing
      // further can match — stop instead of NPE-ing on compareTo.
      if (ua == null || ub == null) done = true
      else {
        val cmp = ua.compareTo(ub)
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val ua = ctx.freshName("ua"); val ub = ctx.freshName("ub")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $na = $a.numElements(), $nb = $b.numElements();
         |while ($i < $na && $j < $nb) {
         |  final UTF8String $ua = $a.isNullAt($i) ? null : $a.getUTF8String($i);
         |  final UTF8String $ub = $b.isNullAt($j) ? null : $b.getUTF8String($j);
         |  if ($ua == null || $ub == null) break; // nulls sort last; nothing further matches
         |  final int $cmp = $ua.compareTo($ub);
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) $i++;
         |  else $j++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SetExprs {
  def sortedIntersectCount(a: Column, b: Column): Column =
    bridge.column(SortedIntersectCount(bridge.expression(a), bridge.expression(b)))
}
