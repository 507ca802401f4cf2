package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native forms of the [[SharedHash]] fragments for hot paths.
  *
  * Semantics are IDENTICAL to the SQL fragments (and therefore to the
  * DuckDB oracle): the SQL `aggregate(transform(...))` spelling costs
  * one boxed lambda call per character/bit — tens of millions of
  * interpreter dispatches per scan at sf0.1 — while these do the same
  * fold in one JVM call per value. `HashExprsSpec` pins the
  * equivalence against the SQL fragments.
  *
  * CodegenFallback is deliberate: RollingHash mostly runs inside
  * `transform(...)` lambdas (never codegen'd anyway), and SimHash62 is
  * one call per row.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_roll_hash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    // (acc*31 + codepoint) mod 1e9+7, matching ascii(substring(s,i,1))
    val s = v.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % SharedHash.P
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 62-bit SimHash over an array of token hashes (with multiplicity):
  * bit b set iff Σ_tokens (((h>>b)&1)==1 ? 1 : -1) > 0. */
case class SimHash62(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_simhash62"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](62)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 62) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var code = 0L
    var b = 0
    while (b < 62) {
      if (counts(b) > 0) code |= (1L << b)
      b += 1
    }
    code
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashExprs {
  def rollHash(c: Column): Column = bridge.column(RollingHash(bridge.expression(c)))
  def simHash62(c: Column): Column = bridge.column(SimHash62(bridge.expression(c)))
}
