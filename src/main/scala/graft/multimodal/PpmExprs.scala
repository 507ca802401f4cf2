package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native forms of the multimodal hot-path fragments (optimization
  * round 18). CodegenFallback matching [[graft.functions.HashExprs]]:
  * one call per row, tight JVM loops inside.
  *
  * [[PpmPayload]] replaces `concat(cast(header as binary),
  * unhex(substring(repeat(hex, ceil(w*h*3/16)), 1, w*h*6)))`: the SQL
  * spelling materializes a w·h·6-char hex STRING per row (~38 KB at
  * the max 80×80 shape) and then parses every hex pair — ~190 MB of
  * transient strings per corpus pass at sf0.1. The native form parses
  * the 32-char md5 ONCE into 16 bytes and tiles them straight into
  * the output array. Byte identity with the SQL fragment is pinned in
  * MultimodalSpec (and the oracle, which replays the SQL twin, stays
  * hash-green over the rewritten queries).
  *
  * [[PpmHeaderDecode]] lifts [[PpmCodec.decodeHeader]] — the REAL
  * parser, unchanged — into a projection, removing q_mm_meta's
  * Dataset encode/decode round-trip of the ~19 KB payload per row. */
case class PpmPayload(hex: Expression, wExpr: Expression, hExpr: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "graft_ppm_payload"
  override def dataType: DataType = BinaryType
  override def first: Expression = hex
  override def second: Expression = wExpr
  override def third: Expression = hExpr

  override def checkInputDataTypes(): TypeCheckResult =
    (hex.dataType, wExpr.dataType, hExpr.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, int, int), got $t")
    }

  override def nullSafeEval(h: Any, w: Any, ht: Any): Any = {
    val hexS = h.asInstanceOf[UTF8String].toString
    val wi = w.asInstanceOf[Int]
    val hi = ht.asInstanceOf[Int]
    // md5 hex → 16 pattern bytes, parsed once
    val pat = new Array[Byte](hexS.length / 2)
    var i = 0
    while (i < pat.length) {
      pat(i) = ((Character.digit(hexS.charAt(2 * i), 16) << 4)
        | Character.digit(hexS.charAt(2 * i + 1), 16)).toByte
      i += 1
    }
    val header = s"P6\n$wi $hi\n255\n".getBytes("US-ASCII")
    val raster = wi * hi * 3
    val out = new Array[Byte](header.length + raster)
    System.arraycopy(header, 0, out, 0, header.length)
    var k = 0
    val base = header.length
    while (k < raster) {
      out(base + k) = pat(k % pat.length)
      k += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(hex = f, wExpr = s, hExpr = t)
}

/** struct(width, height) via the real P6 header parser — see object
  * doc. A malformed payload throws, exactly like the mapPartitions
  * form this replaces. */
case class PpmHeaderDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_ppm_header"
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val hdr = PpmCodec.decodeHeader(v.asInstanceOf[Array[Byte]])
    InternalRow(hdr.width, hdr.height)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PpmExprs {
  def ppmPayload(hex: Column, width: Column, height: Column): Column =
    bridge.column(PpmPayload(
      bridge.expression(hex), bridge.expression(width), bridge.expression(height)))
  def ppmHeaderDecode(c: Column): Column =
    bridge.column(PpmHeaderDecode(bridge.expression(c)))
}
