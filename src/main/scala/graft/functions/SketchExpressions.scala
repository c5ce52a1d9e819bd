package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** cms_estimate(sketch BINARY, item STRING) → BIGINT: point estimate
  * from a serialized `count_min_sketch(...)` aggregate. Spark ships
  * the sketch builder but no probe expression — estimates otherwise
  * require collecting the sketch to the driver. This keeps the probe
  * in the plan: the one-row sketch broadcasts and each probe row costs
  * one codegen'd static call.
  *
  * The item hashes through the same bytes the aggregate added
  * (Spark's CountMinSketchAgg calls addBinary(utf8.getBytes) for
  * STRING inputs), so estimates are exactly the sketch's answer, not
  * a re-hash approximation.
  */
case class CountMinEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires (BINARY, STRING), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def nullSafeEval(sketch: Any, item: Any): Any =
    SketchOps.estimate(sketch.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, i) => s"graft.functions.SketchOps.estimate($s, $i)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object SketchOps {

  /** Deserialized-sketch cache: the sketch column is one broadcast
    * value repeated per probe row, so deserialize once per distinct
    * byte image per executor. Bounded: cleared wholesale past 8
    * entries (probes reference 1-2 sketches in practice). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[java.nio.ByteBuffer, CountMinSketch]()

  def estimate(sketchBytes: Array[Byte], item: UTF8String): Long = {
    val key = java.nio.ByteBuffer.wrap(sketchBytes)
    var cms = cache.get(key)
    if (cms == null) {
      if (cache.size > 8) cache.clear()
      cms = CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))
      cache.putIfAbsent(key, cms)
    }
    // byte-level probe — the exact bytes CountMinSketchAgg added
    cms.estimateCount(item.getBytes)
  }
}

object SketchFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

  def cms_estimate(sketch: Column, item: Column): Column =
    column(CountMinEstimate(expression(sketch), expression(item)))
}
