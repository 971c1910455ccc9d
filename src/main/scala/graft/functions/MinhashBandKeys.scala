package graft.functions

import graft.pipeline.Dedup
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst form of the MinHash band-key kernel: computes
  * bandKeys(minhashSignature(shingles)) straight off the columnar
  * ArrayData — no per-row Seq conversion and, unlike the UDF kernel,
  * no UTF8String→String→UTF8String round trip per shingle. Values are
  * bit-identical to both the Column-expression spec and the UDF kernel
  * (PipelineSpec proves the three-way equality).
  */
case class MinhashBandKeys(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_bands requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinhashBandKernel.eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashBandKernel.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): MinhashBandKeys =
    copy(child = newChild)
}

/** Kernel host for [[MinhashBandKeys]]. Deliberately NOT the case
  * class's companion: a companion `eval` gets no static forwarder
  * (the class inherits `Expression.eval(InternalRow)`), so generated
  * code calling `MinhashBandKeys.eval(arr)` failed janino compile and
  * every stage containing it silently fell back to interpreted eval.
  * A distinct object name gives a real static method to call.
  */
object MinhashBandKernel {
  /** Static entry shared by interpreted eval and generated code. */
  def eval(arr: ArrayData): ArrayData = {
    val slotSeeds = Dedup.slotSeedsJvm
    val bandSeeds = Dedup.bandSeedsJvm
    val k = Dedup.K
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      var j = 0
      while (j < k) {
        val h = XxHash64Function.hash(u, StringType, slotSeeds(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](Dedup.Bands)
    var b = 0
    while (b < Dedup.Bands) {
      var h = bandSeeds(b)
      var o = 0
      while (o < Dedup.RowsPerBand) {
        h = XxHash64Function.hash(mins(b * Dedup.RowsPerBand + o), LongType, h)
        o += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}
