package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst form of the rarest-first token-order kernel behind
  * the prefix-filter family (q37 n-gram Jaccard, q166 containment and
  * their consumers): each document's token hashes sorted by the
  * global (document-frequency, hash) order, the df looked up in a
  * broadcast (sorted-hashes, dfs) dictionary. Replaces the Scala UDF
  * kernel, which paid a catalyst→Seq[String] conversion and a
  * UTF8String→String→UTF8String round trip per token per row — this
  * reads UTF8Strings straight out of the columnar ArrayData inside
  * whole-stage codegen (the [[MinhashBandKeys]] pattern; values are
  * bit-identical, PipelineSpec pins kernel ≡ distributed-join order
  * output downstream).
  *
  * Carries the Broadcast HANDLE (not the arrays): the dictionary is
  * fetched once per executor by the broadcast machinery instead of
  * riding every serialized task binary.
  */
case class RarestFirstOrder(child: Expression,
    dict: Broadcast[(Array[Long], Array[Long])]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rarest_first"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rarest_first requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RarestFirstKernel.evalBc(input.asInstanceOf[ArrayData], dict)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("rfDict", dict,
        "org.apache.spark.broadcast.Broadcast")
      s"${ev.value} = graft.functions.RarestFirstKernel.evalBc($c, $ref);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): RarestFirstOrder = copy(child = newChild)
}

/** Kernel host — a distinct object, not the case class companion, so
  * generated code gets a real static method (the [[MinhashBandKernel]]
  * lesson: a companion `eval` clashes with `Expression.eval` and
  * janino silently falls back to interpreted).
  */
object RarestFirstKernel {
  def evalBc(arr: ArrayData,
      bc: Broadcast[(Array[Long], Array[Long])]): ArrayData = {
    val d = bc.value
    eval(arr, d._1, d._2)
  }

  /** Per-row mirror of sort_array(collect_list(struct(df, tok))).tok:
    * the same XxHash64 chain as the Column xxhash64 (seed 42),
    * ascending signed (df, hash) order. Every token's hash is in the
    * dictionary by construction (it was built from the same stream);
    * a 64-bit collision merges two tokens' df — extra candidates the
    * exact verify removes, never a lost pair.
    */
  def eval(arr: ArrayData, ts: Array[Long], dfs: Array[Long]): ArrayData = {
    val m = arr.numElements()
    val hs = new Array[Long](m)
    val df = new Array[Long](m)
    var i = 0
    while (i < m) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      hs(i) = h
      df(i) = dfs(java.util.Arrays.binarySearch(ts, h))
      i += 1
    }
    val idx = new Array[Integer](m)
    i = 0
    while (i < m) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Long.compare(df(a.intValue()), df(b.intValue()))
        if (c != 0) c
        else java.lang.Long.compare(hs(a.intValue()), hs(b.intValue()))
      }
    })
    val out = new Array[Long](m)
    i = 0
    while (i < m) { out(i) = hs(idx(i).intValue()); i += 1 }
    new GenericArrayData(out)
  }
}
