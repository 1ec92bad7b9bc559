package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression computing a full MinHash signature —
  * `numHashes` min-hash values over a word array — in ONE pass.
  *
  * The built-in formulation (`array_min(transform(ws, w →
  * xxhash64(j, w)))` once per hash j) walks the array `numHashes`
  * times and materializes an intermediate hash array per walk; this
  * expression walks the words once, hashing each word `numHashes`
  * ways into a primitive long[] of running minima, inside whole-stage
  * codegen. Bit-identical to the built-in formulation
  * (MinHashExprSpec): per-hash seeding matches Spark's two-argument
  * `xxhash64(<int literal j>, w)` exactly.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSig.compute($c, $numHashes);
      ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** One pass over the words; running minima in a primitive long[].
    * Returns null when the array holds no non-null word (the built-in
    * `array_min` over an empty transform is null in that case too). */
  def compute(words: ArrayData, numHashes: Int): GenericArrayData = {
    // per-hash initial state = xxhash64's fold of the INT literal j
    val seeds = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      seeds(j) = XxHash64Function.hash(j, IntegerType, 42L); j += 1
    }
    val minima = Array.fill(numHashes)(Long.MaxValue)
    var seen = false
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) {
        seen = true
        val w = words.getUTF8String(i)
        var k = 0
        while (k < numHashes) {
          val h = XxHash64Function.hash(w, StringType, seeds(k))
          if (h < minima(k)) minima(k) = h
          k += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(minima)
  }

  /** Column API: `numHashes`-wide MinHash signature of array<string>. */
  def minhashSig(words: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(words), numHashes))
}
