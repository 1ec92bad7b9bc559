package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression producing the DISTINCT hashed word
  * n-grams of a document in one pass: for each window of `n`
  * consecutive words, fold the words' xxhash64 chain into one 64-bit
  * gram key, dedup in a hash set, return array<long>.
  *
  * Replaces the built-in shingling pipeline (slice + array_join per
  * position, array_distinct, explode, xxhash64 of the gram STRING) —
  * which materializes every gram as a new string object — with zero
  * string allocation. Downstream semantics are unchanged: two
  * documents share a gram key iff they share the n-gram (modulo
  * 64-bit hash collisions, as before), which is all the Jaccard
  * blocking join consumes. ShinglesExprSpec asserts set-cardinality
  * and shared-count equivalence against the built-in formulation.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Distinct gram keys; documents shorter than `n` words shingle to
    * an empty array (matching the built-in formulation). */
  def compute(words: ArrayData, n: Int): GenericArrayData = {
    val len = words.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= len - n) {
      var h = 42L
      var j = 0
      while (j < n) {
        val w = if (words.isNullAt(i + j)) null else words.getUTF8String(i + j)
        // null words fold as a fixed sentinel so the key stays total
        h = if (w == null) XxHash64Function.hash(0L, LongType, h)
        else XxHash64Function.hash(w, StringType, h)
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Column API: distinct hashed word n-grams of array<string>. */
  def wordShingles(words: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(words), n))
}
