package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** The PUBLIC Iceberg spec's 32-bit bucket hash as a native codegen'd
  * expression (https://iceberg.apache.org/spec/#appendix-b-32-bit-hash-requirements):
  * murmur3_x86_32 at seed 0 over the value's single-value binary
  * serialization — longs as 8 little-endian bytes, strings as UTF-8
  * bytes. Pinned to the spec's Appendix-B vectors (long 34 →
  * 2017239379, string "iceberg" → 1210000089) by IcebergBucketSpec.
  *
  * Spark's own `Murmur3Hash` expression matches the spec for LONG
  * children (two little-endian int blocks, fmix len 8) but NOT for
  * strings — its `hashUnsafeBytes` mixes tail bytes one-per-round,
  * a Spark-private variant no foreign engine reproduces; the
  * standard-tail `hashUnsafeBytes2` is the spec hash, and this
  * expression is what routes strings through it. The [[Transform]]
  * `mbucket` kind builds its write column from this expression, so a
  * string-keyed bucket layout (doc ids, URLs — the common
  * training-corpus keys) crosses the Iceberg seam with prune parity.
  */
case class IcebergBucketHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // TIMESTAMP buckets as its µs-epoch long — the spec's rule
    // (timestamps serialize as their micros value), and exactly the
    // type's Catalyst-internal representation
    case LongType | StringType | org.apache.spark.sql.types.TimestampType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"iceberg_bucket_hash requires bigint, string or timestamp, " +
        s"got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket_hash"

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType =>
      IcebergBucketHash.hashString(input.asInstanceOf[UTF8String])
    case _ => IcebergBucketHash.hashLong(input.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType =>
        s"${ev.value} = graft.functions.IcebergBucketHash.hashString($c);"
      case _ =>
        s"${ev.value} = graft.functions.IcebergBucketHash.hashLong($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): IcebergBucketHash =
    copy(child = newChild)
}

object IcebergBucketHash {
  /** Spec hashLong: murmur3_x86_32(littleEndianBytes(v), seed 0). */
  def hashLong(v: Long): Int = Murmur3_x86_32.hashLong(v, 0)

  /** Spec string hash: murmur3_x86_32(utf8Bytes(v), seed 0) — the
    * STANDARD tail handling (hashUnsafeBytes2), hashed in place over
    * the UTF8String's memory, no copy. */
  def hashString(s: UTF8String): Int =
    Murmur3_x86_32.hashUnsafeBytes2(s.getBaseObject, s.getBaseOffset,
      s.numBytes, 0)

  /** The full bucket transform of a column: `(hash & MaxInt) % n`. */
  def bucket(c: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.lit
    (GraftBridge.column(IcebergBucketHash(GraftBridge.expression(c)))
      .bitwiseAND(lit(Int.MaxValue)) % lit(n))
      .cast(org.apache.spark.sql.types.LongType)
  }
}
