package graft

import graft.functions.{LongDot, MinHashSig, ParseDuration, SimHash64, WordShingles}
import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for graft's native Catalyst expressions — the
  * `SparkSessionExtensions` seam, so a spark-submit user gets the
  * functions with ONE config line and zero code:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT parse_duration(requestTime) FROM api_logs
  *   SELECT simhash64(word_shingles(split(body, ' '), 3), 0) FROM docs
  * }}}
  *
  * [[GraftExtensions.register]] does the same on an already-running
  * session (notebooks, tests — extensions only apply at session
  * build). Every function resolves to the SAME codegen'd expression
  * the Column API uses; nothing is UDF-boxed. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an INTEGER LITERAL, got $other")
  }
  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.size == n, s"$fn takes $n argument(s), got ${args.size}")

  private def fn(name: String, usage: String,
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
      builder)

  /** (identifier, info, builder) for every graft SQL function. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    fn("parse_duration",
      "parse_duration(str) - Go-style duration string to microseconds; NULL if malformed.",
      { args => arity("parse_duration", args, 1); ParseDuration(args.head) }),
    fn("simhash64",
      "simhash64(words, seed) - one-pass 64-bit SimHash of an array<string>.",
      { args => arity("simhash64", args, 2)
        SimHash64(args.head, intLit(args(1), "simhash64", "seed")) }),
    fn("minhash_sig",
      "minhash_sig(words, k) - k-hash MinHash signature of an array<string>.",
      { args => arity("minhash_sig", args, 2)
        MinHashSig(args.head, intLit(args(1), "minhash_sig", "k")) }),
    fn("word_shingles",
      "word_shingles(words, n) - hashed word n-grams of an array<string>.",
      { args => arity("word_shingles", args, 2)
        WordShingles(args.head, intLit(args(1), "word_shingles", "n")) }),
    fn("long_dot",
      "long_dot(a, b) - exact integer dot product of two array<bigint>.",
      { args => arity("long_dot", args, 2); LongDot(args.head, args(1)) }))

  /** Register every function on a LIVE session (extensions only run at
    * session build; this is the runtime equivalent). Idempotent. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, b) =>
      GraftBridge.registerFunction(spark, id.funcName, info, b)
    }
}
