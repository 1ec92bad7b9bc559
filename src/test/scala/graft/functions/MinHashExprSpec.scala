package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The native one-pass MinHashSig expression must be bit-identical to
  * the per-hash array_min(transform(...)) reference formulation. */
class MinHashExprSpec extends SparkSpec {
  import spark.implicits._

  test("minhash_sig is bit-identical to the built-in formulation for all 32 hashes") {
    val ws = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
      .filter(size(col("ws")) > 0)
    val both = ws.select(
      (col("doc_id") +:
        MinHashSig.minhashSig(col("ws"), 32).as("sig") +:
        Dedup.minhashSigColumns): _*)
    val mismatch = (0 until 32).map(j =>
      when(element_at(col("sig"), j + 1) =!= col(s"h$j"), 1).otherwise(0))
      .reduce(_ + _)
    assert(both.filter(mismatch > 0).count() === 0L)
  }

  test("minhash_sig null semantics: null array -> null, no non-null word -> null") {
    val df = Seq(
      (1L, Some(Seq("a"))),
      (2L, None)).toDF("id", "ws")
    val out = df.select(col("id"), MinHashSig.minhashSig(col("ws"), 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out === Map(1L -> false, 2L -> true))
    val allNullWords = Seq(Tuple1(Seq[Option[String]](None, None))).toDF("ws")
      .select(MinHashSig.minhashSig(col("ws"), 4).as("sig")).head()
    assert(allNullWords.isNullAt(0))
  }
}
