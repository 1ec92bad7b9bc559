package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** WordShingles must be join-equivalent to the built-in shingling: the
  * Jaccard blocking only consumes "do two docs share a gram", so the
  * native keys must induce the same per-doc set sizes and the same
  * pairwise shared counts as the string formulation. */
class ShinglesExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("per-document distinct gram count matches the built-in formulation") {
    val native = docs.select(col("doc_id"),
      size(WordShingles.wordShingles(split(col("text"), " "), 5)).as("n_native"))
    val ref = Dedup.shingled(docs, 5)
      .select(col("doc_id"), size(col("grams")).as("n_ref"))
    val bad = native.join(ref, "doc_id")
      .filter(col("n_native") =!= col("n_ref")).count()
    assert(bad === 0L, s"$bad documents have differing distinct-gram counts")
  }

  test("pairwise shared-gram counts match the built-in formulation") {
    def pairs(e: org.apache.spark.sql.DataFrame) = {
      val a = e.select(col("doc_id").as("a"), col("gh"))
      val b = e.select(col("doc_id").as("b"), col("gh"))
      a.join(b, Seq("gh")).filter(col("a") < col("b"))
        .groupBy("a", "b").count()
        .as[(Long, Long, Long)].collect().toSeq.sorted
    }
    val sample = docs.filter(col("doc_id") < 60)
    val native = pairs(sample.select(col("doc_id"),
      explode(WordShingles.wordShingles(split(col("text"), " "), 5)).as("gh")))
    val ref = pairs(Dedup.shingled(sample, 5)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("gh")))
    assert(native.nonEmpty && native === ref)
  }

  test("documents shorter than n shingle to empty, not null") {
    val out = Seq((1L, "a b c"), (2L, "one two three four five six"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        WordShingles.wordShingles(split(col("text"), " "), 5).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).length).toMap
    assert(out === Map(1L -> 0, 2L -> 2))
  }
}
