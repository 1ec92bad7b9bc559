package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The native codegen'd SimHash64 expression must be bit-identical to
  * the higher-order-function reference formulation in Dedup. */
class SimHashExprSpec extends SparkSpec {
  import spark.implicits._

  test("simhash64 expression is bit-identical to the HOF reference for both seeds") {
    val ws = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
      .filter(size(col("ws")) > 0)
    val both = ws.select(col("doc_id"),
        SimHash64.simhash64(col("ws"), 0).as("native0"),
        SimHash64.simhash64(col("ws"), 1).as("native1"),
        Dedup.simhashBitSums(0).as("bits0"),
        Dedup.simhashBitSums(1).as("bits1"))
      .select(col("doc_id"), col("native0"), col("native1"),
        Dedup.packSigns("bits0").as("ref0"),
        Dedup.packSigns("bits1").as("ref1"))
    val bad = both.filter(
      col("native0") =!= col("ref0") || col("native1") =!= col("ref1")).count()
    assert(bad === 0L, s"$bad documents fingerprint differently")
    // and the fingerprints are non-degenerate
    assert(both.select("native0").distinct().count() > 1)
  }

  test("simhash64 handles edge cases: empty array is 0, null words ignored, null array is null") {
    val df = Seq(
      (1L, Some(Seq("a", "b"))),
      (2L, Some(Seq.empty[String])),
      (3L, None)).toDF("id", "ws")
    val out = df.select(col("id"), SimHash64.simhash64(col("ws"), 0).as("fp"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L).exists(_ != 0L))
    assert(out(2L) === Some(0L))
    assert(out(3L) === None)
    // null elements inside the array are skipped, not poisonous
    val withNullWord = Seq(Tuple1(Seq(Some("a"), None, Some("b")))).toDF("ws")
      .select(SimHash64.simhash64(col("ws"), 0).as("fp")).head()
    val without = Seq(Tuple1(Seq("a", "b"))).toDF("ws")
      .select(SimHash64.simhash64(col("ws"), 0).as("fp")).head()
    assert(withNullWord === without)
  }
}
