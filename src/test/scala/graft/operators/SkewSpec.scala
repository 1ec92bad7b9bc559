package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** saltedJoin must return exactly the plain join's rows while
  * spreading a hot key across salt buckets. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on pathologically skewed data") {
    // 90% of the fact rows share key 0 — the shape that melts one task
    val big = spark.range(20000)
      .select(when(col("id") % 10 < 9, 0L).otherwise(col("id") % 7).as("k"),
        col("id").as("payload"))
    val small = (0L until 7L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, "k")
      .as[(Long, Long, String)].collect().toSeq.sorted
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "name")
      .as[(Long, Long, String)].collect().toSeq.sorted
    assert(salted === plain)
  }

  test("the hot key's rows actually spread across salt buckets") {
    val big = spark.range(10000).select(lit(0L).as("k"), col("id").as("payload"))
    val buckets = big
      .withColumn("_salt", pmod(xxhash64(col("k"), col("payload")), lit(8L)))
      .groupBy("_salt").count().as[(Long, Long)].collect().toMap
    assert(buckets.size === 8, s"expected all 8 buckets used, got ${buckets.size}")
    assert(buckets.values.max < 10000L * 0.3, "no bucket may hold the bulk of the hot key")
  }
}
