package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LongDot must be bit-identical to the HOF zip_with+aggregate
  * formulation it replaced in the cosine kernels. */
class LongDotSpec extends SparkSpec {
  import spark.implicits._

  test("long_dot equals the zip_with+aggregate formulation on the corpus") {
    val q = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("qv"))
    val a = q.select(col("vec_id").as("ia"), col("qv").as("va"))
    val b = q.select(col("vec_id").as("ib"), col("qv").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib") && col("ib") < col("ia") + 5)
    val bad = pairs.select(
        LongDot.longDot(col("va"), col("vb")).as("native"),
        aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(bad === 0L)
  }

  test("long_dot null semantics: null array -> null, self-dot is the norm") {
    val df = Seq(
      (1L, Some(Seq(3L, -4L)), Some(Seq(3L, -4L))),
      (2L, None, Some(Seq(1L, 1L)))).toDF("id", "a", "b")
    val out = df.select(col("id"), LongDot.longDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out === Map(1L -> Some(25L), 2L -> None))
  }
}
