package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (one user/tenant owning most of a 100 TB fact table).
  *
  * AQE's runtime skew-join split is the first line of defense and is
  * on by default; explicit salting is for the cases AQE can't save —
  * a skewed key whose single hash bucket exceeds what one executor
  * can even hold, or deterministic pre-partitioning of a pipeline
  * that reuses the join output. The salt fans each big-side row into
  * one of `salts` sub-buckets and replicates the SMALL side `salts`×,
  * so the hot key's work spreads over `salts` tasks while every join
  * pair still meets exactly once.
  */
object Skew {

  /** Inner equi-join of `big` ⋈ `small` on `key`, salted `salts` ways.
    * Produces exactly the rows of `big.join(small, key)` (asserted by
    * SkewSpec), with the big side's per-key load split across `salts`
    * shuffle buckets. The salt is a deterministic hash of the big
    * row's full contents — distinct rows of a hot key spread evenly;
    * exact duplicate rows share a bucket (they carry no information
    * to balance on). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs already have a _salt column; rename it before saltedJoin")
    val bigCols: Seq[Column] = big.columns.map(col).toSeq
    val b = big.withColumn("_salt", pmod(xxhash64(bigCols: _*), lit(salts.toLong)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
