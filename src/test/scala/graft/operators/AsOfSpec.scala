package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The generic as-of join must match the naive inequality-join
  * formulation exactly (the O(n·m) formulation is the SPEC, never the
  * implementation), on both tie modes. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // right rows unique per (key, time) so the expected match is
  // well-defined; payload derived from time for easy checking
  private lazy val left = Seq(
    (1L, 100L, "a"), (1L, 200L, "b"), (1L, 50L, "c"),
    (2L, 100L, "d"), (3L, 500L, "e"))
    .toDF("k", "lt", "lv")
  private lazy val right = Seq(
    (1L, 100L, "r100"), (1L, 150L, "r150"), (1L, 40L, "r40"),
    (2L, 101L, "r101"), (4L, 1L, "r1"))
    .toDF("k", "rt", "rv")

  private def naive(strict: Boolean): Set[(Long, Long, String, Option[Long], Option[String])] = {
    val cond = col("l.k") === col("r.k") &&
      (if (strict) col("r.rt") < col("l.lt") else col("r.rt") <= col("l.lt"))
    val best = left.as("l").join(right.as("r"), cond)
      .groupBy(col("l.k"), col("l.lt"), col("l.lv"))
      .agg(max(col("r.rt")).as("rt"))
    left.as("l")
      .join(best.as("b"),
        col("l.k") === col("b.k") && col("l.lt") === col("b.lt") &&
          col("l.lv") === col("b.lv"), "left")
      .join(right.as("r"),
        col("l.k") === col("r.k") && col("b.rt") === col("r.rt"), "left")
      .select(col("l.k"), col("l.lt"), col("l.lv"), col("b.rt"), col("r.rv"))
      .as[(Long, Long, String, Option[Long], Option[String])].collect().toSet
  }

  private def viaAsof(strict: Boolean): Set[(Long, Long, String, Option[Long], Option[String])] =
    AsOf.asofJoin(left, right, "k", "lt", "rt", strict = strict)
      .select(col("k"), col("lt"), col("lv"), col("r_rt"), col("r_rv"))
      .as[(Long, Long, String, Option[Long], Option[String])].collect().toSet

  test("non-strict: same-instant right row IS visible; equals the naive formulation") {
    val got = viaAsof(strict = false)
    assert(got === naive(strict = false))
    // the (1, 100) left row must see the rt=100 right row
    assert(got.contains((1L, 100L, "a", Some(100L), Some("r100"))))
    // no prior right row anywhere for key 3 → null payload
    assert(got.contains((3L, 500L, "e", None, None)))
  }

  test("strict: same-instant right row is NOT visible; equals the naive formulation") {
    val got = viaAsof(strict = true)
    assert(got === naive(strict = true))
    // at lt=100 the rt=100 row is excluded; rt=40 is the latest strict prior
    assert(got.contains((1L, 100L, "a", Some(40L), Some("r40"))))
    // latest prior picked, not just any prior
    assert(got.contains((1L, 200L, "b", Some(150L), Some("r150"))))
  }

  test("left-only keys survive with null payload; right-only keys emit nothing") {
    val out = AsOf.asofJoin(left, right, "k", "lt", "rt")
    assert(out.count() === left.count())
    assert(out.filter(col("k") === 4L).count() === 0L)
    assert(out.filter(col("k") === 3L && col("r_rv").isNull).count() === 1L)
  }
}
