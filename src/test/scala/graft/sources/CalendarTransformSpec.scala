package graft.sources

import graft.SparkSpec
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll

/** The year/month CALENDAR transforms over the whole µs-long domain:
  * the SQL write column (what lays files out), the driver derive
  * (what prunes), and the V2 functions (what SPJ co-partitions with)
  * must be ONE arithmetic — a one-ordinal drift on any side silently
  * mis-prunes. Properties pin (a) derive's floor-calendar
  * self-consistency (every value lies inside its own ordinal's exact
  * interval, the monoBounds contract) and (b) SQL-column parity with
  * derive over random batches spanning the full domain, extremes
  * included. */
class CalendarTransformSpec extends SparkSpec {
  import spark.implicits._

  private val usPerDay = 86400000000L

  private def check(p: Prop): Unit = {
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500), p)
    assert(r.passed, r.status.toString)
  }

  /** Interval bounds in BigInt: at the extreme edge of the long
    * domain the period's first/last µs overflows Long (which is why
    * the strict pruner's monoBounds answers None there — undecidable,
    * never wrong); the PROPERTY still holds in unbounded arithmetic. */
  private def intervalOf(kind: String, q: Long): (BigInt, BigInt) = {
    val (from, to) = kind match {
      case "year" =>
        (java.time.LocalDate.of((1970L + q).toInt, 1, 1),
          java.time.LocalDate.of((1971L + q).toInt, 1, 1))
      case _ =>
        val y = (1970L + Math.floorDiv(q, 12L)).toInt
        val m = Math.floorMod(q, 12L).toInt + 1
        val f = java.time.LocalDate.of(y, m, 1)
        (f, f.plusMonths(1))
    }
    (BigInt(from.toEpochDay) * usPerDay, BigInt(to.toEpochDay) * usPerDay)
  }

  test("property: every µs value lies inside its own year/month ordinal's exact calendar interval (floor semantics, whole domain)") {
    val y = Transform.year("v")
    val m = Transform.month("v")
    check(forAll { (v: Long) =>
      val (ylo, yhi) = intervalOf("year", y.derive(v))
      val (mlo, mhi) = intervalOf("month", m.derive(v))
      ylo <= v && BigInt(v) < yhi && mlo <= v && BigInt(v) < mhi &&
        // month refines year: the month ordinal's year is the year ordinal
        Math.floorDiv(m.derive(v), 12L) == y.derive(v)
    })
  }

  test("property: derive is monotone non-decreasing (range pruning soundness)") {
    val y = Transform.year("v")
    val m = Transform.month("v")
    check(forAll { (a: Long, b: Long) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      y.derive(lo) <= y.derive(hi) && m.derive(lo) <= m.derive(hi)
    })
  }

  test("SQL write column equals derive over random batches spanning the WHOLE long domain, extremes included") {
    val rnd = new scala.util.Random(421L)
    val edges = Seq(0L, 1L, -1L, usPerDay, -usPerDay, usPerDay - 1,
      -usPerDay + 1, Long.MaxValue, Long.MinValue, Long.MaxValue - 1,
      Long.MinValue + 1)
    val vals = edges ++ Seq.fill(2000)(rnd.nextLong()) ++
      Seq.fill(500)(rnd.between(-4e18.toLong, 4e18.toLong)) ++
      // the realistic window too (1900..2100), densely
      Seq.fill(500)(rnd.between(-2208988800000000L, 4102444800000000L))
    val df = vals.toDF("v")
    val y = Transform.year("v")
    val m = Transform.month("v")
    val got = df.select(df("v"), y.column.as("y"), m.column.as("mo"))
      .collect()
    got.foreach { r =>
      val v = r.getLong(0)
      assert(r.getLong(1) === y.derive(v), s"year($v)")
      assert(r.getLong(2) === m.derive(v), s"month($v)")
    }
  }
}
