package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the Misra-Gries sketch: sub-capacity exactness, heavy
  * keys always retained with bounded undercount, merge associativity,
  * and agreement with the exact window top-k on the corpus. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def mg(k: Int, cap: Int) = new HeavyHitters(k, cap)

  test("below capacity the sketch is exact") {
    val agg = mg(5, 100)
    val stream = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c") ++
      (0 until 30).map(i => s"n$i")
    val st = stream.foldLeft(agg.zero)(agg.reduce)
    val top = agg.finish(st)
    assert(top.take(3) === Seq("a" -> 40L, "b" -> 25L, "c" -> 10L))
  }

  test("planted heavy key survives eviction with the n/(capacity+1) bound") {
    val agg = mg(3, 32)
    val rnd = new scala.util.Random(5)
    // hot key: 1000 of 2000 events; 500 distinct noise keys force
    // constant eviction pressure at capacity 32
    val stream = rnd.shuffle(Seq.fill(1000)("hot") ++
      (0 until 1000).map(i => s"noise${i % 500}"))
    val n = stream.size
    val st = stream.foldLeft(agg.zero)(agg.reduce)
    val top = agg.finish(st)
    assert(top.head._1 === "hot", s"hot key lost: $top")
    val est = top.head._2
    assert(est <= 1000L, "Misra-Gries never overcounts")
    assert(est >= 1000L - n / (32 + 1), s"undercount $est beyond the n/(c+1) bound")
  }

  test("merge: any partial-aggregation split still finds the heavy keys") {
    val agg = mg(2, 16)
    val rnd = new scala.util.Random(9)
    val stream = rnd.shuffle(Seq.fill(300)("x") ++ Seq.fill(200)("y") ++
      (0 until 400).map(i => s"n${i % 100}")).toIndexedSeq
    Seq(1, 57, 300, 899).foreach { cut =>
      val (l, r) = stream.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged).map(_._1).toSet === Set("x", "y"),
        s"split at $cut lost a heavy key")
    }
  }

  test("property: never overcounts, bounded undercount, heavy keys retained (20 seeds)") {
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val cap = 8 + rnd.nextInt(57) // 8..64
      val agg = mg(cap, cap)
      val nHot = 1 + rnd.nextInt(3)
      val hotReps = 200 + rnd.nextInt(400)
      val noise = (0 until 300 + rnd.nextInt(700)).map(i => s"n${rnd.nextInt(200)}")
      val stream = rnd.shuffle(
        (0 until nHot).flatMap(h => Seq.fill(hotReps)(s"hot$h")) ++ noise)
      val n = stream.size
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // random split-and-merge tree exercises the merge path too
      val (l, r) = stream.splitAt(rnd.nextInt(n + 1))
      val st = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      val bound = n.toLong / (cap + 1)
      st.foreach { case (k, est) =>
        assert(est <= truth(k), s"seed=$seed overcount: $k est=$est true=${truth(k)}")
        assert(est >= truth(k) - bound,
          s"seed=$seed undercount beyond bound: $k est=$est true=${truth(k)} bound=$bound")
      }
      truth.filter(_._2 > bound).keys.foreach { k =>
        assert(st.contains(k), s"seed=$seed heavy key $k (true=${truth(k)} > $bound) evicted")
      }
    }
  }

  test("log_heavy_hitters: distributed sketch agrees with the exact corpus top users") {
    val sketch = graft.operators.LogAnalytics.logHeavyHitters(spark, sfDir)
      .select("user_id").as[String].collect().toSeq
    val exact = graft.Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(10).select(col("user_id").cast("string")).as[String].collect().toSeq
    // the corpus has few hundred users, well under capacity pressure's
    // worst case — top users must coincide as SETS (est ties can
    // reorder neighbors)
    assert(sketch.toSet.intersect(exact.toSet).size >= 7,
      s"sketch $sketch diverged from exact $exact")
  }
}
