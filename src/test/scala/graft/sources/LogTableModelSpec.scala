package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

import java.nio.file.Files
import scala.util.Random

/** Model-based random walk over the lakehouse core: a seeded op
  * sequence (append / delete / compact / rollback / expire) runs
  * against both the real LogTable and an in-memory model of
  * version → row-set; after every op the table's visible rows must
  * equal the model's. This is what catches op INTERACTIONS
  * (delete-after-compact, rollback-across-delete, expire-then-append)
  * that single-op specs can't. */
class LogTableModelSpec extends SparkSpec {
  import spark.implicits._

  private def runWalk(seed: Int, steps: Int, partitioned: Boolean = false): Unit = {
    val rnd = new Random(seed)
    val t = LogTable(spark, Files.createTempDirectory(s"model_$seed").toString,
      partitionBy = if (partitioned) Seq("bucket") else Nil)
    // model: committed versions in order, each with its visible row set
    var model = Vector[(Long, Set[Long])]((0L, Set.empty))
    var nextId = 0L
    def current: Set[Long] = model.last._2
    def record(v: Long, rows: Set[Long]): Unit = model = model :+ ((v, rows))
    // a table whose every retained snapshot is file-less has no schema
    // to offer — read() is a column-less empty frame (documented edge)
    def rowsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
      if (df.columns.isEmpty) Set.empty
      else df.select("id").as[Long].collect().toSet

    (0 until steps).foreach { step =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // append a fresh batch
          val n = 1 + rnd.nextInt(20)
          val ids = (nextId until nextId + n)
          nextId += n
          val s = t.append(
            if (partitioned) ids.map(i => (i, s"b${i % 3}")).toDF("id", "bucket")
            else ids.toDF("id"))
          record(s.version, current ++ ids)
        case 4 | 5 => // delete a random id range
          if (current.nonEmpty) {
            val ids = current.toSeq.sorted
            val lo = ids(rnd.nextInt(ids.size))
            val hi = lo + rnd.nextInt(30)
            val pre = t.currentVersion
            val s = t.delete(col("id") >= lo && col("id") <= hi)
            val kept = current.filterNot(id => id >= lo && id <= hi)
            if (s.version != pre) record(s.version, kept)
            else assert(kept == current, s"step $step: no-op delete changed rows")
          }
        case 6 => // compact keeps rows, bumps version when it rewrites
          val pre = t.currentVersion
          val s = t.compact(smallBytes = 1L << 20, targetBytes = 4L << 20)
          if (s.version != pre) record(s.version, current)
        case 7 => // rollback to a random retained version
          val (v, rows) = model(rnd.nextInt(model.size))
          val s = t.rollback(v)
          record(s.version, rows)
        case 8 => // expire all but the newest few snapshots
          val keep = 1 + rnd.nextInt(3)
          t.expire(keepLast = keep)
          val retained = model.takeRight(keep)
          model = retained
        case 9 => // time travel to a retained snapshot must match its model
          val (v, rows) = model(rnd.nextInt(model.size))
          if (v != 0L) {
            val got = rowsOf(t.timeTravel(v))
            assert(got == rows, s"step $step: timeTravel($v) diverged")
          }
      }
      val visible = rowsOf(t.read())
      assert(visible == current,
        s"seed=$seed step=$step: table has ${visible.size} rows, model ${current.size}")
    }
  }

  test("random op walks match the in-memory model (3 seeds × 30 steps)") {
    Seq(7, 42, 1234).foreach(runWalk(_, 30))
  }

  test("the same walks hold on a PARTITIONED table (partitioning × delete/compact/rollback)") {
    Seq(11, 99).foreach(runWalk(_, 30, partitioned = true))
  }
}
