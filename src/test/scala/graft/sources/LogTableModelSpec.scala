package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, concat, lit}

import java.nio.file.Files
import scala.util.Random

/** Model-based random walk over the lakehouse core: a seeded op
  * sequence (append / delete / merge — plain, conditional and
  * not-matched-by-source — / update / compact / rollback / expire /
  * recluster / age-expire / branch-write-publish, with readRange
  * spot-checks)
  * runs against both the real LogTable and an in-memory model of
  * version → (id → value); after every op the table's visible rows
  * must equal the model's. This is what catches op INTERACTIONS
  * (merge-after-compact, rollback-across-delete, expire-then-append)
  * that single-op specs can't. */
class LogTableModelSpec extends SparkSpec {
  import spark.implicits._

  private def runWalk(seed: Int, steps: Int, partitioned: Boolean = false): Unit = {
    val rnd = new Random(seed)
    val t = LogTable(spark, Files.createTempDirectory(s"model_$seed").toString,
      partitionBy = if (partitioned) Seq("bucket") else Nil)
    // model: committed versions in order, each with its visible id→value map
    var model = Vector[(Long, Map[Long, String])]((0L, Map.empty))
    var nextId = 0L
    def current: Map[Long, String] = model.last._2
    def record(v: Long, rows: Map[Long, String]): Unit = model = model :+ ((v, rows))
    def df(rows: Seq[(Long, String)]) =
      if (partitioned) rows.map { case (i, v) => (i, v, s"b${i % 3}") }.toDF("id", "v", "bucket")
      else rows.toDF("id", "v")
    // a table whose every retained snapshot is file-less has no schema
    // to offer — read() is a column-less empty frame (documented edge)
    def rowsOf(d: org.apache.spark.sql.DataFrame): Map[Long, String] =
      if (d.columns.isEmpty) Map.empty
      else d.select("id", "v").as[(Long, String)].collect().toMap

    (0 until steps).foreach { step =>
      rnd.nextInt(22) match {
        case 0 | 1 | 2 | 3 => // append a fresh batch
          val n = 1 + rnd.nextInt(20)
          val rows = (nextId until nextId + n).map(i => (i, s"a$step"))
          nextId += n
          val s = t.append(df(rows))
          record(s.version, current ++ rows)
        case 4 | 5 => // delete a random id range
          if (current.nonEmpty) {
            val ids = current.keys.toSeq.sorted
            val lo = ids(rnd.nextInt(ids.size))
            val hi = lo + rnd.nextInt(30)
            val pre = t.currentVersion
            val s = t.delete(col("id") >= lo && col("id") <= hi)
            val kept = current.filterNot { case (id, _) => id >= lo && id <= hi }
            if (s.version != pre) record(s.version, kept)
            else assert(kept == current, s"step $step: no-op delete changed rows")
          }
        case 6 | 7 => // merge: update a random modulus class + insert fresh ids
          val m = 2 + rnd.nextInt(4)
          val matched = current.keys.filter(_ % m == 0).toSeq.sorted
            .map(i => (i, s"m$step"))
          val fresh = (nextId until nextId + 1 + rnd.nextInt(5))
            .map(i => (i, s"m$step"))
          nextId += fresh.size
          val s = t.merge(df(matched ++ fresh), "id")
          record(s.version, current ++ matched ++ fresh)
        case 8 => // compact keeps rows, bumps version when it rewrites
          val pre = t.currentVersion
          val s = t.compact(smallBytes = 1L << 20, targetBytes = 4L << 20)
          if (s.version != pre) record(s.version, current)
        case 9 => // rollback to a random retained version
          val (v, rows) = model(rnd.nextInt(model.size))
          val s = t.rollback(v)
          record(s.version, rows)
        case 10 => // expire all but the newest few snapshots
          val keep = 1 + rnd.nextInt(3)
          t.expire(keepLast = keep)
          model = model.takeRight(keep)
        case 11 => // time travel to a retained snapshot must match its model
          val (v, rows) = model(rnd.nextInt(model.size))
          if (v != 0L) {
            val got = rowsOf(t.timeTravel(v))
            assert(got == rows, s"step $step: timeTravel($v) diverged")
          }
        case 12 => // recluster rewrites layout, never content
          val pre = t.currentVersion
          val s = t.recluster("id", 1 + rnd.nextInt(3))
          if (s.version != pre) record(s.version, current)
        case 13 => // stats-pruned range read must equal the model's filter
          if (current.nonEmpty) {
            val ids = current.keys.toSeq.sorted
            val lo = ids(rnd.nextInt(ids.size))
            val hi = lo + rnd.nextInt(40)
            val got = rowsOf(t.readRange("id", lo, hi))
            val want = current.filter { case (id, _) => id >= lo && id <= hi }
            assert(got == want, s"step $step: readRange($lo,$hi) diverged")
          }
        case 14 => // age-based expiry: future cutoff == count-based expire
          val keep = 1 + rnd.nextInt(3)
          t.expireOlderThan(System.currentTimeMillis() + 60000L, keepLast = keep)
          model = model.takeRight(keep)
        case 15 => // COW update of a modulus class
          if (current.nonEmpty) {
            val m = 2 + rnd.nextInt(4)
            val pre = t.currentVersion
            val s = t.update(col("id") % m === 0,
              Map("v" -> concat(col("v"), lit(s"u$step"))))
            val upd = current.map { case (id, v) =>
              (id, if (id % m == 0) v + s"u$step" else v) }
            if (s.version != pre) record(s.version, upd)
            else assert(upd == current, s"step $step: no-op update changed rows")
          }
        case 16 => // merge with a NOT MATCHED BY SOURCE sweep
          val m = 2 + rnd.nextInt(4)
          val matched = current.keys.filter(_ % m == 0).toSeq.sorted
            .map(i => (i, s"n$step"))
          val fresh = (nextId until nextId + 1 + rnd.nextInt(3))
            .map(i => (i, s"n$step"))
          nextId += fresh.size
          val matchedIds = matched.map(_._1).toSet
          val s = t.merge(df(matched ++ fresh), "id",
            notMatchedBySourceDelete = Some(col("id") % 7 === 3))
          val kept = current.filter { case (id, _) =>
            matchedIds.contains(id) || id % 7 != 3 }
          record(s.version, kept ++ matched ++ fresh)
        case 17 => // branch write-audit-publish roundtrip
          val bn = s"wap$step"
          val b = t.createBranch(bn)
          val rows = (nextId until nextId + 1 + rnd.nextInt(5))
            .map(i => (i, s"w$step"))
          nextId += rows.size
          b.append(df(rows))
          assert(rowsOf(t.read()) == current,
            s"step $step: branch write leaked to main before publish")
          val s = t.fastForward(bn)
          t.dropBranch(bn)
          record(s.version, current ++ rows)
        case 18 => // MERGE-ON-READ delete (deletion-vector marks)
          if (current.nonEmpty) {
            val ids = current.keys.toSeq.sorted
            val lo = ids(rnd.nextInt(ids.size))
            val hi = lo + rnd.nextInt(25)
            val pre = t.currentVersion
            val s = t.deleteMor(col("id") >= lo && col("id") <= hi)
            val kept = current.filterNot { case (id, _) => id >= lo && id <= hi }
            if (s.version != pre) record(s.version, kept)
            else assert(kept == current, s"step $step: no-op deleteMor changed rows")
          }
        case 19 => // equality upsert: tombstone + append in one commit
          val matched = current.keys.filter(_ % (2 + rnd.nextInt(3)) == 0)
            .toSeq.sorted.take(10).map(i => (i, s"e$step"))
          val fresh = (nextId until nextId + 1 + rnd.nextInt(4))
            .map(i => (i, s"e$step"))
          nextId += fresh.size
          val s = t.upsertEq(df(matched ++ fresh), "id")
          record(s.version, current ++ matched ++ fresh)
        case 20 => // multi-statement transaction: append + delete, ONE commit
          val rows = (nextId until nextId + 1 + rnd.nextInt(5))
            .map(i => (i, s"t$step"))
          nextId += rows.size
          val cut: Long =
            if (current.nonEmpty) {
              val ids = current.keys.toSeq.sorted
              ids(rnd.nextInt(ids.size))
            } else -1L
          val pre = t.currentVersion
          val s = t.transaction { tx =>
            tx.append(df(rows))
            tx.delete(col("id") === cut)
          }
          assert(s.version == pre + 1,
            s"step $step: a transaction must land as exactly one commit")
          record(s.version, (current ++ rows) - cut)
        case 21 => // metadata-only partition drop (partitioned walks)
          if (partitioned && current.nonEmpty) {
            val b = rnd.nextInt(3)
            val s = t.dropPartitions(p => p.get("bucket").contains(s"b$b"))
            record(s.version,
              current.filterNot { case (id, _) => id % 3 == b })
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

  test("the same walks hold on a PARTITIONED table (partitioning × merge/delete/compact)") {
    Seq(11, 99).foreach(runWalk(_, 30, partitioned = true))
  }
}
