package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

class LogTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): LogTable =
    LogTable(spark, Files.createTempDirectory("logtable_spec_").toString)

  private def df(ids: Range): DataFrame = ids.toDF("id")

  test("append commits atomically and bumps the version") {
    val t = freshTable()
    assert(t.currentVersion === 0L)
    assert(t.read().count() === 0L)

    val s1 = t.append(df(0 until 10))
    assert(s1.version === 1L)
    assert(s1.operation === "append")
    assert(t.read().count() === 10L)

    val s2 = t.append(df(10 until 25))
    assert(s2.version === 2L)
    assert(t.read().count() === 25L)
    assert(t.read().agg(Map("id" -> "max")).as[Long].head() === 24L)
  }

  test("timeTravel reads any prior snapshot unchanged") {
    val t = freshTable()
    t.append(df(0 until 5))
    t.append(df(5 until 9))
    assert(t.timeTravel(1).count() === 5L)
    assert(t.timeTravel(2).count() === 9L)
    // current read == latest snapshot
    assert(t.read().count() === t.timeTravel(t.currentVersion).count())
  }

  test("compact preserves data, reduces files, keeps old snapshots readable") {
    val t = freshTable()
    (0 until 4).foreach(i => t.append(df(i * 10 until (i + 1) * 10).repartition(2)))
    val pre = t.stats()
    assert(pre.files.size === 8) // 4 appends × 2 partitions
    val preVersion = t.currentVersion

    val post = t.compact()
    assert(post.operation === "compact")
    assert(post.files.size === 1) // tiny files bin-pack into one
    assert(post.totalRows === 40L)
    assert(t.read().count() === 40L)
    assert(t.read().distinct().count() === 40L) // no dup rows from rewrite
    // snapshot isolation: the pre-compact snapshot still reads
    assert(t.timeTravel(preVersion).count() === 40L)
  }

  test("stats come from manifest metadata and match the data") {
    val t = freshTable()
    t.append(df(0 until 100))
    val s = t.stats()
    assert(s.totalRows === 100L)
    assert(s.totalRows === t.read().count())
    assert(s.totalBytes > 0L)
    assert(s.files.forall(f => f.rows > 0 && f.bytes > 0))
  }

  test("expire drops old snapshots and deletes orphaned files") {
    val t = freshTable()
    t.append(df(0 until 10))
    t.append(df(10 until 20))
    t.compact()
    val preCompactFiles = t.snapshot(2L).files.map(_.path)

    t.expire(keepLast = 1)
    assert(t.versions === Seq(3L))
    assert(t.read().count() === 20L) // current snapshot untouched
    // the compacted-away small files are gone from disk
    assert(preCompactFiles.forall(p => !Files.exists(Paths.get(p))))
    // expired versions are no longer readable
    intercept[Exception](t.timeTravel(2L).count())
  }

  test("concurrent appends all land (optimistic rename-commit retry)") {
    val t = freshTable()
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = (0 until 4).map { i =>
      Future(t.append(df(i * 100 until i * 100 + 50)))
    }
    Await.result(Future.sequence(futures), 120.seconds)
    pool.shutdown()
    assert(t.currentVersion === 4L)
    assert(t.read().count() === 200L)
    assert(t.read().distinct().count() === 200L)
  }
}
