package graft.sources

import org.apache.spark.sql.SparkSession

/** Child-process entries for the MARKER-COMMIT-LOOP cross-process spec
  * ([[MarkerCommitSpec]]): independent JVMs playing the reference's
  * two decoupled roles — flushing nodes and the lock-elected leader —
  * meeting ONLY at the table root's pending-marker prefix
  * (reference README.md:104-118, :196-212). */
private object MarkerProc {
  def session(name: String): SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** A flushing NODE: stages `nFlushes` buffer flushes (3 rows each)
  * into the shared table's pool and publishes their 0-byte markers.
  * Never commits — that is the leader's job. */
object MarkerFlusherMain {
  def main(args: Array[String]): Unit = {
    val Array(root, nodeId, nStr) = args
    val n = nStr.toInt
    val spark = MarkerProc.session(s"graft-marker-flusher-$nodeId")
    import spark.implicits._
    val t = LogTable(spark, root)
    (0 until n).foreach { i =>
      val rows = (0 until 3).map(r =>
        (s"n$nodeId-f$i-r$r", nodeId.toLong * 1000000L + i * 1000L + r))
      MarkerCommit.flush(t, rows.toDF("s", "v"))
    }
    spark.stop()
    sys.exit(0)
  }
}

/** A COMMITTER: either drains the pending prefix through repeated
  * leader rounds (`drain`, small batches so rounds interleave when two
  * committers race), or commits ONE round and "crashes" before marker
  * cleanup and lease release (`crash` — the fault the protocol must
  * absorb exactly-once). */
object MarkerCommitterMain {
  def main(args: Array[String]): Unit = {
    val Array(root, mode) = args
    val spark = MarkerProc.session(s"graft-marker-committer-$mode")
    mode match {
      case "drain" =>
        MarkerCommit.runUntilDrained(spark, root, maxMarkers = 3,
          leaseMs = 2000L)
      case "crash" =>
        MarkerCommit.runOnce(spark, root, leaseMs = 1500L,
          crashAfterCommit = true)
      case "follow" =>
        // the reference's ACTUAL deployment: a committer daemon ticking
        // its interval WHILE nodes are still flushing — commit batches
        // of whatever is pending, for a fixed window, then stop
        val c = MarkerCommit.startCommitter(spark, root,
          intervalMs = 100L, leaseMs = 2000L, maxMarkers = 3)
        Thread.sleep(12000L)
        c.close()
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
    sys.exit(0)
  }
}
