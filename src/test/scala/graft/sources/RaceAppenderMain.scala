package graft.sources

import org.apache.spark.sql.SparkSession

/** Child-process entry for the CROSS-PROCESS committer race
  * ([[CrossProcessCommitSpec]]): an INDEPENDENT JVM with its own
  * SparkSession and its own LogTable handle performs `n` real
  * single-batch appends against a shared table root. Two of these
  * racing is the reference's multi-node commit loop
  * (reference README.md:207-212: every node flushes, a leader commits
  * atomically — here BOTH processes commit, and the hard-link
  * create-or-fail protocol must serialize them with no lost commit). */
object RaceAppenderMain {
  def main(args: Array[String]): Unit = {
    val Array(root, writerId, nStr) = args
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = LogTable(spark, root)
    (0 until n).foreach { i =>
      t.append(Seq((s"w$writerId-$i", writerId.toLong * 1000L + i))
        .toDF("s", "v"))
    }
    spark.stop()
    sys.exit(0)
  }
}
