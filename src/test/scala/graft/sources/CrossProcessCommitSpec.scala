package graft.sources

import graft.SparkSpec

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit
import scala.jdk.CollectionConverters._

/** CROSS-PROCESS committer race — the reference's multi-node commit
  * loop (reference README.md:207-212) without the docker cluster: two
  * INDEPENDENT JVMs (separate SparkSessions, separate LogTable
  * handles, nothing shared but the table root on disk) race real
  * appends. The in-process races (FileIOSpec, FaultInjectionSpec)
  * prove the retry loop; this proves the PRIMITIVE — hard-link
  * create-or-fail is atomic BETWEEN processes, so exactly one writer
  * wins each version and every commit lands exactly once. */
class CrossProcessCommitSpec extends SparkSpec {
  import spark.implicits._

  test("two independent JVMs racing appends: one winner per version, no lost or duplicated commit") {
    val root = Files.createTempDirectory("graft_xproc_").toString
    LogTable(spark, root).append(Seq(("base", 0L)).toDF("s", "v"))

    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    // this (forked) test JVM already carries the JDK17 --add-opens set
    // Spark needs — hand the children the same flags
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filter(a => a == "--add-opens" || a.contains("=ALL-UNNAMED"))
    val perWriter = 6
    def spawn(id: Int): (Process, java.io.File) = {
      val log = Files.createTempFile(s"xproc_w${id}_", ".log").toFile
      val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g", "-cp", cp,
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "graft.sources.RaceAppenderMain", root, id.toString, perWriter.toString)
      val p = new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true).redirectOutput(log).start()
      (p, log)
    }
    val children = Seq(spawn(1), spawn(2))
    children.foreach { case (p, log) =>
      assert(p.waitFor(480, TimeUnit.SECONDS), s"child timed out; log: $log")
      assert(p.exitValue() === 0,
        s"child failed (exit ${p.exitValue()}); tail:\n" +
          Files.readAllLines(log.toPath).asScala.takeRight(30).mkString("\n"))
    }

    // every commit landed: 1 base + 2 × perWriter appends, serialized
    // into consecutive versions with no gap and no lost commit
    val t = LogTable(spark, root)
    assert(t.currentVersion === (1 + 2 * perWriter).toLong)
    assert(t.versions.sorted === (1L to (1 + 2 * perWriter)).toSeq)
    // every row exactly once — a clobbered manifest would lose rows,
    // a double-applied retry would duplicate them
    val rows = t.read().select("s").as[String].collect().toSeq
    val expected = "base" +: (for (w <- 1 to 2; i <- 0 until perWriter)
      yield s"w$w-$i")
    assert(rows.sorted === expected.sorted)
    // each version is an append whose file list strictly grows
    (2L to t.currentVersion).foreach { v =>
      val s = t.snapshot(v)
      assert(s.operation === "append")
      assert(s.files.size > t.snapshot(v - 1).files.size)
    }
  }
}
