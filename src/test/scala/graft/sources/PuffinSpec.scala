package graft.sources

import graft.SparkSpec

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** NDV statistics across the Iceberg seam ([[IcebergStatistics]] +
  * [[Puffin]]): the export writes a spec-conformant Puffin file of
  * theta sketches registered in the metadata's `statistics` array,
  * the sketches reproduce the recorded estimates when deserialized
  * independently, and the import direction adopts the NDVs into
  * graft's manifest so CBO starts informed. */
class PuffinSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("exportStatistics: Puffin theta blobs, statistics entry, exact NDVs below sketch saturation, import adopts") {
    val t = LogTable(spark, tmp("puffin_src_"))
    // 1000 distinct ids, 7 distinct cats, 250 distinct doubles —
    // all under the 2^12 sketch size, so estimates are EXACT-mode
    t.append((0L until 1000L).map(i =>
      (i, s"cat${i % 7}", (i % 250).toDouble)).toDF("id", "cat", "score"))
    val dest = tmp("puffin_out_")
    IcebergExport.export(t, dest)
    val puffin = IcebergStatistics.exportStatistics(t, dest)

    // the metadata advanced (v2 + hint) and records the entry
    val metaDir = Paths.get(dest).resolve("metadata")
    assert(new String(Files.readAllBytes(
      metaDir.resolve("version-hint.text"))).trim === "2")
    val ndvs = IcebergStatistics.ndvStats(dest)
    assert(ndvs === Map("id" -> 1000L, "cat" -> 7L, "score" -> 250L))

    // the Puffin FILE is independently valid: magic-framed, one theta
    // blob per column, each sketch reproducing its recorded ndv
    val (blobs, fileProps) = Puffin.read(puffin)
    assert(fileProps.get("created-by").contains("graft"))
    assert(blobs.size === 3)
    blobs.foreach { case (m, payload) =>
      assert(m.tpe === "apache-datasketches-theta-v1")
      assert(m.snapshotId === t.currentVersion)
      val est = org.apache.datasketches.theta.Sketches.wrapCompactSketch(
        org.apache.datasketches.memory.Memory.wrap(payload)).getEstimate
      assert(Math.round(est).toString === m.properties("ndv"),
        s"sketch of fields ${m.fields} must reproduce its ndv property")
    }

    // a plain reader is unaffected by the statistics entry
    assert(IcebergRead.read(spark, dest).count() === 1000L)

    // IMPORT adopts the NDVs into graft's manifest estimate channel
    val imp = IcebergImport.importTable(spark, dest, tmp("puffin_imp_"))
    assert(imp.snapshot().ndvs === Map("id" -> 1000L, "cat" -> 7L, "score" -> 250L))
    assert(imp.read().count() === 1000L)

    // stats must describe the snapshot they claim: a table that moved
    // past its export refuses instead of mislabeling
    t.append(Seq((5000L, "new", 1.0)).toDF("id", "cat", "score"))
    val e = intercept[IllegalArgumentException](
      IcebergStatistics.exportStatistics(t, dest))
    assert(e.getMessage.contains("re-export"))
  }

  test("SQL surface: CALL export_statistics + iceberg_stats('<path>') table function") {
    val t = LogTable(spark, tmp("puffin_sql_"))
    t.append((0L until 300L).map(i => (i, s"k${i % 11}")).toDF("id", "k"))
    GraftSql.register("puf_t", t)
    val dest = tmp("puffin_sql_out_")
    GraftSql.exec(spark, s"CALL export_iceberg(puf_t, '$dest')")
    GraftSql.exec(spark, s"CALL export_statistics(puf_t, '$dest')")
    val rows = GraftSql.exec(spark,
      s"SELECT col_name, ndv FROM iceberg_stats('$dest') ORDER BY col_name")
      .as[(String, Long)].collect().toSeq
    assert(rows === Seq(("id", 300L), ("k", 11L)))
    // composes with ordinary SQL
    val n = GraftSql.exec(spark,
      s"""SELECT count(*) AS n FROM iceberg_stats('$dest') s
         |JOIN iceberg_scan('$dest') d ON d.id < s.ndv""".stripMargin)
      .head().getLong(0)
    assert(n > 0L)
    // CALL analyze fills the manifest NDV channel through SQL too
    GraftSql.exec(spark, "CALL analyze(puf_t, 'k')")
    assert(t.snapshot().ndvs === Map("k" -> 11L))
  }

  test("exportStatistics refuses a table with no sketchable top-level atomic columns") {
    val t = LogTable(spark, tmp("puffin_none_"))
    t.append(Seq((true, Array(1L, 2L)), (false, Array(3L)))
      .toDF("flag", "xs")) // boolean + array: no single-value sketch form
    val dest = tmp("puffin_none_out_")
    IcebergExport.export(t, dest)
    val e = intercept[IllegalArgumentException](
      IcebergStatistics.exportStatistics(t, dest))
    assert(e.getMessage.contains("no sketchable"))
    // and ndvStats on a stats-less table is empty, not an error
    assert(IcebergStatistics.ndvStats(dest) === Map.empty)
  }

  test("sketches are deterministic and union-mergeable across partition layouts") {
    val t1 = LogTable(spark, tmp("puffin_det1_"))
    t1.append((0L until 400L).map(i => (i, s"s${i % 13}", i.toDouble))
      .toDF("id", "cat", "score").repartition(7))
    val t2 = LogTable(spark, tmp("puffin_det2_"))
    t2.append((0L until 400L).map(i => (i, s"s${i % 13}", i.toDouble))
      .toDF("id", "cat", "score").repartition(2))
    val s1 = IcebergStatistics.thetaSketches(t1,
      Seq(("id", org.apache.spark.sql.types.LongType),
        ("cat", org.apache.spark.sql.types.StringType)))
    val s2 = IcebergStatistics.thetaSketches(t2,
      Seq(("id", org.apache.spark.sql.types.LongType),
        ("cat", org.apache.spark.sql.types.StringType)))
    // same value set → same estimates regardless of partitioning
    Seq("id", "cat").foreach { c =>
      def est(b: Array[Byte]) = org.apache.datasketches.theta.Sketches
        .wrapCompactSketch(org.apache.datasketches.memory.Memory.wrap(b))
        .getEstimate
      assert(est(s1(c)) === est(s2(c)), s"estimate of $c")
    }
  }
}
