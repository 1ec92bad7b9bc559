package graft.sources

import graft.SparkSpec
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions.col

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Parquet bloom filters as a manifest-declared table property
  * ([[LogTable.addBloom]] — Iceberg's write.parquet.bloom-filter
  * property): files written after the commit carry native parquet
  * bloom filters for the column; pushed equality filters consult them
  * for row-group skipping — the point-lookup complement to range
  * skipping on columns the layout is not clustered on. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def hasBloom(path: String, column: String): Boolean = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), new Configuration()))
    try r.getFooter.getBlocks.asScala.exists(b =>
      b.getColumns.asScala.exists(c =>
        c.getPath.toDotString == column && c.getBloomFilterOffset >= 0))
    finally r.close()
  }

  test("addBloom: new files carry the filter, reads stay exact, compact retrofits old files") {
    val t = LogTable(spark, Files.createTempDirectory("bloom_spec_").toString)
    t.append((0 until 100).map(i => (i.toLong, s"req-$i")).toDF("id", "rid")
      .coalesce(1))
    val preFile = t.snapshot().files.head.path
    assert(!hasBloom(preFile, "rid"), "pre-property files have no filter")

    val s = t.addBloom("rid", expectedDistinct = 1000L)
    assert(s.operation === "set-bloom" && s.bloomCols === Seq(BloomCol("rid", 1000L)))
    intercept[IllegalArgumentException](t.addBloom("nope"))

    t.append((100 until 200).map(i => (i.toLong, s"req-$i")).toDF("id", "rid")
      .coalesce(1))
    val newFile = t.snapshot().files.map(_.path).filterNot(_ == preFile).head
    assert(hasBloom(newFile, "rid"), "post-property files carry the filter")
    assert(!hasBloom(newFile, "id"), "only the declared column pays the bytes")

    // point lookups stay exact across mixed files
    assert(t.read().filter(col("rid") === "req-150").count() === 1L)
    assert(t.read().filter(col("rid") === "req-3").count() === 1L)

    // a property reload survives sessions (manifest-recorded)
    assert(LogTable(spark, t.root).snapshot().bloomCols === Seq(BloomCol("rid", 1000L)))

    // compact rewrites old files UNDER the property — retrofit
    t.compact(smallBytes = 1L << 20)
    assert(t.snapshot().files.forall(f => hasBloom(f.path, "rid")))
    assert(t.read().filter(col("rid") === "req-3").count() === 1L)

    // dropBloom stops future writes from paying the filter bytes
    t.dropBloom("rid")
    t.append(Seq((999L, "req-999")).toDF("id", "rid"))
    val last = t.snapshot().files.maxBy(_.seq)
    assert(!hasBloom(last.path, "rid"))
  }
}
