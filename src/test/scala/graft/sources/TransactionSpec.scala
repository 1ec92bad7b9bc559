package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import java.nio.file.Files

/** Multi-statement atomic transactions (LogTable.transaction) —
  * Iceberg `Table.newTransaction` semantics: all staged statements
  * publish as ONE commit, none are visible before publish, a body
  * failure leaves main untouched, and a concurrent main commit makes
  * the publish refuse loudly instead of dropping either side. */
class TransactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): LogTable =
    LogTable(spark, Files.createTempDirectory("txn_spec_").toString)

  private def df(ids: Range): DataFrame = ids.toDF("id")

  test("staged statements publish as one atomic commit") {
    val t = freshTable()
    t.append(df(0 until 10))
    val before = t.currentVersion

    val published = t.transaction { tx =>
      tx.append(df(10 until 20))
      tx.delete(col("id") < 5)
      tx.append(df(20 until 25))
    }

    // combined effect: [5,25)
    assert(t.read().select("id").as[Int].collect().sorted === (5 until 25).toArray)
    // exactly ONE new commit on main, regardless of statement count
    assert(t.currentVersion === before + 1)
    assert(published.version === before + 1)
    assert(published.operation === "publish")
    // the ephemeral staging branch is gone
    assert(t.branches.isEmpty)
  }

  test("intermediate state is invisible to main readers; reads inside see prior statements") {
    val t = freshTable()
    t.append(df(0 until 10))

    t.transaction { tx =>
      tx.append(df(10 until 15))
      // read-your-writes inside the transaction
      assert(tx.read().count() === 15L)
      // ...while main still serves the pre-transaction snapshot
      assert(t.read().count() === 10L)
      tx.delete(col("id") >= 12)
    }
    assert(t.read().count() === 12L)
  }

  test("a body failure aborts: main untouched, staging dropped") {
    val t = freshTable()
    t.append(df(0 until 10))
    val before = t.currentVersion

    val e = intercept[RuntimeException] {
      t.transaction { tx =>
        tx.append(df(10 until 20))
        throw new RuntimeException("boom")
      }
    }
    assert(e.getMessage === "boom")
    assert(t.currentVersion === before)
    assert(t.read().count() === 10L)
    assert(t.branches.isEmpty)
  }

  test("a concurrent main commit makes the publish refuse loudly") {
    val t = freshTable()
    t.append(df(0 until 10))

    val e = intercept[IllegalStateException] {
      t.transaction { tx =>
        tx.append(df(10 until 20))
        // a commit lands on main mid-transaction
        t.append(df(100 until 105))
      }
    }
    assert(e.getMessage.contains("advanced"))
    // the concurrent commit survives; the transaction's rows do not
    assert(t.read().select("id").as[Int].collect().sorted ===
      ((0 until 10) ++ (100 until 105)).toArray)
    assert(t.branches.isEmpty)
  }

  test("a read-only transaction publishes no commit") {
    val t = freshTable()
    t.append(df(0 until 10))
    val before = t.currentVersion
    val s = t.transaction { tx => assert(tx.read().count() === 10L) }
    assert(s.version === before)
    assert(t.currentVersion === before)
    assert(t.branches.isEmpty)
  }

  test("schema DDL and DML stage together") {
    val t = freshTable()
    t.append(df(0 until 5))
    val before = t.currentVersion

    t.transaction { tx =>
      tx.addColumn("tag", org.apache.spark.sql.types.StringType)
      tx.append(Seq((5, "a"), (6, "b")).toDF("id", "tag"))
    }
    assert(t.currentVersion === before + 1)
    val out = t.read().orderBy("id")
    assert(out.columns.toSeq === Seq("id", "tag"))
    assert(out.count() === 7L)
    assert(out.filter(col("tag").isNotNull).count() === 2L)
  }

  test("evolveSpec inside a transaction publishes the new spec to main") {
    val t = freshTable()
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "kind"))

    t.transaction { tx =>
      val evolved = tx.evolveSpec(partitionBy = Seq("kind"))
      evolved.append(Seq((3L, "c"), (4L, "c")).toDF("id", "kind"))
    }

    val snap = t.snapshot()
    assert(snap.operation === "publish")
    // the publish must carry the branch head's spec: the adopted files
    // are laid out (and keyed) under it — re-recording the pre-fork
    // spec would mislabel the manifest relative to the layout
    assert(snap.partCols === Seq("kind"))
    assert(snap.files.exists(_.partitions.contains("kind")))

    // a fresh handle adopts the recorded spec and keeps appending under it
    val t2 = LogTable(spark, t.root)
    t2.append(Seq((5L, "d")).toDF("id", "kind"))
    assert(t2.snapshot().partCols === Seq("kind"))
    assert(t2.read().count() === 5L)
    // pre-evolution files carry no `kind` dir value, so partition
    // selection correctly refuses; row-exact reads stay right
    intercept[IllegalArgumentException](t2.readWhere(p => p("kind") == "c"))
    assert(t2.read().filter(col("kind") === "c").count() === 2L)
  }
}
