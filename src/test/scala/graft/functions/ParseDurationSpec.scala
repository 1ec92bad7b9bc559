package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ParseDuration]] — Go-style duration strings (the reference
  * schema's requestTime/timeToFirstByte shape) to exact microseconds,
  * null on malformed input, identical through interpreted eval and
  * whole-stage codegen. */
class ParseDurationSpec extends SparkSpec {
  import spark.implicits._

  private val cases: Seq[(String, Option[Long])] = Seq(
    "5.862332ms" -> Some(5862L),
    "412ms" -> Some(412000L),
    "88us" -> Some(88L),
    "12.3µs" -> Some(12L),       // sub-µs truncates toward zero
    "7.5s" -> Some(7500000L),
    "1m30.5s" -> Some(90500000L),
    "2h3m4s" -> Some(2L * 3600000000L + 3L * 60000000L + 4000000L),
    "500ns" -> Some(0L),
    "1500ns" -> Some(1L),
    "0" -> Some(0L),             // Go's zero duration has no unit
    "-1.5ms" -> Some(-1500L),
    "+2s" -> Some(2000000L),
    " 3ms " -> Some(3000L),      // tolerant of surrounding whitespace
    "" -> None,
    "fast" -> None,
    "12" -> None,                // digits with no unit
    "12kq" -> None,              // unknown unit
    "ms" -> None,                // unit with no digits
    "1.2.3s" -> None)

  test("parse table: every unit class, compound forms, malformed -> null") {
    cases.foreach { case (s, want) =>
      assert(Option(ParseDuration.parse(s)).map(_.longValue()) === want,
        s"parse('$s')")
    }
  }

  test("codegen path agrees with direct eval, including nulls") {
    val df = (cases.map(_._1) :+ null).toDF("d")
    val got = df.select(col("d"),
        ParseDuration.parseDuration(col("d")).as("us"))
      .collect()
      .map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    cases.foreach { case (s, want) =>
      assert(got(Some(s)) === want, s"codegen('$s')")
    }
    assert(got(None) === None)
  }

  test("the plan stays inside whole-stage codegen (no UDF boxing)") {
    // a local Seq constant-folds away — range() keeps the expression
    // in the executed plan, where it must sit inside a codegen span
    val df = spark.range(100)
      .select(concat(col("id").cast("string"), lit("ms")).as("d"))
      .select(ParseDuration.parseDuration(col("d")).as("us"))
    val codegenSpans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty,
      s"expected a codegen span in:\n${df.queryExecution.executedPlan}")
    assert(df.agg(sum("us")).head().getLong(0) === (0L until 100L).sum * 1000L)
  }
}
