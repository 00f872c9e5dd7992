package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.core.Tables

/** Data-generation contract: the driver regenerates /root/testdata between
  * rounds and has already changed on-disk shapes once (events.ts INT64
  * TIMESTAMP(NANOS) -> plain timestamp[us]). This spec pins the loader
  * contract so a regen can't silently strand the engine again:
  *
  *  - every table in Tables.names analyzes and returns >0 rows in every
  *    sf dir that exists (catches the LOUD variant: an analysis error on
  *    a changed column type);
  *  - events.ts loads as a TimestampType within a sane year range
  *    (catches the SILENT variant: a pinned LongType schema reading µs
  *    values as ns would yield timestamps ~1970, off by 1000×).
  */
class TablesContractSpec extends SparkSpec {

  private val sfDirs: Seq[String] =
    Seq("sf0.001", "sf0.01", "sf0.1")
      .map(d => s"/root/testdata/$d")
      .filter(d => new java.io.File(d).isDirectory)

  test("at least one testdata sf dir exists") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* dirs found")
  }

  test("every table loads, analyzes and is non-empty in every sf dir") {
    for (dir <- sfDirs; name <- Tables.names) {
      val df = Tables.load(spark, dir, name)
      // force analysis + a real scan (count is cheap at these SFs)
      val n = df.count()
      assert(n > 0, s"$dir/$name loaded 0 rows")
    }
  }

  test("events.ts loads as a µs TimestampType in a sane year range") {
    for (dir <- sfDirs) {
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"$dir events.ts is ${df.schema("ts").dataType}, expected TimestampType")
      val Array(row) = df.agg(
        min(year(col("ts"))).as("y_min"),
        max(year(col("ts"))).as("y_max")).collect()
      val (yMin, yMax) = (row.getInt(0), row.getInt(1))
      // a ns-as-µs misread lands in 1970; a µs-as-ns misread lands far
      // in the future — both fall outside this band
      assert(yMin >= 2000 && yMax <= 2100,
        s"$dir events.ts year range [$yMin, $yMax] outside [2000, 2100] — " +
          "loader/data generation mismatch (1000× timestamp scale error?)")
    }
  }

  test("INT64 TIMESTAMP(MICROS) events generation loads normalized") {
    // a third plausible driver regen: parquet INT64 with the
    // TIMESTAMP(MICROS, adjustedToUTC) logical type — Spark reads it as
    // TimestampType natively and the loader must pass it through at µs
    // precision, not re-scale it (a 1000x error would land ~1970 or far
    // future, caught by value equality here)
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evmicros").toString
    val base = 1717200000000000L // 2024-06-01 in µs
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      Seq((1L, base), (2L, base + 60000000L))
        .toDF("event_id", "us")
        .select($"event_id", expr("timestamp_micros(us)").as("ts"),
          lit(7L).as("user_id"), lit("view").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"micros generation loaded as ${df.schema("ts").dataType}")
    val got = df.orderBy(col("event_id"))
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    assert(got.sameElements(Array(base, base + 60000000L)),
      s"micros values not preserved: ${got.toSeq} vs $base")
  }

  test("legacy INT64-nanos events generation still loads via the long branch") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evnanos").toString
    val base = 1717200000000000L // 2024-06-01 in µs
    Seq((1L, base * 1000L), (2L, (base + 60000000L) * 1000L)) // µs -> ns
      .toDF("event_id", "ts")
      .select($"event_id", $"ts", lit(7L).as("user_id"),
        lit("view").as("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.agg(min(unix_micros(col("ts")))).collect()(0).getLong(0)
    assert(got == base, s"nanos branch produced $got, expected $base")
  }
}
