package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}
import org.apache.spark.sql.types.TimestampNTZType

/** Pins `Tables.events`' conf-hygiene contract: the loader must not touch
  * session state for the (current-generator) micros flavor, and must set
  * the legacy nanos flag — loudly, and only then — when the footer shows
  * a genuine TIMESTAMP(NANOS) column, because Spark's vectorized reader
  * re-reads that flag from session conf at execution time (a
  * set-and-restore would make the returned lazy DataFrame unreadable). */
class TablesSpec extends SparkSpec {

  private val flag = "spark.sql.legacy.parquet.nanosAsLong"

  test("events on a micros file leaves session conf untouched") {
    val had = spark.conf.getOption(flag)
    try {
      spark.conf.unset(flag)
      val df = Tables.events(spark, "/root/testdata/sf0.001")
      assert(df.schema("ts").dataType === TimestampNTZType)
      assert(df.count() > 0)
      // unset exposes the registered default ("false"); the contract is
      // that the loader did not flip it on
      assert(!spark.conf.getOption(flag).contains("true"),
        "micros events load mutated the nanos session flag")
    } finally had.foreach(v => spark.conf.set(flag, v))
  }

  test("events on a nanos file sets the flag (file-mandated) and converts to micros NTZ") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos_events").toString
    // a genuine TIMESTAMP(NANOS) file, written with the low-level parquet
    // API (Spark itself cannot write nanos)
    val schema = Types.buildMessage()
      .required(PrimitiveType.PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .required(PrimitiveType.PrimitiveTypeName.INT64).named("event_id")
      .named("events")
    val out = HadoopOutputFile.fromPath(
      new Path(s"$dir/events.parquet"), spark.sparkContext.hadoopConfiguration)
    val w = ExampleParquetWriter.builder(out).withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try {
      // 1 500 000 001 234 ns = 1 500 000 001 µs + 234 ns (truncated away)
      w.write(gf.newGroup().append("ts", 1500000001234L).append("event_id", 1L))
      w.write(gf.newGroup().append("ts", 2000000009999L).append("event_id", 2L))
    } finally w.close()

    val had = spark.conf.getOption(flag)
    try {
      spark.conf.unset(flag)
      val df = Tables.events(spark, dir)
      assert(spark.conf.getOption(flag).contains("true"),
        "nanos events load must enable the session flag the reader needs")
      assert(df.schema("ts").dataType === TimestampNTZType)
      val ts = df.orderBy("event_id").collect().map(_.getAs[java.time.LocalDateTime]("ts"))
      assert(ts(0) === java.time.LocalDateTime.ofEpochSecond(1500, 1000, java.time.ZoneOffset.UTC))
      assert(ts(1) === java.time.LocalDateTime.ofEpochSecond(2000, 9000, java.time.ZoneOffset.UTC))
    } finally {
      if (had.isEmpty) spark.conf.unset(flag) else spark.conf.set(flag, had.get)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
