package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture table loader (driver parquet, TESTDATA.md). */
object Tables {

  /** Session config every entry point must set: the `events` fixture stores
    * TIMESTAMP(NANOS), which Spark's parquet reader rejects by default
    * (PARQUET_TYPE_ILLEGAL). Applied at session CONSTRUCTION (Verify/Bench/
    * Explain/test builders) — a library read path must not mutate shared
    * session conf as a side effect. */
  val RequiredConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /**
   * Read nanos as long (legacy flag, see [[RequiredConf]]) and convert to a
   * microsecond TimestampType column — the fixture has no sub-microsecond
   * components (verified), and DuckDB exposes the same column as
   * microsecond TIMESTAMP, so both engines see identical values.
   */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (cur, f) =>
      if (f.name == "ts" && f.dataType == LongType)
        cur.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else cur
    }
  }
}
