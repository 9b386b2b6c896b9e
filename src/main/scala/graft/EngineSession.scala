package graft

import org.apache.spark.sql.SparkSession

/**
 * The engine's canonical session builder. Every driver-facing entry point
 * (Bench, Verify, Explain) and the test harness build their session HERE,
 * so the full extension surface — the graft_* SQL functions and the
 * LambdaCse optimizer rule — is active on every documented path. Before
 * this, the rule was only exercised by its own spec: a user's naive
 * duplicated-HOF query ran 8-32x slower through the shipped mains than the
 * engine's tests suggested.
 */
object EngineSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The fixture generator writes naive (no-timezone) parquet timestamps;
      // Spark 4 would infer those as TIMESTAMP_NTZ, which half the timestamp
      // function surface (unix_micros, to_unix_timestamp, ...) rejects and
      // the DuckDB oracle treats as plain TIMESTAMP. Read them as session-tz
      // instants instead — with the UTC session pin above this is exactly
      // DuckDB's naive-timestamp arithmetic, and one type serves the whole
      // query surface.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .withExtensions(new GraftExtensions)
}
