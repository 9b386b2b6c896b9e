package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Existence probes — `IsKeyExist` / `AreKeysExist` / `IsSwampExist`
 * (reference: proto/hydraide.proto:310-340,
 * app/server/gateway/gateway.go:1481-1596).
 *
 * Scale shape: the probed key list is tiny, so it is pushed INTO the scan
 * (`isin` compiles to a parquet pushdown filter that prunes row groups on
 * min/max stats); the matching keys that come back are at most |keys| rows,
 * broadcast back onto the probe list. The 100 TB table is never shuffled
 * and never fully scanned.
 */
object Existence {

  /** Per-key presence: one row per probed key with `is_present`. Key lists
    * past [[KeyProbe.InlineThreshold]] probe via broadcast join instead of
    * `isin` literals — same result, no plan-size cliff. */
  def areKeysExist(df: DataFrame, keyCol: String, keys: Seq[Any]): DataFrame =
    KeyProbe.presence(df, keyCol, keys)

  /** Single-key probe: true iff the key exists. */
  def isKeyExist(df: DataFrame, keyCol: String, key: Any): Boolean =
    !df.filter(col(keyCol) === lit(key)).isEmpty

  /** Swamp (table) existence = registered in the catalog or present on
    * storage (reference checks the filesystem the same way). Storage is
    * probed through the session's Hadoop FileSystem so HDFS/S3/file: paths
    * all work — `java.io.File` would silently answer false off-local. */
  def isSwampExist(spark: SparkSession, dir: String, name: String): Boolean = {
    // the registry short-circuit must respect `dir`: a binding registered
    // under a DIFFERENT root must not make this dir answer true for a
    // swamp it does not hold (the dir parameter exists to locate the
    // swamp, not to be bypassed)
    // qualify BOTH sides through the FileSystem before comparing — raw
    // Path.toString treats equivalent spellings (trailing slash, bare vs
    // scheme-qualified, relative vs absolute) as different dirs, which
    // would answer false for a registered-but-no-data-yet swamp whose dir
    // the caller spelled differently than register did
    val hconf = spark.sparkContext.hadoopConfiguration
    def qualified(p: org.apache.hadoop.fs.Path): String =
      p.getFileSystem(hconf).makeQualified(p).toString
    val registeredHere = graft.Catalog.spec(name).exists { s =>
      val specParent = new org.apache.hadoop.fs.Path(s.path).getParent
      specParent != null &&
        qualified(specParent) == qualified(new org.apache.hadoop.fs.Path(dir))
    }
    registeredHere || {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
  }
}
