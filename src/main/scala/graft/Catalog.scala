package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/**
 * Swamp registration — `RegisterSwamp` / `DeRegisterSwamp`
 * (reference: proto/hydraide.proto:803-869: a swamp pattern is registered
 * with storage options before use; deregistration removes the binding, not
 * the data).
 *
 * Spark re-expression: a registration binds a swamp name to a storage
 * location + format + options and exposes it as a temp view, so both the
 * DataFrame API (`Catalog.load`) and `spark.sql("... FROM name")` resolve
 * it. Options like the reference's `maxFileSize` / flush interval are
 * write-path storage knobs; the ones that matter on Spark are carried
 * (format, path, read options) and the rest are retained opaquely so a
 * round-trip keeps them.
 */
object Catalog {

  final case class SwampSpec(
      name: String,
      path: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty)

  private val registry = TrieMap.empty[String, SwampSpec]

  /**
   * Register (or re-register) a swamp binding and expose it as a view.
   * Like the reference's RegisterSwamp — which binds a pattern before any
   * data exists — registration tolerates a missing/empty path: the spec is
   * stored unconditionally and the view is created lazily if the source
   * can't be read yet. [[load]] always re-reads the source (fresh file
   * listing) and refreshes the view, so files written after registration
   * are visible.
   */
  def register(spark: SparkSession, spec: SwampSpec): Unit = {
    registry.put(spec.name, spec)
    try load(spark, spec.name)
    catch {
      // ONLY the two "no data yet" conditions are tolerated (that's the
      // RegisterSwamp-before-first-write contract). A blanket
      // AnalysisException catch would also swallow real registration
      // errors — a typo'd format, malformed options — and defer them to a
      // confusing TABLE_OR_VIEW_NOT_FOUND at first query.
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getCondition).exists(c =>
               c.contains("PATH_NOT_FOUND") ||
               c.contains("UNABLE_TO_INFER_SCHEMA")) => () // no data yet
    }
  }

  /** Remove the binding (data untouched, as in the reference).
    *
    * Scope contract: the registry is JVM-global, but temp VIEWS are
    * per-session (Spark's own scoping) — deregister/destroy drop the view
    * only in the session passed in. Another session that called [[load]]
    * keeps its view until it reloads (and, after destroy, will fail on
    * the deleted files) — the same staleness Spark's catalog has for any
    * dropped-underneath table; `isRegistered` is the cross-session truth. */
  def deregister(spark: SparkSession, name: String): Unit = {
    registry.remove(name)
    spark.catalog.dropTempView(name)
  }

  /**
   * Destroy — the reference's `Destroy`/`DestroyBulk`
   * (proto/hydraide.proto:689-733): remove the binding AND delete the
   * swamp's storage, through the session's Hadoop FileSystem so any
   * supported scheme works. Returns true iff data was actually deleted.
   */
  def destroy(spark: SparkSession, name: String): Boolean = {
    val path = registry.get(name).map(_.path)
    deregister(spark, name)
    path.exists { pth =>
      val p = new org.apache.hadoop.fs.Path(pth)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(p) && fs.delete(p, true)
    }
  }

  /** DestroyBulk (proto:263-278): destroy many swamps, per-name outcome. */
  def destroyBulk(spark: SparkSession, names: Seq[String]): Map[String, Boolean] =
    names.map(n => n -> destroy(spark, n)).toMap

  def isRegistered(name: String): Boolean = registry.contains(name)

  def spec(name: String): Option[SwampSpec] = registry.get(name)

  /** Load a registered swamp as a DataFrame (fresh file listing) and
    * refresh its temp view so SQL resolution sees the same data. */
  def load(spark: SparkSession, name: String): DataFrame = {
    val s = registry.getOrElse(name,
      throw new IllegalArgumentException(s"swamp not registered: $name"))
    val df = spark.read.format(s.format).options(s.options).load(s.path)
    df.createOrReplaceTempView(s.name)
    df
  }
}
