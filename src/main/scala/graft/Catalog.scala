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

  /** Register (or re-register) a swamp binding and expose it as a view. */
  def register(spark: SparkSession, spec: SwampSpec): Unit = {
    registry.put(spec.name, spec)
    load(spark, spec.name).createOrReplaceTempView(spec.name)
  }

  /** Remove the binding (data untouched, as in the reference). */
  def deregister(spark: SparkSession, name: String): Unit = {
    registry.remove(name)
    spark.catalog.dropTempView(name)
  }

  def isRegistered(name: String): Boolean = registry.contains(name)

  def spec(name: String): Option[SwampSpec] = registry.get(name)

  /** Load a registered swamp as a DataFrame. */
  def load(spark: SparkSession, name: String): DataFrame = {
    val s = registry.getOrElse(name,
      throw new IllegalArgumentException(s"swamp not registered: $name"))
    spark.read.format(s.format).options(s.options).load(s.path)
  }
}
