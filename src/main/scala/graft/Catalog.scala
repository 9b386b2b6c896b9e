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
   * SQL-safe view name for a swamp: the reference's hierarchical names
   * (`sanctuary/realm/swamp`, proto/hydraide.proto naming) are not valid
   * view identifiers, so non-identifier characters map to `_` for the
   * temp-view binding only — the registry, [[load]], and [[explore]] all
   * keep the original name. Distinct names that sanitize identically
   * (`a/b` vs `a_b`) share a view slot (last registration wins the view);
   * the DataFrame path is collision-free.
   */
  private def viewName(name: String): String =
    if (name.forall(c => c.isLetterOrDigit || c == '_')) name
    else name.map(c => if (c.isLetterOrDigit || c == '_') c else '_')

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
    // the spec must not enter the registry until the load attempt settles:
    // a NON-tolerated failure (typo'd format, malformed options) must
    // propagate AND leave no broken binding behind — otherwise
    // isRegistered reports true, explore() FS-probes a dead entry, and
    // destroyBulk counts it as a real swamp
    val prev = registry.get(spec.name)
    registry.put(spec.name, spec) // load() reads the spec from the registry
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
      case e: Throwable =>
        prev match { // roll the registry back to its pre-call binding
          case Some(p) => registry.put(spec.name, p)
          case None    => registry.remove(spec.name)
        }
        throw e
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
    spark.catalog.dropTempView(viewName(name))
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

  /**
   * Explorer — the reference's namespace browser
   * (app/server/explorer/explorer.go:108-197: scan the data directory,
   * index swamps by Sanctuary/Realm/Swamp, list with filters, report
   * per-swamp file size / timestamps / entry counts and rolled-up sizes
   * per realm/sanctuary).
   *
   * Spark re-expression: one row per REGISTERED swamp whose
   * `sanctuary/realm/swamp` name matches the optional filters, with the
   * storage facts read from the filesystem (file count, total bytes,
   * latest modification time) and, opt-in, the row count (Parquet
   * answers it from footer metadata — no data scan). The hierarchy
   * rollups the reference serves as separate RPCs (`ListSanctuaries`,
   * `ListRealms`, `GetSize`) are one `groupBy("sanctuary")` /
   * `groupBy("sanctuary","realm").agg(sum("total_bytes"), ...)` away —
   * the DataFrame IS the index, so filtering/pagination/aggregation are
   * ordinary relational ops rather than bespoke endpoints.
   *
   * Scale shape: the listing is driver-side but CATALOG-sized (one FS
   * `listFiles` per registration — the registry itself is the bound);
   * the data files are never read unless `withRowCounts` asks for the
   * metadata count. Names with fewer than three `/` segments land with
   * NULL sanctuary/realm and the full name as `swamp`, so flat
   * registrations still list.
   */
  def explore(spark: SparkSession,
              sanctuary: Option[String] = None,
              realm: Option[String] = None,
              swampPrefix: Option[String] = None,
              withRowCounts: Boolean = false): DataFrame = {
    import spark.implicits._
    val rows = registry.values.toSeq.sortBy(_.name).flatMap { s =>
      val (sanc, rlm, swamp) = s.name.split("/", 3) match {
        case Array(a, b, c) => (Option(a), Option(b), c)
        case _              => (None, None, s.name)
      }
      val keep = sanctuary.forall(sanc.contains(_)) &&
        realm.forall(rlm.contains(_)) &&
        swampPrefix.forall(swamp.startsWith)
      if (!keep) None
      else {
        val p = new org.apache.hadoop.fs.Path(s.path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val (files, bytes, modified) =
          if (!fs.exists(p)) (0L, 0L, 0L)
          else {
            val it = fs.listFiles(p, true)
            var (n, b, m) = (0L, 0L, 0L)
            while (it.hasNext) {
              val st = it.next()
              // count data files only — commit markers/_SUCCESS are layout noise
              if (!st.getPath.getName.startsWith("_")) {
                n += 1; b += st.getLen; m = math.max(m, st.getModificationTime)
              }
            }
            (n, b, m)
          }
        // read directly (not via load) so a LISTING never replaces the
        // session's temp views as a side effect
        val rowCount: Option[Long] =
          if (withRowCounts && files > 0)
            scala.util.Try(spark.read.format(s.format).options(s.options)
              .load(s.path).count()).toOption
          else None
        Some((sanc.orNull, rlm.orNull, swamp, s.name, s.path, s.format,
          files, bytes,
          if (modified == 0L) null else new java.sql.Timestamp(modified),
          rowCount))
      }
    }
    rows.toDF("sanctuary", "realm", "swamp", "name", "path", "format",
      "file_count", "total_bytes", "modified_at", "row_count")
  }

  /** Load a registered swamp as a DataFrame (fresh file listing) and
    * refresh its temp view so SQL resolution sees the same data. */
  def load(spark: SparkSession, name: String): DataFrame = {
    val s = registry.getOrElse(name,
      throw new IllegalArgumentException(s"swamp not registered: $name"))
    val df = spark.read.format(s.format).options(s.options).load(s.path)
    df.createOrReplaceTempView(viewName(s.name))
    df
  }
}
