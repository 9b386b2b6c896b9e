package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Write-side semantics as batch MERGE-style transforms.
 *
 * The reference applies these per-key under a per-key FIFO guard on a live
 * server (reference: proto/hydraide.proto:874-1040 Set matrix;
 * 1607-2149 conditional increments; 2150-2231 set-slice ops;
 * app/core/hydra/swamp/swamp.go:1274-2017). In Spark the same semantics are
 * a single declarative plan: a full-outer join on the key (shuffle-by-key is
 * the distributed analogue of their per-key lock — each key lands in exactly
 * one task) followed by conditional column rewrites. Small delta sets should
 * be broadcast so the 100 TB base table never shuffles.
 */
object Mutations {

  /** Per-row outcome, mirroring Set_Response status (proto:1028-1040). */
  val StatusNew = "NEW"
  val StatusUpdated = "UPDATED"
  val StatusUnchanged = "NOTHING_CHANGED"
  val StatusDeleted = "DELETED"
  val StatusNotFound = "NOT_FOUND"

  sealed trait WriteMode
  case object Upsert extends WriteMode      // CreateIfNotExist + Overwrite
  case object InsertOnly extends WriteMode  // CreateIfNotExist, no overwrite
  case object UpdateOnly extends WriteMode  // Overwrite existing only
  /** The (CreateIfNotExist=false, Overwrite=false) cell of the matrix:
    * nothing is ever written — the output data equals `base` exactly and
    * only `_status` carries information (proto:1028-1040 NOTHING_CHANGED =
    * "skipped due to Overwrite=false"). Delta-only keys have no data row to
    * report on (the reference answers NOT_FOUND out-of-band) — use
    * [[setStatuses]] for the per-delta-key status view that includes them. */
  case object DryRun extends WriteMode

  /**
   * The reference's `Set` matrix: merge `delta` into `base` on `keyCol`.
   * Output = post-state plus a `_status` column (NEW / UPDATED /
   * NOTHING_CHANGED) so callers get the per-key response the reference
   * returns. Value columns = all non-key columns shared by both sides.
   */
  def set(base: DataFrame, delta: DataFrame, keyCol: String,
          mode: WriteMode = Upsert): DataFrame = {
    val valueCols = base.columns.filter(_ != keyCol).toSeq
    require(valueCols.forall(delta.columns.contains),
      s"delta must carry all value columns ${valueCols.mkString(",")}")
    // reserved-name guard (the capGate discipline): an existing _graft_b
    // data column would be REPLACED by the presence flag and then emitted
    // as lit(true) for every row — silent data loss, not an error
    val clash = (base.columns ++ delta.columns).distinct.filter(c =>
      c.equalsIgnoreCase("_graft_b") || c.equalsIgnoreCase("_graft_d") ||
      c.equalsIgnoreCase("_status"))
    require(clash.isEmpty, s"input must not contain reserved columns: ${clash.toSeq}")
    // PRECONDITION (documented, not scanned — a uniqueness probe would be
    // a full pass per call): delta must be KEY-UNIQUE. A duplicate delta
    // key fans the matching base row out into duplicate post-state rows
    // (the reference serializes same-key writes FIFO; a seq-ordered
    // last-write-wins dedup lives upstream in Snapshots.mergeCommit's
    // dedupSeqCol).

    // Null-key discipline: a null-key DELTA row is unaddressable (it can
    // join no base row) — without the strip it surfaced as a phantom
    // all-NULL output row under Upsert. Null-key BASE rows pass through
    // unchanged: side presence is detected by FLAG columns, not key
    // nullness, so they survive every mode (key-nullness presence made
    // DryRun — documented "output equals base exactly" — drop them).
    val b = base.withColumn("_graft_b", lit(true)).as("b")
    val d = delta.filter(col(keyCol).isNotNull)
      .withColumn("_graft_d", lit(true)).as("d")
    // UpdateOnly/DryRun never emit delta-only keys, so a LEFT join is
    // equivalent — and unlike full_outer it lets the planner BROADCAST a
    // small delta instead of shuffling the 100 TB base by key. Upsert/
    // InsertOnly genuinely need the delta-only side => full_outer.
    val joinType = mode match {
      case UpdateOnly | DryRun => "left_outer"
      case _                   => "full_outer"
    }
    val joined = b.join(d, col(s"b.$keyCol") === col(s"d.$keyCol"), joinType)

    val inBase = col("b._graft_b").isNotNull
    val inDelta = col("d._graft_d").isNotNull
    // fold from lit(false): a key-only base has NO value columns and the
    // bare reduce throws on the empty list (setStatuses' guard, shared)
    val changed = valueCols.map(c => !(col(s"b.$c") <=> col(s"d.$c")))
      .foldLeft(lit(false))(_ || _)

    val takeDelta: Column = mode match {
      case Upsert     => inDelta
      case InsertOnly => inDelta && !inBase
      case UpdateOnly => inDelta && inBase
      case DryRun     => lit(false)
    }

    val status = when(!inBase && takeDelta, StatusNew)
      .when(inBase && takeDelta && changed, StatusUpdated)
      .otherwise(StatusUnchanged)

    val outKey = coalesce(col(s"b.$keyCol"), col(s"d.$keyCol")).as(keyCol)
    val outVals = valueCols.map(c =>
      when(takeDelta, col(s"d.$c")).otherwise(col(s"b.$c")).as(c))

    val keep: Column = mode match {
      case Upsert | InsertOnly => lit(true) // base ∪ delta
      case UpdateOnly | DryRun => inBase    // delta-only keys are dropped
    }

    joined
      .filter(keep)
      .select((outKey +: outVals :+ status.as("_status")): _*)
  } // _graft_b/_graft_d presence flags die in the select above

  /**
   * Per-delta-key status view — the KeysAndStatuses half of Set_Response
   * (proto:1020-1040) as its own DataFrame: one row per delta key with the
   * outcome the given mode would (or did) produce, including the NOT_FOUND
   * outcome for keys [[set]] cannot represent as data rows. The delta is
   * the small side, so the base probe is a broadcast-able semi-lookup at
   * scale.
   */
  def setStatuses(base: DataFrame, delta: DataFrame, keyCol: String,
                  mode: WriteMode = Upsert): DataFrame = {
    val valueCols = base.columns.filter(_ != keyCol).filter(delta.columns.contains).toSeq
    val b = base.as("b")
    val d = delta.as("d")
    val joined = d.join(b, col(s"b.$keyCol") === col(s"d.$keyCol"), "left_outer")
    val inBase = col(s"b.$keyCol").isNotNull
    val changed =
      if (valueCols.isEmpty) lit(false)
      else valueCols.map(c => !(col(s"b.$c") <=> col(s"d.$c"))).reduce(_ || _)
    val modeStatus = mode match {
      case Upsert =>
        when(!inBase, StatusNew).when(changed, StatusUpdated).otherwise(StatusUnchanged)
      case InsertOnly =>
        when(!inBase, StatusNew).otherwise(StatusUnchanged)
      case UpdateOnly =>
        when(!inBase, StatusNotFound).when(changed, StatusUpdated).otherwise(StatusUnchanged)
      case DryRun =>
        when(!inBase, StatusNotFound).otherwise(StatusUnchanged)
    }
    // a null-key delta row is unaddressable — set() strips it and writes
    // NOTHING, so this view must not promise NEW for it (the status/data
    // reconciliation lie): NOT_FOUND is the honest per-key answer
    val status = when(col(s"d.$keyCol").isNull, StatusNotFound)
      .otherwise(modeStatus)
    joined.select(col(s"d.$keyCol").as(keyCol), status.as("_status"))
  }

  /** Per-key delete with statuses (proto:1517-1557): anti-join rewrite. */
  def deleteKeys(base: DataFrame, keys: DataFrame, keyCol: String): DataFrame =
    base.join(keys.select(keyCol).distinct(), Seq(keyCol), "left_anti")

  /** Per-key outcome of a delete — DELETED for keys that existed,
    * NOT_FOUND otherwise (the reference's per-key error statuses,
    * proto:1517-1557). One row per requested key; the base probe is a
    * broadcast-able semi-lookup like [[setStatuses]]. */
  def deleteStatuses(base: DataFrame, keys: DataFrame, keyCol: String): DataFrame = {
    val k = keys.select(keyCol).distinct().as("d")
    val b = base.select(keyCol).distinct().as("b")
    k.join(b, col(s"d.$keyCol") === col(s"b.$keyCol"), "left_outer")
      .select(col(s"d.$keyCol").as(keyCol),
        when(col(s"b.$keyCol").isNotNull, StatusDeleted)
          .otherwise(StatusNotFound).as("_status"))
  }

  /**
   * Conditional increment (the 10 `IncrementXxx` RPCs, proto:1607-2149):
   * add `delta` to `valueCol` only where `condition` holds on the CURRENT
   * value; emits `_applied` so callers see per-key outcomes. Batch form of
   * the reference's read-modify-write under lock.
   */
  def incrementWhere(base: DataFrame, valueCol: String,
                     delta: Column, condition: Column): DataFrame = {
    // The reference exposes one typed RPC per width (Int8..Uint64, Float32/
    // 64, proto:1607-2149) and preserves the value's exact type through the
    // read-modify-write (swamp.go:1274-2017). Spark's `+` widens to the
    // delta's type, so cast the result back to the column's declared type —
    // the output schema is byte-for-byte the input schema plus `_applied`.
    require(!base.columns.exists(_.equalsIgnoreCase("_applied")),
      "input must not contain the reserved column _applied")
    val origType = base.schema(valueCol).dataType
    import org.apache.spark.sql.types._
    val bounds: Option[(Long, Long)] = origType match {
      case ByteType => Some((Byte.MinValue.toLong, Byte.MaxValue.toLong))
      case ShortType => Some((Short.MinValue.toLong, Short.MaxValue.toLong))
      case IntegerType => Some((Int.MinValue.toLong, Int.MaxValue.toLong))
      case LongType => Some((Long.MinValue, Long.MaxValue))
      case _ => None
    }
    bounds match {
      case Some((lo, hi)) =>
        // INTEGRAL columns: under Spark 4's default ANSI mode a widened
        // add's cast-back (or an int+int add itself) THROWS on overflow —
        // one poisoned key aborting the whole batch job, where the
        // reference applies per-key. The non-aborting contract here:
        // a would-overflow increment is simply NOT APPLIED (_applied =
        // false, value unchanged — the same per-key refusal surface as a
        // failed condition). The fit check compares, never overflows:
        // each branch's bound arithmetic stays inside long range. Deltas
        // are applied at integral precision (cast to long) — the typed
        // reference RPCs are integral here by construction.
        val dL = delta.cast(LongType)
        val xL = col(valueCol).cast(LongType)
        val fits = when(dL >= 0, xL <= lit(hi) - dL)
          .otherwise(xL >= lit(lo) - dL)
        val applied = coalesce(condition, lit(false)) &&
          coalesce(fits, lit(false))
        base
          .withColumn("_applied", applied)
          .withColumn(valueCol,
            when(applied, (xL + dL).cast(origType)).otherwise(col(valueCol)))
      case None =>
        val applied = coalesce(condition, lit(false))
        base
          .withColumn("_applied", applied)
          .withColumn(valueCol,
            when(applied, (col(valueCol) + delta).cast(origType)).otherwise(col(valueCol)))
    }
  }

  /**
   * Set-semantics slice ops on an array column (Uint32Slice push/delete,
   * proto:2150-2231): union keeps the array deduplicated, delete removes
   * all occurrences; result stays sorted for deterministic comparisons.
   */
  def slicePush(arr: Column, values: Seq[Long]): Column =
    array_sort(array_union(coalesce(arr, array()), array(values.map(lit): _*)))

  def sliceDelete(arr: Column, values: Seq[Long]): Column =
    array_sort(array_except(coalesce(arr, array()), array(values.map(lit): _*)))

  def sliceContains(arr: Column, value: Long): Column =
    coalesce(array_contains(arr, lit(value)), lit(false))

  /** Explicit null guard, not coalesce(size(...)): under
    * spark.sql.legacy.sizeOfNull (ANSI off — the pre-Spark-4 default many
    * deployments restore) size(NULL) is -1, not null, and the coalesce
    * would pass the -1 through as a "cardinality". */
  def sliceSize(arr: Column): Column =
    when(arr.isNull, lit(0)).otherwise(size(arr))
}
