package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.filters.{FilterCompiler, FilterNode}

/**
 * Ordered, paginated, filtered reads — the Spark re-expression of the
 * reference's `GetByIndex` / `GetByIndexStream` / `GetByIndexStreamFromMany`
 * (reference: proto/hydraide.proto:1349-1445, 2798-2914;
 * app/server/gateway/gateway.go:483-906).
 *
 * The reference maintains per-axis in-memory order indexes ("beacons",
 * app/core/hydra/swamp/beacon/beacon.go) and walks them with binary-searched
 * time bounds. On Spark none of that machinery exists as state: the sort axis
 * is an ORDER BY (Catalyst TakeOrderedAndProject when limited), the half-open
 * `[from, to)` window is a pushed-down range predicate that prunes Parquet
 * row groups on min/max stats, and KeysOnly is column pruning. At 100 TB the
 * win is that `filter -> orderBy -> limit` compiles to a per-partition top-K
 * plus a single K-row merge on the driver — no global shuffle of the data.
 */
object IndexRead {

  sealed trait Order
  case object Asc extends Order
  case object Desc extends Order

  final case class IndexQuery(
      filter: Option[FilterNode] = None,
      orderBy: Seq[(String, Order)] = Nil,
      from: Int = 0,                     // offset (reference: `From`)
      limit: Option[Int] = None,         // reference: `Limit` / `MaxResults`
      timeAxis: Option[String] = None,   // half-open [fromTime, toTime)
      fromTime: Option[java.sql.Timestamp] = None,
      toTime: Option[java.sql.Timestamp] = None,
      includeKeys: Seq[Any] = Nil,       // reference: IncludedKeys (proto:2830-2844)
      excludeKeys: Seq[Any] = Nil,
      keyCol: String = "key",
      keysOnly: Boolean = false,
      // Keyset continuation: resume strictly after the (orderBy..., key)
      // tuple of the previous page's last row. afterAxis holds one value
      // per orderBy column; afterKey the key tie-break. Replaces `from`.
      afterAxis: Seq[Any] = Nil,
      afterKey: Option[Any] = None)

  def run(df: DataFrame, q: IndexQuery): DataFrame = {
    var cur = df

    // cheap key pre-filters first — Catalyst will keep them in front.
    // Null discipline (the KeyProbe rules): null PROBE keys are stripped —
    // a null inside an isin list poisons the whole three-valued predicate
    // (`k2 IN (k1, NULL)` is NULL, and `NOT NULL` is NULL: one stray null
    // in excludeKeys would silently empty the entire result). Null-keyed
    // ROWS can never be named by either list, so include drops them (isin
    // NULL is not TRUE — correct) and exclude must KEEP them explicitly
    // (`NOT(NULL IN ...)` is NULL, not TRUE — a bare negation dropped
    // rows the caller never excluded).
    val inKeys = q.includeKeys.filter(_ != null)
    val exKeys = q.excludeKeys.filter(_ != null)
    if (inKeys.nonEmpty) cur = cur.filter(col(q.keyCol).isin(inKeys: _*))
    else if (q.includeKeys.nonEmpty) cur = cur.filter(lit(false)) // only null probes
    if (exKeys.nonEmpty)
      cur = cur.filter(col(q.keyCol).isNull || !col(q.keyCol).isin(exKeys: _*))

    // half-open time window [from, to) — binary-searched beacon bounds in the
    // reference (beacon.go:1435-1500); pushed-down range predicate here.
    // Bounds WITHOUT an axis are an inconsistent query: silently ignoring
    // them would hand a caller who asked for [t1, t2) the entire table
    require(q.timeAxis.isDefined || (q.fromTime.isEmpty && q.toTime.isEmpty),
      "fromTime/toTime need timeAxis — a time window without an axis " +
        "would be silently ignored")
    q.timeAxis.foreach { axis =>
      q.fromTime.foreach(t => cur = cur.filter(col(axis) >= lit(t)))
      q.toTime.foreach(t => cur = cur.filter(col(axis) < lit(t)))
    }

    q.filter.foreach(f => cur = cur.filter(FilterCompiler.compile(f, df)))

    // Keyset continuation — the beacon-walk pagination of the reference
    // (beacon.go:1368-1420 resumes an ordered walk from the last-seen
    // element instead of re-counting an offset). OFFSET k forces every
    // page to re-scan and re-sort the k rows already served (page N costs
    // O(N·pageSize·log)); the keyset form compiles to a row-lexicographic
    // range predicate over (orderBy..., key) that reaches the parquet scan
    // and prunes row groups on min/max stats — page N costs the same as
    // page 1 at any depth.
    if (q.afterKey.isDefined || q.afterAxis.nonEmpty) {
      require(q.afterKey.isDefined,
        "keyset continuation needs afterKey (the key tie-break of the last served row)")
      require(q.afterAxis.length == q.orderBy.length,
        s"afterAxis must carry one value per orderBy column " +
          s"(${q.afterAxis.length} given for ${q.orderBy.length} axes)")
      require(q.from == 0, "keyset continuation replaces the offset — leave from=0")
      val axes: Seq[(Column, Order, Any)] =
        q.orderBy.zip(q.afterAxis).map { case ((c, o), v) => (col(c), o, v) } :+
          ((col(q.keyCol), Asc: Order, q.afterKey.get))
      // Null-safe "strictly after v" under Spark's default sort-null
      // placement (ASC = nulls first, DESC = nulls last). A bare `c > lit(v)`
      // is null-hostile twice over: a NULL axis VALUE in the continuation
      // token makes the whole predicate NULL (every row silently dropped),
      // and NULL CELLS in the column are dropped even when the sort placed
      // them after the token. Tie comparison is `<=>` for the same reason.
      def strictlyAfter(c: Column, o: Order, v: Any): Column = o match {
        case Asc  => if (v == null) c.isNotNull else c > lit(v)
        case Desc => if (v == null) lit(false) else c < lit(v) || c.isNull
      }
      def after(i: Int): Column = {
        val (c, o, v) = axes(i)
        val strict = strictlyAfter(c, o, v)
        if (i == axes.length - 1) strict
        else strict || (c <=> lit(v) && after(i + 1))
      }
      cur = cur.filter(after(0))
    }

    // key-only pagination (afterKey with no orderBy axes) must still SORT
    // by the key: the continuation filter alone would page an unordered
    // stream — the client takes the page's max key as the next token and
    // every unserved row below it is skipped forever
    if (q.orderBy.nonEmpty || q.afterKey.isDefined) {
      val sortCols: Seq[Column] = q.orderBy.map {
        case (c, Asc)  => col(c).asc
        case (c, Desc) => col(c).desc
      } :+ col(q.keyCol).asc // total order: deterministic pagination on ties
      cur = cur.orderBy(sortCols: _*)
    }

    if (q.from > 0) cur = cur.offset(q.from)
    q.limit.foreach(n => cur = cur.limit(n))
    if (q.keysOnly) cur = cur.select(col(q.keyCol))
    cur
  }

  /**
   * Multi-source read with per-source queries and a global limit —
   * `GetByIndexStreamFromMany` (proto:2883-2914): results stream per-swamp
   * IN THE ORDER THE QUERIES ARE LISTED, and the global MaxResults stops
   * after N total across sources — it is a truncation of that
   * source-ordered stream, NOT a merged re-sort. Spark's `limit` over the
   * union matches at the CLIENT boundary (the reference's only surface —
   * these are answers to a streaming RPC): collecting plans
   * CollectLimitExec, which consumes the per-source ordered partitions in
   * union order. Composing the limited result into FURTHER plan stages can
   * instead plan GlobalLimitExec over a shuffle, where fetch order — and
   * therefore WHICH n rows survive — is not source-ordered; a pipeline
   * needing the reference truncation mid-plan should apply per-source
   * limits itself and skip globalLimit.
   */
  def fromMany(sources: Seq[(DataFrame, IndexQuery)], globalLimit: Option[Int]): DataFrame = {
    require(sources.nonEmpty, "fromMany needs at least one source")
    val parts = sources.map { case (df, q) => run(df, q) }
    val all = parts.reduce(_ unionByName _)
    globalLimit.fold(all)(all.limit)
  }
}
