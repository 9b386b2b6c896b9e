package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.filters.{FilterCompiler, FilterNode}

/**
 * Profile-mode reads — the reference's `GetStream` over a "profile swamp":
 * one swamp per entity whose treasures are the entity's FIELDS (key = field
 * name, value = field content), streamed back as a pivot to one wide row,
 * with optional TreasureKey-targeted filters
 * (reference: proto/hydraide.proto:2916-2932,
 * app/server/gateway/gateway.go:942-1036,
 * sdk/go/hydraidego/hydraidego.go:3398-4163).
 *
 * Spark re-expression: the long (entity, field, value) layout pivots with a
 * single hash-aggregate — `max(CASE WHEN field = f THEN value END)` per
 * requested field — i.e. ONE shuffle on the entity key, map-side partial
 * aggregation included. The field list is explicit (as in the reference,
 * where the caller names the TreasureKeys it wants), so no extra distinct
 * pass over the corpus is needed to discover pivot values, and unrequested
 * fields are never carried. TreasureKey filters become ordinary column
 * predicates on the pivoted row.
 */
object Profile {

  /**
   * Pivot an entity's field-treasures to one wide row per entity.
   * `fields` = the TreasureKeys to materialize as columns (missing field =>
   * NULL, matching the reference's absent-treasure behavior).
   */
  def getStream(long: DataFrame, entityCol: String, fieldCol: String,
                valueCol: String, fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "profile read needs at least one field")
    // a repeated TreasureKey would surface as two identically-named output
    // columns — ambiguous to every downstream reference; refuse loudly
    require(fields.distinct.size == fields.size,
      s"duplicate profile fields: ${fields.diff(fields.distinct).distinct.mkString(", ")}")
    val aggs = fields.map(f => max(when(col(fieldCol) === f, col(valueCol))).as(f))
    long.groupBy(col(entityCol)).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * GetStream with TreasureKey filters: pivot, then filter on the wide row
   * (the reference applies TreasureKeyFilters against named field treasures
   * — post-pivot column predicates are the same semantics).
   */
  def getStreamFiltered(long: DataFrame, entityCol: String, fieldCol: String,
                        valueCol: String, fields: Seq[String],
                        filter: FilterNode): DataFrame = {
    val wide = getStream(long, entityCol, fieldCol, valueCol, fields)
    wide.filter(FilterCompiler.compile(filter, wide))
  }
}
