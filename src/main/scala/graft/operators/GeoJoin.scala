package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{GeoFunctions => GF}

/**
 * Pairwise geo distance join: all pairs of rows within `maxKm` of each
 * other (location-duplicate detection, store-overlap analysis) — the
 * 2-D spatial sibling of [[RangeJoin]]'s binned kernel.
 *
 * The naive formulation is a cross join with a haversine filter —
 * quadratic, unrunnable at corpus scale. Here: band every point by
 * LATITUDE (a pair within `maxKm` differs by at most `maxKm / 110` deg
 * lat — the conservative meridian arc, valid at every latitude, no
 * cos(lat) antimeridian/pole corner cases), probe each point into its
 * own and the next band, hash-join on the band id, and verify with the
 * exact haversine. Candidates scale with band occupancy, never n².
 *
 * Pair dedup without a distinct shuffle (the [[RangeJoin]] discipline):
 * a same-band pair appears in both probe directions — keep the
 * key-ordered one; a cross-band pair appears exactly once (the lower
 * band probes upward) — keep it unconditionally, emitting keys in
 * canonical (min, max) order.
 *
 * Null Island (0, 0) rows are excluded on both sides, matching the
 * reference's GeoDistanceFilter contract (filter_native.go:637-704).
 *
 * REQUIREMENT (documented, the AsofJoin right-uniqueness discipline):
 * `keyCol` must be UNIQUE — self-pairs are removed by key inequality, so
 * two DISTINCT rows sharing a key value would have their pair silently
 * discarded (the one pair a location-duplicate detector exists to find).
 * De-duplicate or re-key (e.g. a row id) before joining.
 */
object GeoJoin {

  def withinDistance(df: DataFrame, keyCol: String, latCol: String,
                     lonCol: String, maxKm: Double): DataFrame = {
    require(maxKm > 0, "maxKm must be positive")
    val bandDeg = maxKm / 110.0
    val pts = df
      .filter(!(col(latCol) === 0.0 && col(lonCol) === 0.0))
      .select(col(keyCol).as("_k"), col(latCol).as("_la"),
        col(lonCol).as("_lo"),
        floor(col(latCol) / bandDeg).cast("long").as("_band"))
    val probes = pts.select(col("_k").as("_ka"), col("_la").as("_laa"),
      col("_lo").as("_loa"), col("_band").as("_ba"),
      explode(array(col("_band"), col("_band") + 1)).as("_pb"))
    val home = pts.select(col("_k").as("_kb"), col("_la").as("_lab"),
      col("_lo").as("_lob"), col("_band").as("_pb"))
    probes.join(home, Seq("_pb"))
      .filter(col("_ka") =!= col("_kb"))
      // same band: both directions matched => keep the key-ordered one;
      // cross band: single directed match => keep unconditionally
      .filter(when(col("_ba") === col("_pb"), col("_ka") < col("_kb"))
        .otherwise(lit(true)))
      // EvalOnce barrier (r18): bare, the <= maxKm predicate is pushed
      // into the banded join's condition AND the trig-heavy haversine is
      // recomputed in the output projection for every surviving pair; the
      // key/direction prunes above still ride the join
      .withColumn("_d", graft.functions.EvalOnceExpr.evalOnce(
        GF.haversineKm(col("_laa"), col("_loa"), col("_lab"), col("_lob"))))
      .filter(col("_d") <= maxKm)
      .select(least(col("_ka"), col("_kb")).as("key_a"),
        greatest(col("_ka"), col("_kb")).as("key_b"),
        round(col("_d"), 3).as("dist_km"))
  }
}
