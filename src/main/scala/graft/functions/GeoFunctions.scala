package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Geo distance as pure column math — everything stays inside whole-stage
 * codegen; no UDF. Mirrors the reference's haversine + bounding-box
 * pre-filter (reference: app/server/gateway/filter.go:14-56,
 * filter_native.go:637-704).
 */
object GeoFunctions {

  /** Mean Earth radius (km) — same constant family the reference uses. */
  val EarthRadiusKm = 6371.0

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2), degrees in. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  /**
   * Conservative bounding box around the reference point, ANDed in front of
   * the haversine so far-away rows short-circuit on two cheap comparisons
   * (the reference builds the same box before evaluating haversine,
   * filter.go:34-56).
   *
   * Strictness matters more than tightness: the box must NEVER exclude a
   * point within the radius, or results diverge from the exact predicate.
   * The longitude width is therefore computed at the worst-case latitude
   * inside the band (standard `asin(sin(r/R)/cos(lat_max))` formula), a 5%
   * margin absorbs float noise, and the box degrades to pass-all near the
   * poles / for hemisphere-scale radii where no box is valid.
   */
  def bboxPrefilter(lat: Column, lon: Column,
                    refLat: Double, refLon: Double, radiusKm: Double): Column = {
    val latDeltaRad = radiusKm / EarthRadiusKm
    val latDelta = math.toDegrees(latDeltaRad) * 1.05
    val latBound = lat.between(refLat - latDelta, refLat + latDelta)
    // worst-case |latitude| reached inside the band
    val maxAbsLat = math.min(math.abs(refLat) + math.toDegrees(latDeltaRad), 90.0)
    val sinR = math.sin(math.min(latDeltaRad, math.Pi / 2))
    val cosMax = math.cos(math.toRadians(maxAbsLat))
    if (maxAbsLat >= 89.0 || sinR >= cosMax) latBound // lon box undefined: lat-only
    else {
      val lonDelta = math.min(
        math.toDegrees(math.asin(math.min(sinR / cosMax, 1.0))) * 1.05, 180.0)
      val lo = refLon - lonDelta
      val hi = refLon + lonDelta
      // antimeridian: a box crossing ±180 is TWO longitude ranges — the
      // single between() would exclude in-radius points on the far side
      // of the seam (refLon 179.5, radius 100 km excludes lon -179.8 at
      // 78 km), breaking the never-exclude invariant. Wrap the
      // overhanging end around; degenerate full wrap falls back to
      // lat-only.
      if (lo < -180.0 && hi > 180.0) latBound
      else if (lo < -180.0)
        latBound && (lon <= hi || lon >= lo + 360.0)
      else if (hi > 180.0)
        latBound && (lon >= lo || lon <= hi - 360.0)
      else latBound && lon.between(lo, hi)
    }
  }
}
