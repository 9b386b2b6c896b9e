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
   * filter.go:34-56). 5% margin keeps it strictly conservative so the
   * box never excludes a point the exact distance would include.
   */
  def bboxPrefilter(lat: Column, lon: Column,
                    refLat: Double, refLon: Double, radiusKm: Double): Column = {
    val latDelta = math.toDegrees(radiusKm / EarthRadiusKm) * 1.05
    val cosLat = math.max(math.cos(math.toRadians(refLat)), 1e-9)
    val lonDelta = math.min(math.toDegrees(radiusKm / (EarthRadiusKm * cosLat)) * 1.05, 180.0)
    lat.between(refLat - latDelta, refLat + latDelta) &&
      lon.between(refLon - lonDelta, refLon + lonDelta)
  }
}
