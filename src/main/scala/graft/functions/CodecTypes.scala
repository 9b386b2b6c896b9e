package graft.functions

import org.apache.spark.sql.types._

/** The codec bridges' shared supportability walk: both wire formats
  * (msgpack, gob) carry the same Spark-type subset — integral/float/
  * string/binary scalars, scale-0 decimals as uint64 carriers,
  * string-keyed maps, and their nested compositions. ONE definition so
  * the two bridges cannot silently drift apart (they document themselves
  * as identical); the protocol name only flavors the error message. */
private[functions] object CodecTypes {
  def unsupported(dt: DataType, proto: String): Option[String] = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | BinaryType => None
    case d: DecimalType =>
      if (d.scale == 0) None
      else Some(s"$d ($proto has no decimal; only scale-0 uint64 carriers)")
    case ArrayType(et, _) => unsupported(et, proto)
    case MapType(StringType, vt, _) => unsupported(vt, proto)
    case m: MapType => Some(s"$m ($proto bridge requires string map keys)")
    case st: StructType =>
      st.fields.flatMap(f => unsupported(f.dataType, proto)).headOption
    case other => Some(other.toString)
  }
}
