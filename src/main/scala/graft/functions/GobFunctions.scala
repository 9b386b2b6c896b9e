package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._

/**
 * GOB ingestion: the LEGACY body encoding of the reference engine. The
 * reference accepts GOB alongside msgpack (encoding enum at
 * proto/hydraide.proto:2460-2473, serializer at
 * app/core/hydra/gobber/gobber.go) and its own documented migration path
 * is "read everything as GOB, write it back as MSGPACK, compact"
 * (proto/hydraide.proto:849-854). This bridge makes that migration a
 * one-liner inside the engine:
 *
 * {{{ df.withColumn("body", MsgPack.pack(Gob.unpack(col("raw"), schema))) }}}
 *
 * Implemented against the PUBLIC wire format only — Go's encoding/gob
 * package documentation and the worked byte-level example it contains
 * (the `Point{22, 33}` stream), which the unit suite pins verbatim as
 * ground truth. Format essentials:
 *
 *  - unsigned int: one byte if < 128, else a (256 - n) prefix byte and n
 *    big-endian bytes;
 *  - signed int: bit 0 carries the sign — `u >> 1`, complemented when
 *    bit 0 is set;
 *  - float: the float64 bit pattern BYTE-REVERSED, then sent as an
 *    unsigned int (small exponents encode short);
 *  - string / []byte: unsigned length then raw bytes;
 *  - the stream is a sequence of length-prefixed messages; a message
 *    holds a signed type id — negative = a type DEFINITION (a wireType
 *    struct describing an array/slice/struct/map, ids assigned from 65
 *    up), positive = the value. Struct values are (field-delta, value)
 *    pairs terminated by delta 0; non-struct top-level values are sent
 *    as a singleton field (one zero byte before the value).
 *
 * Decode contract (mirrors [[MsgPack.unpack]]): corrupt bytes, missing
 * fields and type mismatches land as NULL, never an executor throw.
 * One Go-ism surfaces here: gob ELIDES zero-valued struct fields on the
 * wire, so a field that was 0/""/false in Go decodes as NULL — callers
 * that want Go's zero-fill semantics coalesce to the zero value.
 * Interface-typed fields (schemaless payloads inside GOB) decode as
 * NULL: their concrete Go type does not exist here by definition.
 *
 * Scale shape: identical to the msgpack bridge — a per-row scan-stage
 * expression, interpreted (CodegenFallback) because ingestion conversion
 * is a one-time boundary pass, not a query hot path; queries run against
 * the decoded native columns.
 */
object Gob {

  /** Decode gob bytes (a `gobber.Serialize` stream: type definitions +
    * one value) into `schema`-typed values. */
  def unpack(c: Column, schema: DataType): Column =
    GraftBridge.column(GobDecode(GraftBridge.expression(c), schema))

  /** Encode a column as a gob stream readable by Go's encoding/gob (and
    * by [[unpack]]). NULL struct fields are elided like Go zero values;
    * NULL array/map elements are not representable in gob and refuse
    * loudly rather than silently altering the data. */
  def pack(c: Column): Column =
    GraftBridge.column(GobEncode(GraftBridge.expression(c)))

  // ------------------------------------------------------------- wire ids
  // predefined type ids (encoding/gob type.go, public API docs)
  private val TBool = 1L; private val TInt = 2L; private val TUint = 3L
  private val TFloat = 4L; private val TBytes = 5L; private val TString = 6L
  private val TComplex = 7L; private val TInterface = 8L
  private val FirstUserId = 65L

  // wireType struct field indices (wireType{ArrayT, SliceT, StructT, MapT, ...})
  private val WArray = 0; private val WSlice = 1; private val WStruct = 2
  private val WMap = 3

  private sealed trait WireDef
  private case class ArrDef(elem: Long, len: Long) extends WireDef
  private case class SliceDef(elem: Long) extends WireDef
  private case class StructDef(fields: Vector[(String, Long)]) extends WireDef
  private case class MapDef(key: Long, elem: Long) extends WireDef

  // ---------------------------------------------------------------- reader

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < bytes.length
    private def next(): Int = {
      if (pos >= bytes.length) throw new IllegalArgumentException("gob: truncated")
      val b = bytes(pos) & 0xff; pos += 1; b
    }
    /** Unsigned int as a raw 64-bit pattern (callers interpret sign). */
    def readUintBits(): Long = {
      val b0 = next()
      if (b0 < 0x80) b0.toLong
      else {
        val n = 256 - b0
        if (n < 1 || n > 8) throw new IllegalArgumentException(s"gob: bad uint prefix $b0")
        var v = 0L
        var i = 0
        while (i < n) { v = (v << 8) | next(); i += 1 }
        v
      }
    }
    /** Unsigned int that must fit a non-negative Long (counts, lengths). */
    def readCount(): Int = {
      val v = readUintBits()
      if (v < 0 || v > Int.MaxValue) throw new IllegalArgumentException(s"gob: bad count $v")
      v.toInt
    }
    /** Element count for a sequence (slice/array/map/field list): every
      * element occupies >= 1 wire byte, so a count exceeding the bytes
      * still in the buffer is hostile or corrupt — refuse BEFORE any
      * per-element work (the same pre-allocation bomb discipline
      * [[readBytes]] applies to its copy and Multimodal applies to image
      * headers). */
    def readBoundedCount(): Int = {
      val n = readCount()
      if (n > bytes.length - pos)
        throw new IllegalArgumentException(
          s"gob: count $n exceeds ${bytes.length - pos} remaining bytes")
      n
    }
    def readInt(): Long = {
      val u = readUintBits()
      if ((u & 1L) == 0L) u >>> 1 else ~(u >>> 1)
    }
    def readFloat(): Double =
      java.lang.Double.longBitsToDouble(java.lang.Long.reverseBytes(readUintBits()))
    def readBytes(): Array[Byte] = {
      val n = readCount()
      // compare against the REMAINING bytes, never `pos + n`: with a
      // hostile n near Int.MaxValue the sum wraps negative, the guard
      // passes, and copyOfRange (which zero-PADS past the source) would
      // attempt the full declared allocation — a 2 GiB OOM from a 5-byte
      // input (caught by the hostile-prefix test)
      if (n > bytes.length - pos) throw new IllegalArgumentException("gob: truncated bytes")
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a
    }
    def readString(): String = new String(readBytes(), StandardCharsets.UTF_8)
    def skip(n: Int): Unit = { // same overflow-safe form as readBytes
      if (n < 0 || n > bytes.length - pos) throw new IllegalArgumentException("gob: bad skip")
      pos += n
    }
  }

  /** Uint as decode-friendly value: Long when it fits, BigInt past 2^63
    * (the same u64 vocabulary the msgpack parser emits). */
  private def uintValue(bits: Long): Any =
    if (bits >= 0) bits else BigInt(java.lang.Long.toUnsignedString(bits))

  // ------------------------------------------------------ type definitions

  /** One struct VALUE read generically as (fieldIndex -> reader thunk)
    * walk: gob structs are (delta, value) pairs ending at delta 0. */
  private def readStructFields(r: Reader)(read: Int => Unit): Unit = {
    var field = -1
    var delta = r.readCount()
    while (delta != 0) {
      field += delta
      read(field)
      delta = r.readCount()
    }
  }

  /** commonType { Name string; Id typeId } — we keep only the Id. */
  private def readCommonType(r: Reader): Long = {
    var id = 0L
    readStructFields(r) {
      case 0 => r.readString() // name: informational only
      case 1 => id = r.readInt()
      case _ => throw new IllegalArgumentException("gob: bad commonType field")
    }
    id
  }

  private def readFieldTypes(r: Reader): Vector[(String, Long)] = {
    val n = r.readBoundedCount()
    Vector.fill(n) {
      var name = ""; var id = 0L
      readStructFields(r) {
        case 0 => name = r.readString()
        case 1 => id = r.readInt()
        case _ => throw new IllegalArgumentException("gob: bad fieldType field")
      }
      (name, id)
    }
  }

  /** A type-definition payload: one wireType struct. Returns (id, def). */
  private def readWireType(r: Reader): WireDef = {
    var result: WireDef = null
    readStructFields(r) {
      case WArray =>
        var elem = 0L; var len = 0L
        readStructFields(r) {
          case 0 => readCommonType(r)
          case 1 => elem = r.readInt()
          case 2 => len = r.readInt()
          case _ => throw new IllegalArgumentException("gob: bad arrayType field")
        }
        result = ArrDef(elem, len)
      case WSlice =>
        var elem = 0L
        readStructFields(r) {
          case 0 => readCommonType(r)
          case 1 => elem = r.readInt()
          case _ => throw new IllegalArgumentException("gob: bad sliceType field")
        }
        result = SliceDef(elem)
      case WStruct =>
        var fields = Vector.empty[(String, Long)]
        readStructFields(r) {
          case 0 => readCommonType(r)
          case 1 => fields = readFieldTypes(r)
          case _ => throw new IllegalArgumentException("gob: bad structType field")
        }
        result = StructDef(fields)
      case WMap =>
        var key = 0L; var elem = 0L
        readStructFields(r) {
          case 0 => readCommonType(r)
          case 1 => key = r.readInt()
          case 2 => elem = r.readInt()
          case _ => throw new IllegalArgumentException("gob: bad mapType field")
        }
        result = MapDef(key, elem)
      case _ => // GobEncoder/BinaryMarshaler/TextMarshaler variants: opaque
        throw new IllegalArgumentException("gob: custom-marshaler types unsupported")
    }
    if (result == null) throw new IllegalArgumentException("gob: empty wireType")
    result
  }

  // --------------------------------------------------------------- values

  private def readValue(r: Reader, typeId: Long,
                        defs: Map[Long, WireDef], depth: Int): Any = {
    if (depth > 64) throw new IllegalArgumentException("gob: nesting too deep")
    typeId match {
      case TBool => r.readUintBits() != 0L
      case TInt => r.readInt()
      case TUint => uintValue(r.readUintBits())
      case TFloat => r.readFloat()
      case TBytes => r.readBytes()
      case TString => r.readString()
      case TComplex => { r.readFloat(); r.readFloat(); null } // no Catalyst target
      case TInterface =>
        // concrete type name, type id, then a byte-counted value: the
        // concrete Go type does not exist here — skip the payload, NULL out
        val nameLen = r.readCount(); r.skip(nameLen)
        if (nameLen > 0) { r.readInt(); r.skip(r.readCount()) }
        null
      case id => defs.get(id) match {
        case Some(StructDef(fields)) =>
          var pairs = Vector.empty[(Any, Any)]
          readStructFields(r) { f =>
            if (f >= fields.length)
              throw new IllegalArgumentException(s"gob: field $f out of range")
            pairs :+= (fields(f)._1 -> readValue(r, fields(f)._2, defs, depth + 1))
          }
          MsgPack.RawMap(pairs)
        case Some(SliceDef(elem)) =>
          val n = r.readBoundedCount()
          Vector.fill(n)(readValue(r, elem, defs, depth + 1))
        case Some(ArrDef(elem, _)) =>
          val n = r.readBoundedCount()
          Vector.fill(n)(readValue(r, elem, defs, depth + 1))
        case Some(MapDef(key, elem)) =>
          val n = r.readBoundedCount()
          MsgPack.RawMap(Vector.fill(n)(
            (readValue(r, key, defs, depth + 1), readValue(r, elem, defs, depth + 1))))
        case None => throw new IllegalArgumentException(s"gob: unknown type id $id")
      }
    }
  }

  /** Parse a full gob stream: type-definition messages, then ONE value
    * message (the `gobber.Serialize` shape). */
  private[functions] def parse(bytes: Array[Byte]): Any = {
    val r = new Reader(bytes)
    var defs = Map.empty[Long, WireDef]
    var messages = 0
    while (r.hasMore) {
      messages += 1
      if (messages > 1024) throw new IllegalArgumentException("gob: runaway stream")
      val len = r.readCount()
      // Long arithmetic: a near-Int.MaxValue frame length would overflow
      // `pos + len` to a negative end and slip past this check (benign
      // downstream — a negative end never equals pos — but the bounds
      // check should REJECT the hostile frame, same as readBoundedCount)
      val end = r.pos.toLong + len
      if (end > bytes.length) throw new IllegalArgumentException("gob: truncated message")
      val typeId = r.readInt()
      if (typeId < 0) { // type definition
        defs += (-typeId) -> readWireType(r)
        if (r.pos != end) throw new IllegalArgumentException("gob: trailing def bytes")
      } else {
        val isStruct = defs.get(typeId).exists(_.isInstanceOf[StructDef])
        // non-struct top-level values ride as a singleton field: delta 0
        val v =
          if (isStruct) readValue(r, typeId, defs, 0)
          else {
            if (r.readCount() != 0)
              throw new IllegalArgumentException("gob: bad singleton delta")
            readValue(r, typeId, defs, 0)
          }
        if (r.pos != end) throw new IllegalArgumentException("gob: trailing value bytes")
        return v
      }
    }
    throw new IllegalArgumentException("gob: no value message")
  }

  private[functions] def decode(bytes: Array[Byte], dt: DataType): Any =
    try MsgPack.convert(parse(bytes), dt)
    catch { case scala.util.control.NonFatal(_) => null }

  // ---------------------------------------------------------------- writer

  private final class Writer {
    val out = new java.io.ByteArrayOutputStream(64)
    def writeUintBits(v: Long): Unit =
      if (v >= 0 && v < 0x80) out.write(v.toInt)
      else {
        var n = 8
        while (n > 1 && (v >>> ((n - 1) * 8)) == 0L) n -= 1
        out.write(256 - n)
        var i = n - 1
        while (i >= 0) { out.write(((v >>> (i * 8)) & 0xff).toInt); i -= 1 }
      }
    def writeInt(v: Long): Unit =
      writeUintBits(if (v >= 0) v << 1 else (~v << 1) | 1L)
    def writeFloat(v: Double): Unit =
      writeUintBits(java.lang.Long.reverseBytes(java.lang.Double.doubleToLongBits(v)))
    def writeBytes(b: Array[Byte]): Unit = { writeUintBits(b.length.toLong); out.write(b) }
    def writeString(s: String): Unit = writeBytes(s.getBytes(StandardCharsets.UTF_8))
  }

  /** Composite types need wire definitions; this assigns ids depth-first
    * from 65 (components before containers, like Go) and returns
    * (type id, definition messages in emit order). */
  private def planTypes(dt: DataType): (Long, Vector[Array[Byte]]) = {
    var nextId = FirstUserId
    var defs = Vector.empty[Array[Byte]]

    def defMessage(id: Long)(body: Writer => Unit): Unit = {
      val w = new Writer
      w.writeInt(-id) // negative id = definition
      body(w)
      defs :+= w.out.toByteArray
    }
    def common(w: Writer, id: Long): Unit = {
      // commonType { Name(0), Id(1) }: name is informational — emit Id only
      w.writeUintBits(2); w.writeInt(id); w.writeUintBits(0)
    }
    def assign(t: DataType): Long = t match {
      case BooleanType => TBool
      case ByteType | ShortType | IntegerType | LongType => TInt
      // decimal(<=18,0) always fits a signed 64-bit int — ride TInt so
      // negative values encode; wider decimals are the u64 carrier, whose
      // per-row contract (negatives/65-bit refuse loudly) matches the
      // msgpack twin's — silently emitting wrong low bits would round-trip
      // to a DIFFERENT number
      case d: DecimalType if d.scale == 0 && d.precision <= 18 => TInt
      case d: DecimalType if d.scale == 0 => TUint // the u64 carrier
      case FloatType | DoubleType => TFloat
      case StringType => TString
      case BinaryType => TBytes
      case ArrayType(et, _) =>
        val elemId = assign(et)
        val id = nextId; nextId += 1
        defMessage(id) { w =>
          w.writeUintBits(WSlice + 1) // wireType field delta -> SliceT
          w.writeUintBits(1); common(w, id) // sliceType field 0: commonType
          w.writeUintBits(1); w.writeInt(elemId) // field 1: Elem
          w.writeUintBits(0) // end sliceType
          w.writeUintBits(0) // end wireType
        }
        id
      case MapType(StringType, vt, _) =>
        val elemId = assign(vt)
        val id = nextId; nextId += 1
        defMessage(id) { w =>
          w.writeUintBits(WMap + 1)
          w.writeUintBits(1); common(w, id)
          w.writeUintBits(1); w.writeInt(TString) // Key
          w.writeUintBits(1); w.writeInt(elemId) // Elem
          w.writeUintBits(0); w.writeUintBits(0)
        }
        id
      case st: StructType =>
        val fieldIds = st.fields.map(f => f.name -> assign(f.dataType))
        val id = nextId; nextId += 1
        defMessage(id) { w =>
          w.writeUintBits(WStruct + 1)
          w.writeUintBits(1); common(w, id)
          w.writeUintBits(1) // structType field 1: Field []fieldType
          w.writeUintBits(fieldIds.length.toLong)
          fieldIds.foreach { case (name, fid) =>
            // fieldType { Name(0), Id(1) }
            w.writeUintBits(1); w.writeString(name)
            w.writeUintBits(1); w.writeInt(fid)
            w.writeUintBits(0)
          }
          w.writeUintBits(0); w.writeUintBits(0)
        }
        id
      case other => throw new UnsupportedOperationException(s"gob pack: $other")
    }
    val id = assign(dt)
    (id, defs)
  }

  private def writeValue(w: Writer, v: Any, dt: DataType): Unit = dt match {
    case BooleanType => w.writeUintBits(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case ByteType => w.writeInt(v.asInstanceOf[Byte].toLong)
    case ShortType => w.writeInt(v.asInstanceOf[Short].toLong)
    case IntegerType => w.writeInt(v.asInstanceOf[Int].toLong)
    case LongType => w.writeInt(v.asInstanceOf[Long])
    case d: DecimalType =>
      val bi = v.asInstanceOf[Decimal].toJavaBigDecimal.toBigIntegerExact
      if (d.precision <= 18) w.writeInt(bi.longValue()) // signed carrier
      else {
        if (bi.signum() < 0 || bi.bitLength() > 64)
          throw new ArithmeticException(s"gob pack: $bi does not fit uint64")
        w.writeUintBits(bi.longValue())
      }
    case FloatType => w.writeFloat(v.asInstanceOf[Float].toDouble)
    case DoubleType => w.writeFloat(v.asInstanceOf[Double])
    case StringType => w.writeString(v.toString)
    case BinaryType => w.writeBytes(v.asInstanceOf[Array[Byte]])
    case ArrayType(et, _) =>
      val a = v.asInstanceOf[ArrayData]
      w.writeUintBits(a.numElements().toLong)
      var i = 0
      while (i < a.numElements()) {
        val e = a.get(i, et)
        if (e == null) throw new UnsupportedOperationException(
          "gob pack: NULL array elements are not representable in gob")
        writeValue(w, e, et); i += 1
      }
    case MapType(StringType, vt, _) =>
      val m = v.asInstanceOf[MapData]
      w.writeUintBits(m.numElements().toLong)
      val ks = m.keyArray(); val vs = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        w.writeString(ks.getUTF8String(i).toString)
        val e = vs.get(i, vt)
        if (e == null) throw new UnsupportedOperationException(
          "gob pack: NULL map values are not representable in gob")
        writeValue(w, e, vt); i += 1
      }
    case st: StructType =>
      val r = v.asInstanceOf[InternalRow]
      var prev = -1
      var i = 0
      while (i < st.length) {
        if (!r.isNullAt(i)) { // NULL fields elide, like Go zero values
          w.writeUintBits((i - prev).toLong)
          writeValue(w, r.get(i, st.fields(i).dataType), st.fields(i).dataType)
          prev = i
        }
        i += 1
      }
      w.writeUintBits(0)
    case other => throw new UnsupportedOperationException(s"gob pack: $other")
  }

  /** Precomputed encode state: the top-level type id plus the type
    * definition messages ALREADY FRAMED as wire bytes. Both depend only
    * on the static DataType, so [[GobEncode]] builds this once per
    * expression instance — re-planning (and re-serializing every
    * definition message) per row would spend more cycles on the static
    * prefix than on the value itself for small bodies. */
  private[functions] final class EncodePlan(val typeId: Long, val defHeader: Array[Byte])

  private[functions] def plan(dt: DataType): EncodePlan = {
    val (typeId, defMessages) = planTypes(dt)
    val out = new java.io.ByteArrayOutputStream(64)
    defMessages.foreach { payload =>
      val w = new Writer; w.writeUintBits(payload.length.toLong)
      out.write(w.out.toByteArray); out.write(payload)
    }
    new EncodePlan(typeId, out.toByteArray)
  }

  private[functions] def encodeWith(p: EncodePlan, v: Any, dt: DataType): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    out.write(p.defHeader, 0, p.defHeader.length)
    val w = new Writer
    w.writeInt(p.typeId)
    if (!dt.isInstanceOf[StructType]) w.writeUintBits(0) // singleton delta
    writeValue(w, v, dt)
    val payload = w.out.toByteArray
    val lw = new Writer; lw.writeUintBits(payload.length.toLong)
    out.write(lw.out.toByteArray, 0, lw.out.size()); out.write(payload, 0, payload.length)
    out.toByteArray
  }

  private[functions] def encode(v: Any, dt: DataType): Array[Byte] =
    encodeWith(plan(dt), v, dt)

  /** Analysis-time supportability walk (driver error, never a task throw).
    * Interface payloads and non-string map keys have no gob mapping here. */
  private[functions] def unsupported(dt: DataType): Option[String] =
    CodecTypes.unsupported(dt, "gob") // shared walk — see CodecTypes
}

/** `gob_pack(value)`: a Go-readable gob stream of any packable column. */
case class GobEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  // the wire-type plan depends only on the child's static type: built once
  // per expression instance (per task after serialization), not per row
  @transient private lazy val encodePlan = Gob.plan(child.dataType)
  override def checkInputDataTypes(): TypeCheckResult =
    Gob.unsupported(child.dataType) match {
      case None => TypeCheckResult.TypeCheckSuccess
      case Some(t) => TypeCheckResult.TypeCheckFailure(s"gob pack: unsupported type $t")
    }
  override def nullSafeEval(input: Any): Any =
    Gob.encodeWith(encodePlan, input, child.dataType)
  override protected def withNewChildInternal(newChild: Expression): GobEncode =
    copy(child = newChild)
}

/** `gob_unpack(bytes, schema)`: typed decode of a legacy GOB body; NULL on
  * corrupt input or any shape/type mismatch. */
case class GobDecode(child: Expression, targetType: DataType)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = targetType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"gob unpack: input must be binary, got ${child.dataType}")
    else Gob.unsupported(targetType) match {
      case None => TypeCheckResult.TypeCheckSuccess
      case Some(t) => TypeCheckResult.TypeCheckFailure(s"gob unpack: unsupported target type $t")
    }
  override def nullSafeEval(input: Any): Any =
    Gob.decode(input.asInstanceOf[Array[Byte]], targetType)
  override protected def withNewChildInternal(newChild: Expression): GobDecode =
    copy(child = newChild)
}
