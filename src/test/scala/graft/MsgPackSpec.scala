package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.MsgPack

/**
 * MessagePack ingestion: round-trips through the public wire format and the
 * reference's missing-path/nil/type-mismatch => NULL semantics
 * (reference: app/server/gateway/filter.go:58-70,315-390).
 */
class MsgPackSpec extends SparkSpec {
  import spark.implicits._

  private val nested = StructType(Seq(
    StructField("name", StringType),
    StructField("age", LongType),
    StructField("score", DoubleType),
    StructField("tags", ArrayType(StringType)),
    StructField("address", StructType(Seq(
      StructField("city", StringType),
      StructField("zip", IntegerType)))),
    StructField("attrs", MapType(StringType, LongType)),
    StructField("blob", BinaryType),
    StructField("active", BooleanType)))

  test("nested body round-trips: struct, array, map, binary, bool, null field") {
    val df = Seq(
      ("k1", "ann", Some(34L), Some(2.5), Seq("a", "b"), Some(("oslo", 1234)),
        Map("x" -> 1L, "y" -> 2L), Array[Byte](1, 2, 3), true),
      ("k2", null, None: Option[Long], None: Option[Double], null,
        None: Option[(String, Int)], null, null, false))
      .toDF("k", "name", "age", "score", "tags", "addr", "attrs", "blob", "active")
      .select(col("k"), MsgPack.pack(struct(
        col("name"), col("age"), col("score"), col("tags"),
        col("addr._1").as("city"), col("addr._2").as("zip"),
        col("attrs"), col("blob"), col("active"))).as("body"))
      // re-nest: the packed struct is flat (city/zip at top) — decode with a
      // DIFFERENT shape to also prove missing-path => NULL on `address`
      .select(col("k"), MsgPack.unpack(col("body"), nested).as("d"))
      .select(col("k"), col("d.name"), col("d.age"), col("d.score"),
        col("d.tags"), col("d.address"), col("d.attrs"), col("d.blob"), col("d.active"))

    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    val r1 = rows("k1")
    assert(r1.getString(1) == "ann" && r1.getLong(2) == 34L && r1.getDouble(3) == 2.5)
    assert(r1.getSeq[String](4) == Seq("a", "b"))
    assert(r1.isNullAt(5), "address was never packed as a nested struct => NULL")
    assert(r1.getMap[String, Long](6) == Map("x" -> 1L, "y" -> 2L))
    assert(r1.getAs[Array[Byte]](7).toSeq == Seq[Byte](1, 2, 3))
    assert(r1.getBoolean(8))
    val r2 = rows("k2")
    for (i <- 1 to 7) assert(r2.isNullAt(i), s"k2 field $i should be NULL")
    assert(!r2.getBoolean(8))
  }

  test("nested struct round-trips when packed nested") {
    val schema = StructType(Seq(
      StructField("address", StructType(Seq(
        StructField("city", StringType), StructField("zip", IntegerType))))))
    val got = Seq(("oslo", 1234)).toDF("city", "zip")
      .select(MsgPack.unpack(
        MsgPack.pack(struct(struct(col("city"), col("zip")).as("address"))),
        schema).as("d"))
      .select(col("d.address.city"), col("d.address.zip"))
      .collect().head
    assert(got.getString(0) == "oslo" && got.getInt(1) == 1234)
  }

  test("missing field, type mismatch, corrupt bytes, magic prefix") {
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("never_written", StringType), // missing path
      StructField("age", StringType)))          // int body vs string target
    val body = MsgPack.pack(struct(lit("ann").as("name"), lit(34L).as("age")))
    val got = spark.range(1).select(MsgPack.unpack(body, schema).as("d"))
      .select(col("d.name"), col("d.never_written"), col("d.age")).collect().head
    assert(got.getString(0) == "ann")
    assert(got.isNullAt(1), "missing path must be NULL")
    assert(got.isNullAt(2), "type-mismatched value must be NULL, not coerced")

    // corrupt: truncated buffer => NULL row, no throw
    val corrupt = spark.range(1)
      .select(MsgPack.unpack(lit(Array[Byte](0x81.toByte, 0xa3.toByte, 'x')), schema))
      .collect().head
    assert(corrupt.isNullAt(0))

    // reference-SDK framing: 0xC7 0x00 magic prefix is stripped (filter.go:58-70)
    val framed = spark.range(1).select(
      MsgPack.unpack(concat(lit(Array[Byte](0xC7.toByte, 0x00)), body), schema).as("d"))
      .select(col("d.name")).collect().head
    assert(framed.getString(0) == "ann")
  }

  test("hostile declared sizes NULL out before any allocation") {
    // bin32 / str32 / array32 / map32 prefixes declaring sizes the 5-byte
    // input cannot back: the parser must refuse BEFORE `new Array` — a
    // trusted prefix here is a 2 GiB allocation from a handful of bytes
    // (the same bomb class the GOB reader's hostile test caught)
    def un(b: Array[Byte]) =
      Seq(Tuple1(b)).toDF("raw")
        .select(MsgPack.unpack(col("raw"), StringType).as("v"))
        .collect().head.get(0)
    val hostile = Seq(
      Array(0xc6, 0x7f, 0xff, 0xff, 0xff), // bin32: 2 GiB declared
      Array(0xdb, 0x7f, 0xff, 0xff, 0xff), // str32: 2 GiB declared
      Array(0xc6, 0xff, 0xff, 0xff, 0xff), // bin32: negative after getInt
      Array(0xdc, 0xff, 0xff),             // array16: 65535 elems, 0 bytes
      Array(0xdf, 0x7f, 0xff, 0xff, 0xff), // map32: 2^31-1 pairs
      Array(0xc9, 0x7f, 0xff, 0xff, 0xff, 0x01)) // ext32: 2 GiB skip
    hostile.foreach { h =>
      assert(un(h.map(_.toByte)) == null, s"hostile ${h.map(x => f"$x%02x").mkString(" ")}")
    }
  }

  test("integer width laddering and u64 as Decimal(20,0)") {
    val schema = StructType(Seq(
      StructField("small", ByteType),
      StructField("neg", ShortType),
      StructField("wide", LongType),
      StructField("u64", DecimalType(20, 0)),
      StructField("overflow", ByteType))) // 300 can't be a byte => NULL
    val big = Decimal(BigDecimal("18446744073709551615")) // 2^64-1
    val body = MsgPack.pack(struct(
      lit(7L).as("small"), lit(-42L).as("neg"), lit(1L << 40).as("wide"),
      lit(big).cast(DecimalType(20, 0)).as("u64"), lit(300L).as("overflow")))
    val got = spark.range(1).select(MsgPack.unpack(body, schema).as("d"))
      .select(col("d.small"), col("d.neg"), col("d.wide"), col("d.u64"), col("d.overflow"))
      .collect().head
    assert(got.getByte(0) == 7 && got.getShort(1) == -42 && got.getLong(2) == (1L << 40))
    assert(got.getDecimal(3).toPlainString == "18446744073709551615")
    assert(got.isNullAt(4), "out-of-range narrow target must be NULL")
  }

  test("shape mismatches are NULL, never mangled values") {
    import graft.functions.{MsgPackDecode, MsgPackEncode}
    import org.apache.spark.sql.GraftBridge
    // a map body against an ARRAY target must be NULL (not [null, ...]);
    // an empty ARRAY against a STRUCT target must be NULL (not all-NULL
    // fields) — empty map vs empty array are distinguishable wire forms
    val mapBody = MsgPack.pack(struct(lit(1L).as("a")))
    val emptyArr = MsgPack.pack(array().cast(ArrayType(LongType)))
    val st = StructType(Seq(StructField("a", LongType)))
    val r = spark.range(1).select(
      MsgPack.unpack(mapBody, ArrayType(LongType)).as("m_as_arr"),
      MsgPack.unpack(emptyArr, st).as("arr_as_struct"),
      MsgPack.unpack(MsgPack.pack(map(lit("x"), lit(1L))), MapType(StringType, LongType))
        .as("map_ok")).collect().head
    assert(r.isNullAt(0), s"map body vs array target must be NULL: $r")
    assert(r.isNullAt(1), s"empty array vs struct target must be NULL: $r")
    assert(r.getMap[String, Long](2) == Map("x" -> 1L))
    // duplicate map keys: LAST occurrence wins and the MapData has unique
    // keys (hand-built wire bytes: fixmap{2} "k":1 "k":2)
    val dup = Array[Byte](0x82.toByte, 0xa1.toByte, 'k', 0x01, 0xa1.toByte, 'k', 0x02)
    val m = spark.range(1)
      .select(MsgPack.unpack(lit(dup), MapType(StringType, LongType)).as("m"))
      .collect().head.getMap[String, Long](0)
    assert(m == Map("k" -> 2L), s"duplicate keys must keep the last: $m")
  }

  test("decimal past 64 bits refuses loudly instead of truncating") {
    // 2^64 has bitLength 65 — emitting its low 64 bits would round-trip to
    // a DIFFERENT number; the encoder must throw, not corrupt
    val over = Decimal(BigDecimal("18446744073709551616")) // 2^64
    // (surfaces raw from constant folding on a literal, wrapped in
    // SparkException from an executor — accept either carrier)
    val e = intercept[Exception] {
      spark.range(1).select(MsgPack.pack(
        lit(over).cast(DecimalType(20, 0)))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("does not fit")), msgs(e).mkString(" | "))
  }

  test("canonical integer widths on the wire: small ints are small") {
    // fixint 7 is ONE byte; the 9-byte int64 form would triple id-heavy
    // body sizes at a terabyte ingestion boundary
    val sizes = spark.range(1).select(
      length(MsgPack.pack(lit(7L))).as("fix"),
      length(MsgPack.pack(lit(300L))).as("u16"),
      length(MsgPack.pack(lit(-5L))).as("negfix"),
      length(MsgPack.pack(lit(1L << 40))).as("i64")).collect().head
    assert(sizes.getInt(0) == 1 && sizes.getInt(1) == 3 &&
      sizes.getInt(2) == 1 && sizes.getInt(3) == 9, sizes.toString)
  }
}
