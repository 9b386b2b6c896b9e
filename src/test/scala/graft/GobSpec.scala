package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{Gob, MsgPack}

/**
 * GOB bridge suite. Ground truth is the byte-level example worked in Go's
 * encoding/gob package documentation (the `Point{22, 33}` stream) plus the
 * scalar encodings the format spec fixes exactly — these pin the DECODER to
 * the real wire format without needing a Go toolchain in the loop; the
 * encoder is then held to decode∘encode = identity on top of those pins.
 */
class GobSpec extends SparkSpec {
  import spark.implicits._

  private def bytes(hex: String): Array[Byte] =
    hex.split("\\s+").filter(_.nonEmpty).map(Integer.parseInt(_, 16).toByte)

  private def decodeOne(b: Array[Byte], dt: DataType): Any = {
    val df = Seq(Tuple1(b)).toDF("raw")
    df.select(Gob.unpack(col("raw"), dt).as("v")).collect().head.get(0)
  }

  test("decodes the documented encoding/gob Point example byte-for-byte") {
    // struct Point { X, Y int } with value Point{22, 33}: the exact stream
    // printed in the encoding/gob package docs (type definition message for
    // id 65, then the value message)
    val stream = bytes(
      "1f ff 81 03 01 01 05 50 6f 69 6e 74 01 ff 82 00 01 02 01 01 58 01 04 00 01 01 59 01 04 00 00 00" +
        " 07 ff 82 01 2c 01 42 00")
    val row = decodeOne(stream, StructType(Seq(
      StructField("X", LongType), StructField("Y", LongType))))
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(row.getLong(0) == 22L && row.getLong(1) == 33L)
  }

  test("decodes spec-fixed scalar streams: int, float, string, bool, uint") {
    // int 5: type id 2 (signed 04), singleton delta 0, value 5<<1 = 0x0a
    assert(decodeOne(bytes("03 04 00 0a"), LongType) == 5L)
    // int -3: value = (~(-3) << 1) | 1 = (2 << 1) | 1 = 5
    assert(decodeOne(bytes("03 04 00 05"), LongType) == -3L)
    // float 17.0: bits reversed -> 0x4031 -> "fe 31 40" (the doc's example)
    assert(decodeOne(bytes("05 08 00 fe 31 40"), DoubleType) == 17.0)
    // string "hi": type id 6 (signed 0c), len 2
    assert(decodeOne(bytes("05 0c 00 02 68 69"), StringType) == "hi")
    // bool true: type id 1 (signed 02), uint 1
    assert(decodeOne(bytes("03 02 00 01"), BooleanType) == true)
    // uint 300: type id 3 (signed 06), 300 needs 2 bytes -> fe 01 2c
    assert(decodeOne(bytes("05 06 00 fe 01 2c"), LongType) == 300L)
  }

  test("corrupt, truncated, and type-mismatched streams decode to NULL") {
    assert(decodeOne(bytes("03 04 00"), LongType) == null) // truncated value
    assert(decodeOne(bytes("ff 04 00 0a"), LongType) == null) // bad length
    assert(decodeOne(Array.emptyByteArray, LongType) == null)
    // valid int stream against a string target: mismatch => NULL
    assert(decodeOne(bytes("03 04 00 0a"), StringType) == null)
  }

  test("hostile length/count prefixes NULL out before any allocation") {
    // a 5-byte stream claiming a 2 GiB string: the length prefix passes
    // the Int range check but exceeds the remaining buffer — the reader
    // must refuse BEFORE copying/allocating, not trust the prefix
    // (decompression-bomb discipline: the declared size never drives an
    // allocation the input bytes cannot back)
    assert(decodeOne(bytes("07 0c 00 fc 7f ff ff ff"), StringType) == null)
    // length prefix past Int.MaxValue (8-byte uint)
    assert(decodeOne(bytes("0b 0c 00 f8 7f ff ff ff ff ff ff ff"), StringType) == null)
    // message framing itself claims 2 GiB
    assert(decodeOne(bytes("fc 7f ff ff ff 0c 00"), StringType) == null)
    // a []int value message declaring 2^31-1 elements after a VALID slice
    // type definition (def message hand-assembled per the wire spec: id 65
    // = slice of TInt): the element count must be bounded by remaining
    // bytes before any per-element loop begins
    val hugeSlice = bytes(
      "0c ff 81 02 01 02 ff 82 00 01 04 00 00" + // def: type 65 []int
        " 08 ff 82 00 fc 7f ff ff ff") // value message: count 0x7fffffff
    assert(decodeOne(hugeSlice, ArrayType(LongType)) == null)
    // same stream with an HONEST count decodes fine — the def above is
    // valid, so the hostile case fails on the count, not the framing
    val okSlice = bytes(
      "0c ff 81 02 01 02 ff 82 00 01 04 00 00 06 ff 82 00 02 02 04")
    assert(decodeOne(okSlice, ArrayType(LongType)) ==
      scala.collection.immutable.ArraySeq(1L, 2L))
  }

  test("300 random corruptions of valid streams: decode never throws, value or NULL") {
    // robustness fuzz: bit flips, truncations, and splices over a real
    // encoded stream must always land as NULL or a value — never an
    // executor exception (the decode contract the scaladoc promises)
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("n", LongType),
      StructField("tags", ArrayType(StringType)),
      StructField("counts", MapType(StringType, LongType))))
    val valid = spark.sql(
      """SELECT named_struct('name', 'doc', 'n', CAST(7 AS BIGINT),
        |  'tags', array('x','y'), 'counts', map('a', CAST(1 AS BIGINT))) AS v"""
        .stripMargin)
      .select(Gob.pack(col("v")).as("b")).collect().head.getAs[Array[Byte]](0)
    val rnd = new scala.util.Random(0xC0FFEE)
    val corrupted = (1 to 300).map { i =>
      val b = valid.clone()
      rnd.nextInt(3) match {
        case 0 => // flip 1-3 bytes anywhere (length prefixes included)
          (0 until rnd.nextInt(3) + 1).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
          (i.toLong, b)
        case 1 => (i.toLong, b.take(rnd.nextInt(b.length))) // truncate
        case _ => // splice two halves at misaligned offsets
          (i.toLong, b.take(rnd.nextInt(b.length)) ++ b.drop(rnd.nextInt(b.length)))
      }
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(corrupted.map { case (id, b) =>
        org.apache.spark.sql.Row(id, b) }, 4),
      StructType(Seq(StructField("id", LongType), StructField("raw", BinaryType))))
    // collect() forces every decode; any executor throw fails the test
    val out = df.select(Gob.unpack(col("raw"), schema)).collect()
    assert(out.length == 300)
  }

  test("decode∘encode is the identity across the supported type tree") {
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("n", LongType),
      StructField("small", IntegerType),
      StructField("flag", BooleanType),
      StructField("score", DoubleType),
      StructField("ratio", FloatType),
      StructField("blob", BinaryType),
      StructField("tags", ArrayType(StringType)),
      StructField("counts", MapType(StringType, LongType)),
      StructField("u64", DecimalType(20, 0)),
      StructField("nested", StructType(Seq(
        StructField("a", LongType), StructField("b", StringType))))))
    val df = spark.sql(
      """SELECT named_struct(
        |  'name', 'doc-1', 'n', CAST(-987654321 AS BIGINT),
        |  'small', 42, 'flag', true, 'score', 2.5D,
        |  'ratio', CAST(0.25 AS FLOAT), 'blob', CAST('raw' AS BINARY),
        |  'tags', array('x', 'y', 'z'),
        |  'counts', map('a', CAST(1 AS BIGINT), 'b', CAST(2 AS BIGINT)),
        |  'u64', CAST('18446744073709551615' AS DECIMAL(20,0)),
        |  'nested', named_struct('a', CAST(7 AS BIGINT), 'b', 'inner')
        |) AS v""".stripMargin)
    val back = df.select(Gob.unpack(Gob.pack(col("v")), schema).as("r"))
      .select(col("r.*")).collect().head
    assert(back.getString(0) == "doc-1")
    assert(back.getLong(1) == -987654321L)
    assert(back.getInt(2) == 42)
    assert(back.getBoolean(3))
    assert(back.getDouble(4) == 2.5)
    assert(back.getFloat(5) == 0.25f)
    assert(new String(back.getAs[Array[Byte]](6)) == "raw")
    assert(back.getSeq[String](7) == Seq("x", "y", "z"))
    assert(back.getMap[String, Long](8) == Map("a" -> 1L, "b" -> 2L))
    assert(back.getDecimal(9).toBigInteger.toString == "18446744073709551615")
    assert(back.getStruct(10).getLong(0) == 7L)
    assert(back.getStruct(10).getString(1) == "inner")
  }

  test("scale-0 decimals: negative values roundtrip on the signed carrier (p<=18)") {
    val schema = StructType(Seq(StructField("v", DecimalType(18, 0))))
    val back = spark.sql(
      "SELECT named_struct('v', CAST(-42 AS DECIMAL(18,0))) AS s")
      .select(Gob.unpack(Gob.pack(col("s")), schema).as("r"))
      .select(col("r.v")).collect().head
    assert(back.getDecimal(0).longValueExact() == -42L)
  }

  test("NULL fields elide on the wire and come back NULL (Go zero elision)") {
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", LongType),
      StructField("c", StringType)))
    val back = spark.sql(
      "SELECT named_struct('a', CAST(NULL AS STRING), 'b', CAST(9 AS BIGINT), 'c', 'keep') AS v")
      .select(Gob.unpack(Gob.pack(col("v")), schema).as("r"))
      .select(col("r.*")).collect().head
    assert(back.isNullAt(0) && back.getLong(1) == 9L && back.getString(2) == "keep")
  }

  test("the documented migration chain: gob body -> msgpack body, identity end to end") {
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("lang", StringType),
      StructField("missing", LongType)))
    val out = Seq(("web", "en"), ("books", "de")).toDF("source", "lang")
      .select(Gob.pack(struct(col("source"), col("lang"))).as("legacy"))
      .select(MsgPack.pack(Gob.unpack(col("legacy"), schema)).as("migrated"))
      .select(MsgPack.unpack(col("migrated"), schema).as("b"))
      .select(col("b.source"), col("b.lang"), col("b.missing"))
      .collect().map(r => (r.getString(0), r.getString(1), r.isNullAt(2))).toSet
    assert(out == Set(("web", "en", true), ("books", "de", true)))
  }

  test("unsupported target types fail at analysis, not per row") {
    val df = Seq(Tuple1(Array[Byte](1, 2))).toDF("raw")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(Gob.unpack(col("raw"), MapType(LongType, StringType))).collect()
    }
    assert(e.getMessage.contains("gob"))
  }
}
