package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.filters._
import graft.functions.{VectorFunctions => VF}

/**
 * Law-style properties for the expression compiler (SURVEY.md §7.4-6):
 * quantifier laws, null discipline, custom-expression/HOF equivalence.
 * Fixed-seed pseudo-random fuzz — same style as the reference's property
 * tests (reference: msgpackpatch/property_test.go:12-27, seed 0xC0FFEE).
 */
class PropertiesSpec extends SparkSpec {

  private val rnd = new scala.util.Random(0xC0FFEE)

  private def randArr(): Seq[Long] =
    Seq.fill(rnd.nextInt(8))(rnd.nextLong() % 16)

  private def evalQuant(arrs: Seq[Option[Seq[Long]]], q: Quantifier): Seq[Boolean] = {
    val rows = arrs.zipWithIndex.map { case (a, i) => Row(i.toLong, a.orNull) }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows),
      StructType(Seq(StructField("id", LongType), StructField("xs", ArrayType(LongType)))))
    // empty relative path => the element itself is the comparand
    val pred = NestedSliceWhere(FieldRef.Path(Seq("xs")), q,
      Cmp(FieldRef.Path(Seq.empty), CmpOp.GreaterThan, 7L))
    // evaluate at the WHERE boundary: NULL (missing slice) = no match
    df.withColumn("m", coalesce(FilterCompiler.compile(pred, df), lit(false)))
      .orderBy("id").select("m").collect().map(_.getBoolean(0)).toSeq
  }

  test("quantifier laws over 200 random slices (ANY=!NONE, ANY=COUNT>=1, empty-slice table)") {
    val arrs = Seq.fill(200)(randArr())
    val opts = arrs.map(Option(_))
    val any = evalQuant(opts, Quantifier.Any)
    val none = evalQuant(opts, Quantifier.None)
    val all = evalQuant(opts, Quantifier.All)
    val cnt = evalQuant(opts, Quantifier.Count(CmpOp.GreaterThanOrEqual, 1))
    arrs.indices.foreach { i =>
      assert(any(i) == !none(i), s"ANY == !NONE violated: ${arrs(i)}")
      assert(any(i) == cnt(i), s"ANY == COUNT>=1 violated: ${arrs(i)}")
      assert(any(i) == arrs(i).exists(_ > 7))
      assert(all(i) == arrs(i).forall(_ > 7))
      if (arrs(i).isEmpty) assert(!any(i) && all(i) && none(i))
    }
  }

  test("null slice never matches any quantifier") {
    val r = Seq(Quantifier.Any, Quantifier.All, Quantifier.None,
      Quantifier.Count(CmpOp.Equal, 0)).map(q => evalQuant(Seq(None), q).head)
    assert(r == Seq(false, false, false, false))
  }

  test("custom cosine expression == HOF formulation on 50 random vectors") {
    val vecs = Seq.fill(50)(Seq.fill(16)(rnd.nextFloat() * 2 - 1))
    val q = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }),
      StructType(Seq(StructField("id", LongType), StructField("v", ArrayType(FloatType)))))
    df.select(VF.cosine(col("v"), q).as("fast"), VF.cosineHof(col("v"), q).as("ref"))
      .collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("TokenSlotsExpr/TokenSlotFoldExpr == hash32 Column chain on 200 " +
       "random token arrays (incl. empty strings and non-ASCII)") {
    import graft.functions.{TextFunctions => TF, TokenSlotFunctions => TS}
    val B = 97 // prime, not a power of two — exercises the modulo honestly
    val alphabet = Seq("a", "bb", "", "Zebra", "héllo", "日本語", "x#y", "...")
    val texts = Seq.fill(200)(
      Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length)))
        .mkString(" "))
    val lut = Array.fill(B)(rnd.nextLong() % 1000000L)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.zipWithIndex.map { case (s, i) => Row(i.toLong, s) }),
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))
    val lutCol = typedlit(lut.toSeq)
    df.select(
        TS.tokenSlots(TF.tokens(col("text")), B).as("fast"),
        transform(TF.tokens(col("text")),
          t => pmod(TF.hash32(t), lit(B.toLong))).as("ref"),
        TS.tokenSlotFold(TF.tokens(col("text")), lut).as("fastSum"),
        aggregate(TF.tokens(col("text")), lit(0L), (acc, t) =>
          acc + element_at(lutCol,
            (pmod(TF.hash32(t), lit(B.toLong)) + lit(1L)).cast(IntegerType)))
          .as("refSum"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"slots diverged: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
        assert(r.getLong(2) == r.getLong(3),
          s"fold diverged: ${r.getLong(2)} vs ${r.getLong(3)}")
      }
  }

  test("DsirFeatureSlots/FoldExpr == the unigram+bigram hash32 Column chain " +
       "on 200 random texts (incl. empty strings, non-ASCII, 1-token docs)") {
    import graft.functions.{TextFunctions => TF, TokenSlotFunctions => TS}
    val B = 97
    val alphabet = Seq("a", "bb", "", "Zebra", "héllo", "日本語", "x#y", "...")
    val texts = Seq.fill(200)(
      Seq.fill(rnd.nextInt(10))(alphabet(rnd.nextInt(alphabet.length)))
        .mkString(" "))
    val lut = Array.fill(B)(rnd.nextLong() % 1000000L)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.zipWithIndex.map { case (s, i) => Row(i.toLong, s) }),
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))
    val lutCol = typedlit(lut.toSeq)
    def refFeatures = element_at(
      transform(array(TF.tokens(col("text"))), toks =>
        concat(toks, TF.wordBigrams(toks))), 1)
    df.select(
        TS.dsirFeatureSlots(TF.tokens(col("text")), B).as("fast"),
        transform(refFeatures,
          f => pmod(TF.hash32(f), lit(B.toLong))).as("ref"),
        TS.dsirFeatureFold(TF.tokens(col("text")), lut).as("fastSum"),
        aggregate(refFeatures, lit(0L), (acc, f) =>
          acc + element_at(lutCol,
            (pmod(TF.hash32(f), lit(B.toLong)) + lit(1L)).cast(IntegerType)))
          .as("refSum"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"dsir slots diverged: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
        assert(r.getLong(2) == r.getLong(3),
          s"dsir fold diverged: ${r.getLong(2)} vs ${r.getLong(3)}")
      }
  }

  test("QualityCountsExpr == the split/HOF quality formula on 300 random " +
       "texts (incl. empty, repeated spaces, unicode, punct runs)") {
    import graft.functions.{TextFunctions => TF, QualityFunctions => QF}
    // the UTF-8 byte-walk invariants under attack: continuation bytes can
    // never alias ' ' or ASCII punct (multi-byte adjacent to both), 4-byte
    // code points (emoji) count 1 char, non-ASCII punctuation (… 。 « ¡ —)
    // is NOT \p{Punct} on either side, combining accents count as their
    // own code point, and a stopword must match by BYTES not by prefix
    // ("the" vs "thé" vs "theá")
    val words = Seq("the", "a", "of", "robot", "Zebra", "héllo", "日本語",
      "x#y...", "!!!", "", "in", "it", "a.b,c;d", "(parens)", "e@mail",
      "日本語。テスト", "héllo!", "¡hola!", "🎉", "🎉!!!", "a日b", "…—«»",
      "éclair", "thé", "theá", "日,日;日", "(日)")
    val texts = Seq.fill(298)(
      Seq.fill(rnd.nextInt(40))(words(rnd.nextInt(words.length)))
        .mkString(" ")) ++ Seq("", "   ")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.zipWithIndex.map { case (s, i) => Row(i.toLong, s) }),
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))
    val toks = TF.tokens(col("text"))
    val refWords = size(toks).cast(LongType)
    val refStop = size(filter(toks, t => t.isin(TF.Stopwords: _*))).cast(LongType)
    val refPunct = (length(col("text")) -
      length(regexp_replace(col("text"), "[\\p{Punct}]", ""))).cast(LongType)
    val refChars = length(col("text")).cast(LongType)
    df.select(QF.qualityCounts(col("text"), TF.Stopwords).as("c"),
        refWords.as("w"), refStop.as("s"), refPunct.as("p"), refChars.as("n"))
      .select(col("c.n_words"), col("c.n_stop"), col("c.n_punct"),
        col("c.n_chars"), col("w"), col("s"), col("p"), col("n"),
        col("c"))
      .collect().foreach { r =>
        assert(r.getLong(0) == r.getLong(4), s"n_words: $r")
        assert(r.getLong(1) == r.getLong(5), s"n_stop: $r")
        assert(r.getLong(2) == r.getLong(6), s"n_punct: $r")
        assert(r.getLong(3) == r.getLong(7), s"n_chars: $r")
      }
  }

  test("TokensContainPhrase == Scala sliding check on 300 random token arrays") {
    val vocab = Vector("a", "b", "c", "ab")
    def randToks() = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
    val phrases = Seq(Seq("a"), Seq("a", "b"), Seq("c", "a", "b"), Seq("zz"))
    val toksSeq = Seq.fill(300)(randToks())
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        toksSeq.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }),
      StructType(Seq(StructField("id", LongType),
        StructField("toks", ArrayType(StringType)))))
    phrases.foreach { ph =>
      val got = df
        .withColumn("m", graft.functions.PhraseFunctions.phraseInTokens(col("toks"), ph))
        .orderBy("id").select("m").collect().map(_.getBoolean(0)).toSeq
      val want = toksSeq.map(_.sliding(ph.length).exists(_.toSeq == ph))
      assert(got == want, s"phrase $ph diverged from the reference sliding check")
    }
  }

  test("two-child DotProduct == HOF on 50 random float/double vector pairs") {
    val rows = Seq.fill(50)((Seq.fill(16)(rnd.nextFloat() * 2 - 1),
      Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.zipWithIndex.map { case ((a, b), i) =>
        Row(i.toLong, a, b) }),
      StructType(Seq(StructField("id", LongType),
        StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(DoubleType)))))
    df.select(VF.dot(col("a"), col("b")).as("fast"),
        VF.dotHof(col("a"), col("b")).as("ref"))
      .collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("filter-tree compilation is total over 100 random and/or trees") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("num", "s")
    def leaf(): FilterNode = rnd.nextInt(4) match {
      case 0 => Cmp(FieldRef("num"), CmpOp.GreaterThan, rnd.nextLong() % 100)
      case 1 => Cmp(FieldRef("s"), CmpOp.Contains, rnd.alphanumeric.take(3).mkString)
      case 2 => IsEmpty(FieldRef("s"))
      case _ => In(FieldRef("num"), Seq(rnd.nextLong() % 100, rnd.nextLong() % 100))
    }
    def tree(depth: Int): FilterNode =
      if (depth == 0 || rnd.nextInt(3) == 0) leaf()
      else rnd.nextInt(3) match {
        case 0 => Group(BoolOp.And, Seq.fill(2)(tree(depth - 1)))
        case 1 => Group(BoolOp.Or, Seq.fill(2)(tree(depth - 1)))
        case _ => Group.passAll
      }
    (1 to 100).foreach { _ =>
      val n = df.filter(FilterCompiler.compile(tree(3), df)).count()
      assert(n >= 0 && n <= 2)
    }
  }

  test("set upsert is idempotent: applying the same delta twice changes nothing") {
    import spark.implicits._
    val base = Seq(("a", 1.0), ("b", 2.0)).toDF("key", "v")
    val delta = Seq(("b", 5.0), ("c", 3.0)).toDF("key", "v")
    val once = Mutationsish(base, delta)
    val twice = Mutationsish(once, delta)
    assert(once.orderBy("key").collect().toSeq == twice.orderBy("key").collect().toSeq)
  }

  private def Mutationsish(base: org.apache.spark.sql.DataFrame,
                           delta: org.apache.spark.sql.DataFrame) =
    graft.operators.Mutations.set(base.select("key", "v"), delta, "key")
      .select("key", "v")

  test("chunkWindows == Scala sliding reference on 100 random docs") {
    import spark.implicits._
    val windowSize = 5; val stride = 3
    def scalaRef(text: String): Seq[String] = {
      val toks = text.split(" ", -1).toSeq
      val n = toks.length
      val nc = if (n <= windowSize) 1
        else math.ceil((n - windowSize).toDouble / stride).toInt + 1
      (0 until nc).map(i => toks.slice(i * stride, i * stride + windowSize).mkString(" "))
    }
    val docs = (1 to 100).map { i =>
      val n = rnd.nextInt(20) // includes 0 => "" => single [""] token
      (i.toLong, Seq.fill(n)("w" + rnd.nextInt(9)).mkString(" "))
    }
    val got = docs.toDF("id", "text")
      .select(col("id"),
        graft.functions.TextFunctions.chunkWindows(col("text"), windowSize, stride).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == scalaRef(text), s"doc $id '$text'")
    }
  }

  test("msgpack pack->unpack is the identity on 300 random nested bodies") {
    // mirrors the reference's byte-level property tests (msgpackpatch/
    // property_test.go) at VALUE level: what goes in comes out, including
    // nulls at every nesting depth
    import graft.functions.MsgPack
    val schema = StructType(Seq(
      StructField("s", StringType),
      StructField("n", LongType),
      StructField("d", DoubleType),
      StructField("b", BooleanType),
      StructField("xs", ArrayType(LongType)),
      StructField("kv", MapType(StringType, StringType)),
      StructField("inner", StructType(Seq(
        StructField("a", StringType), StructField("z", LongType))))))
    def randStr() = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
    def opt[T](v: => T): Any = if (rnd.nextInt(5) == 0) null else v
    val rows = (1 to 300).map { i =>
      Row(i.toLong, Row(
        opt(randStr()),
        opt(rnd.nextLong()),
        opt(rnd.nextDouble() * 1e6 - 5e5),
        opt(rnd.nextBoolean()),
        opt(Seq.fill(rnd.nextInt(6))(rnd.nextLong() % 1000)),
        opt(Seq.fill(rnd.nextInt(4))(randStr() -> randStr()).toMap),
        opt(Row(opt(randStr()), opt(rnd.nextLong())))))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("id", LongType), StructField("body", schema))))
    val got = df.select(col("id"),
        MsgPack.unpack(MsgPack.pack(col("body")), schema).as("rt"), col("body"))
      .collect()
    got.foreach { r =>
      assert(r.get(1) == r.get(2), s"round-trip diverged at id ${r.getLong(0)}:\n" +
        s"  got  ${r.get(1)}\n  want ${r.get(2)}")
    }
  }

  test("gob pack->unpack is the identity on 300 random nested bodies") {
    // same value-level identity law as the msgpack property, with gob's
    // two contract differences baked in: NULLs live only at struct-field
    // level (gob cannot represent them inside arrays/maps), and integer
    // edge values ride the sign-bit encoding (MinValue/MaxValue included)
    import graft.functions.Gob
    val schema = StructType(Seq(
      StructField("s", StringType),
      StructField("n", LongType),
      StructField("d", DoubleType),
      StructField("b", BooleanType),
      StructField("xs", ArrayType(LongType)),
      StructField("kv", MapType(StringType, StringType)),
      StructField("inner", StructType(Seq(
        StructField("a", StringType), StructField("z", LongType))))))
    val edgeLongs = Seq(0L, 1L, -1L, 127L, 128L, -128L, Long.MaxValue, Long.MinValue)
    def randLong() = if (rnd.nextInt(4) == 0) edgeLongs(rnd.nextInt(edgeLongs.size))
                     else rnd.nextLong()
    def randStr() = if (rnd.nextInt(6) == 0) "Hétérogène ☃ " + rnd.nextInt(99)
                    else rnd.alphanumeric.take(rnd.nextInt(12)).mkString
    def opt[T](v: => T): Any = if (rnd.nextInt(5) == 0) null else v
    val rows = (1 to 300).map { i =>
      Row(i.toLong, Row(
        opt(randStr()),
        opt(randLong()),
        opt(rnd.nextDouble() * 1e6 - 5e5),
        opt(rnd.nextBoolean()),
        opt(Seq.fill(rnd.nextInt(6))(randLong())),
        opt(Seq.fill(rnd.nextInt(4))(randStr() -> randStr()).toMap),
        opt(Row(opt(randStr()), opt(randLong())))))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("id", LongType), StructField("body", schema))))
    val got = df.select(col("id"),
        Gob.unpack(Gob.pack(col("body")), schema).as("rt"), col("body"))
      .collect()
    got.foreach { r =>
      assert(r.get(1) == r.get(2), s"gob round-trip diverged at id ${r.getLong(0)}:\n" +
        s"  got  ${r.get(1)}\n  want ${r.get(2)}")
    }
  }

  test("gob round-trip holds on 40 random nested SCHEMAS (all scalar widths, struct/slice/map)") {
    // the fixed-schema law above exercises one shape; hand-written binary
    // parsing earns a stronger contract — the schema itself is fuzzed here
    // (depth <= 3 over every scalar width gob can carry), so field-delta
    // bookkeeping, nested definition planning, and the per-width carriers
    // are all hit in combinations nobody hand-picked
    import graft.functions.Gob
    val scalars: Seq[DataType] = Seq(BooleanType, ByteType, ShortType,
      IntegerType, LongType, FloatType, DoubleType, StringType, BinaryType,
      DecimalType(18, 0), DecimalType(20, 0))
    def randType(depth: Int): DataType =
      if (depth <= 0) scalars(rnd.nextInt(scalars.size))
      else rnd.nextInt(6) match {
        case 0 => ArrayType(randType(depth - 1))
        case 1 => MapType(StringType, randType(depth - 1))
        case 2 | 3 => StructType((0 until rnd.nextInt(3) + 1).map(i =>
          StructField(s"f$i", randType(depth - 1))))
        case _ => scalars(rnd.nextInt(scalars.size))
      }
    def randStr() = rnd.alphanumeric.take(rnd.nextInt(10)).mkString
    def randValue(dt: DataType): Any = dt match {
      case BooleanType => rnd.nextBoolean()
      case ByteType => rnd.nextInt().toByte
      case ShortType => rnd.nextInt().toShort
      case IntegerType => rnd.nextInt()
      case LongType => rnd.nextLong()
      case FloatType => rnd.nextFloat() * 1e5f - 5e4f
      case DoubleType => rnd.nextDouble() * 1e6 - 5e5
      case StringType => randStr()
      case BinaryType =>
        val b = new Array[Byte](rnd.nextInt(8)); rnd.nextBytes(b); b
      case d: DecimalType if d.precision <= 18 => // signed carrier, 18 digits max
        java.math.BigDecimal.valueOf(rnd.nextLong() % 1000000000000000000L)
      case _: DecimalType => // u64 carrier: non-negative, full 64-bit range
        new java.math.BigDecimal(java.lang.Long.toUnsignedString(rnd.nextLong()))
      case ArrayType(et, _) => Seq.fill(rnd.nextInt(4))(randValue(et))
      case MapType(_, vt, _) =>
        Seq.fill(rnd.nextInt(3))(randStr() -> randValue(vt)).toMap
      case st: StructType => // NULLs live only at struct-field level in gob
        Row(st.fields.toSeq.map(f =>
          if (rnd.nextInt(5) == 0) null else randValue(f.dataType)): _*)
    }
    // structural equality that Row.equals cannot provide: byte arrays by
    // content, decimals by numeric value, containers recursively
    def same(a: Any, b: Any): Boolean = (a, b) match {
      case (null, null) => true
      case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y) == 0
      // collection.Seq, not the 2.13 immutable alias: Spark hands back
      // mutable.ArraySeq, which the immutable pattern silently skips —
      // nested byte arrays then compare by REFERENCE in the == fallback
      case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
        x.length == y.length && x.zip(y).forall { case (p, q) => same(p, q) }
      case (x: scala.collection.Map[_, _], y: scala.collection.Map[_, _]) =>
        val xm = x.asInstanceOf[scala.collection.Map[Any, Any]]
        val ym = y.asInstanceOf[scala.collection.Map[Any, Any]]
        xm.size == ym.size && xm.forall { case (k, v) => ym.get(k).exists(same(v, _)) }
      case (x: Row, y: Row) =>
        x.length == y.length && (0 until x.length).forall(i => same(x.get(i), y.get(i)))
      case _ => a == b
    }
    for (trial <- 1 to 40) {
      val dt = randType(3)
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("body", dt)))
      val rows = (1 to 6).map(i => Row(i.toLong, randValue(dt)))
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      val got = df.select(col("id"),
          Gob.unpack(Gob.pack(col("body")), dt).as("rt"), col("body"))
        .collect()
      got.foreach { r =>
        assert(same(r.get(1), r.get(2)),
          s"trial $trial schema $dt diverged at id ${r.getLong(0)}:\n" +
            s"  got  ${r.get(1)}\n  want ${r.get(2)}")
      }
    }
  }

  test("substringDedup invariants on 120 random docs: subsequence, count " +
       "consistency, oracle replay") {
    import spark.implicits._
    val k = 3
    // small vocabulary so cross-doc k-gram collisions actually occur
    def doc() = Seq.fill(rnd.nextInt(30) + 1)("w" + rnd.nextInt(5)).mkString(" ")
    val docs = (1 to 120).map(i => (i.toLong, doc()))
    val out = graft.operators.Dedup
      .substringDedup(docs.toDF("doc_id", "text"), "text", "doc_id", k = k)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Int]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    assert(out.keySet == docs.map(_._1).toSet, "every doc must survive as a row")
    val in = docs.toMap
    // reference implementation replayed in plain Scala
    val allGrams = scala.collection.mutable.Map.empty[Seq[String], Int]
    docs.foreach { case (_, t) =>
      val ts = t.split(" ").toSeq
      ts.sliding(k).filter(_.size == k).foreach(g =>
        allGrams(g) = allGrams.getOrElse(g, 0) + 1)
    }
    out.foreach { case (id, (nTok, nRem, clean)) =>
      val ts = in(id).split(" ").toSeq
      assert(nTok == ts.size, s"doc $id token count")
      val covered = ts.indices.filter { j =>
        (math.max(0, j - k + 1) to math.min(j, ts.size - k)).exists { s =>
          allGrams.getOrElse(ts.slice(s, s + k), 0) >= 2
        }
      }.toSet
      val want = ts.indices.filterNot(covered).map(ts).mkString(" ")
      assert(clean == want, s"doc $id clean text:\n got  $clean\n want $want")
      assert(nRem == covered.size, s"doc $id removed count")
      // clean tokens are an ordered subsequence of the input
      var pos = -1
      clean.split(" ").filter(_.nonEmpty).foreach { t =>
        val nxt = ts.indexWhere(_ == t, pos + 1)
        assert(nxt > pos, s"doc $id: token '$t' out of order or invented")
        pos = nxt
      }
    }
  }

  test("PqEncodeExpr random-vector law: interpreted eval == relational " +
       "quantize+argmin replay (zeros, negatives, ties included)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val m = 4; val dim = 16; val sd = dim / m; val ksub = 5; val scale = 1e6
    for (trial <- 1 to 40) {
      // codebook and vectors share a coarse value grid so argmin TIES occur
      def coarse() = (rnd.nextInt(7) - 3) * 0.25
      val cb = Array.fill(ksub)(Array.fill(dim)(
        math.round(coarse() * scale)))
      val vec = Array.fill(dim)(coarse().toFloat)
      val expr = graft.functions.PqEncodeExpr(
        Literal.create(vec.toSeq, ArrayType(FloatType)), cb, m, scale)
      val got = expr.eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
      // plain-Scala replay of the documented rule
      val iv = vec.map(x => {
        val v = x.toDouble * scale
        (math.signum(v) * math.floor(math.abs(v) + 0.5)).toLong
      })
      val want = (0 until m).map { s =>
        val ds = (0 until ksub).map { c =>
          (0 until sd).map { j =>
            val d = iv(s * sd + j) - cb(c)(s * sd + j); d * d
          }.sum
        }
        ds.indexOf(ds.min) // first min = lowest code on ties
      }
      assert(got == want, s"trial $trial: $got vs $want (vec ${vec.toSeq})")
    }
  }

  test("RollingGramHashExpr random law: rolling == direct polynomial over " +
       "random unicode tokens and k values") {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XXH64}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val B = 0x9E3779B97F4A7C15L
    val alphabet = Seq("a", "βγ", "字", "", "zz9", "🙂")
    for (trial <- 1 to 60) {
      val k = rnd.nextInt(4) + 1
      val n = rnd.nextInt(12)
      val toks = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size)))
      val expr = graft.functions.RollingGramHashExpr(
        Literal.create(toks, ArrayType(StringType)), k)
      val got = expr.eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      def th(s: String) = XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 42L)
      val want =
        if (n < k) Seq.empty[Long]
        else (0 to n - k).map(i =>
          toks.slice(i, i + k).foldLeft(0L)((h, t) => h * B + th(t)))
      assert(got == want, s"trial $trial k=$k toks=$toks")
    }
  }

  test("substringDedupPrebuilt random law: prebuilt(crawl | corpus artifact) " +
       "== substringDedup(corpus ∪ crawl) restricted to crawl") {
    import spark.implicits._
    val k = 3
    def doc() = Seq.fill(rnd.nextInt(20) + 1)("w" + rnd.nextInt(4)).mkString(" ")
    val corpus = (100 to 140).map(i => (i.toLong, doc()))
    val crawl = (1 to 40).map(i => (i.toLong, doc()))
    val dir = java.nio.file.Files.createTempDirectory("graft-gram-prop").toString
    graft.operators.Dedup.buildGramIndex(
      corpus.toDF("doc_id", "text"), "text", "doc_id", s"$dir/g", k = k)
    val pre = graft.operators.Dedup.substringDedupPrebuilt(spark, s"$dir/g",
        crawl.toDF("doc_id", "text"), "text", "doc_id", k = k)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Int]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    val full = graft.operators.Dedup.substringDedup(
        (corpus ++ crawl).toDF("doc_id", "text"), "text", "doc_id", k = k)
      .filter($"doc_id" < 100)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Int]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    assert(pre == full)
    // the tiny vocabulary guarantees the rule actually fired somewhere
    assert(pre.values.exists(_._2 > 0), "fixture produced no duplication")
  }

  test("bm25TopK random law: distributed ranking == scalar replay on random " +
       "small-vocab corpora") {
    import spark.implicits._
    for (trial <- 1 to 5) {
      val n = rnd.nextInt(30) + 10
      def doc() = Seq.fill(rnd.nextInt(15) + 1)("w" + rnd.nextInt(6)).mkString(" ")
      val corpus = (1 to n).map(i => (i.toLong, doc()))
      val terms = Seq("w0", "w3")
      val got = graft.operators.TermStats
        .bm25TopK(corpus.toDF("doc_id", "text"), "text", "doc_id", terms, k = n)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // scalar replay with the identical integer-scaling discipline
      val dls = corpus.map { case (id, t) => id -> t.split(" ").length }.toMap
      val avgdl = dls.values.sum.toDouble / n
      val dfm = terms.map(t =>
        t -> corpus.count(_._2.split(" ").contains(t))).toMap
      val want = corpus.flatMap { case (id, text) =>
        val s = terms.map { t =>
          val f = text.split(" ").count(_ == t)
          if (f == 0 || dfm(t) == 0) 0L
          else {
            val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
            val ts = idf * (f * 2.2) /
              (f + 1.2 * (1.0 - 0.75 + 0.75 * dls(id) / avgdl))
            (math.signum(ts) * math.floor(math.abs(ts) * 1e6 + 0.5)).toLong
          }
        }.sum
        if (terms.forall(t => !text.split(" ").contains(t))) None
        else Some(id -> BigDecimal(s.toDouble / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (id, sc) => (-sc, id) }
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("segmentDedup invariants on 150 random docs: global uniqueness, order, subset") {
    import spark.implicits._
    // word soup with a small vocabulary so cross-doc segment collisions
    // actually occur; variable lengths cover the short-tail segment
    def doc() = Seq.fill(rnd.nextInt(40) + 1)("w" + rnd.nextInt(6)).mkString(" ")
    val docs = (1 to 150).map(i => (i.toLong, doc()))
    val out = graft.operators.Dedup
      .segmentDedup(docs.toDF("doc_id", "text"), "text", "doc_id", segTokens = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    def segs(t: String) = t.split(" ").grouped(4).map(_.mkString(" ")).toSeq
    // 1. no segment text appears twice anywhere in the output corpus
    val allSegs = out.toSeq.sortBy(_._1).flatMap { case (_, t) => segs(t) }
    assert(allSegs.size == allSegs.distinct.size,
      "a segment survived twice after segmentDedup")
    // 2. each output doc's segments are a subsequence of its input's
    //    (order preserved, nothing invented)
    val in = docs.toMap
    out.foreach { case (id, t) =>
      val is = segs(in(id)); var pos = -1
      segs(t).foreach { sg =>
        val nxt = is.indexWhere(_ == sg, pos + 1)
        assert(nxt > pos, s"doc $id: segment '$sg' out of order or absent")
        pos = nxt
      }
    }
    // 3. first-occurrence rule: replaying docs in key order and keeping
    //    only unseen segments reproduces the output exactly
    val seen = scala.collection.mutable.Set.empty[String]
    docs.foreach { case (id, t) =>
      val kept = segs(t).filter(seen.add)
      val want = if (kept.isEmpty) None else Some(kept.mkString(" "))
      assert(out.get(id) == want, s"doc $id: got ${out.get(id)}, want $want")
    }
  }

  test("sessionize invariants on random event streams: contiguous ids, gap law") {
    import spark.implicits._
    import java.sql.Timestamp
    val events = (1 to 400).map { i =>
      (rnd.nextInt(8).toLong, i.toLong,
        new Timestamp(1700000000000L + rnd.nextInt(versionGapSpanMs)))
    }
    val out = graft.operators.Sessionize
      .assign(events.toDF("user_id", "event_id", "ts"), "user_id", "ts",
        "event_id", gapSeconds = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getLong(3)))
    out.groupBy(_._1).foreach { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3.getTime, e._2))
      // ids start at 1, never decrease, step by at most 1
      assert(ordered.head._4 == 1L)
      ordered.sliding(2).filter(_.length == 2).foreach { w =>
        val (_, _, t1, s1) = w(0); val (_, _, t2, s2) = w(1)
        val gapMs = t2.getTime - t1.getTime
        if (gapMs >= 60000L) assert(s2 == s1 + 1, s"gap $gapMs must split")
        else assert(s2 == s1, s"gap $gapMs must not split")
      }
    }
  }
  private val versionGapSpanMs = 30 * 60000 // ~30 min span => real gaps at 60s

  test("geo withinDistance == brute force on 300 random points (recall and precision)") {
    import spark.implicits._
    // points concentrated so pairs actually occur, spanning band
    // boundaries and negative latitudes
    val pts = (1 to 300).map { i =>
      (i.toLong, rnd.nextDouble() * 8 - 4, rnd.nextDouble() * 8 - 4)
    }
    val maxKm = 120.0
    val got = graft.operators.GeoJoin
      .withinDistance(pts.toDF("id", "lat", "lon"), "id", "lat", "lon", maxKm)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def hav(a: (Long, Double, Double), b: (Long, Double, Double)): Double = {
      val dLat = math.toRadians(b._2 - a._2); val dLon = math.toRadians(b._3 - a._3)
      val x = math.pow(math.sin(dLat / 2), 2) +
        math.cos(math.toRadians(a._2)) * math.cos(math.toRadians(b._2)) *
          math.pow(math.sin(dLon / 2), 2)
      2.0 * 6371.0 * math.asin(math.sqrt(x))
    }
    val want = (for {
      a <- pts; b <- pts if a._1 < b._1
      if hav(a, b) <= maxKm
    } yield (a._1, b._1)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty, "degenerate test: no qualifying pairs generated")
  }

  test("packSequences invariants: bins contiguous from 0, spans bounded by budget") {
    import spark.implicits._
    val budget = 50
    val docs = (1 to 200).map(i => (i.toLong, rnd.nextInt(30) + 1))
    val out = graft.operators.Sampling
      .packSequences(docs.toDF("id", "n"), "id", "n", budget)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byBin = out.groupBy(_._3)
    // bins are contiguous 0..max
    assert(byBin.keySet == (0L until byBin.keySet.size).toSet)
    // every bin's token span STARTS below its boundary (docs may overflow
    // past it by at most one doc — the documented carry rule): the first
    // doc of bin b begins at running-sum < (b+1)*budget and >= b*budget
    val sorted = out.sortBy(_._1)
    var running = 0L
    sorted.foreach { case (_, n, bin) =>
      assert(bin == running / budget, s"bin mismatch at running=$running")
      running += n
    }
  }

  // ------------------------------------------------------------------
  // k-means: the distributed exact-integer Lloyd must equal a
  // straightforward single-threaded reference implementation — any
  // arithmetic drift (rounding, tie order, empty-cluster rule) surfaces
  // as an assignment diff here before it could desync the SQL oracle.
  // ------------------------------------------------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("kmeans assignments == plain-Scala exact-integer Lloyd on 60 random vectors") {
    val dim = 8; val k = 3; val iters = 3
    val vecs = Seq.tabulate(60)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.map { case (id, v) => Row(id, v.toSeq) }),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))

    val got = graft.operators.Similarity
      .kmeansAssignments(df, "embedding", "vec_id", k, iters, dim)
      .select("key", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference: same algorithm, no Spark
    val ivecs = vecs.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1e6)) }.toMap
    var cs: Seq[(Array[Long], Long)] = vecs.map(_._1)
      .sortBy(id => (md5hex(id.toString), id)).take(k)
      .map(id => (ivecs(id), 1L))
    def assign(): Map[Long, Int] = ivecs.map { case (id, v) =>
      val best = cs.zipWithIndex.map { case ((sum, n), ci) =>
        val dot = v.zip(sum).map { case (a, b) => a * b }.sum
        (-(dot.toDouble / n), ci)
      }.min // (negScore, cid) lexicographic = score DESC, cid ASC
      id -> best._2
    }
    var a = assign()
    (2 to iters).foreach { _ =>
      cs = cs.zipWithIndex.map { case (prev, ci) =>
        val members = a.collect { case (id, c) if c == ci => ivecs(id) }
        if (members.isEmpty) prev
        else (members.transpose.map(_.sum).toArray, members.size.toLong)
      }
      a = assign()
    }
    assert(got == a.map { case (id, c) => id -> c.toLong })
  }

  // ------------------------------------------------------------------
  // BPE: the boundary-encoded string `replace` must equal the obvious
  // token-list implementation (greedy left-to-right non-overlapping
  // merge) — the encoding trick is exactly what this pins.
  // ------------------------------------------------------------------

  test("bpe train == plain-Scala token-list BPE on 150 random words") {
    import spark.implicits._
    val words = Seq.fill(150)(
      Seq.fill(rnd.nextInt(5) + 1)(('a' + rnd.nextInt(3)).toChar).mkString)
    val (gotMerges, gotVocabDf) =
      graft.operators.Bpe.train(Seq(words.mkString(" ")).toDF("text"), "text", 5)
    val gotVocab = gotVocabDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // reference: words as token lists
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var reprs: Map[Seq[String], Long] =
      freq.map { case (w, f) => w.map(_.toString) -> f }
    val refMerges = Seq.newBuilder[(String, String, Long)]
    var continue = true
    var step = 0
    while (continue && step < 5) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      reprs.foreach { case (toks, f) =>
        toks.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f }
      }
      if (counts.isEmpty) continue = false
      else {
        val ((t1, t2), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        refMerges += ((t1, t2, c))
        reprs = reprs.toSeq.map { case (toks, f) =>
          // greedy left-to-right non-overlapping merge
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < toks.size) {
            if (i + 1 < toks.size && toks(i) == t1 && toks(i + 1) == t2) {
              out += t1 + t2; i += 2
            } else { out += toks(i); i += 1 }
          }
          out.toSeq -> f
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        step += 1
      }
    }
    assert(gotMerges.map(m => (m.t1, m.t2, m.count)) == refMerges.result())
    val refVocab = reprs.toSeq.flatMap { case (toks, f) => toks.map(_ -> f) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(gotVocab == refVocab)
  }

  // --- RangeJoin: binned equi-join == brute-force nested loop ------------
  // The binning rewrite has three classic failure surfaces: the half-open
  // end (an interval must NOT claim the bin of its exclusive endpoint),
  // floor-division on PRE-EPOCH timestamps (negative micros), and the
  // first-shared-bin dedup (a pair sharing several bins must surface
  // exactly once). Brute force over random data hits all three.

  private def randTs(r: scala.util.Random): java.sql.Timestamp =
    // ±200 h around the epoch — crosses zero (floor-division binning on
    // negative times), lands on and off whole-hour bin boundaries because
    // of the millisecond jitter
    new java.sql.Timestamp(
      (r.nextInt(401) - 200).toLong * 3600L * 1000L + r.nextInt(3600000))

  test("rangeJoin pointInInterval == brute force on 150x60 random rows " +
       "(pre-epoch, boundary, empty/null intervals)") {
    import spark.implicits._
    val r = new scala.util.Random(0xD1CE)
    val points = (0 until 150).map(i => (i.toLong,
      if (r.nextInt(20) == 0) null else randTs(r)))
    val intervals = (0 until 60).map { j =>
      val s = randTs(r)
      // mix: genuine spans, empty (e == s), inverted (e < s), null ends,
      // and spans snapped to whole bin widths (boundary == boundary)
      val e = r.nextInt(6) match {
        case 0 => s // empty: matches nothing (half-open)
        case 1 => new java.sql.Timestamp(s.getTime - 3600000L) // inverted
        case 2 => null
        case 3 => new java.sql.Timestamp(s.getTime + 2L * 3600000L) // 1 bin-width exactly at "2 hours"
        case _ => new java.sql.Timestamp(s.getTime + (r.nextInt(10) + 1).toLong * 1800000L)
      }
      (1000L + j, s, e)
    }
    val pDf = points.toDF("pid", "ts")
    val iDf = intervals.toDF("iid", "s", "e")
    for (width <- Seq("2 hours", "1 day")) {
      val got = graft.operators.RangeJoin
        .pointInInterval(pDf, iDf, "ts", "s", "e", width)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size, s"duplicate pairs at width $width")
      val want = (for {
        (pid, ts) <- points if ts != null
        (iid, s, e) <- intervals if s != null && e != null
        if ts.getTime >= s.getTime && ts.getTime < e.getTime
      } yield (pid, iid)).toSet
      assert(got.toSet == want, s"width $width: got ${got.size} want ${want.size}")
    }
  }

  test("rangeJoin intervalOverlap == brute force on 60x60 random intervals " +
       "(first-shared-bin dedup exact)") {
    import spark.implicits._
    val r = new scala.util.Random(0xFACE)
    def mk(base: Long): Seq[(Long, java.sql.Timestamp, java.sql.Timestamp)] =
      (0 until 60).map { j =>
        val s = randTs(r)
        val e = if (r.nextInt(8) == 0) s // empty — overlaps nothing
          else new java.sql.Timestamp(s.getTime + (r.nextInt(16) + 1).toLong * 1800000L)
        (base + j, s, e)
      }
    val ls = mk(0); val rs = mk(500)
    val got = graft.operators.RangeJoin.intervalOverlap(
        ls.toDF("lid", "ls", "le"), rs.toDF("rid", "rs", "re"),
        "ls", "le", "rs", "re", "2 hours")
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got.size == got.toSet.size, "a pair surfaced in more than one bin")
    val want = (for {
      (lid, a, b) <- ls if b.getTime > a.getTime
      (rid, c, d) <- rs if d.getTime > c.getTime
      if a.getTime < d.getTime && c.getTime < b.getTime
    } yield (lid, rid)).toSet
    assert(got.toSet == want, s"got ${got.size} want ${want.size}")
  }

  test("fuzzy pairs == plain-Scala levenshtein brute force on 120 random names") {
    import spark.implicits._
    // independent oracle: textbook DP, not Spark's levenshtein on either
    // side — pins the bounded (threshold) form's early-exit against a
    // reference that has no early exit to get wrong
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val r = new scala.util.Random(0xFEED)
    val alphabet = "abcde"
    val blocks = Seq("x", "y", "z")
    val names = (0 until 120).map { _ =>
      val w = (0 until (r.nextInt(6) + 1)).map(_ => alphabet(r.nextInt(5))).mkString
      s"$w ${blocks(r.nextInt(3))}"
    }.distinct
    for (maxDist <- Seq(0, 1, 2)) {
      val got = graft.operators.Fuzzy.pairs(names.toDF("p_name"), "p_name",
          v => element_at(split(v, " "), 2), maxDist)
        .collect().map(x => (x.getString(0), x.getString(1), x.getInt(2))).toSet
      val want = (for {
        a <- names; b <- names
        if a < b && a.split(" ")(1) == b.split(" ")(1)
        d = lev(a, b) if d <= maxDist
      } yield (a, b, d)).toSet
      assert(got == want, s"maxDist=$maxDist: got ${got.size} want ${want.size}")
    }
  }
}
