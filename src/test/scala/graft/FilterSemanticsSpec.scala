package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.filters._

/**
 * Truth tables for the filter algebra — mirrors the reference's operator ×
 * type × nil/missing/mismatch matrix (reference: filter_test.go,
 * filter_nested_slice_test.go; semantics cited in FilterAst.scala).
 */
class FilterSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def keysMatching(node: FilterNode, df: org.apache.spark.sql.DataFrame,
                           keyCol: String = "k"): Set[String] =
    df.filter(FilterCompiler.compile(node, df)).select(keyCol)
      .collect().map(_.getString(0)).toSet

  // --- scalar compare + null discipline -----------------------------------

  private lazy val scalars = Seq(
    ("a", Some(10L), Some("hello world")),
    ("b", Some(20L), Some("")),
    ("c", None, Some("HELLO")),
    ("d", Some(30L), None)
  ).toDF("k", "num", "s")

  test("EQUAL matches value; NULL never matches") {
    assert(keysMatching(Cmp(FieldRef("num"), CmpOp.Equal, 10L), scalars) == Set("a"))
  }
  test("NOT_EQUAL does not match NULL (missing => no match)") {
    assert(keysMatching(Cmp(FieldRef("num"), CmpOp.NotEqual, 10L), scalars) == Set("b", "d"))
  }
  test("ordered comparators") {
    assert(keysMatching(Cmp(FieldRef("num"), CmpOp.GreaterThan, 10L), scalars) == Set("b", "d"))
    assert(keysMatching(Cmp(FieldRef("num"), CmpOp.LessThanOrEqual, 20L), scalars) == Set("a", "b"))
  }
  test("CONTAINS is case-sensitive; STARTS/ENDS_WITH") {
    assert(keysMatching(Cmp(FieldRef("s"), CmpOp.Contains, "hello"), scalars) == Set("a"))
    assert(keysMatching(Cmp(FieldRef("s"), CmpOp.StartsWith, "HE"), scalars) == Set("c"))
    assert(keysMatching(Cmp(FieldRef("s"), CmpOp.EndsWith, "world"), scalars) == Set("a"))
  }
  test("IS_EMPTY matches NULL and empty string; negation excludes both") {
    assert(keysMatching(IsEmpty(FieldRef("s")), scalars) == Set("b", "d"))
    assert(keysMatching(IsEmpty(FieldRef("s"), negate = true), scalars) == Set("a", "c"))
  }
  test("empty FilterGroup = pass-all") {
    assert(keysMatching(Group.passAll, scalars) == Set("a", "b", "c", "d"))
  }
  test("AND / OR composition") {
    val node = Group.or(
      Group.and(Cmp(FieldRef("num"), CmpOp.Equal, 10L),
        Cmp(FieldRef("s"), CmpOp.Contains, "world")),
      Cmp(FieldRef("s"), CmpOp.Equal, "HELLO"))
    assert(keysMatching(node, scalars) == Set("a", "c"))
  }
  test("IN set membership; NULL not in any set") {
    assert(keysMatching(In(FieldRef("num"), Seq(10L, 30L)), scalars) == Set("a", "d"))
  }

  // --- slices / maps -------------------------------------------------------

  private lazy val slices = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("a", Seq(1L, 2L, 3L), Seq("Foo", "BAR"), Map("x" -> Seq(0, 5))),
      Row("b", Seq.empty[Long], Seq.empty[String], Map.empty[String, Seq[Int]]),
      Row("c", null, null, null))),
    StructType(Seq(
      StructField("k", StringType),
      StructField("nums", ArrayType(LongType)),
      StructField("strs", ArrayType(StringType)),
      StructField("m", MapType(StringType, ArrayType(IntegerType))))))

  test("SLICE_CONTAINS; null slice never matches, even negated") {
    assert(keysMatching(SliceContains(FieldRef("nums"), 2L), slices) == Set("a"))
    assert(keysMatching(SliceContains(FieldRef("nums"), 9L, negate = true), slices) == Set("a", "b"))
  }
  test("SLICE_CONTAINS_SUBSTRING is case-insensitive") {
    assert(keysMatching(SliceContainsSubstring(FieldRef("strs"), "bar"), slices) == Set("a"))
    assert(keysMatching(SliceContainsSubstring(FieldRef("strs"), "OO"), slices) == Set("a"))
  }
  test("HAS_KEY / HAS_NOT_KEY; null map never matches") {
    assert(keysMatching(HasKey(FieldRef("m"), "x"), slices) == Set("a"))
    assert(keysMatching(HasKey(FieldRef("m"), "y", negate = true), slices) == Set("a", "b"))
  }
  test("IS_EMPTY on arrays and maps") {
    assert(keysMatching(IsEmpty(FieldRef("nums")), slices) == Set("b", "c"))
  }
  test("#len pseudo-field") {
    assert(keysMatching(Cmp(FieldRef.Len(FieldRef("nums")), CmpOp.Equal, 3), slices) == Set("a"))
    assert(keysMatching(Cmp(FieldRef.Len(FieldRef("nums")), CmpOp.Equal, 0), slices) == Set("b"))
  }

  // --- quantified nested slices (empty-slice law: ANY=false, ALL/NONE=true,
  //     COUNT compares 0; null slice never matches) -------------------------

  private lazy val nested = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("a", Seq(Row(1L, "ready"), Row(5L, "done"))),
      Row("empty", Seq.empty[Row]),
      Row("nil", null))),
    StructType(Seq(
      StructField("k", StringType),
      StructField("items", ArrayType(StructType(Seq(
        StructField("clicks", LongType), StructField("status", StringType))))))))

  private def quant(q: Quantifier, pred: FilterNode = Cmp(FieldRef("clicks"), CmpOp.GreaterThan, 2L)) =
    NestedSliceWhere(FieldRef("items"), q, pred)

  test("ANY: empty => false, nil => false") {
    assert(keysMatching(quant(Quantifier.Any), nested) == Set("a"))
  }
  test("ALL: empty => true, nil => false") {
    assert(keysMatching(quant(Quantifier.All,
      Cmp(FieldRef("clicks"), CmpOp.GreaterThanOrEqual, 1L)), nested) == Set("a", "empty"))
  }
  test("NONE: empty => true") {
    assert(keysMatching(quant(Quantifier.None,
      Cmp(FieldRef("status"), CmpOp.Equal, "failed")), nested) == Set("a", "empty"))
  }
  test("COUNT compares 0 on empty") {
    assert(keysMatching(quant(Quantifier.Count(CmpOp.Equal, 0)), nested) == Set("empty"))
    assert(keysMatching(quant(Quantifier.Count(CmpOp.GreaterThanOrEqual, 1)), nested) == Set("a"))
  }
  test("AnyElement wildcard [*]") {
    assert(keysMatching(AnyElement(FieldRef("items"),
      Cmp(FieldRef("status"), CmpOp.Equal, "done")), nested) == Set("a"))
  }

  // --- phrase --------------------------------------------------------------

  private lazy val phrases = Seq(
    ("a", "general terms conditions apply"),
    ("b", "terms general conditions"),
    ("c", "no relevant words")
  ).toDF("k", "text")
    .withColumn("wi", graft.functions.TextFunctions.wordIndex(col("text")))

  test("phrase = consecutive positions only") {
    assert(keysMatching(PhraseMatch(FieldRef("wi"), Seq("general", "terms")), phrases) == Set("a"))
    assert(keysMatching(PhraseMatch(FieldRef("wi"), Seq("general", "terms", "conditions")), phrases) == Set("a"))
  }
  test("phrase negate matches docs lacking the words entirely") {
    assert(keysMatching(PhraseMatch(FieldRef("wi"), Seq("general", "terms"), negate = true),
      phrases) == Set("b", "c"))
  }
  test("single-word phrase = key containment") {
    assert(keysMatching(PhraseMatch(FieldRef("wi"), Seq("conditions")), phrases) == Set("a", "b"))
  }

  // PhraseInTokens (the scan form) must agree with the map form everywhere
  private lazy val tokenized = phrases.withColumn("toks", split(col("text"), " "))

  test("token-array phrase: consecutive positions only, same truth table") {
    assert(keysMatching(PhraseInTokens(FieldRef("toks"), Seq("general", "terms")), tokenized) == Set("a"))
    assert(keysMatching(PhraseInTokens(FieldRef("toks"), Seq("general", "terms", "conditions")), tokenized) == Set("a"))
    assert(keysMatching(PhraseInTokens(FieldRef("toks"), Seq("conditions")), tokenized) == Set("a", "b"))
    assert(keysMatching(PhraseInTokens(FieldRef("toks"), Seq("general", "terms"), negate = true),
      tokenized) == Set("b", "c"))
    // phrase longer than the doc: no match, negate matches
    assert(keysMatching(PhraseInTokens(FieldRef("toks"),
      Seq("no", "relevant", "words", "here", "at", "all")), tokenized) == Set.empty)
  }

  // --- type-mismatch discipline (filter.go:392-493) ------------------------

  test("cross-family compare => no match (not an implicit cast)") {
    // string literal vs numeric column: Spark's cast would parse "10" == 10
    assert(keysMatching(Cmp(FieldRef("num"), CmpOp.Equal, "10"), scalars) == Set.empty)
    // numeric literal vs string column
    assert(keysMatching(Cmp(FieldRef("s"), CmpOp.Equal, 5L), scalars) == Set.empty)
    // CONTAINS on a numeric column
    assert(keysMatching(Cmp(FieldRef("num"), CmpOp.Contains, "1"), scalars) == Set.empty)
    // IN with mismatched member type
    assert(keysMatching(In(FieldRef("num"), Seq("10", "20")), scalars) == Set.empty)
  }

  test("IN validates EVERY member: mixed list keeps only family-compatible members") {
    // old behavior checked only the head: Seq(10L, "20") would implicitly
    // cast "20" — the exact behavior the discipline suppresses
    assert(keysMatching(In(FieldRef("num"), Seq(10L, "20")), scalars) == Set("a"))
    assert(keysMatching(In(FieldRef("num"), Seq("10", 20L)), scalars) == Set("b"))
    assert(keysMatching(In(FieldRef("num"), Seq[Any]()), scalars) == Set.empty)
  }

  private lazy val times = Seq(
    ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:10")),
    ("b", java.sql.Timestamp.valueOf("2024-01-01 00:00:10.700")), // sub-second
    ("c", java.sql.Timestamp.valueOf("2024-01-01 00:00:11"))
  ).toDF("k", "ts")

  test("numeric literal vs timestamp column compares as Unix seconds, truncating") {
    // reference filter.go:420-421: time.Time -> n.UTC().Unix() (whole
    // seconds); 10.7s truncates to 10s and must EQUAL 10, not exceed it
    val secs10 = java.sql.Timestamp.valueOf("2024-01-01 00:00:10").getTime / 1000
    assert(keysMatching(Cmp(FieldRef("ts"), CmpOp.Equal, secs10), times) == Set("a", "b"))
    assert(keysMatching(Cmp(FieldRef("ts"), CmpOp.GreaterThan, secs10), times) == Set("c"))
    assert(keysMatching(Cmp(FieldRef("ts"), CmpOp.GreaterThanOrEqual, secs10), times) == Set("a", "b", "c"))
    assert(keysMatching(Cmp(FieldRef("ts"), CmpOp.LessThanOrEqual, secs10), times) == Set("a", "b"))
    assert(keysMatching(Cmp(FieldRef("ts"), CmpOp.LessThan, secs10), times) == Set.empty)
    assert(keysMatching(In(FieldRef("ts"), Seq(secs10)), times) == Set("a", "b"))
    // string ops on a timestamp stay no-match
    assert(keysMatching(Cmp(FieldRef("ts"), CmpOp.Contains, "2024"), times) == Set.empty)
  }

  test("Unix-seconds timestamp compare reaches the parquet scan as a pushed filter") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tspush").toString
    times.write.parquet(s"$tmp/t.parquet")
    val onDisk = spark.read.parquet(s"$tmp/t.parquet")
    val secs10 = java.sql.Timestamp.valueOf("2024-01-01 00:00:10").getTime / 1000
    val plan = onDisk
      .filter(FilterCompiler.compile(
        Cmp(FieldRef("ts"), CmpOp.GreaterThanOrEqual, secs10), onDisk))
      .queryExecution.executedPlan.toString
    // the range rewrite must keep the raw column comparable: a cast on the
    // column side would leave PushedFilters with only IsNotNull
    assert(plan.contains("GreaterThanOrEqual(ts,"), s"timestamp bound not pushed:\n$plan")
  }

  test("IN with native timestamp literals still takes the isin path") {
    val t10 = java.sql.Timestamp.valueOf("2024-01-01 00:00:10")
    assert(keysMatching(In(FieldRef("ts"), Seq(t10)), times) == Set("a"))
    // mixed timestamp + numeric members: both semantics honored per member
    val secs10 = t10.getTime / 1000
    assert(keysMatching(In(FieldRef("ts"), Seq[Any](t10, secs10)), times) == Set("a", "b"))
  }

  test("NULL literal never matches; equality on missing column type is total") {
    assert(keysMatching(Cmp(FieldRef("num"), CmpOp.Equal, null), scalars) == Set.empty)
    // unresolvable path (schema-blind ctx would throw at execution only if
    // the column is truly absent; via df-compile the column must exist)
    assertThrows[org.apache.spark.sql.AnalysisException] {
      scalars.filter(FilterCompiler.compile(
        Cmp(FieldRef("nope"), CmpOp.Equal, 1L), scalars)).collect()
    }
  }

  test("Labeled inside a quantifier predicate is rejected loudly") {
    val node = NestedSliceWhere(FieldRef("items"), Quantifier.Any,
      Labeled("x", Cmp(FieldRef("q"), CmpOp.GreaterThan, 1L)))
    val df = Seq(("a", Seq(2L))).toDF("k", "items")
      .select(col("k"), transform(col("items"), q => struct(q.as("q"))).as("items"))
    assertThrows[IllegalArgumentException] {
      FilterCompiler.compileWithLabels(Group.and(node), df)
    }
  }

  test("uint64 literal: no int64 overflow, numeric-family compatible") {
    val u = U64(BigInt("18446744073709551615")) // 2^64 - 1
    assert(keysMatching(Cmp(FieldRef("num"), CmpOp.LessThan, u), scalars) == Set("a", "b", "d"))
    assert(keysMatching(Cmp(FieldRef("num"), CmpOp.Equal, u), scalars) == Set.empty)
    assert(keysMatching(In(FieldRef("num"), Seq(U64(BigInt(10)), U64(BigInt(30)))), scalars) == Set("a", "d"))
  }

  // --- labels (SearchResultMeta) -------------------------------------------

  test("labels: OR collects ALL matching branches, no short-circuit") {
    val node = Group.or(
      Labeled("big", Cmp(FieldRef("num"), CmpOp.GreaterThanOrEqual, 20L)),
      Labeled("hello", Cmp(FieldRef("s"), CmpOp.Contains, "hello")))
    val (pred, labels) = FilterCompiler.compileWithLabels(node, scalars)
    val out = scalars.filter(pred)
      .select(col("k"), array_join(labels, ",").as("l"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "hello", "b" -> "big", "d" -> "big"))
    // a row matching both branches reports both labels
    val both = Group.or(
      Labeled("n10", Cmp(FieldRef("num"), CmpOp.Equal, 10L)),
      Labeled("w", Cmp(FieldRef("s"), CmpOp.EndsWith, "world")))
    val (p2, l2) = FilterCompiler.compileWithLabels(both, scalars)
    val a = scalars.filter(p2).select(col("k"), array_join(l2, ",").as("l"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a("a") == "n10,w")
  }

  test("type-mismatch discipline applies INSIDE quantifiers (per-element type)") {
    // array<struct<v:long>>: a STRING literal against the long field must
    // compile to no-match inside the quantifier, exactly as it does at
    // top level — the elemCtx unwrap regression (the slice's ArrayType
    // reaching the struct matcher lost per-element typing entirely)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", Seq(Row(1L), Row(2L))),
        Row("b", Seq(Row(3L))))),
      StructType(Seq(
        StructField("k", StringType),
        StructField("xs", ArrayType(StructType(Seq(
          StructField("v", LongType))))))))
    val mism = NestedSliceWhere(FieldRef("xs"), Quantifier.Any,
      Cmp(FieldRef.Path(Seq("v")), CmpOp.Equal, "1"))
    assert(keysMatching(mism, df) == Set.empty,
      "string-vs-long inside a quantifier must be no-match, not implicit-cast")
    val ok = NestedSliceWhere(FieldRef("xs"), Quantifier.Any,
      Cmp(FieldRef.Path(Seq("v")), CmpOp.Equal, 3L))
    assert(keysMatching(ok, df) == Set("b"))
    // empty relative path: the element itself is the comparand, and its
    // leaf type participates in the discipline
    val leaf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("a", Seq(5L, 7L)))),
      StructType(Seq(StructField("k", StringType),
        StructField("ns", ArrayType(LongType)))))
    val leafMism = NestedSliceWhere(FieldRef("ns"), Quantifier.Any,
      Cmp(FieldRef.Path(Seq.empty), CmpOp.Equal, "5"))
    assert(keysMatching(leafMism, leaf) == Set.empty)
    val leafOk = NestedSliceWhere(FieldRef("ns"), Quantifier.Any,
      Cmp(FieldRef.Path(Seq.empty), CmpOp.Equal, 7L))
    assert(keysMatching(leafOk, leaf) == Set("a"))
  }

  test("shared label across OR branches reports once (distinct labels)") {
    val node = Group.or(
      Labeled("hot", Cmp(FieldRef("num"), CmpOp.Equal, 10L)),
      Labeled("hot", Cmp(FieldRef("s"), CmpOp.Contains, "hello")))
    val (p, l) = FilterCompiler.compileWithLabels(node, scalars)
    val a = scalars.filter(p).select(col("k"), array_join(l, ",").as("l"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a("a") == "hot", s"duplicate label leaked: $a")
  }

  // --- vector / geo ---------------------------------------------------------

  test("vector: dimension mismatch never matches; threshold respected") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", Seq(1.0f, 0.0f)),
        Row("b", Seq(0.0f, 1.0f)),
        Row("short", Seq(1.0f)))),
      StructType(Seq(StructField("k", StringType),
        StructField("v", ArrayType(FloatType)))))
    assert(keysMatching(VectorSimilar(FieldRef("v"), Array(1.0f, 0.0f), 0.9), df) == Set("a"))
  }

  test("geo: inside/outside radius; Null Island excluded") {
    val df = Seq(
      ("near", 10.1, 20.1),
      ("far", -40.0, 120.0),
      ("nullisland", 0.0, 0.0)
    ).toDF("k", "lat", "lon")
    assert(keysMatching(GeoWithin(FieldRef("lat"), FieldRef("lon"), 10.0, 20.0, 100.0), df) == Set("near"))
    assert(keysMatching(GeoWithin(FieldRef("lat"), FieldRef("lon"), 10.0, 20.0, 100.0,
      inside = false), df) == Set("far"))
  }
}
