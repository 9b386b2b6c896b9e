package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{IndexRead, KeyProbe}
import graft.filters.{Cmp, CmpOp, FieldRef}

/**
 * Keyset pagination (IndexRead continuation) and KeyProbe regime-switch
 * coverage — both regimes of every branch actually execute here, including
 * the >threshold broadcast paths and the nullable-axis keyset semantics.
 */
class KeysetProbeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def orders: DataFrame = Tables(spark, sf, "orders")

  // --- keyset pagination ----------------------------------------------------

  private def paginate(df: DataFrame, axis: String, order: IndexRead.Order,
                       pageSize: Int): Seq[(Any, Any)] = {
    val base = IndexRead.IndexQuery(
      orderBy = Seq((axis, order)), limit = Some(pageSize), keyCol = "k")
    var q = base
    val out = Seq.newBuilder[(Any, Any)]
    var page = IndexRead.run(df, q).collect()
    while (page.nonEmpty) {
      out ++= page.map(r => (r.getAs[Any](axis), r.getAs[Any]("k")))
      val tok = page.last
      q = base.copy(afterAxis = Seq(tok.getAs[Any](axis)),
        afterKey = Some(tok.getAs[Any]("k")))
      page = IndexRead.run(df, q).collect()
    }
    out.result()
  }

  test("keyset page 2 equals the OFFSET formulation exactly") {
    val base = IndexRead.IndexQuery(
      filter = Some(Cmp(FieldRef("o_orderstatus"), CmpOp.Equal, "O")),
      orderBy = Seq(("o_orderdate", IndexRead.Desc)),
      keyCol = "o_orderkey")
    val tok = IndexRead.run(orders, base.copy(limit = Some(20))).collect().last
    val keyset = IndexRead.run(orders, base.copy(limit = Some(20),
      afterAxis = Seq(tok.getAs[Any]("o_orderdate")),
      afterKey = Some(tok.getAs[Any]("o_orderkey")))).collect()
    val offset = IndexRead.run(orders, base.copy(from = 20, limit = Some(20))).collect()
    assert(keyset.toSeq == offset.toSeq)
  }

  test("keyset walk over a NULLABLE axis visits every row exactly once (asc & desc)") {
    val df = Seq(
      (1L, Option(10)), (2L, None: Option[Int]), (3L, Option(5)),
      (4L, None: Option[Int]), (5L, Option(10)), (6L, Option(7)),
      (7L, None: Option[Int]), (8L, Option(5))).toDF("k", "axis")
    for (order <- Seq(IndexRead.Asc, IndexRead.Desc)) {
      val sort = if (order == IndexRead.Asc) col("axis").asc else col("axis").desc
      val expected = df.orderBy(sort, col("k").asc).collect()
        .map(r => (r.getAs[Any]("axis"), r.getAs[Any]("k"))).toSeq
      val walked = paginate(df, "axis", order, pageSize = 3)
      assert(walked == expected, s"order=$order lost or reordered rows")
    }
  }

  test("keyset walk over TWO axes (ties + NULLs in both) visits every row exactly once") {
    // axis ties spanning page boundaries on BOTH columns force the
    // row-lexicographic tie chain (a = tokA AND (b after tokB ...)) to
    // actually exercise its recursive branch
    val rnd = new scala.util.Random(7)
    val df = (1L to 40L).map { k =>
      (k,
        if (rnd.nextInt(5) == 0) null else Integer.valueOf(rnd.nextInt(3)),
        if (rnd.nextInt(5) == 0) null else Integer.valueOf(rnd.nextInt(3)))
    }.toDF("k", "a", "b")
    for ((oa, ob) <- Seq((IndexRead.Asc, IndexRead.Desc), (IndexRead.Desc, IndexRead.Asc))) {
      val base = IndexRead.IndexQuery(
        orderBy = Seq(("a", oa), ("b", ob)), limit = Some(7), keyCol = "k")
      def sort(c: String, o: IndexRead.Order) =
        if (o == IndexRead.Asc) col(c).asc else col(c).desc
      val expected = df.orderBy(sort("a", oa), sort("b", ob), col("k").asc)
        .collect().map(_.getAs[Long]("k")).toSeq
      var q = base
      val walked = Seq.newBuilder[Long]
      var page = IndexRead.run(df, q).collect()
      while (page.nonEmpty) {
        walked ++= page.map(_.getAs[Long]("k"))
        val tok = page.last
        q = base.copy(
          afterAxis = Seq(tok.getAs[Any]("a"), tok.getAs[Any]("b")),
          afterKey = Some(tok.getAs[Any]("k")))
        page = IndexRead.run(df, q).collect()
      }
      assert(walked.result() == expected, s"orders ($oa,$ob) lost or reordered rows")
    }
  }

  test("keyset continuation from a NULL-axis token does not drop the null group's ties") {
    // token = (axis NULL, k = 2): ASC nulls-first means rows 4 and 7 (also
    // null axis, larger key) come next — a bare `axis > NULL` would drop them
    val df = Seq(
      (1L, Option(1)), (2L, None: Option[Int]), (4L, None: Option[Int]),
      (7L, None: Option[Int])).toDF("k", "axis")
    val q = IndexRead.IndexQuery(orderBy = Seq(("axis", IndexRead.Asc)),
      keyCol = "k", afterAxis = Seq(null), afterKey = Some(2L))
    val got = IndexRead.run(df, q).collect().map(_.getAs[Long]("k")).toSeq
    assert(got == Seq(4L, 7L, 1L)) // null group continues, then values
  }

  test("keyset plan: pushed range predicate, no Offset node") {
    val df = SparkEntry.queries("q_index_keyset")(spark, sf)
    val physical = df.queryExecution.executedPlan.toString
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(physical.contains("PushedFilters:") &&
      physical.contains("LessThan(o_orderdate"),
      s"keyset bound did not reach the scan:\n$physical")
    assert(!optimized.contains("Offset"),
      s"keyset page must not re-count an offset:\n$optimized")
    // the OFFSET formulation, by contrast, does carry one — the assert above
    // is meaningful
    val off = SparkEntry.queries("q_index_order_limit")(spark, sf)
    assert(off.queryExecution.optimizedPlan.toString.contains("Offset"))
  }

  test("fromMany global limit truncates the source-ordered stream (proto:2883-2914)") {
    // reference contract: per-swamp results in listed order; MaxResults
    // stops after N TOTAL — no merged re-sort across sources
    val df = Seq((1L, 10), (2L, 30), (3L, 20), (4L, 40)).toDF("k", "v")
    val qAsc = IndexRead.IndexQuery(
      orderBy = Seq(("v", IndexRead.Asc)), limit = Some(3), keyCol = "k")
    val qDesc = IndexRead.IndexQuery(
      orderBy = Seq(("v", IndexRead.Desc)), limit = Some(3), keyCol = "k")
    val got = IndexRead.fromMany(
      Seq(df -> qAsc, df -> qDesc), globalLimit = Some(4))
      .select("k").collect().map(_.getLong(0)).toSeq
    // source 1's full page (v asc: 1,3,2), then source 2's FIRST row only
    // (v desc starts at 4) — not the 4 largest/smallest of a merged sort
    assert(got == Seq(1L, 3L, 2L, 4L),
      s"global limit must truncate in source order, got $got")
  }

  // --- KeyProbe regimes -----------------------------------------------------

  private val bigKeys: Seq[Any] = (1L to 10001L).map(k => k: Any)

  test("inline regime (10 keys): pushed In filter, no join") {
    val p = KeyProbe.semi(orders, "o_orderkey", (1L to 10L).map(k => k: Any))
      .queryExecution.executedPlan.toString
    assert(p.contains("In(o_orderkey"), s"no pushed In:\n$p")
    assert(!p.contains("Join"), s"inline regime must not join:\n$p")
  }

  test("broadcast regime (10,001 keys): BroadcastHashJoin semi/anti, table side never shuffles") {
    val semi = KeyProbe.semi(orders, "o_orderkey", bigKeys)
    val anti = KeyProbe.anti(orders, "o_orderkey", bigKeys)
    val pSemi = semi.queryExecution.executedPlan.toString
    val pAnti = anti.queryExecution.executedPlan.toString
    assert(pSemi.contains("BroadcastHashJoin") && pSemi.contains("LeftSemi"), pSemi)
    assert(pAnti.contains("BroadcastHashJoin") && pAnti.contains("LeftAnti"), pAnti)
    assert(!pSemi.contains("SortMergeJoin") && !pSemi.contains("Exchange hashpartitioning"),
      s"big side must stream, not shuffle:\n$pSemi")
    // and the regimes return the same rows (bound both sides: the table
    // also holds keys BELOW the probe range, e.g. orderkey 0)
    val inRange = col("o_orderkey") >= 1L && col("o_orderkey") <= 10001L
    assert(semi.count() == orders.filter(inRange).count())
    assert(anti.count() == orders.filter(!inRange).count())
  }

  test("broadcast presence (10,001 keys): one row per probed key, correct booleans") {
    val pres = KeyProbe.presence(orders, "o_orderkey", bigKeys)
    assert(pres.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val m = pres.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(m.size == 10001)
    val present = orders
      .filter(col("o_orderkey") >= 1L && col("o_orderkey") <= 10001L)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(m.count(_._2) == present.size)
    assert(present.forall(m(_)))
  }

  test("regimes agree on semi/anti/presence; anti keeps NULL-key rows in both") {
    val df = Seq(Option(1L), Option(2L), Option(3L), None, Option(5L)).toDF("k")
    val keys: Seq[Any] = Seq(2L, 3L, 42L)
    def rows(d: DataFrame) = d.collect().map(_.toSeq).toSet
    for ((inline, bcast) <- Seq(
      (KeyProbe.semi(df, "k", keys), KeyProbe.semi(df, "k", keys, threshold = 1)),
      (KeyProbe.anti(df, "k", keys), KeyProbe.anti(df, "k", keys, threshold = 1)),
      (KeyProbe.presence(df, "k", keys), KeyProbe.presence(df, "k", keys, threshold = 1))))
      assert(rows(inline) == rows(bcast))
    assert(rows(KeyProbe.anti(df, "k", keys)) ==
      Set(Seq(1L), Seq(null), Seq(5L)), "anti must keep the null-key row")
    assert(rows(KeyProbe.presence(df, "k", keys)) ==
      Set(Seq(2L, true), Seq(3L, true), Seq(42L, false)))
  }

  test("a NULL in the probe key list: regimes agree, nothing matches it") {
    // inline `!isin(...null...)` would evaluate NULL for every non-matching
    // row and drop them all — the null probe key must be stripped up front
    val df = Seq(Option(1L), Option(2L), None, Option(5L)).toDF("k")
    val keys: Seq[Any] = Seq(2L, null, 42L)
    def rows(d: DataFrame) = d.collect().map(_.toSeq).toSet
    for ((inline, bcast) <- Seq(
      (KeyProbe.semi(df, "k", keys), KeyProbe.semi(df, "k", keys, threshold = 1)),
      (KeyProbe.anti(df, "k", keys), KeyProbe.anti(df, "k", keys, threshold = 1)),
      (KeyProbe.presence(df, "k", keys), KeyProbe.presence(df, "k", keys, threshold = 1))))
      assert(rows(inline) == rows(bcast))
    assert(rows(KeyProbe.semi(df, "k", keys)) == Set(Seq(2L)))
    assert(rows(KeyProbe.anti(df, "k", keys)) == Set(Seq(1L), Seq(null), Seq(5L)))
    // presence still answers one row per REQUESTED key — the null probe key
    // keeps its row and is simply never present
    assert(rows(KeyProbe.presence(df, "k", keys)) ==
      Set(Seq(2L, true), Seq(null, false), Seq(42L, false)))
  }

  test("presence works when the probed table's key column is itself named `key`") {
    val df = Seq(1L, 2L, 3L).toDF("key")
    val got = KeyProbe.presence(df, "key", Seq(2L, 9L), threshold = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(2L -> true, 9L -> false))
  }

  // --- table-probe (bloom) regime -------------------------------------------

  test("bloom semiJoin: bloom pre-filter in the plan, rows exactly the IN-subquery set") {
    val probe = Tables(spark, sf, "customer").filter(col("c_mktsegment") === "BUILDING")
    val got = KeyProbe.semiJoin(orders, "o_custkey", probe, "c_custkey",
      expectedKeys = 1000)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BloomMightContain") || plan.contains("bloommightcontain"),
      s"bloom probe missing from plan:\n$plan")
    val want = orders.createOrReplaceTempView("o_bl")
    probe.createOrReplaceTempView("c_bl")
    val exact = spark.sql(
      "SELECT count(*) FROM o_bl WHERE o_custkey IN (SELECT c_custkey FROM c_bl)")
      .head().getLong(0)
    assert(got.count() == exact)
  }

  test("bloom antiJoin: definite-miss rows skip the join; result is the exact complement") {
    val probe = Tables(spark, sf, "customer").filter(col("c_mktsegment") === "BUILDING")
    val anti = KeyProbe.antiJoin(orders, "o_custkey", probe, "c_custkey",
      expectedKeys = 1000)
    assert(anti.count() + KeyProbe.semiJoin(orders, "o_custkey", probe, "c_custkey",
      1000).count() == orders.count())
    // null big-side keys are kept (never members of any probe set)
    val df = Seq(Option(1L), Option(2L), None).toDF("k")
    val pr = Seq(2L).toDF("pk")
    val got = KeyProbe.antiJoin(df, "k", pr, "pk", expectedKeys = 10)
      .collect().map(_.toSeq).toSet
    assert(got == Set(Seq(1L), Seq(null)))
  }

  test("bloom expression: no false negatives over inserted keys, string + long") {
    val bfL = Tables(spark, sf, "customer").stat.bloomFilter("c_custkey", 1000, 0.01)
    val allL = Tables(spark, sf, "customer")
      .filter(!graft.functions.BloomFunctions.mightContain(col("c_custkey"), bfL))
    assert(allL.count() == 0, "bloom dropped an inserted long key")
    val bfS = Tables(spark, sf, "customer").stat.bloomFilter("c_mktsegment", 10, 0.01)
    val allS = Tables(spark, sf, "customer")
      .filter(!graft.functions.BloomFunctions.mightContain(col("c_mktsegment"), bfS))
    assert(allS.count() == 0, "bloom dropped an inserted string key")
  }
}
