package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.filters._
import graft.operators._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF, GeoFunctions => GF}

/**
 * Driver contract: every operator from SURVEY.md §2 appears as a named query
 * with a DuckDB oracle where the semantics are SQL-expressible.
 *
 * Conventions shared by Spark + oracle sides (driver hash-compares after
 * sorting columns by name):
 *  - every computed column is aliased identically on both sides;
 *  - floating aggregates are round()ed to kill accumulation-order noise;
 *  - every LIMIT/OFFSET query carries a total order (unique tie-break key).
 */
object SparkEntry {

  /** A query + its optional DuckDB oracle, kept adjacent so names/columns
    * can never drift apart. */
  private final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ==========================================================================
  // §2.2 filters / predicates (orders = the reference's bucket-matrix swamp:
  // tenant=o_custkey, status=o_orderstatus, score=o_totalprice)
  // ==========================================================================

  private val filterQueries = Seq(
    Q("q_filter_eq",
      (s, d) => IndexRead.run(t(s, d, "orders"),
        IndexRead.IndexQuery(
          filter = Some(Cmp(FieldRef("o_custkey"), CmpOp.Equal, 42L)),
          keyCol = "o_orderkey")),
      Some("SELECT * FROM orders WHERE o_custkey = 42")),

    Q("q_filter_and_range",
      (s, d) => t(s, d, "orders").filter(FilterCompiler.compile(Group.and(
        Cmp(FieldRef("o_orderstatus"), CmpOp.Equal, "O"),
        Cmp(FieldRef("o_totalprice"), CmpOp.GreaterThan, 150000.0),
        Cmp(FieldRef("o_totalprice"), CmpOp.LessThanOrEqual, 300000.0)))),
      Some("SELECT * FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 150000.0 AND o_totalprice <= 300000.0")),

    Q("q_filter_or",
      (s, d) => t(s, d, "orders").filter(FilterCompiler.compile(Group.or(
        Cmp(FieldRef("o_custkey"), CmpOp.Equal, 5L),
        Cmp(FieldRef("o_custkey"), CmpOp.Equal, 6L),
        Group.and(
          Cmp(FieldRef("o_orderstatus"), CmpOp.Equal, "F"),
          Cmp(FieldRef("o_totalprice"), CmpOp.LessThan, 5000.0))))),
      Some("SELECT * FROM orders WHERE o_custkey = 5 OR o_custkey = 6 OR (o_orderstatus = 'F' AND o_totalprice < 5000.0)")),

    Q("q_filter_in",
      (s, d) => t(s, d, "orders").filter(FilterCompiler.compile(
        In(FieldRef("o_custkey"), Seq(1L, 2L, 3L, 10L, 20L)))),
      Some("SELECT * FROM orders WHERE o_custkey IN (1,2,3,10,20)")),

    Q("q_filter_not_equal",
      (s, d) => t(s, d, "orders").filter(FilterCompiler.compile(Group.and(
        Cmp(FieldRef("o_orderstatus"), CmpOp.NotEqual, "O"),
        Cmp(FieldRef("o_custkey"), CmpOp.LessThanOrEqual, 50L)))),
      Some("SELECT * FROM orders WHERE o_orderstatus <> 'O' AND o_custkey <= 50")),

    Q("q_filter_string_ops",
      (s, d) => t(s, d, "part").filter(FilterCompiler.compile(Group.and(
        Cmp(FieldRef("p_name"), CmpOp.Contains, "re"),
        Cmp(FieldRef("p_type"), CmpOp.StartsWith, "S"),
        Cmp(FieldRef("p_type"), CmpOp.EndsWith, "D")))),
      Some("SELECT * FROM part WHERE p_name LIKE '%re%' AND p_type LIKE 'S%' AND p_type LIKE '%D'")),

    Q("q_filter_empty_group", // empty FilterGroup = pass-all (proto:2554-2601)
      (s, d) => t(s, d, "nation").filter(FilterCompiler.compile(Group.passAll)),
      Some("SELECT * FROM nation")),

    Q("q_filter_time_window", // half-open [from, to) — beacon.go:1435-1500
      (s, d) => IndexRead.run(t(s, d, "orders"), IndexRead.IndexQuery(
        timeAxis = Some("o_orderdate"),
        fromTime = Some(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")),
        toTime = Some(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")),
        keyCol = "o_orderkey")),
      Some("SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'")),

    Q("q_keys_only", // KeysOnly projection => column pruning (gateway.go:726-732)
      (s, d) => IndexRead.run(t(s, d, "orders"), IndexRead.IndexQuery(
        filter = Some(Cmp(FieldRef("o_totalprice"), CmpOp.GreaterThan, 300000.0)),
        keyCol = "o_orderkey", keysOnly = true)),
      Some("SELECT o_orderkey FROM orders WHERE o_totalprice > 300000.0")),

    Q("q_include_exclude", // IncludedKeys/ExcludeKeys pre-filters (proto:2830-2844)
      (s, d) => IndexRead.run(t(s, d, "customer"), IndexRead.IndexQuery(
        includeKeys = (1L to 40L),
        excludeKeys = Seq(5L, 10L, 15L),
        keyCol = "c_custkey")),
      Some("SELECT * FROM customer WHERE c_custkey BETWEEN 1 AND 40 AND c_custkey NOT IN (5,10,15)")),

    Q("q_is_empty", // IS_EMPTY / IS_NOT_EMPTY (filter_native.go:88-95)
      (s, d) => t(s, d, "documents")
        .withColumn("maybe", when(col("doc_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("source")))
        .filter(FilterCompiler.compile(IsEmpty(FieldRef("maybe")))
          .or(FilterCompiler.compile(Cmp(FieldRef("lang"), CmpOp.Equal, "fr"))))
        .select(col("doc_id"), col("lang")),
      Some("""SELECT doc_id, lang FROM (SELECT doc_id, lang, CASE WHEN doc_id % 7 = 0 THEN NULL ELSE source END AS maybe FROM documents) WHERE maybe IS NULL OR lang = 'fr'""")))

  // ==========================================================================
  // §2.5/2.6 ordered paginated reads (GetByIndex* family)
  // ==========================================================================

  private val indexQueries = Seq(
    Q("q_index_order_limit", // axis sort + From offset + Limit (proto:1349-1445)
      (s, d) => IndexRead.run(t(s, d, "orders"), IndexRead.IndexQuery(
        filter = Some(Cmp(FieldRef("o_orderstatus"), CmpOp.Equal, "O")),
        orderBy = Seq(("o_orderdate", IndexRead.Desc)),
        from = 10, limit = Some(20), keyCol = "o_orderkey")),
      Some("SELECT * FROM orders WHERE o_orderstatus = 'O' ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 20 OFFSET 10")),

    Q("q_index_value_axis", // VALUE_* beacon axis => ORDER BY value column
      (s, d) => IndexRead.run(t(s, d, "orders"), IndexRead.IndexQuery(
        orderBy = Seq(("o_totalprice", IndexRead.Asc)),
        limit = Some(15), keyCol = "o_orderkey")),
      Some("SELECT * FROM orders ORDER BY o_totalprice ASC, o_orderkey ASC LIMIT 15")),

    Q("q_index_from_many", // GetByIndexStreamFromMany (proto:2883-2914)
      (s, d) => {
        val orders = t(s, d, "orders")
        IndexRead.fromMany(Seq(
          orders.filter(col("o_orderstatus") === "F") ->
            IndexRead.IndexQuery(orderBy = Seq(("o_totalprice", IndexRead.Desc)),
              limit = Some(10), keyCol = "o_orderkey"),
          orders.filter(col("o_orderstatus") === "O") ->
            IndexRead.IndexQuery(orderBy = Seq(("o_totalprice", IndexRead.Desc)),
              limit = Some(10), keyCol = "o_orderkey")),
          globalLimit = None)
      },
      Some("""(SELECT * FROM orders WHERE o_orderstatus = 'F' ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10) UNION ALL (SELECT * FROM orders WHERE o_orderstatus = 'O' ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10)""")),

    Q("q_topk", // top-k = TakeOrderedAndProject, no global sort shuffle
      (s, d) => t(s, d, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(25)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
      Some("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 25")))

  // ==========================================================================
  // §2.4 aggregations (+ Spark-native extensions the reference lacks)
  // ==========================================================================

  private val aggQueries = Seq(
    Q("q1_agg", // grouped hash agg with partial (map-side) combine
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, round(avg(l_quantity),6) AS avg_qty, count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    Q("q_count", // Count RPC (proto:1559-1589)
      (s, d) => t(s, d, "lineitem").agg(count(lit(1)).as("cnt")),
      Some("SELECT count(*) AS cnt FROM lineitem")),

    Q("q_count_matching", // CountMatching / Cap pre-count (beacon.go:1161-1186)
      (s, d) => t(s, d, "orders")
        .filter(FilterCompiler.compile(Group.and(
          Cmp(FieldRef("o_orderstatus"), CmpOp.Equal, "F"),
          Cmp(FieldRef("o_totalprice"), CmpOp.GreaterThan, 100000.0))))
        .agg(count(lit(1)).as("cnt")),
      Some("SELECT count(*) AS cnt FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0")),

    Q("q_distinct_set", // Uint32Slice dedup-set semantics: per-key sorted set
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("status_set"),
          countDistinct(col("o_orderpriority")).as("n_prio")),
      Some("SELECT o_custkey, array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS status_set, count(DISTINCT o_orderpriority) AS n_prio FROM orders GROUP BY o_custkey")),

    Q("q_slice_size", // Uint32SliceSize = set cardinality (proto:2192-2209)
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(countDistinct(col("l_partkey")).as("set_size")),
      Some("SELECT l_suppkey, count(DISTINCT l_partkey) AS set_size FROM lineitem GROUP BY l_suppkey")),

    Q("q_approx_distinct", // HLL — the 100 TB substitute for exact distinct
      (s, d) => t(s, d, "lineitem")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
             countDistinct(col("l_partkey")).as("exact_parts")),
      None), // sketch values are engine-specific: rows-only check

    Q("q_rollup", // grouping-sets surface the reference lacks (§2.4)
      (s, d) => t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty")),
      Some("SELECT l_returnflag, l_linestatus, count(*) AS cnt, round(sum(l_quantity),2) AS sum_qty FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)")))

  // ==========================================================================
  // assembled
  // ==========================================================================

  private val allQueries: Seq[Q] =
    filterQueries ++ indexQueries ++ aggQueries

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_index_order_limit")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
