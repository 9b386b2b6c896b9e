package graft.filters

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Compiles the [[FilterNode]] algebra to a Catalyst [[Column]] expression.
 *
 * Design stance (SURVEY.md §4, §7): the reference evaluates its filter tree
 * row-by-row in Go (reference: app/server/gateway/filter.go:123-312); here the
 * whole tree becomes ONE declarative Column so Catalyst can push scalar
 * conjuncts into the Parquet scan, reorder cheap predicates first, and keep
 * everything inside whole-stage codegen. No custom rule is needed — pushdown
 * and short-circuiting are free once the tree is a Column.
 *
 * Null discipline: the reference's "absent path => no match"
 * (reference: app/server/gateway/filter_native.go:369-371) falls out of SQL
 * three-valued logic — a NULL input propagates NULL through every leaf and
 * through the AND/OR tree (the algebra has no group-level NOT), and the
 * WHERE boundary treats NULL as no-match. Leaves are therefore NOT wrapped
 * in `coalesce(p, false)`: the wrapper would be semantically redundant AND
 * it blocks Parquet predicate pushdown (a coalesce'd comparison is opaque to
 * the data-source filter translator — at 100 TB that is the difference
 * between skipping row groups and scanning them). coalesce appears in
 * exactly two places where NULL *must* become a concrete false before
 * further logic: inside quantifier lambdas (per-element votes) and ahead of
 * explicit negation (PhraseMatch.negate). IS_EMPTY *matches* NULL by
 * definition.
 */
object FilterCompiler {

  /** Resolution context: how a relative path becomes a Column, and its type. */
  private final case class Ctx(
      resolve: Seq[String] => Column,
      typeOf: Seq[String] => Option[DataType])

  /** Compile against a DataFrame (schema-aware: IS_EMPTY branches on type,
    * and scalar compares apply the reference's type-mismatch ⇒ no-match
    * discipline — reference: app/server/gateway/filter.go:392-493). */
  def compile(node: FilterNode, df: DataFrame): Column =
    compileNode(node, rootCtx(Some(df.schema)))

  /** Compile schema-blind (IS_EMPTY only checks NULL for non-string paths;
    * scalar compares fall back to Spark implicit casts). */
  def compile(node: FilterNode): Column =
    compileNode(node, rootCtx(None))

  /**
   * Compile + per-row matched-labels column (SearchResultMeta semantics,
   * reference: proto/hydraide.proto:2779-2796, filter_native.go:24-77).
   * Every [[Labeled]] subtree is ALSO projected as its own boolean, so an OR
   * group never short-circuits label collection — a row matching several
   * labeled branches reports all of them. Returns (predicate,
   * matched_labels: sorted array<string> of the labels whose subtree
   * matched on that row).
   */
  def compileWithLabels(node: FilterNode, df: DataFrame): (Column, Column) = {
    val ctx = rootCtx(Some(df.schema))
    val pred = compileNode(node, ctx)
    val labeled = collectLabels(node)
    val labelsCol =
      if (labeled.isEmpty) array().cast(ArrayType(StringType))
      // array_distinct: two subtrees SHARING a label (or-ing two rules
      // under one name) must not emit the label twice — array_sort alone
      // would hand consumers ["hot","hot"]
      else array_sort(array_distinct(filter(
        array(labeled.map { case (lbl, n) =>
          when(noNull(compileNode(n, ctx)), lit(lbl))
        }: _*),
        e => e.isNotNull)))
    (pred, labelsCol)
  }

  private def collectLabels(node: FilterNode): Seq[(String, FilterNode)] = node match {
    case Labeled(l, c)   => (l -> c) +: collectLabels(c)
    case Group(_, cs)    => cs.flatMap(collectLabels)
    // Labels are per-ROW metadata; a label buried in a per-ELEMENT predicate
    // has no well-defined row projection. Silently dropping it (the old
    // behavior) loses data — reject loudly instead.
    case AnyElement(_, p)          => requireNoLabels(p, "AnyElement"); Nil
    case NestedSliceWhere(_, _, p) => requireNoLabels(p, "NestedSliceWhere"); Nil
    case _               => Nil
  }

  private def requireNoLabels(node: FilterNode, where: String): Unit = node match {
    case Labeled(l, _) => throw new IllegalArgumentException(
      s"Labeled('$l') inside $where is not supported: labels are per-row " +
        "metadata and a per-element match cannot be projected as a row " +
        "label — lift the label above the quantifier")
    case Group(_, cs)              => cs.foreach(requireNoLabels(_, where))
    case AnyElement(_, p)          => requireNoLabels(p, where)
    case NestedSliceWhere(_, _, p) => requireNoLabels(p, where)
    case _                         => ()
  }

  private def rootCtx(schema: Option[StructType]): Ctx = Ctx(
    resolve = parts => parts.tail.foldLeft(col(parts.head))((c, p) => c(p)),
    typeOf = parts => schema.flatMap(s => resolveType(s, parts)))

  private def elemCtx(elem: Column, elemType: Option[DataType]): Ctx = Ctx(
    resolve = parts => parts.foldLeft(elem)((c, p) => c(p)),
    typeOf = parts => elemType.map {
      // call sites pass the SLICE's resolved type, which is the ArrayType
      // itself (resolveType stops at the array for an exhausted path) —
      // without this unwrap the StructType case below never matched and
      // the type-mismatch / timestamp-seconds disciplines were silently
      // lost inside every quantifier
      case at: ArrayType => at.elementType
      case dt => dt
    }.flatMap { et =>
      if (parts.isEmpty) Some(et) // empty relative path = the element itself
      else et match {
        case st: StructType => resolveType(st, parts) // head = element field
        case _ => None
      }
    })

  /** Walk a StructType along `parts` (head = top-level column). */
  private def resolveType(schema: StructType, parts: Seq[String]): Option[DataType] = {
    def step(dt: DataType, rest: Seq[String]): Option[DataType] = rest match {
      case Seq() => Some(dt)
      case p +: tail => dt match {
        case st: StructType => st.find(_.name.equalsIgnoreCase(p)).flatMap(f => step(f.dataType, tail))
        case mt: MapType    => step(mt.valueType, tail)
        case at: ArrayType  => step(at.elementType, rest) // transparent for [*]-style use
        case _ => None
      }
    }
    schema.find(_.name.equalsIgnoreCase(parts.head)).flatMap(f => step(f.dataType, parts.tail))
  }

  private def fieldCol(ref: FieldRef, ctx: Ctx): Column = ref match {
    case FieldRef.Path(parts) => ctx.resolve(parts)
    // explicit null guard (the Mutations.sliceSize discipline): under
    // spark.sql.legacy.sizeOfNull — a supported deployment restore —
    // size(NULL) is -1, not NULL, and a missing slice would MATCH every
    // `#len < n` compare, violating the missing-path => no-match contract
    case FieldRef.Len(of) =>
      val c = ctx.resolve(of.parts)
      when(c.isNull, lit(null).cast(IntegerType)).otherwise(size(c))
  }

  private def noNull(c: Column): Column = coalesce(c, lit(false))

  // --- type-mismatch discipline (reference: filter.go:392-493) --------------
  // The reference coerces within the numeric family (toInt64/toUint64/
  // toFloat64 matrix) but returns NO MATCH for cross-family compares
  // (string vs number, bool vs number, ...). Spark's implicit casts would
  // instead stringify/parse — so when the column type is known we compile an
  // incompatible compare to lit(false) outright. Unknown types (schema-blind
  // compile, unresolvable path) keep legacy implicit-cast behavior.

  private def litFamily(v: Any): Char = v match {
    case _: String => 'S'
    case _: Boolean => 'B'
    case _: Byte | _: Short | _: Int | _: Long | _: Float | _: Double => 'N'
    case _: BigDecimal | _: BigInt | _: java.math.BigDecimal => 'N'
    case U64(_) => 'N'
    case _: java.sql.Timestamp | _: java.sql.Date => 'T'
    case _: java.time.Instant | _: java.time.LocalDate | _: java.time.LocalDateTime => 'T'
    case _ => '?'
  }

  private def colFamily(dt: DataType): Char = dt match {
    case StringType => 'S'
    case BooleanType => 'B'
    case _: NumericType => 'N'
    case TimestampType | DateType | TimestampNTZType => 'T'
    case _ => '?'
  }

  /** uint64 literals become Decimal(20,0) so values past Long.MaxValue
    * compare correctly instead of overflowing (filter.go:410-415). */
  private def litOf(v: Any): Column = v match {
    case U64(b) => lit(new java.math.BigDecimal(b.bigInteger)).cast(DecimalType(20, 0))
    case other  => lit(other)
  }

  private def typeOfField(f: FieldRef, ctx: Ctx): Option[DataType] = f match {
    case FieldRef.Path(parts) => ctx.typeOf(parts)
    case FieldRef.Len(_)      => Some(IntegerType)
  }

  private def compatible(f: FieldRef, v: Any, stringOp: Boolean, ctx: Ctx): Boolean =
    typeOfField(f, ctx) match {
      case Some(dt) =>
        val cf = colFamily(dt); val lf = litFamily(v)
        if (cf == '?' || lf == '?') true
        else if (stringOp) cf == 'S' && lf == 'S'
        else cf == lf
      case None => true
    }

  // --- numeric literal vs timestamp column: Unix-seconds coercion -----------
  // The reference stores time.Time and coerces it to Unix seconds for
  // numeric compares (filter.go:420-421 `n.UTC().Unix()` — i.e. the COLUMN
  // is truncated to whole seconds, then integer-compared). Mirroring that
  // with unix_seconds(col) would kill parquet pushdown, so each truncating
  // compare is rewritten as an equivalent RANGE predicate on the raw column
  // (floor(x) >= n  <=>  x >= n, etc. for integer n) — exact reference
  // semantics, still a pushdown-eligible timestamp comparison.

  private def isTsNumericLit(f: FieldRef, v: Any, ctx: Ctx): Boolean =
    typeOfField(f, ctx).exists(dt =>
      dt == TimestampType || dt == TimestampNTZType) &&
      litFamily(v) == 'N' && !v.isInstanceOf[U64]

  /** Reference toInt64: floats truncate toward zero (filter.go:418-419). */
  private def litSeconds(v: Any): Long = v match {
    case n: Byte => n.toLong
    case n: Short => n.toLong
    case n: Int => n.toLong
    case n: Long => n
    case n: Float => n.toLong
    case n: Double => n.toLong
    case n: BigDecimal => n.toLong
    case n: BigInt => n.toLong
    case n: java.math.BigDecimal => n.longValue
    case other => throw new IllegalArgumentException(s"not a numeric literal: $other")
  }

  private def tsSecondsCompare(c: Column, dt: DataType, op: CmpOp, secs: Long): Column = {
    // cast the LITERAL to the column's exact type (constant-folded), never
    // the column — a cast on the column side would block parquet pushdown.
    // For NTZ the epoch literal is interpreted in the session tz (pinned
    // UTC by every entry point), matching the reference's UTC Unix seconds.
    def ts(n: Long) = timestamp_seconds(lit(n)).cast(dt)
    op match {
      case CmpOp.Equal              => c >= ts(secs) && c < ts(secs + 1)
      case CmpOp.NotEqual           => !(c >= ts(secs) && c < ts(secs + 1))
      case CmpOp.GreaterThan        => c >= ts(secs + 1)
      case CmpOp.GreaterThanOrEqual => c >= ts(secs)
      case CmpOp.LessThan           => c < ts(secs)
      case CmpOp.LessThanOrEqual    => c < ts(secs + 1)
      case _                        => lit(false) // string ops on time: no match
    }
  }

  /** One scalar compare with the full coercion discipline — shared by Cmp
    * and by In() members that need non-isin compilation. */
  private def scalarCompare(f: FieldRef, op: CmpOp, v: Any, ctx: Ctx): Column = {
    val stringOp = op match {
      case CmpOp.Contains | CmpOp.NotContains | CmpOp.StartsWith | CmpOp.EndsWith => true
      case _ => false
    }
    if (!stringOp && isTsNumericLit(f, v, ctx))
      tsSecondsCompare(fieldCol(f, ctx), typeOfField(f, ctx).get, op, litSeconds(v))
    else if (!compatible(f, v, stringOp, ctx)) lit(false) // mismatch => no match
    else {
      val c = fieldCol(f, ctx)
      val l = litOf(v)
      op match {
        case CmpOp.Equal              => c === l
        case CmpOp.NotEqual           => c =!= l
        case CmpOp.GreaterThan        => c > l
        case CmpOp.GreaterThanOrEqual => c >= l
        case CmpOp.LessThan           => c < l
        case CmpOp.LessThanOrEqual    => c <= l
        case CmpOp.Contains           => c.contains(l)
        case CmpOp.NotContains        => !c.contains(l)
        case CmpOp.StartsWith         => c.startsWith(l)
        case CmpOp.EndsWith           => c.endsWith(l)
      }
    }
  }

  private def compileNode(node: FilterNode, ctx: Ctx): Column = node match {

    case Group(_, Seq()) => lit(true) // empty group = pass-all (proto:2554-2601)
    case Group(BoolOp.And, cs) => cs.map(compileNode(_, ctx)).reduce(_ && _)
    case Group(BoolOp.Or, cs)  => cs.map(compileNode(_, ctx)).reduce(_ || _)

    case Labeled(_, child) => compileNode(child, ctx) // label is metadata-only

    case Cmp(f, op, v) => scalarCompare(f, op, v, ctx)

    case IsEmpty(f, negate) =>
      val c = fieldCol(f, ctx)
      val dt = f match {
        case FieldRef.Path(parts) => ctx.typeOf(parts)
        case FieldRef.Len(_)      => Some(IntegerType)
      }
      val empty = dt match {
        case Some(StringType)                  => c.isNull || c === lit("")
        case Some(_: ArrayType) | Some(_: MapType) => c.isNull || size(c) === lit(0)
        case _                                 => c.isNull
      }
      if (negate) !empty else empty

    case HasKey(f, k, negate) =>
      val p = map_contains_key(fieldCol(f, ctx), lit(k))
      if (negate) !p else p

    case SliceContains(f, v, negate) =>
      // same literal/type discipline as scalar Cmp: litOf widens U64 to
      // Decimal(20,0) (a bare lit(U64) throws "Unsupported literal
      // type"), and a cross-family value — known element type vs the
      // literal — can never match, negated or not (the pinned
      // null-and-mismatch-never-match rule), instead of Spark's
      // implicit-cast behavior
      val elemFam = (f match {
        case FieldRef.Path(parts) => ctx.typeOf(parts)
        case _                    => None
      }).collect { case at: ArrayType => colFamily(at.elementType) }
      val fam = litFamily(v)
      if (elemFam.exists(ef => ef != '?' && fam != '?' && ef != fam)) lit(false)
      else {
        val p = array_contains(fieldCol(f, ctx), litOf(v))
        if (negate) !p else p
      }

    case SliceContainsSubstring(f, sub, negate) =>
      // case-INsensitive by spec (proto:2042-2043) vs case-sensitive CONTAINS.
      val p = exists(fieldCol(f, ctx), e => lower(e).contains(lit(sub.toLowerCase)))
      if (negate) !p else p

    case In(f, vs) =>
      // EVERY member is validated against the column family (not just the
      // head): a mismatched member can never match, so it is dropped — a
      // mixed list like In(numCol, Seq(1L, "2")) matches only the 1L, and
      // an all-mismatch list compiles to no-match. Members that need a
      // coercion (U64 decimal widening, numeric-vs-timestamp Unix seconds)
      // fall back to an OR of scalar compares; the plain path stays `isin`
      // (InSet: pushdown-eligible).
      val good = vs.filter(v =>
        compatible(f, v, stringOp = false, ctx) || isTsNumericLit(f, v, ctx))
      if (good.isEmpty) lit(false)
      else if (good.exists(v => v.isInstanceOf[U64] || isTsNumericLit(f, v, ctx)))
        good.map(v => scalarCompare(f, CmpOp.Equal, v, ctx)).reduce(_ || _)
      else fieldCol(f, ctx).isin(good: _*)

    case AnyElement(slice, pred) =>
      val arr = ctx.resolve(slice.parts)
      val elemType = ctx.typeOf(slice.parts)
      exists(arr, e => noNull(compileNode(pred, elemCtx(e, elemType))))

    case NestedSliceWhere(slice, q, elemFilter) =>
      val arr = ctx.resolve(slice.parts)
      val elemType = ctx.typeOf(slice.parts)
      def pred(e: Column): Column = noNull(compileNode(elemFilter, elemCtx(e, elemType)))
      q match {
        case Quantifier.Any  => exists(arr, pred)
        case Quantifier.All  => forall(arr, pred)
        case Quantifier.None => !exists(arr, pred)
        case Quantifier.Count(op, n) =>
          // null-guarded like FieldRef.Len: legacy sizeOfNull deployments
          // get -1 from size(NULL), which would MATCH <, <=, != compares
          val cnt = when(arr.isNull, lit(null).cast(IntegerType))
            .otherwise(size(filter(arr, pred(_)))) // NULL => no match
          (op match {
            case CmpOp.Equal              => cnt === n
            case CmpOp.NotEqual           => cnt =!= n
            case CmpOp.GreaterThan        => cnt > n
            case CmpOp.GreaterThanOrEqual => cnt >= n
            case CmpOp.LessThan           => cnt < n
            case CmpOp.LessThanOrEqual    => cnt <= n
            case other => throw new IllegalArgumentException(s"COUNT quantifier with $other")
          })
      }

    case PhraseMatch(path, words, negate) =>
      val m = ctx.resolve(path.parts)
      val p = words match {
        case Seq()  => lit(true)
        case Seq(w) => map_contains_key(m, lit(w))
        case w0 +: rest =>
          // positions of w0 where every following word sits at pos+i
          // (reference: app/server/gateway/filter.go:560-589)
          exists(element_at(m, lit(w0)), p0 =>
            rest.zipWithIndex.map { case (w, i) =>
              coalesce(array_contains(element_at(m, lit(w)), p0 + lit(i + 1)), lit(false))
            }.reduce(_ && _))
      }
      // "phrase absent" (first word missing => NULL) is a non-match BEFORE
      // negation: NOT(phrase) must match docs lacking the words entirely
      val matched = noNull(p)
      if (negate) !matched else matched

    case PhraseInTokens(path, words, negate) =>
      // O(tokens × |phrase|) sliding check over the token array — the scan
      // form of phrase search (reference: filter.go:560-589 semantics) as a
      // zero-allocation codegen'd Expression (TokensContainPhrase); the
      // earlier HOF form allocated a window-index array per row.
      val toks = ctx.resolve(path.parts)
      val p = words match {
        case Seq() => lit(true)
        case ws    => graft.functions.PhraseFunctions.phraseInTokens(toks, ws)
      }
      val matched = noNull(p)
      if (negate) !matched else matched

    case VectorSimilar(path, query, minSim) =>
      val v = ctx.resolve(path.parts)
      val score = graft.functions.VectorFunctions.cosine(v, query)
      size(v) === lit(query.length) && score >= lit(minSim)

    case GeoWithin(latP, lonP, refLat, refLon, radiusKm, inside) =>
      val lat = ctx.resolve(latP.parts).cast(DoubleType)
      val lon = ctx.resolve(lonP.parts).cast(DoubleType)
      val dist = graft.functions.GeoFunctions.haversineKm(lat, lon, lit(refLat), lit(refLon))
      val notNullIsland = !(lat === lit(0.0) && lon === lit(0.0))
      val p =
        if (inside) {
          // conservative bounding-box pre-filter ANDed in front so Catalyst
          // short-circuits the trig for far-away rows (reference: filter.go:34-56)
          graft.functions.GeoFunctions.bboxPrefilter(lat, lon, refLat, refLon, radiusKm) &&
            dist <= lit(radiusKm)
        } else dist > lit(radiusKm)
      notNullIsland && p
  }
}
