package graft.filters

/**
 * Pure-Scala AST for the reference's filter algebra.
 *
 * Re-expresses the protobuf filter tree of the reference engine
 * (reference: proto/hydraide.proto:2489-2796 — FilterGroup, TreasureFilter,
 * NestedSliceWhereFilter, PhraseFilter, VectorFilter, GeoDistanceFilter)
 * as a typed Scala algebra. Semantics locked by the reference's evaluator
 * (reference: app/server/gateway/filter.go:123-312, filter_native.go:80-877):
 *
 *  - empty FilterGroup          => pass-all
 *  - missing path / NULL value  => no match — even for negated compare /
 *    contains / has-key forms (pinned by FilterSemanticsSpec: "null slice
 *    never matches, even negated"). The exceptions are IS_EMPTY (absence
 *    IS emptiness) and the PHRASE negated forms, which match docs lacking
 *    the word map entirely
 *  - type mismatch              => no match
 *  - SLICE_CONTAINS_SUBSTRING   => case-INsensitive (scalar CONTAINS is sensitive)
 *  - empty slice under quantifier: ANY=false, ALL/NONE=true, COUNT compares 0
 */
sealed trait FilterNode

/** Boolean combinators (reference: proto/hydraide.proto:2554-2601). */
sealed trait BoolOp
object BoolOp {
  case object And extends BoolOp
  case object Or  extends BoolOp
}

/** An AND/OR group; empty children means "match everything". */
final case class Group(op: BoolOp, children: Seq[FilterNode]) extends FilterNode
object Group {
  def and(children: FilterNode*): Group = Group(BoolOp.And, children)
  def or(children: FilterNode*): Group  = Group(BoolOp.Or, children)
  val passAll: Group = Group(BoolOp.And, Nil)
}

/**
 * What a predicate addresses. The reference distinguishes the typed value
 * field, opt-in metadata timestamps, the key, and dotted msgpack body paths
 * (reference: proto/hydraide.proto:2489-2552). Here everything is a column
 * path; `#len` and `[*]` are modeled explicitly.
 */
sealed trait FieldRef
object FieldRef {
  /** Plain (possibly dotted / nested) column path, e.g. "body.address.city". */
  final case class Path(parts: Seq[String]) extends FieldRef
  /** Length of a slice/map at path (`Field#len` in the reference). */
  final case class Len(of: Path) extends FieldRef
  /** Any-element wildcard: `Items[*].Status` — handled by AnyElement node. */
  def apply(dotted: String): Path = Path(dotted.split('.').toIndexedSeq)
}

/** Scalar comparison operators (reference: proto/hydraide.proto:2026-2046). */
sealed trait CmpOp
object CmpOp {
  case object Equal              extends CmpOp
  case object NotEqual           extends CmpOp
  case object GreaterThan        extends CmpOp
  case object GreaterThanOrEqual extends CmpOp
  case object LessThan           extends CmpOp
  case object LessThanOrEqual    extends CmpOp
  case object Contains           extends CmpOp // case-sensitive substring
  case object NotContains        extends CmpOp
  case object StartsWith         extends CmpOp
  case object EndsWith           extends CmpOp
}

/** Typed scalar compare of a field vs a literal. */
final case class Cmp(field: FieldRef, op: CmpOp, value: Any) extends FilterNode

/** nil/unset or empty string (reference: filter_native.go:88-95,235-276). */
final case class IsEmpty(field: FieldRef, negate: Boolean = false) extends FilterNode

/** Map contains key (reference: filter_native.go:346-361). */
final case class HasKey(field: FieldRef, key: String, negate: Boolean = false) extends FilterNode

/** Array contains exact value (reference: filter.go:647-714). */
final case class SliceContains(field: FieldRef, value: Any, negate: Boolean = false) extends FilterNode

/** Any string element contains substring, case-INsensitive (filter.go:656-671). */
final case class SliceContainsSubstring(field: FieldRef, sub: String, negate: Boolean = false) extends FilterNode

/** Set membership (STRING_IN / INT32_IN / INT64_IN, proto:2543-2551). */
final case class In(field: FieldRef, values: Seq[Any]) extends FilterNode

/** `Field[*].X <op> v` — any element of a struct-array matches. */
final case class AnyElement(slice: FieldRef.Path, elementPred: FilterNode) extends FilterNode

/** Quantifiers over a nested slice (reference: proto/hydraide.proto:2603-2645). */
sealed trait Quantifier
object Quantifier {
  case object Any  extends Quantifier
  case object All  extends Quantifier
  case object None extends Quantifier
  /** COUNT(op, n): number of matching elements compared to n. */
  final case class Count(op: CmpOp, n: Long) extends Quantifier
}

/**
 * Per-element FilterGroup over a nested slice with a quantifier.
 * Inside `elementFilter`, FieldRef paths are relative to the element.
 */
final case class NestedSliceWhere(
    slice: FieldRef.Path,
    quantifier: Quantifier,
    elementFilter: FilterNode) extends FilterNode

/**
 * All words appear at consecutive positions in a `map[word]->[positions]`
 * word index (reference: proto/hydraide.proto:2647-2686, filter.go:560-589).
 */
final case class PhraseMatch(
    wordIndex: FieldRef.Path,
    words: Seq[String],
    negate: Boolean = false) extends FilterNode

/**
 * Same phrase semantics evaluated directly over a token ARRAY — the scan
 * form: an O(tokens × |phrase|) sliding check with no per-row index
 * construction. This is the hot-path variant; [[PhraseMatch]] stays for
 * data that already carries the reference's word-index map shape.
 */
final case class PhraseInTokens(
    tokens: FieldRef.Path,
    words: Seq[String],
    negate: Boolean = false) extends FilterNode

/**
 * Attaches a result label to a predicate subtree. When compiled with
 * [[FilterCompiler.compileWithLabels]], each labeled subtree is ALSO
 * projected as its own boolean so the per-row `matched_labels` can be
 * emitted — OR groups do not short-circuit label collection, mirroring
 * the reference (reference: proto/hydraide.proto:2779-2796,
 * app/server/gateway/filter_native.go:24-77). Transparent for plain
 * `compile` (the label does not change match semantics).
 */
final case class Labeled(label: String, child: FilterNode) extends FilterNode

/**
 * Unsigned-64 literal wrapper for [[Cmp]]/[[In]] values: compiled as
 * DecimalType(20,0) so values above Long.MaxValue compare correctly against
 * signed columns instead of overflowing (reference:
 * app/server/gateway/filter.go:410-415 uint64 guard).
 */
final case class U64(value: BigInt)

/**
 * Cosine similarity of a pre-L2-normalized float vector vs a query vector
 * >= minSimilarity; dimension mismatch => no match
 * (reference: proto/hydraide.proto:2688-2711, filter_native.go:528-585).
 */
final case class VectorSimilar(
    field: FieldRef.Path,
    query: Array[Float],
    minSimilarity: Double) extends FilterNode

/**
 * Haversine distance from a reference point vs radius (km), INSIDE/OUTSIDE;
 * Null Island (0,0) excluded; bounding-box pre-filter
 * (reference: proto/hydraide.proto:2713-2777, filter.go:14-56).
 */
final case class GeoWithin(
    latField: FieldRef.Path,
    lonField: FieldRef.Path,
    refLat: Double,
    refLon: Double,
    radiusKm: Double,
    inside: Boolean = true) extends FilterNode
