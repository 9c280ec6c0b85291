"""DimFilter JSON tree → Catalyst Column predicates.

Reference: processing/src/main/java/org/apache/druid/query/filter/ (the JSON
model) and segment/filter/ (evaluation).  Druid evaluates each filter twice —
a bitmap-index path and a value-matcher path, split by Filters.java/cnf —
neither exists here: we emit one declarative predicate and Catalyst does CNF
normalization, predicate pushdown into the Parquet scan (replacing the bitmap
path with row-group/page skipping) and residual evaluation in codegen
(replacing the value matcher).

Multi-value-dimension (MVD) semantics — the one genuinely non-standard rule
(segment/DimensionSelector.java; filters match if ANY value matches): every
leaf predicate on an ArrayType column is wrapped in ``exists(col, v -> pred)``.
This is the single chokepoint SURVEY §7 calls for.

String comparator orderings for `bound` (query/ordering/StringComparators.java:
lexicographic / alphanumeric / numeric / strlen / version) compile to sortable
expressions — numeric casts where possible, padded keys otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_druid_spark.functions.extraction import compile_extraction
from incubator_druid_spark.model.columns import qcol
from incubator_druid_spark.model.intervals import parse_intervals, interval_predicate


class FilterContext:
    """Resolves dimension names to Columns and knows which are multi-value."""

    def __init__(self, df: DataFrame, virtual: dict[str, Column] | None = None):
        self.df = df
        self.virtual = virtual or {}
        self._types = {f.name: f.dataType for f in df.schema.fields}

    def resolve(self, name: str) -> Column:
        if name in self.virtual:
            return self.virtual[name]
        if name not in self._types:
            # a nonexistent column reads as NULL (string-typed), not an
            # error — Druid's missing-column semantics (e.g.
            # GroupByQueryRunnerTest.testGroupByWithNonexistentDimension;
            # segments are schema-free, so queries over columns absent from
            # some/all segments must still run)
            return F.lit(None).cast("string")
        return qcol(name)

    def is_array(self, name: str) -> bool:
        if name in self.virtual:
            return False
        return isinstance(self._types.get(name), T.ArrayType)

    def is_binary(self, name: str) -> bool:
        """True for COMPLEX (pre-built sketch) columns stored as binary."""
        if name in self.virtual:
            return False
        return isinstance(self._types.get(name), T.BinaryType)

    def data_type(self, name: str):
        """Spark DataType of a physical column (None for virtual/unknown)."""
        if name in self.virtual:
            return None
        return self._types.get(name)


def compile_filter(spec: dict | None, ctx: FilterContext) -> Column | None:
    """Compile a DimFilter JSON node; None spec → None (no predicate)."""
    if spec is None:
        return None
    t = spec["type"]

    if t == "and":  # query/filter/AndDimFilter.java
        preds = [compile_filter(f, ctx) for f in spec["fields"]]
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out
    if t == "or":  # OrDimFilter.java
        preds = [compile_filter(f, ctx) for f in spec["fields"]]
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out
    if t == "not":  # NotDimFilter.java
        # Druid filters are two-valued ValueMatchers: a comparison over a
        # missing/null value matches FALSE, so its negation matches TRUE —
        # not SQL's three-valued NULL (testTimeseriesWithInvertedFilterOn-
        # NonExistentDimension keeps all rows under NOT(absent='sally'))
        return ~F.coalesce(compile_filter(spec["field"], ctx), F.lit(False))
    if t == "true":  # TrueDimFilter.java
        return F.lit(True)
    if t == "false":
        return F.lit(False)
    if t == "expression" and isinstance(ctx, FilterContext):
        # ExpressionDimFilter over a single MVD reference: the scalar
        # expression maps across the elements and the filter matches when
        # ANY mapped element is truthy (ExpressionFilter.java makeMatcher's
        # array branch)
        from incubator_druid_spark.functions.druid_expr import (
            compile_expr, mvd_map_target)
        arr_cols = {n for n, ty in ctx._types.items()
                    if isinstance(ty, T.ArrayType)}
        str_cols = {n for n, ty in ctx._types.items()
                    if isinstance(ty, T.StringType)}
        target = mvd_map_target(spec["expression"], arr_cols)
        if target is not None:
            from incubator_druid_spark.functions.druid_expr import \
                druid_truthy
            # MVD elements are strings — tag the mapped variable too
            return F.exists(
                ctx.resolve(target),
                lambda x: druid_truthy(compile_expr(
                    spec["expression"],
                    lambda n, _x=x: _x if n == target
                    else ctx.resolve(n),
                    str_cols | {target},
                    arr_cols - {target})))
    if t == "expression":  # ExpressionDimFilter.java
        from incubator_druid_spark.functions.druid_expr import (compile_expr,
                                                                druid_truthy)
        str_cols = arr_cols = int_cols = num_cols = ts_cols = sac = None
        if isinstance(ctx, FilterContext):
            str_cols = {n for n, ty in ctx._types.items()
                        if isinstance(ty, T.StringType)}
            arr_cols = {n for n, ty in ctx._types.items()
                        if isinstance(ty, T.ArrayType)}
            int_cols = {n for n, ty in ctx._types.items()
                        if isinstance(ty, (T.LongType, T.IntegerType,
                                           T.ShortType, T.ByteType))}
            num_cols = {n for n, ty in ctx._types.items()
                        if isinstance(ty, (T.DoubleType, T.FloatType,
                                           T.DecimalType))}
            # __time (and any timestamp column) reads as LONG millis in
            # expression filters: `__time >= 949550706000` is numeric
            ts_cols = {n for n, ty in ctx._types.items()
                       if isinstance(ty, T.TimestampType)
                       and n not in ctx.virtual}
            sac = {n for n, ty in ctx._types.items()
                   if isinstance(ty, T.ArrayType)
                   and isinstance(ty.elementType, T.StringType)}
        # ExpressionFilter applies Evals.asBoolean to the VALUE: a number
        # matches iff > 0 (a boolean cast would match any non-zero).  An
        # already-BOOLEAN expression (comparisons — the common case) skips
        # the truthiness CASE so the predicate stays recognizable to
        # Catalyst's pushdown (truthy(bool) ≡ bool for filtering: null is
        # non-matching either way).
        col = compile_expr(spec["expression"], ctx.resolve,
                           str_cols, arr_cols, int_cols, num_cols,
                           timestamp_cols=ts_cols,
                           string_array_cols=(sac if isinstance(
                               ctx, FilterContext) else None))
        if isinstance(ctx, FilterContext):
            from pyspark.sql import types as _T
            try:
                rt = ctx.df.select(col.alias("__e")).schema[0].dataType
                if isinstance(rt, _T.BooleanType):
                    return col
            except Exception:  # unresolvable here — let the caller surface
                pass
        return druid_truthy(col)
    if t == "interval":  # IntervalDimFilter.java — __time ∈ intervals
        col = _dim_col(spec, ctx)
        ivs = parse_intervals(spec["intervals"])
        fn = spec.get("extractionFn")
        dtype = ctx.data_type(spec.get("dimension", "__time"))
        if isinstance(dtype, T.TimestampType) and fn is None:
            return interval_predicate(ivs, col)
        # non-time column (or an extraction output): the VALUE parses as
        # epoch millis — unparseable values never match
        # (IntervalDimFilter.java's long-predicate path;
        # TimeFilteringTest.testIntervalFilterOnStringDimension)
        if isinstance(dtype, T.TimestampType):
            if fn is not None and fn.get("type") == "timeFormat":
                # timeFormat interprets the value AS a time (same exemption
                # as leaf() below) — feed it the timestamp, then parse its
                # string output as epoch millis
                col = compile_extraction(fn, col)
                fn = None
            else:
                col = F.unix_millis(col)
        if fn is not None:
            col = compile_extraction(fn, col)
        # IntervalDimFilter.makeBoundDimFilters converts to NUMERIC-ordering
        # bound filters (BigDecimal comparison): ANY parseable number
        # matches, not just strictly-integral strings — a double column's
        # '1.301616E12' rendering or '...000.5' must compare numerically
        s = col.cast("string")
        millis = s.try_cast("decimal(38,6)")
        preds = [(millis >= F.lit(a)) & (millis < F.lit(b))
                 for a, b in ivs]
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return F.coalesce(out, F.lit(False))
    if t == "javascript":
        raise NotImplementedError("javascript filter: rewrite as `expression` filter")

    # ---- leaf predicates on one dimension: MVD-aware -------------------
    dim = spec.get("dimension")
    extraction = spec.get("extractionFn")

    def leaf(value_col: Column) -> Column:
        c = value_col
        if (dim is not None
                and isinstance(ctx.data_type(dim), T.TimestampType)
                and (extraction is None
                     or extraction.get("type") != "timeFormat")):
            # __time's dimension selector serves epoch millis — value
            # filters (selector/bound/in) and string-shaped extraction fns
            # see '1301616000000', same rule as dimension specs
            # (operators/dimensions.py); timeFormat is the one fn that
            # interprets the value AS a time, and the interval filter has
            # its own branch above
            c = F.unix_millis(c)
        num_type = None
        if (extraction is None and dim is not None
                and isinstance(ctx.data_type(dim), T.NumericType)):
            # numeric columns match via typed predicates — the filter value
            # parses into the column's type instead of the column rendering
            # to string (DimensionHandlerUtils.makeVectorProcessor long/
            # float/double predicate branches; an unparseable value is
            # ALWAYS_FALSE).  f0 = '0' must match 0.0f, which stringifies
            # as '0.0'.
            num_type = ctx.data_type(dim)
        c = compile_extraction(extraction, c)
        return _leaf_predicate(spec, t, c, ctx, num_type)

    if dim is not None and ctx.is_array(dim):
        # MVD rule: ANY element matching satisfies the filter; extraction
        # fns apply per element.  A null or empty array row carries "no
        # value" (DimensionSelector contract: missing MVD ≡ null) and the
        # SCALAR predicate decides whether null matches — e.g. a bound
        # with no lower bound accepts null
        # (BoundFilter.doesMatch's null branch;
        # BoundFilterTest.testLexicographicMatchEverything expects the
        # []/null rows under dim2 < 'z').
        arr = ctx.resolve(dim)
        if t in ("selector", "equals") and spec.get(
                "value" if t == "selector" else "matchValue") is None                 and extraction is None:
            return arr.isNull() | (F.size(arr) == 0)

        def _elem_pred(v):
            cv = compile_extraction(extraction, v)                 if extraction is not None else v
            return _leaf_predicate(spec, t, cv, ctx)

        null_pred = F.coalesce(
            _elem_pred(F.lit(None).cast("string")), F.lit(False))
        return F.when(arr.isNull() | (F.size(arr) == 0), null_pred)             .otherwise(F.coalesce(F.exists(arr, _elem_pred), F.lit(False)))

    if dim is not None and ctx.is_binary(dim) and extraction is None:
        # COMPLEX (binary sketch) columns have no dimension selector —
        # DimFilters over them read null (testGroupByComplexColumn filters
        # quality_uniques = null and matches every row)
        return leaf(F.lit(None).cast("string"))
    return leaf(ctx.resolve(dim) if dim is not None else F.lit(None))


def _dim_col(spec: dict, ctx: FilterContext) -> Column:
    return ctx.resolve(spec.get("dimension", "__time"))


def _typed_value_literal(v: str, num_type):
    """Parse a filter value into a numeric column's type, Druid-style
    (DimensionHandlerUtils long/float/double predicates): integral types
    accept only exactly-integral decimals ('3.0' matches 3L,
    '3.000...01' and out-of-range values match nothing); float/double
    accept any parseable number.  Returns None (= ALWAYS_FALSE) when the
    value doesn't parse."""
    from decimal import Decimal, InvalidOperation
    if isinstance(num_type, (T.LongType, T.IntegerType, T.ShortType,
                             T.ByteType)):
        try:
            d = Decimal(v.strip())
        except (InvalidOperation, ValueError):
            return None
        if d != d.to_integral_value():
            return None
        i = int(d)
        if not -(2 ** 63) <= i < 2 ** 63:
            return None
        return F.lit(i).cast(num_type)
    try:
        f = float(v)
    except ValueError:
        return None
    return F.lit(f).cast(num_type)


def _leaf_predicate(spec: dict, t: str, c: Column, ctx: FilterContext,
                    num_type=None) -> Column:
    if t == "selector":
        # SelectorDimFilter.java — null-aware equality
        v = spec.get("value")
        if v is None:
            return c.isNull()
        if num_type is not None:
            # typed predicate: parse the value into the column type; an
            # unparseable value never matches
            lit = _typed_value_literal(str(v), num_type)
            if lit is None:
                return F.lit(False)
            return F.coalesce(c == lit, F.lit(False))
        return c.cast("string") == F.lit(str(v))
    if t == "equals":
        # (Druid 24+ shape; accept for forward compat)
        return c == F.lit(spec["matchValue"])
    if t == "in":
        # InDimFilter.java
        values = spec["values"]
        non_null = [str(v) for v in values if v is not None]
        if num_type is not None and non_null:
            # typed predicates, same rule as the selector branch above
            pred = F.lit(False)
            for v in non_null:
                lit = _typed_value_literal(v, num_type)
                if lit is None:
                    continue
                pred = pred | F.coalesce(c == lit, F.lit(False))
        else:
            pred = c.cast("string").isin(non_null) if non_null else F.lit(False)
        if any(v is None for v in values):
            pred = pred | c.isNull()
        return pred
    if t == "bound":
        return _bound_predicate(spec, c)
    if t == "range":
        return _range_predicate(spec, c)
    if t == "like":
        # LikeDimFilter.java — SQL LIKE with optional escape
        esc = spec.get("escape")
        s = c.cast("string")
        if esc:
            # Druid's LikeMatcher lets the escape precede ANY character
            # ('@bar' escape '@' ≡ 'bar'); Spark's LIKE ... ESCAPE rejects
            # escapes of non-wildcards, so compile the matcher's regex
            # (LikeDimFilter.LikeMatcher.from) instead
            import re as _re
            out, i, p = [], 0, spec["pattern"]
            while i < len(p):
                ch = p[i]
                if ch == esc and i + 1 < len(p):
                    out.append(_re.escape(p[i + 1]))
                    i += 2
                    continue
                out.append(".*" if ch == "%" else
                           "." if ch == "_" else _re.escape(ch))
                i += 1
            return s.rlike("(?s)^" + "".join(out) + "$")
        return s.like(spec["pattern"])
    if t == "regex":
        # RegexDimFilter.java — java find() semantics = rlike
        return c.cast("string").rlike(spec["pattern"])
    if t == "search":
        # SearchQueryDimFilter.java
        return compile_search_spec(spec["query"], c)
    if t == "columnComparison":
        # ColumnComparisonDimFilter.java — every side reads as a value SET
        # (a null/empty/missing row reads as {null},
        # ColumnComparisonFilter.java:189,200-212 NULL_VALUE) and the
        # filter matches when every PAIR of sets overlaps — any common
        # element, with null == null (overlap(), :115-134).  Dimension
        # specs may carry extraction fns (applied per element).
        sides = []
        for d in spec["dimensions"]:
            if isinstance(d, str):
                name, fn = d, None
            else:
                name, fn = d.get("dimension"), d.get("extractionFn")
            col = ctx.resolve(name)
            if ctx.is_array(name):
                arr = F.when(col.isNull() | (F.size(col) == 0),
                             F.array(F.lit(None).cast("string"))) \
                    .otherwise(col)
            else:
                arr = F.array(col.cast("string"))
            if fn is not None:
                # HOF lambdas must be unary — PySpark passes an index arg
                # to higher-arity callables — so bind fn via a factory
                def _mapper(_fn):
                    return lambda x: compile_extraction(_fn, x)
                arr = F.transform(arr, _mapper(fn))
            sides.append(arr)

        def _overlap(a, b):
            return F.exists(a, lambda x: F.exists(
                b, lambda y: x.eqNullSafe(y)))

        out = F.lit(True)
        for i in range(len(sides)):
            for j in range(i):
                out = out & F.coalesce(
                    _overlap(sides[i], sides[j]), F.lit(False))
        return out
    if t == "extraction":
        # ExtractionDimFilter.java (deprecated) — fn(dim) == value
        v = spec.get("value")
        if v is None:
            return c.isNull()
        return c.cast("string") == F.lit(str(v))
    if t == "spatial":
        return _spatial_predicate(spec, c)
    if t == "bloom":
        # druid-bloom-filter/.../BloomDimFilter.java — membership against a
        # pre-built filter.  Two accepted forms:
        # - base64 string: Druid's own serialized BloomKFilter (Hive
        #   murmur3-64 block format) — the interop path, probed by an
        #   Arrow-batched pandas UDF (functions/bloomk.py);
        # - {"positions": [...], "m":…, "k":…}: the engine-native sparse
        #   position set over xxhash64 — stays fully JVM-side in codegen.
        bf = spec["bloomKFilter"]
        if isinstance(bf, (str, bytes)):
            # Druid builds filters over numeric columns via addLong/addFloat/
            # addDouble (numeric-representation hashing, not string bytes) —
            # dispatch the probe on the physical column type.  Extraction fns
            # yield strings, so only bare dimensions dispatch numerically.
            from incubator_druid_spark.functions.bloomk import \
                bloomk_might_contain
            kind = "string"
            if spec.get("extractionFn") is None and spec.get("dimension"):
                dt = ctx.data_type(spec["dimension"])
                if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType,
                                   T.ByteType)):
                    kind = "long"
                elif isinstance(dt, T.FloatType):
                    kind = "float"
                elif isinstance(dt, T.DoubleType):
                    kind = "double"
            return bloomk_might_contain(bf, kind)(c.cast("string"))
        from incubator_druid_spark.functions.bloom import (DEFAULT_K, DEFAULT_M,
                                                           bloom_might_contain)
        return bloom_might_contain(bf["positions"], c,
                                   bf.get("m", DEFAULT_M), bf.get("k", DEFAULT_K))
    raise ValueError(f"unknown filter type: {t!r}")


def _dimspec_name(d) -> str:
    return d if isinstance(d, str) else d.get("dimension", d.get("outputName"))


# -- bound / range with StringComparators -----------------------------------

def _dec_refine(s: Column, n: Column) -> Column:
    """decimal(38,18) tie-refiner: the reference compares numeric-ordering
    values as BigDecimal (StringComparators.NUMERIC via
    convertStringToBigDecimal), so distinct longs beyond 2^53 must not
    collapse to the same double.  Compared AFTER the double field, it only
    decides double-ties; values outside the decimal range (|x| > ~1e20,
    beyond any long) stay ties at double precision."""
    d = s.try_cast("decimal(38,18)")
    zero = F.lit(0).cast("decimal(38,18)")
    return F.coalesce(F.when(n.isNotNull(), d), zero)


def _numeric_cmp_key(c: Column) -> Column:
    """StringComparators.NumericComparator as a comparable struct: both
    parse → numeric compare; one parses → unparseable first; neither →
    plain string compare (the s field is blanked for parseable values so
    numerically-equal renderings like '1' and '01' compare equal)."""
    s = c.cast("string")
    n = s.try_cast("double")
    return F.struct(
        n.isNotNull().cast("int").alias("p"),
        F.coalesce(n, F.lit(0.0)).alias("n"),
        _dec_refine(s, n).alias("d"),
        F.when(n.isNotNull(), F.lit("")).otherwise(s).alias("s"))


def _ordering_key(c: Column, ordering: str) -> Column:
    """Sortable expression per query/ordering/StringComparators.java."""
    if ordering in ("lexicographic", None):
        return c.cast("string")
    if ordering == "numeric":
        return _numeric_cmp_key(c)
    if ordering == "strlen":
        # StringComparators.StrlenComparator: by length, then lexicographic;
        # struct comparison gives the composite ordering
        s = c.cast("string")
        return F.struct(F.length(s).alias("l"), s.alias("s"))
    if ordering == "alphanumeric":
        return _alphanum_key(c, digit_sentinel=True)
    if ordering == "version":
        return _alphanum_key(c)
    raise ValueError(f"unknown ordering {ordering!r}")


def _ordering_sort_key(c: Column, ordering: str) -> Column:
    """Ordering key for SORT contexts (search sort, topN dimension specs,
    limitSpec dimensionOrder) — differs from the comparison key only for
    ``numeric``: StringComparators.NumericComparator sorts null first, then
    UNPARSEABLE strings lexicographically among themselves, then numbers;
    the struct compares (parseable-flag, number, string).  Comparison
    contexts (bound filters) keep the plain double key: an unparseable
    operand makes the predicate null → non-matching, same as the
    reference's failed parse."""
    if ordering == "numeric":
        s = c.cast("string")
        num = s.try_cast("double")
        return F.struct(num.isNotNull().cast("int").alias("p"),
                        num.alias("n"),
                        _dec_refine(s, num).alias("d"), s.alias("s"))
    return _ordering_key(c, ordering)


def _alphanum_key(c: Column, digit_sentinel: bool = False) -> Column:
    """Pad every digit run to 20 chars so plain string compare equals the
    numeric-aware compare (bounded approximation of
    StringComparators.ALPHANUMERIC / .VERSION).  Spark regexp_replace can't pad
    in the replacement, so: mark digit-run boundaries, split, pad digit tokens,
    re-join — all builtin HOFs, stays in codegen.

    digit_sentinel (the ALPHANUMERIC comparator) prefixes each digit run
    with \x01 so a DIGIT chunk sorts before any non-digit chunk, and
    lowercases non-digit chunks (compareNonNumeric uses
    CASE_INSENSITIVE_ORDER) — StringComparators.java:122-257;
    BoundFilterTest.testAlphaNumericMatchWithNegatives ('-1000' above '3')
    and NoLowerLimit ('abc' below 'ZZZZZ').  VERSION keeps plain padding
    and case (maven-style character compare)."""
    s = c.cast("string")
    parts = F.split(F.regexp_replace(s, r"(\d+)", "\x01$1\x01"), "\x01")
    pre = "\x01" if digit_sentinel else ""
    padded = F.transform(
        parts,
        lambda p: F.when(p.rlike(r"^\d+$"),
                         F.concat(F.lit(pre), F.lpad(p, 20, "0")))
        .otherwise(F.lower(p) if digit_sentinel else p))
    return F.array_join(padded, "")


def _bound_predicate(spec: dict, c: Column) -> Column:
    # BoundDimFilter.java: lower/upper, lowerStrict/upperStrict, ordering
    ordering = spec.get("ordering", "lexicographic")
    key = _ordering_key(c, ordering)
    preds = []
    if spec.get("lower") is not None:
        lo = _bound_literal(spec["lower"], ordering)
        preds.append(key > lo if spec.get("lowerStrict") else key >= lo)
    if spec.get("upper") is not None:
        hi = _bound_literal(spec["upper"], ordering)
        preds.append(key < hi if spec.get("upperStrict") else key <= hi)
    if not preds:
        return c.isNotNull()
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    # BoundFilter.doesMatch's null branch (sql mode: isNullOrEquivalent ==
    # isNull, so the upper clause is always satisfied): a null input
    # matches exactly when there is NO lower bound
    # (BoundFilterTest.testLexicographicMatchMissingColumn).
    return F.when(c.isNull(), F.lit(spec.get("lower") is None))         .otherwise(F.coalesce(out, F.lit(False)))


def _range_predicate(spec: dict, c: Column) -> Column:
    # Druid 24+ typed range filter (forward compat)
    preds = []
    if spec.get("lower") is not None:
        lo = F.lit(spec["lower"])
        preds.append(c > lo if spec.get("lowerOpen") else c >= lo)
    if spec.get("upper") is not None:
        hi = F.lit(spec["upper"])
        preds.append(c < hi if spec.get("upperOpen") else c <= hi)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def _bound_literal(v: str, ordering: str):
    if ordering == "numeric":
        return _numeric_cmp_key(F.lit(str(v)))
    if ordering == "strlen":
        return F.struct(F.lit(len(str(v))).alias("l"), F.lit(str(v)).alias("s"))
    if ordering == "alphanumeric":
        import re as _re
        parts = _re.split(r"(\d+)", str(v))
        return F.lit("".join(
            "\x01" + p.zfill(20) if p.isdigit() else p.lower()
            for p in parts))
    if ordering == "version":
        import re as _re
        return F.lit(_re.sub(r"\d+", lambda m: m.group().zfill(20), str(v)))
    return F.lit(str(v))


# -- search query specs ------------------------------------------------------

def compile_search_spec(q: dict, c: Column) -> Column:
    """SearchQuerySpec (query/search/*SearchQuerySpec.java):
    contains / insensitive_contains / fragment / regex."""
    t = q["type"]
    s = c.cast("string")
    if t == "contains":
        if q.get("caseSensitive", False):
            return F.instr(s, q["value"]) > 0
        return F.instr(F.lower(s), q["value"].lower()) > 0
    if t == "insensitive_contains":
        return F.instr(F.lower(s), q["value"].lower()) > 0
    if t == "fragment":
        # FragmentSearchQuerySpec.java — ALL fragments must appear
        cs = q.get("caseSensitive", False)
        out = None
        for frag in q["values"]:
            p = (F.instr(s, frag) > 0) if cs else (F.instr(F.lower(s), frag.lower()) > 0)
            out = p if out is None else out & p
        return out if out is not None else F.lit(True)
    if t == "regex":
        return s.rlike(q["pattern"])
    if t == "all":
        # AllSearchQuerySpec.accept(@Nullable dimVal) returns true
        # unconditionally — even for null values; the caller decides null
        # handling, so do not filter them here
        return F.lit(True)
    raise ValueError(f"unknown search spec {t!r}")


# -- spatial -----------------------------------------------------------------

def _spatial_predicate(spec: dict, c: Column) -> Column:
    """SpatialDimFilter.java + collections/spatial/search/ bound types.
    Druid spatial dims are 'lat,lon' strings; bound types: rectangular, radius,
    polygon.  Compiled to numeric predicates on the split coordinates."""
    bound = spec["bound"]
    coords = F.split(c.cast("string"), ",")
    x = F.get(coords, 0).try_cast("double")
    y = F.get(coords, 1).try_cast("double")
    bt = bound["type"]
    if bt == "rectangular":
        mins, maxs = bound["minCoords"], bound["maxCoords"]
        return (x >= mins[0]) & (x <= maxs[0]) & (y >= mins[1]) & (y <= maxs[1])
    if bt == "radius":
        cx, cy = bound["coords"]
        r = float(bound["radius"])
        return ((x - cx) * (x - cx) + (y - cy) * (y - cy)) <= r * r
    if bt == "polygon":
        # ray-casting needs iteration — express as a sum over vertex pairs
        xs, ys = bound["abscissa"], bound["ordinate"]
        n = len(xs)
        crossings = None
        for i in range(n):
            j = (i + 1) % n
            cond = ((F.lit(ys[i]) > y) != (F.lit(ys[j]) > y)) & (
                x < (F.lit(xs[j] - xs[i]) * (y - ys[i]) / F.lit(ys[j] - ys[i]) + xs[i]))
            ci = F.when(cond, 1).otherwise(0)
            crossings = ci if crossings is None else crossings + ci
        return (crossings % 2) == 1
    raise ValueError(f"unknown spatial bound {bt!r}")
