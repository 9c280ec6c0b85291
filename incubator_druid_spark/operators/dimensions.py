"""DimensionSpec handling shared by groupBy / topN / search.

Reference: processing/.../query/dimension/ — DefaultDimensionSpec,
ExtractionDimensionSpec, ListFilteredDimensionSpec, RegexFilteredDimensionSpec,
PrefixFilteredDimensionSpec.  Output type coercion per DimensionSpec.getOutputType.

MVD grouping semantics (SURVEY §7 hard-part #1): grouping on an ArrayType
column EXPLODES the row — one group per element (segment/DimensionSelector.java
contract).  The filtered dimension specs prune elements *before* the explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.lenient import lenient_cast as _lcast
from pyspark.sql import types as T

from incubator_druid_spark.functions.extraction import compile_extraction
from incubator_druid_spark.model.columns import qcol

_OUT_TYPES = {"STRING": "string", "LONG": "long", "FLOAT": "float", "DOUBLE": "double"}


def dimension_column(spec, df: DataFrame) -> tuple[str, Column, bool]:
    """→ (outputName, column expression, needs_explode)."""
    types = {f.name: f.dataType for f in df.schema.fields}

    def _col(name):
        # a nonexistent column reads as NULL string, not an error — Druid's
        # schema-free-segment semantics (GroupByQueryRunnerTest
        # .testGroupByWithNonexistentDimension); a COMPLEX (binary sketch)
        # column has no dimension selector and also reads as the null group
        # (testGroupByComplexColumn groups 26 rows under null)
        if name not in types or isinstance(types[name], T.BinaryType):
            return F.lit(None).cast("string")
        return qcol(name)

    if isinstance(spec, str):
        is_arr = isinstance(types.get(spec), T.ArrayType)
        return spec, _col(spec), is_arr
    t = spec.get("type", "default")
    if t in ("listFiltered", "regexFiltered", "prefixFiltered"):
        return _filtered_dimension(spec, t, df)
    dim = spec["dimension"]
    out = spec.get("outputName", dim)
    is_arr = isinstance(types.get(dim), T.ArrayType)
    col = _col(dim)
    if t == "default":
        ot = spec.get("outputType")
        if ot and ot.upper() in _OUT_TYPES and is_arr:
            # a typed MVD dimension coerces PER ELEMENT (the dimension
            # selector reads each value at the declared type): ['7','007']
            # under LONG groups as one key 7, not two string keys
            col = F.transform(col,
                              lambda x: _lcast(x, _OUT_TYPES[ot.upper()]))
        elif ot and ot.upper() in _OUT_TYPES:
            if (ot.upper() == "LONG"
                    and isinstance(types.get(dim), T.TimestampType)):
                # a timestamp read as LONG is epoch MILLIS in Druid (__time's
                # storage type), not Spark's cast-to-seconds
                col = F.unix_millis(col)
            else:
                col = _lcast(col, _OUT_TYPES[ot.upper()])
        elif not ot and isinstance(types.get(dim), T.NumericType):
            # DefaultDimensionSpec.getOutputType defaults to STRING: a dict-
            # form spec with no outputType renders a NUMERIC column as its
            # Java string form ('14000.0' for a float —
            # TopNQueryRunnerTest.testFullOnTopNFloatColumnAsString).  The
            # bare-string dimension shorthand keeps the native type (engine
            # convenience, README compat table); __time stays a timestamp.
            col = col.cast("string")
        return out, col, is_arr
    if t == "extraction":
        # extraction applies per-value for MVDs.  __time's selector serves
        # its LONG storage (epoch millis), so a string-shaped extraction fn
        # over __time sees '1301616000000', not a rendered datetime
        # (GroupByQueryRunnerTest.testGroupByLongTimeColumnWithExFn);
        # timeFormat is the one fn that interprets the value AS a time.
        if (isinstance(types.get(dim), T.TimestampType)
                and not _interprets_as_time(spec["extractionFn"])):
            col = F.unix_millis(col)
        if is_arr:
            col = F.transform(col, lambda v: compile_extraction(spec["extractionFn"], v))
        else:
            col = compile_extraction(spec["extractionFn"], col,
                                     input_type=types.get(dim))
        ot = spec.get("outputType")
        if ot and ot.upper() in _OUT_TYPES:
            # ExtractionDimensionSpec honors outputType too (STRING default;
            # e.g. strlen + LONG in testFullOnTopNStringOutputAsLong)
            cast = lambda v: v.cast(_OUT_TYPES[ot.upper()])  # noqa: E731
            col = F.transform(col, cast) if is_arr else cast(col)
        return out, col, is_arr
    if t == "lookup":
        # LookupDimensionSpec.java:140-159 — sugar for an extraction spec
        # whose fn is a LookupExtractionFn over either an inline LookupExtractor
        # (`lookup`) or a registered lookup (`name`); the two are mutually
        # exclusive.  Output type is always STRING.
        name, lk = spec.get("name"), spec.get("lookup")
        if bool(name) == (lk is not None):
            raise ValueError(
                "lookup dimension spec: provide exactly one of 'name' "
                "(registered) or 'lookup' (inline)")
        if name:
            fn = {"type": "registeredLookup", "lookup": name}
        else:
            fn = {"type": "lookup", "lookup": lk}
        fn["retainMissingValue"] = spec.get("retainMissingValue", False)
        if spec.get("replaceMissingValueWith") is not None:
            fn["replaceMissingValueWith"] = spec["replaceMissingValueWith"]
        if is_arr:
            col = F.transform(col, lambda v: compile_extraction(fn, v))
        else:
            col = compile_extraction(fn, col)
        return out, col, is_arr
    raise ValueError(f"unknown dimension spec type {t!r}")


def _filtered_dimension(spec: dict, t: str, df: DataFrame) -> tuple[str, Column, bool]:
    """ListFiltered/RegexFiltered/PrefixFilteredDimensionSpec — prune MVD
    elements before the explode (dimension/ListFilteredDimensionSpec.java).

    The decoration wraps the delegate's DimensionSelector, which serves the
    SOURCE values — the outputType conversion happens downstream in the
    groupBy/topN engine.  So matching is on the string rendering of the
    PRE-cast value ('170000' for a numeric-string column even when the
    delegate retypes it FLOAT —
    GroupByQueryRunnerTest.testGroupByNumericStringsAsNumericWithDecoration),
    and the outputType cast is applied to the surviving elements after."""
    delegate = spec["delegate"]
    out_type = None
    if isinstance(delegate, dict) and delegate.get("type", "default") == "default":
        ot = delegate.get("outputType")
        if ot and ot.upper() in _OUT_TYPES:
            out_type = ot.upper()
            delegate = {k: v for k, v in delegate.items() if k != "outputType"}
    inner_name, inner_col, inner_arr = dimension_column(delegate, df)
    arr = inner_col if inner_arr else F.array(inner_col)
    if t == "listFiltered":
        # whitelist values are STRINGS even over a typed delegate
        # (ListFilteredDimensionSpec matches on the string rendering)
        values, allow = spec["values"], spec.get("isWhitelist", True)
        vals = F.array(*[F.lit(str(v)) for v in values])
        kept = F.filter(
            arr,
            (lambda v: F.array_contains(vals, v.cast("string"))) if allow
            else (lambda v: ~F.array_contains(vals, v.cast("string"))))
    elif t == "regexFiltered":
        # RegexFilteredDimensionSpec.java:81 uses Matcher.matches() — a FULL
        # match, unlike the regex DimFilter's find() — so anchor the pattern
        pat = "^(?:" + spec["pattern"] + ")$"
        kept = F.filter(arr, lambda v: v.cast("string").rlike(pat))
    else:
        kept = F.filter(arr,
                        lambda v: v.cast("string").startswith(spec["prefix"]))
    if out_type:
        kept = F.transform(kept, lambda v: v.cast(_OUT_TYPES[out_type]))
    return spec.get("outputName", inner_name), kept, "explode"


def _interprets_as_time(fn: dict) -> bool:
    """True when the extraction fn (or the FIRST fn of a cascade — it
    receives the raw value, CascadeExtractionFn applies in array order)
    interprets its input AS a timestamp rather than as the long millis
    rendering."""
    t = fn.get("type")
    if t == "cascade":
        fns = fn.get("extractionFns") or []
        return bool(fns) and _interprets_as_time(fns[0])
    return t == "timeFormat"


def apply_dimensions(
    df: DataFrame, specs: list, query_type: str = "groupBy"
) -> tuple[DataFrame, list[str]]:
    """Materialize dimension output columns, exploding MVDs.  Returns the
    projected frame and the list of group-key column names.

    `query_type` picks the all-pruned-row semantics for FILTERED dimension
    specs: topN's selector skips rows with zero selector values (inner
    explode), but groupBy's engine aggregates them under
    GROUP_BY_MISSING_VALUE, i.e. a null group
    (GroupByQueryEngineV2.java:864-867;
    GroupByQueryRunnerTest.testGroupByNumericStringsAsNumericWithDecoration
    expects the all-pruned 'entertainment' rows as a ql=null,qf=null group).
    """
    from incubator_druid_spark.functions.lookups import flush_lookup_joins
    names: list[str] = []
    for spec in specs or []:
        name, col, needs_explode = dimension_column(spec, df)
        df = flush_lookup_joins(df)  # large-lookup dimension/extraction refs
        if needs_explode == "explode":
            if query_type == "topN":
                # topN: a row whose elements are ALL pruned has zero selector
                # values and contributes nothing (inner explode) — unlike a
                # source-null MVD, which reads as one null value
                df = df.withColumn(name, F.explode(col))
            else:
                # groupBy: empty filtered array → one null-group row
                # (GROUP_BY_MISSING_VALUE).  explode_outer over a
                # NULL-when-empty array emits exactly one null value.
                df = df.withColumn(
                    name, F.explode_outer(F.when(F.size(col) > 0, col)))
        elif needs_explode:
            # one output row per element; empty array → null group (Druid keeps
            # the row with a null dimension value)
            df = df.withColumn(name, F.explode_outer(col))
        else:
            df = df.withColumn(name, col)
        names.append(name)
    return df, names
