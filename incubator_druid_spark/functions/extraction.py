"""Extraction functions — Druid's dimension-transform library.

Reference: processing/src/main/java/org/apache/druid/query/extraction/ — these
wrap a dimension in filters and dimension specs (DimensionSpec type
"extraction", query/dimension/ExtractionDimensionSpec.java).

Each compiles to a plain Column expression; Catalyst folds it into the scan
projection, so an extraction-fn'd group-by key is computed once, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def compile_extraction(spec: dict | None, col: Column,
                       input_type=None) -> Column:
    """``input_type`` (a Spark DataType, optional) lets time-interpreting
    fns coerce a LONG millis input back to a timestamp — e.g. a nested
    groupBy whose inner query emitted a timeFormat-asMillis LONG dimension
    that the outer timeFormat refloors."""
    if spec is None:
        return col
    t = spec["type"]
    if t == "regex":
        # query/extraction/RegexDimExtractionFn.java — group 1 (or
        # `index`) when the pattern FINDS a match (an empty captured group
        # stays '' in sql mode); a NON-matching value returns the input
        # unchanged unless replaceMissingValue swaps in
        # replaceMissingValueWith (null input is always "missing")
        # (RegexDimExtractionFnTest.testNullAndEmpty /
        # testMissingValueReplacementWhenPatternMatchesNull)
        idx = spec.get("index", 1)
        s = col.cast("string")
        extracted = F.regexp_extract(s, spec["expr"], idx)
        matched = s.rlike(spec["expr"])
        if spec.get("replaceMissingValue"):
            replacement = F.lit(spec.get("replaceMissingValueWith"))
            return F.when(s.isNull(), replacement) \
                .when(matched, extracted).otherwise(replacement)
        return F.when(matched, extracted).otherwise(s)
    if t == "substring":
        # query/extraction/SubstringDimExtractionFn.java — 0-based index
        start = int(spec.get("index", 0))
        length = spec.get("length")
        s = col.cast("string")
        out = F.substring(s, start + 1, int(length) if length is not None else 2**31 - 1)
        return F.when(F.length(s) > start, out).otherwise(F.lit(None))
    if t == "strlen":
        # StrlenExtractionFn.java renders String.length() — Java UTF-16
        # units, so supplementary codepoints count 2 (the emoji surrogate
        # pair is "2"); Spark's length() counts codepoints, so widen them
        s = col.cast("string")
        return F.length(
            F.regexp_replace(s, "[\\x{10000}-\\x{10FFFF}]", "aa")
        ).cast("string")
    if t == "upper":
        return F.upper(col.cast("string"))
    if t == "lower":
        return F.lower(col.cast("string"))
    if t == "timeFormat":
        # query/extraction/TimeFormatExtractionFn.java — joda format + optional
        # granularity pre-floor + tz
        from incubator_druid_spark.model.granularity import parse_granularity
        from incubator_druid_spark.functions.druid_expr import _joda_to_spark
        from pyspark.sql import types as T
        c = col
        if input_type is not None and not isinstance(input_type,
                                                     T.TimestampType):
            if isinstance(input_type, T.StringType):
                # TimeFormatExtractionFn.apply(Object) parses non-numeric
                # STRINGS as ISO datetimes (DateTimes.of) — a blind long
                # cast would null out every ISO-string value
                s = c.cast("string")
                c = (F.when(s.rlike(r"^-?\d+$"),
                            F.timestamp_millis(s.cast("long")))
                      .otherwise(s.try_cast("timestamp")))
            else:
                # a LONG (epoch millis) input — e.g. the inner query's
                # asMillis output refloored by the outer query
                c = F.timestamp_millis(c.cast("long"))
        if spec.get("granularity"):
            c = parse_granularity(spec["granularity"]).floor(c)
        fmt = spec.get("format")
        if fmt is None and spec.get("asMillis"):
            # TimeFormatExtractionFn.java asMillis: format==null renders the
            # (granularity-truncated) instant's millis
            return F.unix_millis(c).cast("string")
        tz = spec.get("timeZone")
        if tz and tz != "UTC":
            local = F.from_utc_timestamp(c, tz)
            if fmt is None:
                # ISODateTimeFormat prints the REAL zone offset
                # ('2010-12-31T16:00:00.000-08:00'), not 'Z'; the offset is
                # per-row (DST) — derive it from the local/UTC delta
                off_min = ((F.unix_millis(local) - F.unix_millis(c))
                           / F.lit(60000)).cast("long")
                sign = F.when(off_min < 0, "-").otherwise("+")
                a = F.abs(off_min)
                off = F.concat(sign,
                               F.lpad((a / 60).cast("long").cast("string"),
                                      2, "0"),
                               F.lit(":"),
                               F.lpad(F.pmod(a, 60).cast("string"), 2, "0"))
                return F.concat(
                    F.date_format(local, "yyyy-MM-dd'T'HH:mm:ss.SSS"), off)
            return F.date_format(local, _joda_to_spark(fmt))
        if fmt is None:
            return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        return F.date_format(c, _joda_to_spark(fmt))
    if t == "time":
        # TimeDimExtractionFn — parse with timeFormat, reformat with
        # resultFormat; an unparseable non-null value passes through
        # UNCHANGED (TimeDimExtractionFn.java:73-81 returns the input on
        # parse failure), while null stays null
        from incubator_druid_spark.functions.druid_expr import _joda_to_spark
        s = col.cast("string")
        parsed = F.try_to_timestamp(s, F.lit(_joda_to_spark(spec["timeFormat"])))
        return F.coalesce(F.date_format(parsed, _joda_to_spark(spec["resultFormat"])), s)
    if t == "stringFormat":
        # StringFormatExtractionFn — String.format with the dim as only
        # arg; nullHandling: NULLSTRING (default) formats null as the
        # literal 'null', EMPTYSTRING as '', RETURNNULL skips formatting
        nh = str(spec.get("nullHandling", "nullString")).lower()
        s = col.cast("string")
        if nh == "returnnull":
            return F.when(s.isNotNull(),
                          F.format_string(spec["format"], s))
        filler = "" if nh == "emptystring" else "null"
        return F.format_string(spec["format"], F.coalesce(s, F.lit(filler)))
    if t == "cascade":
        # CascadeExtractionFn — apply extractionFns in order
        out = col
        for sub in spec["extractionFns"]:
            out = compile_extraction(sub, out)
        return out
    if t == "bucket":
        # BucketExtractionFn — floor((x - offset)/size)*size + offset,
        # rendered with trailing zeros stripped ('2' not '2.0', '1200.5'
        # stays; unparseable input → null — BucketExtractionFnTest)
        size = float(spec.get("size", 1))
        offset = float(spec.get("offset", 0))
        x = col.try_cast("double")
        b = F.floor((x - offset) / size) * size + offset
        # integer-valued results print via the LONG rendering
        # (String.valueOf((long) ret) in BucketExtractionFn.apply) — a
        # double→string cast would give '1.0E7' scientific notation for
        # boundaries >= 1e7 and '-0' for negative zero
        return F.when(b == F.floor(b), b.try_cast("long").cast("string")) \
                .otherwise(b.cast("string"))
    if t == "lookup":
        # query/lookup/LookupExtractionFn.java — inline map
        m = spec["lookup"].get("map", {})
        from incubator_druid_spark.functions import lookups as _lk
        if len(m) > _lk.LOOKUP_JOIN_THRESHOLD:
            # big inline map: register under a content-derived name and take
            # the broadcast-join path (see lookups.py module docstring)
            # full-width content digest: a truncated hash could collide two
            # distinct maps and silently reuse the first one's contents
            import hashlib
            digest = hashlib.sha1(
                repr(sorted((str(k), str(v)) for k, v in m.items()))
                .encode()).hexdigest()[:16]
            syn = f"__inline_{digest}"
            if syn not in _lk._LOOKUPS:
                _lk.register_lookup(syn, {str(k): str(v) for k, v in m.items()})
            out = _lk.lookup_column(syn, col)
            if spec.get("retainMissingValue"):
                out = F.coalesce(out, col.cast("string"))
            elif spec.get("replaceMissingValueWith") is not None:
                out = F.coalesce(out, F.lit(spec["replaceMissingValueWith"]))
            return out
        pairs = []
        for k, v in m.items():
            pairs.extend([F.lit(str(k)), F.lit(str(v))])
        out = F.element_at(F.create_map(*pairs), col.cast("string")) if pairs else F.lit(None)
        if spec.get("retainMissingValue"):
            out = F.coalesce(out, col.cast("string"))
        elif spec.get("replaceMissingValueWith") is not None:
            out = F.coalesce(out, F.lit(spec["replaceMissingValueWith"]))
        return out
    if t == "registeredLookup":
        # query/lookup/RegisteredLookupExtractionFn.java
        from incubator_druid_spark.functions.lookups import lookup_column
        out = lookup_column(spec["lookup"], col, spec.get("replaceMissingValueWith"))
        if spec.get("retainMissingValue"):
            out = F.coalesce(out, col.cast("string"))
        return out
    if t == "partial":
        # MatchingDimExtractionFn.java:62-72 — keep the value if the regex
        # FINDS a match (partial, unlike regexFiltered's matches()), else null
        s = col.cast("string")
        return F.when(s.isNotNull() & s.rlike(spec["expr"]), s)
    if t == "searchQuery":
        # SearchQuerySpecDimExtractionFn — keep value if it matches, else null
        from incubator_druid_spark.filters.filters import compile_search_spec
        return F.when(compile_search_spec(spec["query"], col), col).otherwise(F.lit(None))
    if t == "javascript":
        raise NotImplementedError(
            "javascript extractionFn: JS engine not embedded; register a python "
            "UDF equivalent via functions.lookups or rewrite as an expression")
    if t == "identity":
        return col
    raise ValueError(f"unknown extractionFn type: {t!r}")
