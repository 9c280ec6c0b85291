"""Bulk cross-engine check for the Druid expression compiler: a curated set
of (druid expr, equivalent DuckDB SQL) pairs evaluated over 1000 seeded
random rows in ONE Spark pass + ONE DuckDB query.  Complements the
per-function unit tests in test_expressions with randomized inputs — the
same oracle strategy the driver applies to whole queries, pushed down to
scalar-function granularity."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.functions.druid_expr import compile_expr

# (druid expression, duckdb equivalent) — 0-based vs 1-based offsets and
# name differences encoded in the duckdb side
PAIRS = [
    ("abs(x)", "abs(x)"),
    ("floor(x)", "floor(x)"),
    ("ceil(x)", "ceil(x)"),
    ("sqrt(abs(x))", "sqrt(abs(x))"),
    ("pow(abs(x), 0.5)", "pow(abs(x), 0.5)"),
    ("exp(x / 1000000)", "exp(x / 1000000)"),
    ("log(abs(x) + 1)", "ln(abs(x) + 1)"),
    ("x + y * 2 - x / 8", "x + y * 2 - x / 8"),
    ("min(x, y)", "least(x, y)"),
    ("max(x, y)", "greatest(x, y)"),
    ("signum(x)", "sign(x)"),
    ("hypot(x / 1000, y / 1000)", "sqrt((x/1000)*(x/1000) + (y/1000)*(y/1000))"),
    ("bitwiseAnd(n, 255)", "n & 255"),
    ("bitwiseXor(n, 9)", "xor(n, 9)"),
    ("if(x > 0, 'p', 'n')", "CASE WHEN x > 0 THEN 'p' ELSE 'n' END"),
    ("nvl(null, s)", "coalesce(NULL, s)"),
    ("concat(s, '-', s)", "concat(s, '-', s)"),
    ("upper(s)", "upper(s)"),
    ("lower(upper(s))", "lower(upper(s))"),
    ("strlen(s)", "length(s)"),
    ("substring(s, 1, 3)", "substr(s, 2, 3)"),          # druid start is 0-based
    ("left(s, 2)", "left(s, 2)"),
    ("right(s, 2)", "right(s, 2)"),
    ("replace(s, 'a', 'z')", "replace(s, 'a', 'z')"),
    ("repeat(s, 2)", "repeat(s, 2)"),
    ("lpad(s, 8, '*')", "lpad(s, 8, '*')"),
    ("reverse(s)", "reverse(s)"),
    ("strpos(s, 'b')", "strpos(s, 'b') - 1"),           # druid is 0-based, -1 miss
    ("timestamp_floor(t, 'PT1H')", "date_trunc('hour', t)"),
    ("timestamp_floor(t, 'P1D')", "date_trunc('day', t)"),
    ("timestamp_extract(t, 'HOUR')", "extract(hour FROM t)"),
    ("timestamp_extract(t, 'DOW')", "isodow(t)"),       # druid DOW == joda Mon=1
    # -- trig / rounding
    ("sin(x / 1e6)", "sin(x / 1e6)"),
    ("cos(x / 1e6)", "cos(x / 1e6)"),
    ("atan2(y, abs(x) + 1)", "atan2(y, abs(x) + 1)"),
    # round-to-integer only: fractional scales hit engine-specific handling
    # of .xx5 doubles (not exactly representable) — Druid itself documents
    # BigDecimal-vs-double drift for ROUND
    ("round(x)", "round(x)"),
    ("cbrt(abs(x))", "cbrt(abs(x))"),
    ("div(n, 7)", "n // 7"),                            # integer floor division
    ("n % 7", "n % 7"),
    # -- conditionals
    ("case_searched(x > 0, 'p', x < 0, 'n', 'z')",
     "CASE WHEN x > 0 THEN 'p' WHEN x < 0 THEN 'n' ELSE 'z' END"),
    ("case_simple(substring(s, 0, 1), 'a', 'A', 'b', 'B', '?')",
     "CASE substr(s, 1, 1) WHEN 'a' THEN 'A' WHEN 'b' THEN 'B' ELSE '?' END"),
    ("isnull(if(s == '', null, s))", "nullif(s, '') IS NULL"),
    # -- strings
    ("trim(s)", "trim(s)"),
    ("regexp_extract(s, '([ab]+)', 1)",                 # druid: NULL on no-
     "nullif(regexp_extract(s, '([ab]+)', 1), '')"),    # match; duckdb: ''
    ("regexp_like(s, '^a')", "regexp_matches(s, '^a')"),
    ("contains_string(s, 'ab')", "contains(s, 'ab')"),
    ("parse_long(format('%d', n))", "CAST(format('{:d}', n) AS BIGINT)"),
    # -- time
    ("timestamp_ceil(t, 'PT1H')",
     "CASE WHEN date_trunc('hour', t) = t THEN t "
     "ELSE date_trunc('hour', t) + INTERVAL 1 HOUR END"),
    ("timestamp_shift(t, 'P1D', 3)", "t + INTERVAL 3 DAY"),
    ("timestamp_shift(t, 'P1M', 2)", "t + INTERVAL 2 MONTH"),
    ("timestamp_format(t, 'yyyy-MM-dd')", "strftime(t, '%Y-%m-%d')"),
    ("timestamp_extract(t, 'QUARTER')", "extract(quarter FROM t)"),
    ("timestamp_extract(t, 'EPOCH')", "epoch(t)"),
    # -- arrays (druid offsets 0-based, duckdb list indexes 1-based)
    ("array_length(string_to_array(s, ' '))",
     "len(string_split(s, ' '))"),
    ("array_offset(string_to_array(s, ' '), 0)",
     "string_split(s, ' ')[1]"),
    ("array_contains(string_to_array(s, ' '), 'ab')",
     "list_contains(string_split(s, ' '), 'ab')"),
    ("array_to_string(string_to_array(s, ' '), '|')",
     # String.join over an EMPTY array is '' (DuckDB string_agg gives NULL)
     "CASE WHEN s IS NULL THEN NULL ELSE coalesce("
     "list_aggregate(string_split(s, ' '), 'string_agg', '|'), '') END"),
    ("fold((v, acc) -> acc + strlen(v), string_to_array(s, ' '), 0)",
     # fold over an EMPTY array returns the accumulator (0); list_sum NULL
     "CASE WHEN s IS NULL THEN NULL ELSE coalesce(CAST(list_sum("
     "list_transform(string_split(s, ' '), v -> length(v))) AS BIGINT), 0) "
     "END"),
    ("map((v) -> upper(v), string_to_array(s, ' '))",
     "list_transform(string_split(s, ' '), v -> upper(v))"),
    ("filter((v) -> strlen(v) > 1, string_to_array(s, ' '))",
     "list_filter(string_split(s, ' '), v -> length(v) > 1)"),
    ("any((v) -> v == 'ab', string_to_array(s, ' '))",
     "len(list_filter(string_split(s, ' '), v -> v = 'ab')) > 0"),
    ("all((v) -> strlen(v) < 5, string_to_array(s, ' '))",
     "len(list_filter(string_split(s, ' '), v -> length(v) >= 5)) = 0"),
    ("array_ordinal(string_to_array(s, ' '), 1)", "string_split(s, ' ')[1]"),
    ("array_overlap(string_to_array(s, ' '), array('ab', 'xy'))",
     "len(list_intersect(string_split(s, ' '), ['ab', 'xy'])) > 0"),
    # -- more math / string parity
    ("greatest(x, y, 0)", "greatest(x, y, 0)"),
    ("least(x, y, 0)", "least(x, y, 0)"),
    ("copySign(x, 0 - y)", "-abs(x)"),                   # y > 0 always
    ("scalb(y, 3)", "y * 8"),
    ("toDegrees(x / 1e6)", "degrees(x / 1e6)"),
    ("toRadians(y)", "radians(y)"),
    ("log10(y)", "log10(y)"),
    ("log2(y)", "log2(y)"),
    ("rpad(s, 8, '*')", "rpad(s, 8, '*')"),
    ("btrim(concat('  ', s, '  '))", "trim(concat('  ', s, '  '))"),
    # ipv4_stringify of a masked long — byte extraction parity
    ("ipv4_stringify(bitwiseAnd(n, 4294967295))",
     "concat(((n & 4294967295) // 16777216) % 256, '.', "
     "((n & 4294967295) // 65536) % 256, '.', "
     "((n & 4294967295) // 256) % 256, '.', (n & 4294967295) % 256)"),
]

# string_to_array follows Java String.split (regex separator, trailing
# empties dropped; "" splits to [""]), not DuckDB string_split — replicate
# Java's semantics on the oracle side
_JSPLIT = ("(CASE WHEN s = '' THEN [''] "
           "WHEN regexp_replace(s, ' +$', '') = '' THEN CAST([] AS VARCHAR[]) "
           "ELSE string_split(regexp_replace(s, ' +$', ''), ' ') END)")
PAIRS = [(d, k.replace("string_split(s, ' ')", _JSPLIT)) for d, k in PAIRS]


def test_expr_compiler_matches_duckdb(spark):
    import datetime

    import duckdb

    rng = np.random.default_rng(11)
    n = 1000
    pdf = pd.DataFrame({
        "x": np.round(rng.uniform(-1e6, 1e6, n), 3),
        "y": np.round(rng.uniform(1.0, 1e3, n), 3),
        "n": rng.integers(-(1 << 40), 1 << 40, n),
        "s": ["".join(rng.choice(list("abcxyz "), size=rng.integers(0, 12)))
              for _ in range(n)],
        "t": [datetime.datetime(2020, 1, 1)
              + datetime.timedelta(seconds=int(v))
              for v in rng.integers(0, 3 * 365 * 86400, n)],
    })
    pdf["row_id"] = range(n)

    df = spark.createDataFrame(pdf)
    sel = [F.col("row_id")] + [
        compile_expr(e, F.col).alias(f"e{i}") for i, (e, _) in enumerate(PAIRS)]
    got = df.select(*sel).toPandas().set_index("row_id").sort_index()

    con = duckdb.connect()
    con.register("t_in", pdf)
    q = "SELECT row_id, " + ", ".join(
        f"({d}) AS e{i}" for i, (_, d) in enumerate(PAIRS)) + \
        " FROM t_in ORDER BY row_id"
    want = con.execute(q).df().set_index("row_id").sort_index()

    for i, (druid_e, duck_e) in enumerate(PAIRS):
        g, w = got[f"e{i}"], want[f"e{i}"]
        if g.dtype.kind in "fc" or w.dtype.kind in "fc":
            ok = np.allclose(g.astype(float), w.astype(float),
                             rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            ga = [None if (not isinstance(v, (list, np.ndarray)) and pd.isna(v))
                  else v for v in g.tolist()]
            wa = [None if (not isinstance(v, (list, np.ndarray)) and pd.isna(v))
                  else v for v in w.tolist()]

            def _eq(a, b):
                if isinstance(a, (list, np.ndarray)) or \
                        isinstance(b, (list, np.ndarray)):
                    return a is not None and b is not None \
                        and list(a) == list(b)
                return a == b or (a is None and b is None)

            ok = all(_eq(a, b) for a, b in zip(ga, wa))
        assert ok, f"mismatch for {druid_e!r} vs {duck_e!r}: " \
                   f"{g.head(3).tolist()} != {w.head(3).tolist()}"
