"""Golden SQL tests — CalciteMultiValueStringQueryTest.java tranche
(MultiValueStringOperatorConversions surface), SQL-compatible null mode.

Druid's "MVD works like a string" implicit per-element mapping of scalar
functions (``concat(dim3, 'foo')`` mapping over elements) lives in the
NATIVE expression layer here (ExpressionPlan NEEDS_APPLIED — see the last
section), matching where the reference implements it; the SQL surface keeps
honest arrays (README compat table).  The MV_* function family is covered
in full, including the scalar-or-array dispatch forms and 2-arg MV_SLICE.

numfoo dim3 per row: ["a","b"], ["b","c"], ["d"], [""], [], null
numfoo dim4 per row: a, a, a, b, b, b
"""

import pytest

from incubator_druid_spark.sql.functions import druid_sql
from tests.conftest import rows


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


def test_mv_overlap_filter(spark, numfoo_catalog):
    """CalciteMultiValueStringQueryTest.java testMultiValueStringOverlapFilter."""
    out = q(spark, numfoo_catalog, """
        SELECT dim3 FROM druid.numfoo
        WHERE MV_OVERLAP(dim3, ARRAY['a','b']) LIMIT 5""").collect()
    assert sorted(tuple(r[0]) for r in out) == [("a", "b"), ("b", "c")]


def test_mv_overlap_filter_non_literal(spark, numfoo_catalog):
    """testMultiValueStringOverlapFilterNonLiteral (scalar column dim4
    standing in for the reference's scalar dim2)."""
    out = q(spark, numfoo_catalog, """
        SELECT dim3 FROM druid.numfoo
        WHERE MV_OVERLAP(dim3, ARRAY[dim4]) LIMIT 5""").collect()
    assert [tuple(r[0]) for r in out] == [("a", "b")]


def test_mv_overlap_scalar_rhs(spark, numfoo_catalog):
    """MV_OVERLAP with a bare scalar second argument (Druid coerces)."""
    out = q(spark, numfoo_catalog, """
        SELECT dim1 FROM druid.numfoo WHERE MV_OVERLAP(dim3, 'd')""")
    assert rows(out, "dim1") == [("2",)]


def test_mv_contains_filter(spark, numfoo_catalog):
    """testMultiValueStringContainsFilter — array arg = contains-all."""
    out = q(spark, numfoo_catalog, """
        SELECT dim3 FROM druid.numfoo
        WHERE MV_CONTAINS(dim3, ARRAY['a','b']) LIMIT 5""").collect()
    assert [tuple(r[0]) for r in out] == [("a", "b")]


def test_mv_contains_array_of_one_element(spark, numfoo_catalog):
    """testMultiValueStringContainsArrayOfOneElement."""
    out = q(spark, numfoo_catalog, """
        SELECT dim3 FROM druid.numfoo
        WHERE MV_CONTAINS(dim3, ARRAY['a']) LIMIT 5""").collect()
    assert [tuple(r[0]) for r in out] == [("a", "b")]


def test_mv_contains_array_of_non_literal(spark, numfoo_catalog):
    """testMultiValueStringContainsArrayOfNonLiteral (dim4 for dim2)."""
    out = q(spark, numfoo_catalog, """
        SELECT dim3 FROM druid.numfoo
        WHERE MV_CONTAINS(dim3, ARRAY[dim4]) LIMIT 5""").collect()
    assert [tuple(r[0]) for r in out] == [("a", "b")]


def test_mv_slice_two_arg(spark, numfoo_catalog):
    """testMultiValueStringSlice — 2-arg form runs to the end."""
    out = q(spark, numfoo_catalog,
            "SELECT MV_SLICE(dim3, 1) AS s FROM druid.numfoo").collect()
    got = sorted(((tuple(r["s"]) if r["s"] is not None else None)
                  for r in out), key=lambda x: (x is None, x))
    assert got == [(), (), (), ("b",), ("c",), None]


def test_mv_length_group(spark, numfoo_catalog):
    """testMultiValueStringLength ([]→0 / null→NULL distinct here)."""
    out = q(spark, numfoo_catalog, """
        SELECT dim1, MV_LENGTH(dim3) AS l, SUM(cnt) AS s
        FROM druid.numfoo GROUP BY 1, 2 ORDER BY 2 DESC""")
    assert rows(out, "dim1", "l", "s") == [
        ("", 2, 1), ("1", 1, 1), ("10.1", 2, 1), ("2", 1, 1),
        ("abc", None, 1), ("def", 0, 1)]


def test_mv_offset_ordinal_group(spark, numfoo_catalog):
    """testMultiValueStringOffset / Ordinal — out-of-range → NULL."""
    out = q(spark, numfoo_catalog, """
        SELECT MV_OFFSET(dim3, 1) AS o, MV_ORDINAL(dim3, 2) AS d,
               SUM(cnt) AS s
        FROM druid.numfoo GROUP BY 1, 2 ORDER BY 3 DESC""")
    assert rows(out, "o", "d", "s") == [
        ("b", "b", 1), ("c", "c", 1), (None, None, 4)]


def test_mv_offset_of_ordinal_of_group(spark, numfoo_catalog):
    """testMultiValueStringOffsetOf / OrdinalOf — miss → NULL (sql mode)."""
    out = q(spark, numfoo_catalog, """
        SELECT MV_OFFSET_OF(dim3, 'b') AS o, MV_ORDINAL_OF(dim3, 'b') AS d,
               SUM(cnt) AS s
        FROM druid.numfoo GROUP BY 1, 2 ORDER BY 3 DESC""")
    assert rows(out, "o", "d", "s") == [(0, 1, 1), (1, 2, 1), (None, None, 4)]


def test_mv_prepend_append_roundtrip(spark, numfoo_catalog):
    """testMultiValueStringPrependAppend over the non-empty rows (the
    reference's null-MVD-as-[null] prepend rows are the documented
    honest-array deviation)."""
    out = q(spark, numfoo_catalog, """
        SELECT MV_TO_STRING(MV_PREPEND('foo', dim3), ',') AS p,
               MV_TO_STRING(MV_APPEND(dim3, 'foo'), ',') AS a,
               SUM(cnt) AS s
        FROM druid.numfoo WHERE MV_LENGTH(dim3) > 0
        GROUP BY 1, 2 ORDER BY 3 DESC""")
    assert rows(out, "p", "a", "s") == [
        ("foo,", ",foo", 1), ("foo,a,b", "a,b,foo", 1),
        ("foo,b,c", "b,c,foo", 1), ("foo,d", "d,foo", 1)]


def test_mv_to_string_to_mv_roundtrip(spark, numfoo_catalog):
    """testMultiValueStringToStringToMultiValueString (non-empty rows;
    honest-array grouping keeps whole arrays)."""
    out = q(spark, numfoo_catalog, """
        SELECT STRING_TO_MV(CONCAT(MV_TO_STRING(dim3, ','), ',d'), ',') AS m,
               SUM(cnt) AS s
        FROM druid.numfoo WHERE MV_LENGTH(dim3) > 0
        GROUP BY 1 ORDER BY 2 DESC""").collect()
    got = sorted((tuple(r["m"]), r["s"]) for r in out)
    assert got == [(("", "d"), 1), (("a", "b", "d"), 1),
                   (("b", "c", "d"), 1), (("d", "d"), 1)]


def test_mv_filter_only_none(spark, numfoo_catalog):
    """MultiValueStringOperatorConversions.MultiValueStringFilterOnly /
    FilterNone (MV_FILTER_ONLY / MV_FILTER_NONE)."""
    out = q(spark, numfoo_catalog, """
        SELECT dim1, MV_TO_STRING(MV_FILTER_ONLY(dim3, ARRAY['a','b']), ',') AS k,
               MV_TO_STRING(MV_FILTER_NONE(dim3, ARRAY['b']), ',') AS d
        FROM druid.numfoo WHERE dim1 IN ('', '10.1')""")
    assert rows(out, "dim1", "k", "d") == [
        ("", "a,b", "a"), ("10.1", "b", "c")]


# ---------------------------------------------------------------------------
# "MVD works like a string" — the implicit scalar-over-MVD mapping, via the
# NATIVE path (ExpressionPlan NEEDS_APPLIED trait)
# ---------------------------------------------------------------------------

def test_mvd_scalar_expression_maps_native(spark, numfoo_catalog):
    """CalciteMultiValueStringQueryTest
    testMultiValueStringWorksLikeStringGroupByWithFilter, through the native
    groupBy: concat(dim3, 'foo') maps over the MVD's elements, the filter
    matches when ANY mapped element equals 'bfoo', and the grouped MVD
    explodes — sql-mode expected rows (bfoo 2, afoo 1, cfoo 1)."""
    from incubator_druid_spark import translate
    q = {"queryType": "groupBy", "dataSource": "numfoo", "granularity": "all",
         "virtualColumns": [{"type": "expression", "name": "v0",
                             "expression": "concat(dim3, 'foo')",
                             "outputType": "STRING"}],
         "filter": {"type": "expression",
                    "expression": "concat(dim3, 'foo') == 'bfoo'"},
         "dimensions": ["v0"],
         "aggregations": [{"type": "longSum", "name": "s",
                           "fieldName": "cnt"}]}
    out = {r["v0"]: r["s"] for r in
           translate(q, spark, numfoo_catalog).collect()}
    assert out == {"afoo": 1, "bfoo": 2, "cfoo": 1}


def test_mvd_self_concat_scan_native(spark, numfoo_catalog):
    """testMultiValueStringWorksLikeStringSelfConcatScan — a single MVD
    referenced twice still maps element-wise (same input, no zip needed)."""
    from incubator_druid_spark import translate
    q = {"queryType": "scan", "dataSource": "numfoo",
         "virtualColumns": [{"type": "expression", "name": "v0",
                             "expression": "concat(dim3, '-lol-', dim3)",
                             "outputType": "STRING"}],
         "columns": ["dim1", "v0"]}
    out = {r["dim1"]: (tuple(r["v0"]) if r["v0"] is not None else None)
           for r in translate(q, spark, numfoo_catalog).collect()}
    assert out[""] == ("a-lol-a", "b-lol-b")
    assert out["10.1"] == ("b-lol-b", "c-lol-c")
    assert out["2"] == ("d-lol-d",)
    assert out["abc"] is None


def _mv_group(spark, cat, expr, outtype="STRING"):
    """The shared shape of the MV_* group-by goldens: a native groupBy on an
    expression virtual column over dim3 with SUM(cnt)
    (CalciteMultiValueStringQueryTest's expected native query)."""
    from incubator_druid_spark import translate
    q = {"queryType": "groupBy", "dataSource": "numfoo",
         "granularity": "all",
         "virtualColumns": [{"type": "expression", "name": "v0",
                             "expression": expr, "outputType": outtype}],
         "dimensions": [{"type": "default", "dimension": "v0",
                         "outputName": "v0", "outputType": outtype}],
         "aggregations": [{"type": "longSum", "name": "a0",
                           "fieldName": "cnt"}]}
    return {r["v0"]: r["a0"] for r in
            translate(q, spark, cat).collect()}


def test_mv_append_group_native(spark, numfoo_catalog):
    """testMultiValueStringAppend (sql null mode) — the grouped MVD
    explodes per element; the null and [] rows both read null and promote
    to [null, 'foo']."""
    got = _mv_group(spark, numfoo_catalog, "array_append(dim3,'foo')")
    assert got == {"foo": 6, None: 2, "b": 2, "": 1, "a": 1, "c": 1, "d": 1}


def test_mv_prepend_group_native(spark, numfoo_catalog):
    """testMultiValueStringPrepend — same element groups as append."""
    got = _mv_group(spark, numfoo_catalog, "array_prepend('foo',dim3)")
    assert got == {"foo": 6, None: 2, "b": 2, "": 1, "a": 1, "c": 1, "d": 1}


def test_mv_concat_group_native(spark, numfoo_catalog):
    """testMultiValueStringConcat — self-concat doubles every element;
    null/[] rows yield [null, null]."""
    got = _mv_group(spark, numfoo_catalog, "array_concat(dim3,dim3)")
    assert got == {None: 4, "b": 4, "": 2, "a": 2, "c": 2, "d": 2}


def test_mv_ordinal_group_native(spark, numfoo_catalog):
    """testMultiValueStringOrdinal — 1-based element; short/empty/null rows
    group under null."""
    got = _mv_group(spark, numfoo_catalog, "array_ordinal(dim3,2)")
    assert got == {None: 4, "b": 1, "c": 1}


def test_mv_ordinal_of_group_native(spark, numfoo_catalog):
    """testMultiValueStringOrdinalOf — 1-based position of 'b'; miss is
    null (sql mode)."""
    got = _mv_group(spark, numfoo_catalog, "array_ordinal_of(dim3,'b')",
                    "LONG")
    assert got == {None: 4, 1: 1, 2: 1}


def test_mv_to_string_group_native(spark, numfoo_catalog):
    """testMultiValueStringToString — [''] renders '', but the []/null rows
    read null and stay null."""
    got = _mv_group(spark, numfoo_catalog, "array_to_string(dim3,',')")
    assert got == {None: 2, "": 1, "a,b": 1, "b,c": 1, "d": 1}


def test_mv_works_like_string_group_by_native(spark, numfoo_catalog):
    """testMultiValueStringWorksLikeStringGroupBy — concat maps per element
    (NEEDS_APPLIED), then the grouped MVD explodes."""
    got = _mv_group(spark, numfoo_catalog, "concat(dim3,'foo')")
    assert got == {None: 2, "bfoo": 2, "afoo": 1, "cfoo": 1, "dfoo": 1,
                   "foo": 1}


def test_mv_works_like_string_scan_native(spark, numfoo_catalog):
    """testMultiValueStringWorksLikeStringScan — the mapped MVD scans as an
    array; null/[] rows scan as null."""
    from incubator_druid_spark import translate
    q = {"queryType": "scan", "dataSource": "numfoo",
         "virtualColumns": [{"type": "expression", "name": "v0",
                             "expression": "concat(dim3, 'foo')",
                             "outputType": "STRING"}],
         "columns": ["dim1", "v0"]}
    out = {r["dim1"]: (tuple(r["v0"]) if r["v0"] is not None else None)
           for r in translate(q, spark, numfoo_catalog).collect()}
    assert out[""] == ("afoo", "bfoo")
    assert out["10.1"] == ("bfoo", "cfoo")
    assert out["2"] == ("dfoo",)
    assert out["1"] == ("foo",)
    assert out["def"] is None   # [] row reads null
    assert out["abc"] is None   # null row


def test_mv_works_like_string_scan_with_filter_native(spark, numfoo_catalog):
    """testMultiValueStringWorksLikeStringScanWithFilter — the virtual
    column filters by ANY-element match before the scan."""
    from incubator_druid_spark import translate
    q = {"queryType": "scan", "dataSource": "numfoo",
         "virtualColumns": [{"type": "expression", "name": "v0",
                             "expression": "concat(dim3, 'foo')",
                             "outputType": "STRING"}],
         "filter": {"type": "selector", "dimension": "v0", "value": "bfoo"},
         "columns": ["v0"]}
    out = sorted(tuple(r["v0"]) for r in
                 translate(q, spark, numfoo_catalog).collect())
    assert out == [("afoo", "bfoo"), ("bfoo", "cfoo")]
