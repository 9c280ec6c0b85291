"""IPv4 expression-macro goldens — the full reference matrices from
processing/src/test/java/org/apache/druid/query/expression/
IPv4AddressMatchExprMacroTest.java, IPv4AddressParseExprMacroTest.java and
IPv4AddressStringifyExprMacroTest.java, evaluated through BOTH surfaces:
the native expression compiler (functions/druid_expr.py ipv4_*) and the
Druid-SQL UDFs (IPV4_PARSE / IPV4_MATCH / IPV4_STRINGIFY).

The key dispatch rule under test: LONG inputs evaluate numerically
(validated to the uint32 range) while STRING inputs are STRICTLY
dotted-quad — the string '3232235521' parses to NULL and matches nothing
even though the long 3232235521 is 192.168.0.1."""

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.functions.druid_expr import compile_expr

IP = "192.168.0.1"
IP_LONG = 3232235521
SUBNET_192_168 = "192.168.0.0/16"
SUBNET_10 = "10.0.0.0/8"


def ev(spark, expression, rows=None, schema="x long", string_cols=None,
       integral_cols=None):
    df = spark.createDataFrame(rows or [(0,)], schema)
    col = compile_expr(expression, F.col, string_cols, None, integral_cols)
    return df.select(col.alias("r")).first()["r"]


# -- ipv4_match (IPv4AddressMatchExprMacroTest) ------------------------------

def test_match_matrix(spark):
    cases = [
        # (address literal, subnet, expected)
        (f"'{IP}'", SUBNET_192_168, True),     # testMatchingStringArgIPv4
        (f"'{IP}'", SUBNET_10, False),         # testNotMatchingStringArgIPv4
        (f"{IP_LONG}", SUBNET_192_168, True),  # testMatchingLongArg
        (f"{IP_LONG}", SUBNET_10, False),      # testNotMatchingLongArg
        # unsigned-int STRING is not an address
        (f"'{IP_LONG}'", SUBNET_192_168, False),
        (f"'{IP_LONG}'", SUBNET_10, False),
        # IPv6 compatible/mapped renderings are not IPv4
        ("'::192.168.0.1'", SUBNET_192_168, False),
        ("'::192.168.0.1'", SUBNET_10, False),
        ("'::ffff:192.168.0.1'", SUBNET_192_168, False),
        ("'::ffff:192.168.0.1'", SUBNET_10, False),
        ("'druid.apache.org'", SUBNET_192_168, False),  # testNotIpAddress
        ("null", SUBNET_192_168, False),                # testNullStringArg
        # testInclusive: the network and broadcast addresses both match
        ("'192.168.0.0'", SUBNET_192_168, True),
        ("'192.168.255.255'", SUBNET_192_168, True),
    ]
    for addr, subnet, exp in cases:
        got = ev(spark, f"ipv4_match({addr}, '{subnet}')")
        assert bool(got) is exp, (addr, subnet, got)


def test_match_null_long_column(spark):
    """testNullLongArg — a null LONG value matches nothing (false)."""
    got = ev(spark, f"ipv4_match(x, '{SUBNET_192_168}')",
             rows=[(None,)], schema="x long", integral_cols={"x"})
    assert not got


def test_match_subnet_arg_invalid(spark):
    """testSubnetArgInvalid — a malformed subnet literal raises at
    compile (IPv4AddressMatchExprMacro 'subnet arg has an invalid
    format')."""
    with pytest.raises(Exception):
        ev(spark, "ipv4_match('192.168.0.1', '192.168.0.1/invalid')")


def test_match_too_few_args(spark):
    with pytest.raises(Exception):
        ev(spark, "ipv4_match('192.168.0.1')")


# -- ipv4_parse (IPv4AddressParseExprMacroTest) ------------------------------

def test_parse_matrix(spark):
    cases = [
        (f"'{IP}'", IP_LONG),              # testValidStringArgIPv4
        (f"'{IP_LONG}'", None),            # testValidStringArgUnsignedInt
        ("'::192.168.0.1'", None),         # testInvalidStringArgIPv6Compatible
        ("'::ffff:192.168.0.1'", None),    # testValidStringArgIPv6Mapped
        ("'druid.apache.org'", None),      # testInvalidStringArgNotIPAddress
        ("null", None),                    # testNullStringArg
        ("-1", None),                      # testInvalidLongArgTooLow
        ("0", 0),                          # testValidLongArgLowest
        (f"{0xFFFFFFFF}", 0xFFFFFFFF),     # testValidLongArgHighest
        (f"{0x100000000}", None),          # testInvalidLongArgTooHigh
        (f"{IP_LONG}", IP_LONG),           # testValidLongArg
    ]
    for arg, exp in cases:
        got = ev(spark, f"ipv4_parse({arg})")
        assert got == exp, (arg, got, exp)


def test_parse_null_long_column(spark):
    got = ev(spark, "ipv4_parse(x)", rows=[(None,)], schema="x long",
             integral_cols={"x"})
    assert got is None


def test_parse_string_column_strict_dotted(spark):
    """A string-TAGGED column follows the strict dotted-quad rule: bare
    digits are null (the reference's STRING dispatch), while a valid
    dotted value parses."""
    got = ev(spark, "ipv4_parse(x)", rows=[(str(IP_LONG),)],
             schema="x string", string_cols={"x"})
    assert got is None
    got = ev(spark, "ipv4_parse(x)", rows=[(IP,)], schema="x string",
             string_cols={"x"})
    assert got == IP_LONG


def test_parse_too_many_args(spark):
    with pytest.raises(Exception):
        ev(spark, "ipv4_parse('192.168.0.1', '192.168.0.1')")


# -- ipv4_stringify (IPv4AddressStringifyExprMacroTest) ----------------------

def test_stringify_matrix(spark):
    cases = [
        ("-1", None),                       # testInvalidLongArgTooSmall
        ("0", "0.0.0.0"),                   # testValidLongArgLowest
        (f"{IP_LONG}", IP),                 # testValidLongArg
        (f"{0xFFFFFFFF}", "255.255.255.255"),  # testValidLongArgHighest
        (f"{0x100000000}", None),           # testInvalidLongArgTooLarge
        ("null", None),                     # testNullStringArg
        ("'druid.apache.org'", None),       # testInvalidStringArgNotIPAddress
        ("'::192.168.0.1'", None),          # testInvalidStringArgIPv6Compatible
        ("'::ffff:192.168.0.1'", None),     # testValidStringArgIPv6Mapped
        (f"'{IP}'", IP),                    # testValidStringArgIPv4
        (f"'{IP_LONG}'", None),             # testValidStringArgUnsignedInt
    ]
    for arg, exp in cases:
        got = ev(spark, f"ipv4_stringify({arg})")
        assert got == exp, (arg, got, exp)


def test_stringify_null_long_column(spark):
    got = ev(spark, "ipv4_stringify(x)", rows=[(None,)], schema="x long",
             integral_cols={"x"})
    assert got is None


# -- the SQL UDF surface (sql/functions.py IPV4_*) ---------------------------

def test_sql_udf_surface(spark, foo_catalog):
    from incubator_druid_spark.sql.functions import druid_sql
    r = druid_sql(spark, f"""
        SELECT IPV4_PARSE('{IP}') AS p,
               IPV4_PARSE('not-an-ip') AS p_bad,
               IPV4_STRINGIFY({IP_LONG}) AS s,
               IPV4_MATCH('{IP}', '{SUBNET_192_168}') AS m_yes,
               IPV4_MATCH('{IP}', '{SUBNET_10}') AS m_no
        FROM foo LIMIT 1""", foo_catalog).first()
    assert r["p"] == IP_LONG
    assert r["p_bad"] is None
    assert r["s"] == IP
    assert bool(r["m_yes"]) is True and bool(r["m_no"]) is False
