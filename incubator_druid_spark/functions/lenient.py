"""ANSI-proof, mode-independent numeric coercions (Druid lenient semantics).

The engine must be correct under the session it is GIVEN: an embedding host
(and the correctness driver) hands us a PySpark-4 session with
``spark.sql.ansi.enabled=true``, where a plain ``cast('6.55' AS LONG)``
throws ``CAST_INVALID_INPUT`` instead of truncating.  Druid never throws on
malformed numeric input:

- ``DimensionHandlerUtils.convertObjectToLong`` / ``ExprEval.computeNumber``
  (processing/src/main/java/org/apache/druid/segment/DimensionHandlerUtils.java,
  core/src/main/java/org/apache/druid/math/expr/ExprEval.java:565-580):
  try an exact long parse first, else parse as double and truncate
  ('6.55' → 6), else null.
- ``Numbers.tryParseDouble`` — malformed strings become null (or a default),
  never an error.

``Column.try_cast`` evaluates with TRY semantics regardless of the session's
ANSI flag, so every route below produces the SAME result under ANSI on and
off — the engine's output cannot depend on host configuration.

Known edge divergences from non-ANSI ``cast`` (documented, not observed in
any reference test): double→long overflow clamps to Long.MAX in Java/non-ANSI
but nulls here; NaN→long is 0 in Java but null here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INTEGRAL = {"long", "bigint", "int", "integer", "short", "smallint",
             "byte", "tinyint"}
_FLOATING = {"double", "float", "real"}


def lenient_cast(col: Column, typ: str) -> Column:
    """Cast with Druid's lenient numeric semantics, identically in ANSI and
    non-ANSI sessions.  Integral targets: exact parse, else double-truncate,
    else null.  Floating targets: parse or null.  Other targets pass through
    (to-string / widening casts never throw)."""
    t = typ.lower()
    if t in _INTEGRAL:
        return F.coalesce(col.try_cast(t), col.try_cast("double").try_cast(t))
    if t in _FLOATING:
        return col.try_cast(t)
    if t in ("timestamp", "date"):
        # unparseable datetime strings are null, never an error
        # (DateTimes.of failures surface as null rows in lenient reads)
        return col.try_cast(t)
    return col.cast(typ)
