"""Column-reference helper.

Druid join datasources expose right-side columns under a dotted prefix
("j0.count" — query/JoinDataSource.java rightPrefix), and those dotted names
flow into dimensions/filters/aggregations of the outer query.  Spark treats a
bare dot as a struct-field separator, so every name-to-Column resolution goes
through ``qcol`` which backtick-quotes dotted names.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qcol(name: str) -> Column:
    if "." in name and not name.startswith("`"):
        return F.col(f"`{name}`")
    return F.col(name)
