"""Cached large array literals.

``F.lit(python_list)`` converts the list element-by-element over py4j —
measured ~2.4 s PER CALL for a 1024-element lookup table on this host,
paid at DataFrame-BUILD time by every query that references the table
(the fixed-point flog2/fexp2/sigmoid/Hilbert kernels each embed one).
Parsing the equivalent ``array(...)`` SQL string is a single py4j
round-trip (~ms), and the resulting unresolved expression Column is
immutable and not bound to any DataFrame or session, so one Column per
distinct (values, type) can serve every consumer for the process
lifetime. This caches EXPRESSIONS, never data or results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CACHE: dict[tuple, Column] = {}


def array_lit(values, element_sql_type: str) -> Column:
    """A Column for the literal ``array<element_sql_type>`` of ``values``.

    Integer values are emitted as bare literals; floats via ``repr``
    (shortest round-tripping form — the decimal parse keeps every
    printed digit and the cast to double rounds back to the identical
    IEEE value). The final cast pins the element type regardless of how
    the parser typed the literals.
    """
    key = (element_sql_type, tuple(values))
    col = _CACHE.get(key)
    if col is None:
        import math

        if any(isinstance(v, float) and not math.isfinite(v) for v in values):
            # nan/inf have no parseable SQL literal form — take the slow
            # but correct element-wise path (no engine table needs this)
            col = F.lit(list(values)).cast(f"array<{element_sql_type}>")
        else:
            body = ",".join(repr(v) for v in values)
            col = F.expr(f"array({body})").cast(f"array<{element_sql_type}>")
        _CACHE[key] = col
    return col
