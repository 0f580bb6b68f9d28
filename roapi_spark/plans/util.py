"""Join-side sizing helpers.

The reference never hard-codes broadcast: DataFusion's planner picks
hash-partitioned vs broadcast joins from statistics
(``columnq/src/query/sql.rs:15-17``).  The Spark equivalent of that
discipline is: add a broadcast *hint* only when Catalyst's own size
estimate bounds the side under a modest cap, and otherwise leave the
strategy to Catalyst + AQE, which re-plans at runtime from actual shuffle
sizes (and will still broadcast a side that *turns out* small).

A forced ``F.broadcast()`` hint overrides every size check AQE would do,
so an unconditional hint on a fact-derived side is correct at sf0.1 and an
executor OOM at 100 TB.  Policy:

* genuine dimension sides (region/nation/supplier/part/customer, tiny
  computed aggregates) go through :func:`maybe_broadcast`;
* fact-derived sides (anything built from ``orders``/``lineitem``/
  ``documents``) are never hinted at all — plain joins, AQE decides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Hard cap for a *forced* broadcast hint.  Deliberately modest: a hint
# bypasses AQE's runtime size checks, so the only safe hint is one whose
# upper bound Catalyst can already prove at plan time.
DEFAULT_BROADCAST_CAP_BYTES = 64 * 1024 * 1024


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's estimated size in bytes of ``df``'s optimized plan.

    Without CBO this is conservative (filters don't shrink the estimate,
    scans report file size), which is exactly what we want for gating a
    forced hint.  Returns ``None`` when the estimate is unavailable.
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(stats.sizeInBytes()))
    except Exception:  # pragma: no cover - py4j detail differences
        return None


def maybe_broadcast(
    df: DataFrame, cap_bytes: int = DEFAULT_BROADCAST_CAP_BYTES
) -> DataFrame:
    """Broadcast-hint ``df`` only when Catalyst's size estimate is under
    ``cap_bytes``; otherwise return it unhinted so AQE picks the join
    strategy from runtime sizes.

    Call this only on sides that are *semantically* dimension-like; never
    on fact-derived inputs (those should simply not be hinted — see module
    docstring).
    """
    size = plan_size_bytes(df)
    if size is not None and 0 <= size <= cap_bytes:
        return F.broadcast(df)
    return df
