"""Property tests (hypothesis) for the commit-timestamp math behind
``VACUUM ... RETAIN n HOURS`` and ``RESTORE ... TO TIMESTAMP AS OF``:
pure-Python log scans whose invariants must hold on any commit
history — monotone or skewed timestamps, missing commitInfo, single
commits."""

from __future__ import annotations

import json
import os
import time

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from roapi_spark.sinks.delta import (
    DeltaWriteError,
    retention_keep_versions,
    version_at_timestamp,
)

HOUR_MS = 3_600_000


def _mk_log(tmp_path, ages_hours: list[float | None]) -> str:
    """A table whose commit v has commitInfo timestamp now - ages[v]h
    (None = commit without commitInfo, a foreign minimal writer)."""
    root = tmp_path / "t"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    now = int(time.time() * 1000)
    for v, age in enumerate(ages_hours):
        lines = []
        if age is not None:
            lines.append(
                json.dumps(
                    {"commitInfo": {"timestamp": int(now - age * HOUR_MS),
                                    "operation": "WRITE"}}
                )
            )
        lines.append(json.dumps({"add": {"path": f"p{v}.parquet",
                                         "size": 1, "modificationTime": 0,
                                         "dataChange": True}}))
        (log / f"{v:020d}.json").write_text("\n".join(lines) + "\n")
    return str(root)


# descending ages (oldest commit first) — the monotone-history case,
# with optional None gaps injected afterwards
ages_lists = st.lists(
    st.floats(0.0, 1000.0, allow_nan=False), min_size=1, max_size=12
).map(lambda xs: sorted(xs, reverse=True))


@given(ages=ages_lists, retain=st.floats(0.0, 1200.0, allow_nan=False))
@settings(max_examples=80, deadline=None)
def test_retention_counts_exactly_the_window(tmp_path_factory, ages, retain):
    tmp = tmp_path_factory.mktemp("ret")
    path = _mk_log(tmp, ages)
    keep = retention_keep_versions(path, retain)
    # ground truth envelope: the scan's cutoff uses its own now(), so a
    # commit whose age is within clock slack of the retention boundary
    # may land on either side — and ties all flip together. Count
    # newest-first under both readings of the boundary.
    slack = 10_000  # ms

    def count(expired) -> int:
        n = 0
        for age in reversed(ages):  # ages[-1] is the newest commit
            if expired(age * HOUR_MS, retain * HOUR_MS):
                break
            n += 1
        return max(n, 1)

    lo = count(lambda a, r: a >= r - slack)  # boundary reads as expired
    hi = count(lambda a, r: a > r + slack)  # boundary reads as kept
    assert 1 <= keep <= len(ages)
    assert lo <= keep <= hi, (ages, retain, lo, keep, hi)


@given(ages=ages_lists)
@settings(max_examples=60, deadline=None)
def test_missing_commitinfo_is_conservative(tmp_path_factory, ages):
    """Commits WITHOUT commitInfo must be treated as recent: the keep
    count with timestamps stripped is always >= the count with them."""
    tmp = tmp_path_factory.mktemp("cons")
    with_ts = retention_keep_versions(_mk_log(tmp, ages), 1.0)
    tmp2 = tmp_path_factory.mktemp("cons2")
    without = retention_keep_versions(
        _mk_log(tmp2, [None] * len(ages)), 1.0
    )
    assert without == len(ages) >= with_ts


@given(ages=ages_lists, pick=st.floats(0.0, 1000.0, allow_nan=False))
@settings(max_examples=80, deadline=None)
def test_version_at_timestamp_picks_last_at_or_before(
    tmp_path_factory, ages, pick
):
    from datetime import datetime, timedelta, timezone

    tmp = tmp_path_factory.mktemp("vat")
    path = _mk_log(tmp, ages)
    limit = datetime.now(timezone.utc) - timedelta(hours=pick)
    limit_s = limit.strftime("%Y-%m-%d %H:%M:%S")
    # envelope: second-truncation of limit_s + the clock delta between
    # _mk_log's now() and ours put boundary commits on either side
    slack_h = 0.01  # 36 s, generous
    definite = [v for v, age in enumerate(ages) if age >= pick + slack_h]
    possible = [v for v, age in enumerate(ages) if age >= pick - slack_h]
    if not possible:
        with pytest.raises(DeltaWriteError, match="no delta commit"):
            version_at_timestamp(path, limit_s)
        return
    try:
        v = version_at_timestamp(path, limit_s)
    except DeltaWriteError:
        assert not definite  # loud only when nothing is clearly eligible
        return
    assert v <= max(possible)
    if definite:
        assert v >= max(definite)


def test_version_at_timestamp_pre_table_is_loud(tmp_path):
    path = _mk_log(tmp_path, [5.0, 1.0])
    with pytest.raises(DeltaWriteError, match="no delta commit"):
        version_at_timestamp(path, "1990-01-01 00:00:00")
