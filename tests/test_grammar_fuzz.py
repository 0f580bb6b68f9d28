"""Adversarial fuzz of the catalog's pre-parser grammar surfaces
(maintenance regexes, time-travel rewrite, CDF TVF rewrite).

Motivated by a real round-11 bug: the first time-travel rewrite regex
backtracked O(n^2) on long identifier-character runs, hanging /api/sql
for minutes on a 70 KB comment-padded POST body. These tests pin the
two invariants every pre-parser surface must hold against arbitrary
input: (1) LINEAR-time gating — no statement, however shaped, may take
super-linear time to classify; (2) loud-or-ignored — adversarial text
either raises a clean CatalogError/parse error or falls through to
Spark's parser, never hangs and never silently rewrites the wrong
span."""

from __future__ import annotations

import time

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from roapi_spark.catalog import Catalog, CatalogError

# pathological paddings: ident-char runs, whitespace runs, quote-ish
# runs, keyword fragments — the shapes that make backtracking regexes
# quadratic
PADS = st.sampled_from(
    ["x", "x.y", "_", "9", " ", "\t", "`", "'", "VERSION ", "AS OF ",
     "TIMESTAMP ", "FOR ", "table_changes(", "RETAIN "]
)


@st.composite
def adversarial_sql(draw) -> str:
    n = draw(st.integers(1_000, 40_000))
    pad = draw(PADS) * (n // max(1, len(draw(PADS))))
    shape = draw(st.integers(0, 5))
    if shape == 0:
        return f"SELECT COUNT(*) AS n FROM t /* {pad} */"
    if shape == 1:
        return f"SELECT 1 -- {pad}\nFROM t"
    if shape == 2:
        return f"SELECT '{pad[:20000]}' AS s"
    if shape == 3:
        return f"{pad} VERSION AS OF 3"
    if shape == 4:
        return f"SELECT * FROM {pad[:5000]} TIMESTAMP AS OF '2020-01-01'"
    return f"VACUUM {pad[:5000]} RETAIN 1 VERSIONS"


@given(adversarial_sql())
@settings(
    max_examples=150,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_grammar_gates_are_linear_time(sql):
    """Classifying ANY statement — regex gates + rewrite scans — must be
    near-instant regardless of padding shape. 150 ms is ~100x the honest
    cost at 40 KB and far below any backtracking blowup (the round-11
    bug took >60 s on this shape)."""
    t0 = time.time()
    for pat in (
        Catalog._TT_KEY_RE,
        Catalog._CDF_RE,
        Catalog._MAINT_RE,
        Catalog._RESTORE_RE,
        Catalog._HISTORY_RE,
        Catalog._DETAIL_RE,
        Catalog._INFO_SCHEMA_RE,
        Catalog._TBLPROPS_RE,
        Catalog._SHOW_PROPS_RE,
        Catalog._CTAS_RE,
        Catalog._DROP_RE,
    ):
        pat.search(sql)
    assert time.time() - t0 < 0.15, f"super-linear gate on: {sql[:80]!r}..."


@given(adversarial_sql())
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_rewrites_never_hang_and_fail_loudly(spark, sql):
    """Driving the full query_sql front half on adversarial text: every
    outcome is a bounded-time clean error (CatalogError for grammar
    surfaces, Spark's own parse error otherwise) — never a hang."""
    cat = Catalog(spark, read_only=False)  # no tables registered
    t0 = time.time()
    try:
        cat.query_sql(sql)
    except Exception:  # noqa: BLE001 — loud is the contract; kind varies
        pass
    assert time.time() - t0 < 10, f"slow classification: {sql[:80]!r}..."


def test_time_travel_rewrite_targets_exact_span(spark, tmp_path):
    """The manual backward identifier scan must rewrite exactly the
    `<ident> VERSION AS OF <n>` span — surrounding text, operators and
    a second reference in the same statement stay intact."""
    from roapi_spark.config import parse_table_config
    from roapi_spark.sinks.delta import write_delta

    path = str(tmp_path / "tspan")
    write_delta(
        spark.createDataFrame([(1,), (2,)], "id bigint"), path, mode="overwrite"
    )
    cat = Catalog(spark, read_only=False)
    cat.load_table(
        parse_table_config({"name": "tt", "uri": path, "option": {"format": "delta"}})
    )
    cat.query_sql("DELETE FROM tt WHERE id = 2")
    out = cat.query_sql(
        "SELECT (SELECT count(*) FROM tt VERSION AS OF 0) AS n0, "
        "(SELECT count(*) FROM tt FOR VERSION AS OF 1) AS n1, "
        "count(*) AS cur FROM tt"
    ).collect()[0]
    assert (out.n0, out.n1, out.cur) == (2, 1, 1)


def test_unknown_table_time_travel_is_loud(spark):
    cat = Catalog(spark, read_only=True)
    with pytest.raises(CatalogError, match="table not found"):
        cat.query_sql("SELECT * FROM nope VERSION AS OF 0")
    with pytest.raises(CatalogError, match="table not found"):
        cat.query_sql("SELECT * FROM table_changes('nope', 0)")
