"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_registry_consistency():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # most queries should carry an oracle (rows-only is the exception)
    assert len(oracles) >= len(qs) - 3


def test_ordered_specs_prioritizes_rerecords(monkeypatch):
    """The driver caps a round at 50 recorded rows, so ordering IS the
    re-record mechanism: latest-not-full-pass first, then never-recorded,
    then registration order (VERDICT r2 wrong #4)."""
    specs = entrymod.load_all()
    names = list(specs)
    failed, stale, green = names[5], names[10], names[0]
    fake_latest = {
        failed: {"err": "boom", "rows_match": None, "schema_match": None,
                 "hash_match": None},
        stale: {"err": None, "rows_match": True, "schema_match": None,
                "hash_match": None},  # rows-only row for an oracled query
        green: {"err": None, "rows_match": True, "schema_match": True,
                "hash_match": True},
    }
    monkeypatch.setattr(entrymod, "_latest_rows", lambda: fake_latest)
    ordered = list(entrymod._ordered_specs())
    # the two not-full-pass rows lead (in registration order)
    assert set(ordered[:2]) == {failed, stale}
    # never-recorded queries come before the green recorded one
    assert ordered.index(green) > ordered.index(names[1])
    # nothing lost or duplicated
    assert sorted(ordered) == sorted(names)


def test_is_full_pass():
    ok = {"err": None, "rows_match": True, "schema_match": True, "hash_match": True}
    assert entrymod._is_full_pass(ok)
    assert not entrymod._is_full_pass({**ok, "err": "x"})
    assert not entrymod._is_full_pass({**ok, "hash_match": None})
    assert not entrymod._is_full_pass(None)
