"""Gate-hygiene invariants (VERDICT r4 #1 and #7).

1. Every oracle's DuckDB result schema must bind to types the driver's
   harness normalizes identically to Spark's: no HUGEINT (DuckDB's
   sum(BIGINT) default) and no DECIMAL — both render differently from
   Spark's BIGINT/DOUBLE under some harness normalizations, which was the
   exact signature of the round-4 ``documents_split`` hash red (rows and
   schema matched, values didn't).  Binding (``rel.types``) plans the
   query without executing it, so this covers all 78 oracles cheaply.

2. Registry-rotation invariant: the driver gate only covers the first 50
   registry entries; the rotation discipline promises every query an
   external green at least every other round.  Assert
   ``set(registry) ⊆ gate(r_n) ∪ gate(r_{n-1})`` over the recorded
   CORRECTNESS_r*.json files so the invariant can't silently break.
"""

from __future__ import annotations

import glob
import json
import os
import re

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Types whose repr/normalization is engine-identical between DuckDB and the
# Spark results the gate hashes against.  Anything outside this set (HUGEINT,
# DECIMAL(38,0), UHUGEINT, ...) must be CAST in the oracle SQL itself.
_SAFE = re.compile(
    r"^(BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE|FLOAT|VARCHAR|BOOLEAN"
    r"|DATE|TIMESTAMP(_NS| WITH TIME ZONE)?|BLOB"
    r"|VARCHAR\[\]|BIGINT\[\]|DOUBLE\[\]|INTEGER\[\])$"
)


def _entry():
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    return E


def test_every_oracle_binds_to_gate_safe_types():
    E = _entry()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    offenders = []
    oracles = E.oracle_sql()
    assert set(oracles) == set(E.queries()), "every query needs an oracle"
    for name, sql in sorted(oracles.items()):
        rel = con.sql(sql)  # binds/plans only; no execution
        for col, typ in zip(rel.columns, (str(t) for t in rel.types)):
            if not _SAFE.match(typ.upper()):
                offenders.append((name, col, typ))
    assert not offenders, f"type-unpinned oracle columns: {offenders}"


def test_gate_rotation_covers_every_registry_query():
    E = _entry()
    registry = list(E.queries())
    gates = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if len(gates) < 2:
        pytest.skip("fewer than two recorded driver gates")
    last_two = set()
    for path in gates[-2:]:
        with open(path) as f:
            last_two |= set(json.load(f))
    # Queries added since the newest gate ran are exempt (they sit at the
    # head of the window and will be covered by the next gate); everything
    # that existed before must appear in one of the last two gates.
    missing = [q for q in registry if q not in last_two]
    window = registry[:50]
    stale = [q for q in missing if q not in window]
    assert not stale, (
        "registry queries outside the upcoming 50-row gate window with no "
        f"external green in the last two rounds: {stale}"
    )
    # Forward invariant: once the registry exceeds the gate's two-round
    # capacity (100), some tail queries will miss next round's lookback.
    # Policy: exactly the declared GATE_DEFERRED variants (each the
    # alternate formulation of an in-window primary) may defer — and they
    # must lead the NEXT window, which this assert forces by failing if
    # anything else would go stale.
    with open(gates[-1]) as f:
        newest = set(json.load(f))
    stale_next = {
        q for q in registry[50:] if q not in newest
    }
    deferred = set(getattr(E, "GATE_DEFERRED", []))
    assert stale_next <= deferred, (
        "tail queries that would miss next round's two-gate lookback but "
        f"are not declared in GATE_DEFERRED: {sorted(stale_next - deferred)}"
    )


def test_r6_staged_queries_bind_and_are_disjoint():
    """The R6 staging block (operators added after the r5 window
    saturated): staged query/oracle keys must match each other, stay out
    of the live registry, and every staged oracle must bind in DuckDB
    with gate-safe types — so the r6 merge is a two-line dict union, not
    an archaeology project."""
    E = _entry()
    assert set(E.R6_QUERIES) == set(E.R6_ORACLES)
    assert not set(E.R6_QUERIES) & set(E.queries())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    offenders = []
    for name, sql in sorted(E.R6_ORACLES.items()):
        rel = con.sql(sql)  # binds/plans only
        for col, typ in zip(rel.columns, (str(t) for t in rel.types)):
            if not _SAFE.match(typ.upper()):
                offenders.append((name, col, typ))
    assert not offenders, f"type-unpinned staged oracle columns: {offenders}"
