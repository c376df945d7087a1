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


def test_gate_covers_every_registry_query():
    """Build-phase gates sampled a rotating 50-row window; from round 6 on
    (optimization phase) the driver re-runs EVERY declared query each round,
    so the two-round staleness window that this test used to police is
    retired.  The invariant that remains meaningful — and must never break —
    is that no registry query exists without at least one recorded external
    driver green."""
    E = _entry()
    registry = list(E.queries())
    gates = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not gates:
        pytest.skip("no recorded driver gates")
    seen = set()
    for path in gates:
        with open(path) as f:
            seen |= set(json.load(f))
    # Queries added since the newest gate ran are exempt: the driver's next
    # full-registry gate covers them.
    with open(gates[-1]) as f:
        newest_mtime = os.path.getmtime(gates[-1])
    never = [q for q in registry if q not in seen]
    deferred = set(getattr(E, "GATE_DEFERRED", []))
    assert not [q for q in never if q not in deferred], (
        f"registry queries with no external driver green ever: {never} "
        f"(newest gate: {gates[-1]}, mtime {newest_mtime})"
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
