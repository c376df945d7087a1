"""Generator determinism + fixture-pathology presence (FIXTURES.md §1).

Mirrors the reference's determinism discipline (StableOutputTests.scala:8-29)
at the corpus level: same seed → byte-identical row lists.
"""

from __future__ import annotations

from codepropertygraph_spark import schema as S
from codepropertygraph_spark import testdata as td


def test_generator_deterministic():
    r1, a1 = td.generate_transcripts("sf0.001")
    r2, a2 = td.generate_transcripts("sf0.001")
    assert r1 == r2
    assert a1 == a2


def test_reference_extractor_deterministic():
    rows, alias = td.generate_transcripts("sf0.001")
    assert td.reference_extract(rows, alias) == td.reference_extract(rows, alias)


def test_pathologies_present():
    rows, alias = td.generate_transcripts("sf0.001")
    by_conv: dict[str, list[dict]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)

    sizes = sorted(len(v) for v in by_conv.values())
    median = sizes[len(sizes) // 2]
    assert max(sizes) >= 15 * median, "mega-conversation missing"
    assert min(sizes) == 1, "single-turn conversation missing"

    # duplicate turn_idx disambiguated by ts
    dup = [
        c
        for c, turns in by_conv.items()
        if len({t["turn_idx"] for t in turns}) < len(turns)
    ]
    assert dup, "duplicate-turn_idx pathology missing"
    for c in dup:
        keys = {(t["turn_idx"], t["ts"]) for t in by_conv[c]}
        assert len(keys) == len(by_conv[c]), "ts must disambiguate duplicates"

    # hub entity in >= 30% of conversations
    hub_convs = {
        r["conv_id"] for r in rows if " org_1 " in f' {r["text"]} '
    }
    assert len(hub_convs) >= 0.3 * len(by_conv), "hub entity missing"

    # alias collisions: one surface, two canonicals
    from collections import Counter

    c = Counter(a["alias"] for a in alias)
    assert any(v > 1 for v in c.values()), "alias collisions missing"

    # unresolvable mentions present
    assert any("unknown_thing_" in r["text"] for r in rows)

    # tool turns carry the tool column
    tool_rows = [r for r in rows if r["role"] == "tool"]
    assert tool_rows and all(r["tool"] for r in tool_rows)


def test_predicate_vocabulary_closed():
    rows, alias = td.generate_transcripts("sf0.001")
    triples = td.reference_extract(rows, alias)
    preds = {t[2] for t in triples}
    assert preds <= set(S.ALL_PREDICATES)
