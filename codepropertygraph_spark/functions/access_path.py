"""Access-path algebra — tracked-field path comparison, JVM-side.

The reference models nested data access as element sequences (ConstantAccess
/ VariableAccess / pointer shifts) with a ``matchAndDiff`` comparison that
classifies two paths as exact / prefix / extension / mismatch and returns the
leftover elements (``semanticcpg/.../accesspath/AccessPath.scala``,
``AccessElement.scala``) — the primitive the dataflow engine needs to decide
whether a write to ``x.a[3].b`` affects a read of ``x.a[*]``.

Domain translation: our nested data is the AST-JSON tree, whose node paths
(``$.clauses[0].subj.surface``) ARE access paths. Elements are constant
member accesses (``clauses``, ``surface``) and index accesses (``[0]``);
``[*]`` is the VariableAccess analog matching any index. Everything is a
Spark SQL expression over element arrays — no Python, applies columnar to
billions of paths.

Match kinds (AccessPath.scala MatchResult analog):
- EXACT            — same elements end to end
- A_PREFIX_OF_B    — a exhausted first; diff = b's remainder (the reference's
                     PREFIX_MATCH: the tracked path covers a subtree)
- B_PREFIX_OF_A    — b exhausted first; diff = a's remainder (EXTENDED_MATCH)
- NO_MATCH         — mismatching element before either exhausted
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WILDCARD = "[*]"


def elements(path_col) -> Column:
    """Split a JSONPath-style string ('$.a[0].b') into its element array
    (['a', '[0]', 'b']). The root '$' is dropped — it matches everything."""
    c = path_col if isinstance(path_col, Column) else F.col(path_col)
    return F.filter(
        F.split(F.regexp_replace(c, r"\[", r".["), r"\."),
        lambda x: (x != "$") & (x != ""),
    )


def _pairwise_ok(a: Column, b: Column, k: Column) -> Column:
    """True when the first k elements match element-wise (wildcard on either
    side matches any index/constant at that position)."""
    return (
        F.size(
            F.filter(
                F.zip_with(
                    F.slice(a, 1, k),
                    F.slice(b, 1, k),
                    lambda x, y: ~((x == y) | (x == WILDCARD) | (y == WILDCARD)),
                ),
                lambda bad: bad,
            )
        )
        == 0
    )


def match_and_diff(a: Column, b: Column) -> Column:
    """struct(kind, diff): classify element arrays ``a`` vs ``b`` and return
    the unmatched tail of the longer side (empty for EXACT / NO_MATCH)."""
    k = F.least(F.size(a), F.size(b))
    ok = _pairwise_ok(a, b, k)
    kind = (
        F.when(~ok, F.lit("NO_MATCH"))
        .when(F.size(a) == F.size(b), F.lit("EXACT"))
        .when(F.size(a) < F.size(b), F.lit("A_PREFIX_OF_B"))
        .otherwise(F.lit("B_PREFIX_OF_A"))
    )
    longer = F.when(F.size(a) >= F.size(b), a).otherwise(b)
    diff = F.when(ok & (F.size(a) != F.size(b)), F.slice(longer, k + 1, F.size(longer) - k)).otherwise(
        F.array().cast("array<string>")
    )
    return F.struct(kind.alias("kind"), diff.alias("diff"))


def match_path(path_col, pattern: str) -> Column:
    """Convenience: match a path STRING column against a constant pattern
    string (which may contain [*] wildcards); returns struct(kind, diff)
    with a = pattern, b = the column's path."""
    pat = F.lit(pattern)
    return match_and_diff(elements(pat), elements(path_col))
