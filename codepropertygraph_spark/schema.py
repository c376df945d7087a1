"""Declared graph schema — the analog of the reference's JSON schema system.

The reference declares node types + allowed property keys in
``schema/src/main/resources/schemas/base.json:67-602`` (``nodeTypes``), edge
types at ``base.json:616-636`` plus extension schemas, base traits at
``base.json:605-614``, closed enums at ``base.json:640-676``, and the operator
name vocabulary at ``schemas/operators.json:5-257``. Codegen turns that JSON
into proto + domain classes (``codepropertygraph/codegen/src/main/python/
generateProtobuf.py:8-24``).

Here the single source of truth is ``schema_decl.json`` next to this module
— the ``base.json`` analog — and this module is the generator
(``generateProtobuf.py`` analog, run as an import-time loader rather than a
text emitter): it derives the label/key constants, the PySpark
``StructType`` for every table, the expectation facts used by the validator
(the ``cpgvalidator`` analog, ``cpgvalidator/src/main/scala/io/shiftleft/
cpgvalidator/validators/CpgValidator.scala:8-14``), and the proto enum
tables ``operators/proto_io.py`` serializes with. Adding a node key, edge
property, or decorator-derived property touches exactly one file:
``schema_decl.json``.

Domain mapping (SURVEY.md §1.3): CONVERSATION ≈ FILE, TURN ≈ METHOD/BLOCK,
MENTION ≈ IDENTIFIER/CALL, ENTITY ≈ TYPE_DECL/METHOD, TOOLCALL ≈ CALL with
dispatch, META_DATA ≈ META_DATA.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

with open(os.path.join(os.path.dirname(__file__), "schema_decl.json")) as _fh:
    _DECL = json.load(_fh)

SCHEMA_VERSION: int = _DECL["version"]

# ---------------------------------------------------------------------------
# Node labels (base.json:67-602 analog). Declaration order is significant:
# it fixes the 1-based proto enum numbering below. The tuple-unpacks tie the
# convenience constants to the declaration — reordering or renaming in the
# JSON fails loudly here at import.
# ---------------------------------------------------------------------------

NODE_LABELS: tuple[str, ...] = tuple(_DECL["node_types"])
(CONVERSATION, TURN, MENTION, ENTITY, TOOLCALL, META_DATA) = NODE_LABELS
assert NODE_LABELS == (
    "CONVERSATION", "TURN", "MENTION", "ENTITY", "TOOLCALL", "META_DATA"
)

# Allowed property keys per node label (base.json nodeKeys analog). Hot
# properties are top-level typed columns of the nodes table; the long tail
# lives in a map<string,string> column, mirroring how the reference keeps a
# fixed per-type key set (base.json:7-56).
NODE_KEYS: dict[str, tuple[str, ...]] = {
    label: tuple(keys) for label, keys in _DECL["node_types"].items()
}

# ---------------------------------------------------------------------------
# Edge labels (base.json:616-636 + enhancements.json:247-258 analog)
# ---------------------------------------------------------------------------

EDGE_LABELS: tuple[str, ...] = tuple(_DECL["edge_types"])
# AST containment: CONVERSATION -> TURN, TURN -> MENTION/TOOLCALL
# NEXT per-conversation turn order (CFG analog)
# CONTAINS transitive containment shortcut (ContainsEdgePass A15)
# REF MENTION -> ENTITY (Linker.linkToSingle semantics, A10)
# REL triple edge ENTITY -> ENTITY; props['pred'] = predicate
# CALL TOOLCALL -> ENTITY(TOOL) resolved call edge (CallLinker A13)
# SOURCE_FILE node -> CONVERSATION file-analog (FileLinker A11)
(AST, NEXT, CONTAINS, REF, REL, CALL, SOURCE_FILE) = EDGE_LABELS
assert EDGE_LABELS == (
    "AST", "NEXT", "CONTAINS", "REF", "REL", "CALL", "SOURCE_FILE"
)

# Allowed (src_label, edge_label, dst_label) facts — the cpgvalidator
# expectation table (CpgValidator.scala:8-14 analog).
EDGE_FACTS: frozenset[tuple[str, str, str]] = frozenset(
    tuple(f) for f in _DECL["edge_facts"]
)

# Edge-cardinality facts — the reference schema's outEdges cardinality
# declarations the validator enforces (``CpgValidator.scala:8-14`` walks
# ``ValidationFacts``; base.json edge entries carry cardinality ONE /
# ZERO_OR_ONE / LIST). Each fact: a node of ``node_label`` must have between
# ``min`` and ``max`` (None = unbounded) ``edge_label`` edges in
# ``direction`` ('out' | 'in').
CARDINALITY_FACTS: tuple[tuple[str, str, str, int, int | None], ...] = tuple(
    (lbl, direction, edge, lo, hi)
    for lbl, direction, edge, lo, hi in _DECL["cardinality_facts"]
)

# ---------------------------------------------------------------------------
# Base traits (base.json:605-614 analog). The reference query DSL dispatches
# on traits via implicits (semanticcpg/.../language/package.scala:137-151);
# here a trait filter compiles to F.col("label").isin(labels_of_trait(t)).
# ---------------------------------------------------------------------------

TRAITS: dict[str, frozenset[str]] = {
    trait: frozenset(labels) for trait, labels in _DECL["traits"].items()
}


def labels_of_trait(trait: str) -> list[str]:
    return sorted(TRAITS[trait])


# ---------------------------------------------------------------------------
# Closed vocabularies (base.json:640-676 / operators.json analog)
# ---------------------------------------------------------------------------

ROLES: tuple[str, ...] = tuple(_DECL["roles"])

ENTITY_TYPES: tuple[str, ...] = tuple(_DECL["entity_types"])

# Predicate vocabulary — the <operator>.* closed name set analog
# (schemas/operators.json:5-257). 'follows' is derived from turn order
# (NEXT-edge projection); the rest appear literally in turn text.
TEXT_PREDICATES: tuple[str, ...] = tuple(_DECL["text_predicates"])
(PRED_USES_TOOL, PRED_MENTIONS, PRED_ASKS_ABOUT, PRED_REFERS_TO) = TEXT_PREDICATES
(PRED_FOLLOWS,) = tuple(_DECL["derived_predicates"])
ALL_PREDICATES: tuple[str, ...] = TEXT_PREDICATES + (PRED_FOLLOWS,)

# Prefix for stub entities synthesized for unresolvable mentions
# (MethodStubCreator analog, semanticcpg/.../fuzzyc/MethodStubCreator.scala:42-53).
EXTERNAL_PREFIX: str = _DECL["external_prefix"]

# ---------------------------------------------------------------------------
# Proto enum tables (cpg.proto NodeType / EdgeType / NodePropertyName
# analogs), serialized by operators/proto_io.py. Deterministic: declaration
# order of schema_decl.json, 1-based (0 = UNKNOWN_*, exactly as the
# reference template reserves 0 for the UNKNOWN members).
# ---------------------------------------------------------------------------

NODE_TYPE_ENUM: dict[str, int] = {l: i + 1 for i, l in enumerate(NODE_LABELS)}
EDGE_TYPE_ENUM: dict[str, int] = {l: i + 1 for i, l in enumerate(EDGE_LABELS)}

# Hot node columns of the nodes table (each encodes as a typed top-level
# property) and the closed edge-prop / decorator-derived key sets. Closed by
# design — the reference's NodePropertyName enum admits only schema-declared
# keys; an undeclared key raises at encode time rather than silently
# round-tripping wrong.
HOT_NODE_COLUMNS: tuple[str, ...] = tuple(_DECL["hot_node_columns"])
EDGE_PROP_KEYS: tuple[str, ...] = tuple(_DECL["edge_prop_keys"])
DERIVED_PROP_KEYS: tuple[str, ...] = tuple(_DECL["derived_prop_keys"])

PROPERTY_NAME_ENUM: dict[str, int] = {
    k: i + 1
    for i, k in enumerate(
        sorted(
            {k for keys in NODE_KEYS.values() for k in keys}
            | set(HOT_NODE_COLUMNS)
            | set(EDGE_PROP_KEYS)
            | set(DERIVED_PROP_KEYS)
        )
    )
}

# ---------------------------------------------------------------------------
# Table schemas (derived from the declaration's column lists)
# ---------------------------------------------------------------------------

_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "map<string,string>": T.MapType(T.StringType(), T.StringType()),
}


def _struct(table: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(name, _TYPES[typ], nullable)
            for name, typ, nullable in _DECL["tables"][table]
        ]
    )


TRANSCRIPTS_SCHEMA = _struct("transcripts")
ALIAS_DICT_SCHEMA = _struct("alias_dict")
NODES_SCHEMA = _struct("nodes")
EDGES_SCHEMA = _struct("edges")
TRIPLES_SCHEMA = _struct("triples")
