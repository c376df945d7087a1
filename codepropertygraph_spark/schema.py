"""Declared graph schema — the analog of the reference's JSON schema system.

The reference declares node types + allowed property keys in
``schema/src/main/resources/schemas/base.json:67-602`` (``nodeTypes``), edge
types at ``base.json:616-636`` plus extension schemas, base traits at
``base.json:605-614``, closed enums at ``base.json:640-676``, and the operator
name vocabulary at ``schemas/operators.json:5-257``. Codegen turns that JSON
into proto + domain classes (``codepropertygraph/codegen/src/main/python/
generateProtobuf.py:8-24``).

Here the single source of truth is this module: it declares labels, keys,
cardinalities and traits for the transcript knowledge graph, derives the
PySpark ``StructType`` for the node/edge tables, and derives the expectation
facts used by the validator (the ``cpgvalidator`` analog,
``cpgvalidator/src/main/scala/io/shiftleft/cpgvalidator/validators/
CpgValidator.scala:8-14``).

Domain mapping (SURVEY.md §1.3): CONVERSATION ≈ FILE, TURN ≈ METHOD/BLOCK,
MENTION ≈ IDENTIFIER/CALL, ENTITY ≈ TYPE_DECL/METHOD, TOOLCALL ≈ CALL with
dispatch, META_DATA ≈ META_DATA.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Node labels (base.json:67-602 analog)
# ---------------------------------------------------------------------------

CONVERSATION = "CONVERSATION"
TURN = "TURN"
MENTION = "MENTION"
ENTITY = "ENTITY"
TOOLCALL = "TOOLCALL"
META_DATA = "META_DATA"

NODE_LABELS = (CONVERSATION, TURN, MENTION, ENTITY, TOOLCALL, META_DATA)

# Allowed property keys per node label (base.json nodeKeys analog). Hot
# properties are top-level typed columns of the nodes table; the long tail
# lives in a map<string,string> column, mirroring how the reference keeps a
# fixed per-type key set (base.json:7-56).
NODE_KEYS: dict[str, tuple[str, ...]] = {
    CONVERSATION: ("name", "conv_id", "n_turns"),
    TURN: ("conv_id", "turn_idx", "order", "role", "tool", "code", "ts"),
    MENTION: ("conv_id", "turn_idx", "order", "name", "code"),
    ENTITY: ("name", "full_name", "entity_type", "is_external"),
    TOOLCALL: ("conv_id", "turn_idx", "order", "name", "full_name"),
    META_DATA: ("language", "version", "overlays"),
}

# ---------------------------------------------------------------------------
# Edge labels (base.json:616-636 + enhancements.json:247-258 analog)
# ---------------------------------------------------------------------------

AST = "AST"  # containment: CONVERSATION -> TURN, TURN -> MENTION/TOOLCALL
NEXT = "NEXT"  # per-conversation turn order (CFG analog)
CONTAINS = "CONTAINS"  # transitive containment shortcut (ContainsEdgePass A15)
REF = "REF"  # MENTION -> ENTITY (Linker.linkToSingle semantics, A10)
REL = "REL"  # triple edge ENTITY -> ENTITY; props['pred'] = predicate
CALL = "CALL"  # TOOLCALL -> ENTITY(TOOL) resolved call edge (CallLinker A13)
SOURCE_FILE = "SOURCE_FILE"  # node -> CONVERSATION file-analog (FileLinker A11)

EDGE_LABELS = (AST, NEXT, CONTAINS, REF, REL, CALL, SOURCE_FILE)

# Allowed (src_label, edge_label, dst_label) facts — the cpgvalidator
# expectation table (CpgValidator.scala:8-14 analog).
EDGE_FACTS: frozenset[tuple[str, str, str]] = frozenset(
    {
        (CONVERSATION, AST, TURN),
        (TURN, AST, MENTION),
        (TURN, AST, TOOLCALL),
        (TURN, NEXT, TURN),
        (CONVERSATION, CONTAINS, TURN),
        (CONVERSATION, CONTAINS, MENTION),
        (CONVERSATION, CONTAINS, TOOLCALL),
        (MENTION, REF, ENTITY),
        (ENTITY, REL, ENTITY),
        (TOOLCALL, CALL, ENTITY),
        (TURN, SOURCE_FILE, CONVERSATION),
        (MENTION, SOURCE_FILE, CONVERSATION),
        (TOOLCALL, SOURCE_FILE, CONVERSATION),
    }
)

# Edge-cardinality facts — the reference schema's outEdges cardinality
# declarations the validator enforces (``CpgValidator.scala:8-14`` walks
# ``ValidationFacts``; base.json edge entries carry cardinality ONE /
# ZERO_OR_ONE / LIST). Each fact: a node of ``node_label`` must have between
# ``min`` and ``max`` (None = unbounded) ``edge_label`` edges in
# ``direction`` ('out' | 'in').
CARDINALITY_FACTS: tuple[tuple[str, str, str, int, int | None], ...] = (
    (MENTION, "out", REF, 1, 1),        # every mention resolves to exactly one entity
    (TOOLCALL, "out", CALL, 1, 1),      # every toolcall dispatches to exactly one entity
    (TURN, "out", NEXT, 0, 1),          # linear CFG: at most one successor
    (TURN, "in", NEXT, 0, 1),           # ... and one predecessor
    (TURN, "in", AST, 1, 1),            # every turn has exactly one AST parent
    (MENTION, "in", AST, 1, 1),
    (TOOLCALL, "in", AST, 1, 1),
    (TURN, "in", CONTAINS, 1, 1),       # transitive-containment shortcut is 1:1 here
    (MENTION, "in", CONTAINS, 1, 1),
    (TOOLCALL, "in", CONTAINS, 1, 1),
    (CONVERSATION, "in", AST, 0, 0),    # conversations are roots
    # FileLinker edges are ZERO_OR_ONE (base.json SOURCE_FILE cardinality):
    # graphs built without the link_files pass stay conformant; with it,
    # every within-conversation node links to at most one file.
    (TURN, "out", SOURCE_FILE, 0, 1),
    (MENTION, "out", SOURCE_FILE, 0, 1),
    (TOOLCALL, "out", SOURCE_FILE, 0, 1),
)

# ---------------------------------------------------------------------------
# Base traits (base.json:605-614 analog). The reference query DSL dispatches
# on traits via implicits (semanticcpg/.../language/package.scala:137-151);
# here a trait filter compiles to F.col("label").isin(labels_of_trait(t)).
# ---------------------------------------------------------------------------

TRAITS: dict[str, frozenset[str]] = {
    "AST_NODE": frozenset({CONVERSATION, TURN, MENTION, TOOLCALL}),
    "CFG_NODE": frozenset({TURN}),
    "TRACKING_POINT": frozenset({TURN, MENTION, TOOLCALL}),
    "DECLARATION": frozenset({ENTITY}),
    "EXPRESSION": frozenset({MENTION, TOOLCALL}),
    "WITHIN_CONVERSATION": frozenset({TURN, MENTION, TOOLCALL}),
    "CALL_REPR": frozenset({TOOLCALL}),
}


def labels_of_trait(trait: str) -> list[str]:
    return sorted(TRAITS[trait])


# ---------------------------------------------------------------------------
# Closed vocabularies (base.json:640-676 / operators.json analog)
# ---------------------------------------------------------------------------

ROLES = ("user", "assistant", "system", "tool")

ENTITY_TYPES = ("PERSON", "ORG", "TOOL", "CONCEPT")

# Predicate vocabulary — the <operator>.* closed name set analog
# (schemas/operators.json:5-257). 'follows' is derived from turn order
# (NEXT-edge projection); the rest appear literally in turn text.
PRED_USES_TOOL = "uses_tool"
PRED_MENTIONS = "mentions"
PRED_ASKS_ABOUT = "asks_about"
PRED_REFERS_TO = "refers_to"
PRED_FOLLOWS = "follows"

TEXT_PREDICATES = (PRED_USES_TOOL, PRED_MENTIONS, PRED_ASKS_ABOUT, PRED_REFERS_TO)
ALL_PREDICATES = TEXT_PREDICATES + (PRED_FOLLOWS,)

# Prefix for stub entities synthesized for unresolvable mentions
# (MethodStubCreator analog, semanticcpg/.../fuzzyc/MethodStubCreator.scala:42-53).
EXTERNAL_PREFIX = "external:"

# ---------------------------------------------------------------------------
# Table schemas
# ---------------------------------------------------------------------------

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

ALIAS_DICT_SCHEMA = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("canonical_name", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("prior", T.DoubleType(), False),
    ]
)

NODES_SCHEMA = T.StructType(
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

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
    ]
)
