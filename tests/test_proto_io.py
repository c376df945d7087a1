"""Proto wire-format interchange (cpg.bin.zip analog) — proto_io.py.

Wire-level golden bytes (hand-derived from the public proto3 encoding so the
codec is checked against the SPEC, not against itself), full-graph roundtrip
on a pipeline-built warehouse, unknown-field tolerance (proto3 parseFrom
parity), and the closed-vocabulary contract."""

from __future__ import annotations

import json
import zipfile

import pytest
from pyspark.sql import functions as F

from codepropertygraph_spark.operators import proto_io
from codepropertygraph_spark.plans import pipeline as P


@pytest.fixture(scope="module")
def catalog(spark, transcripts, alias_dict, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_proto"))
    return P.run_pipeline(spark, transcripts, alias_dict, wh)


# -- wire-level goldens -------------------------------------------------------


def test_varint_golden():
    # spec examples: 1 -> 01, 300 -> AC 02, max uint64 -> 10 bytes
    assert proto_io._uvarint(1) == b"\x01"
    assert proto_io._uvarint(300) == b"\xac\x02"
    assert len(proto_io._uvarint(-1)) == 10  # two's complement int64
    # decode inverts encode across the range edges
    for n in (0, 1, 127, 128, 300, 2**31, 2**63 - 1, -1, -(2**63)):
        buf = proto_io._uvarint(n)
        got, pos = proto_io._read_uvarint(buf, 0)
        assert pos == len(buf)
        assert proto_io._to_int64(got) == proto_io._to_int64(n)


def test_node_wire_golden():
    """Hand-assembled expected bytes for a minimal Node message.

    Node{key=1: varint, type=2: varint, property=3: LEN} with one string
    property; Property{name=1: varint, value=2: LEN};
    PropertyValue{string_value=1: LEN}."""
    label = proto_io.S.NODE_LABELS[0]  # enum value 1
    name_enum = proto_io.PROPERTY_NAME_ENUM["name"]
    row = {"id": 5, "label": label, "name": "ab", "props": {}}
    got = proto_io.encode_node(row)
    pv = b"\x0a\x02ab"  # field 1 LEN=2 'ab'
    prop = bytes([0x08, name_enum]) + b"\x12" + bytes([len(pv)]) + pv
    exp = (
        b"\x08\x05"  # key=5
        b"\x10\x01"  # type=1
        b"\x1a" + bytes([len(prop)]) + prop  # property (field 3, LEN)
    )
    assert got == exp
    # and the decoder inverts it when wrapped as a CpgStruct node entry
    struct = b"\x0a" + bytes([len(got)]) + got
    nodes, edges = proto_io.decode_struct(
        struct,
        {v: k for k, v in proto_io.PROPERTY_NAME_ENUM.items()},
        {v: k for k, v in proto_io.NODE_TYPE_ENUM.items()},
        {v: k for k, v in proto_io.EDGE_TYPE_ENUM.items()},
    )
    assert edges == []
    assert nodes[0]["id"] == 5 and nodes[0]["label"] == label
    assert nodes[0]["name"] == "ab"


def test_edge_wire_roundtrip_with_props():
    label = proto_io.S.EDGE_LABELS[4]  # REL carries props['pred']
    row = {"src": -3, "dst": 2**62, "label": label, "props": {"pred": "uses"}}
    struct = b"\x12" + proto_io._uvarint(len(proto_io.encode_edge(row))) + proto_io.encode_edge(row)
    nodes, edges = proto_io.decode_struct(
        struct,
        {v: k for k, v in proto_io.PROPERTY_NAME_ENUM.items()},
        {v: k for k, v in proto_io.NODE_TYPE_ENUM.items()},
        {v: k for k, v in proto_io.EDGE_TYPE_ENUM.items()},
    )
    assert nodes == []
    assert edges[0]["src"] == -3 and edges[0]["dst"] == 2**62
    assert edges[0]["label"] == label and edges[0]["props"] == {"pred": "uses"}


def test_decoder_skips_unknown_fields():
    """proto3 parseFrom parity: unknown field numbers and wire types 1/5 in
    a Node message are skipped, known fields still decode."""
    node_body = (
        b"\x08\x07"          # key=7
        b"\x10\x02"          # type=2
        b"\x78\x01"          # field 15 varint (unknown)
        b"\x65\x01\x02\x03\x04"  # field 12 fixed32 (unknown)
        b"\x3a\x02hi"        # field 7 LEN (unknown)
    )
    struct = b"\x0a" + bytes([len(node_body)]) + node_body
    nodes, _ = proto_io.decode_struct(
        struct, {}, {v: k for k, v in proto_io.NODE_TYPE_ENUM.items()}, {}
    )
    assert nodes[0]["id"] == 7
    assert nodes[0]["label"] == proto_io.S.NODE_LABELS[1]


def test_closed_vocabulary_rejects_unknown_key():
    with pytest.raises(ValueError, match="not in the declared vocabulary"):
        proto_io.encode_node(
            {"id": 1, "label": "TURN", "props": {"no_such_key": "x"}}
        )


def test_empty_string_vs_null_distinct():
    """'' is a present property (oneof members always serialize); null is an
    absent one — they must not collapse."""
    base = {"id": 1, "label": "ENTITY", "props": {}}
    with_empty = proto_io.encode_node({**base, "name": ""})
    with_null = proto_io.encode_node({**base, "name": None})
    assert with_empty != with_null
    struct = b"\x0a" + bytes([len(with_empty)]) + with_empty
    nodes, _ = proto_io.decode_struct(
        struct,
        {v: k for k, v in proto_io.PROPERTY_NAME_ENUM.items()},
        {v: k for k, v in proto_io.NODE_TYPE_ENUM.items()},
        {},
    )
    assert nodes[0]["name"] == ""


# -- full-graph roundtrip -----------------------------------------------------


def _rowset(df):
    return {
        tuple(r)
        for r in df.select(
            *[c for c in df.columns if c != "props"],
            F.array_sort(F.map_entries("props")).cast("string"),
        ).collect()
    }


def test_proto_zip_roundtrip_identical(catalog, spark, tmp_path):
    nodes, edges = catalog.nodes(), catalog.edges()
    path = str(tmp_path / "graph.cpg.bin.zip")
    m = proto_io.export_proto_zip(nodes, edges, path, n_shards=3)
    assert m["proto_bundle_version"] == proto_io.PROTO_BUNDLE_VERSION

    rn, re_, m2 = proto_io.load_proto_zip(spark, path)
    assert m2 == m
    assert _rowset(rn) == _rowset(nodes.select(*rn.columns))
    assert _rowset(re_) == _rowset(edges.select(*re_.columns))

    # determinism: re-export byte-identical entries (zip timestamps differ,
    # so compare entry payload CRCs, not archive bytes)
    path2 = str(tmp_path / "graph2.cpg.bin.zip")
    proto_io.export_proto_zip(nodes, edges, path2, n_shards=3)
    crcs = lambda p: sorted(
        (i.filename, i.CRC, i.file_size) for i in zipfile.ZipFile(p).infolist()
    )
    assert crcs(path) == crcs(path2)

    # the archive is structurally what ProtoCpgLoader expects: every entry
    # parses as a CpgStruct (only fields 1/2, LEN-typed), no metadata entry
    with zipfile.ZipFile(path) as zf:
        assert json.loads(zf.comment)["node_types"] == proto_io.NODE_TYPE_ENUM
        for entry in zf.namelist():
            for field, wt, _ in proto_io._iter_fields(zf.read(entry)):
                assert (field, wt) in {(1, 2), (2, 2)}


def test_codec_roundtrip_property():
    """Property-based: any schema-conforming node/edge row round-trips
    through the wire codec bit-exactly (hypothesis over unicode text,
    int boundaries, null patterns, and the declared prop vocabulary)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # props-tail keys exclude the hot columns: the wire format has one
    # property namespace, so a shadowing key is rejected at encode (see
    # encode_node) — this property test is what surfaced that ambiguity
    prop_keys = sorted(set(proto_io.PROPERTY_NAME_ENUM) - set(proto_io._NODE_COLS))
    text = st.text(min_size=0, max_size=40)
    maybe_text = st.none() | text
    node_rows = st.fixed_dictionaries(
        {
            "id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "label": st.sampled_from(list(proto_io.S.NODE_LABELS)),
            "name": maybe_text,
            "full_name": maybe_text,
            "code": maybe_text,
            "order": st.none() | st.integers(min_value=-(2**31), max_value=2**31 - 1),
            "conv_id": maybe_text,
            "turn_idx": st.none() | st.integers(min_value=-(2**31), max_value=2**31 - 1),
            "props": st.dictionaries(st.sampled_from(prop_keys), text, max_size=4),
        }
    )
    pn = {v: k for k, v in proto_io.PROPERTY_NAME_ENUM.items()}
    nt = {v: k for k, v in proto_io.NODE_TYPE_ENUM.items()}
    et = {v: k for k, v in proto_io.EDGE_TYPE_ENUM.items()}

    @settings(max_examples=200, deadline=None)
    @given(node_rows)
    def check(row):
        body = proto_io.encode_node(row)
        struct = b"\x0a" + proto_io._uvarint(len(body)) + body
        nodes, _ = proto_io.decode_struct(struct, pn, nt, et)
        got = nodes[0]
        assert got["id"] == row["id"] and got["label"] == row["label"]
        for c in ("name", "full_name", "code", "conv_id"):
            assert got[c] == row[c]
        for c in ("order", "turn_idx"):
            assert got[c] == row[c]
        assert got["props"] == row["props"]

    check()


def test_overlay_zip_roundtrip_additive(catalog, spark, tmp_path):
    """CpgOverlay form: additive-only zip (direct repeated fields, no Entry
    wrapper) roundtrips and applies; removal kinds are rejected."""
    nodes, edges = catalog.nodes(), catalog.edges()
    new_node = spark.createDataFrame(
        [(777777, "ENTITY", "y", "y", None, None, None, None, {"entity_type": "TOOL"})],
        nodes.schema,
    )
    upd = (
        nodes.filter(F.col("label") == "TURN").limit(2)
        .select("id", F.lit("role").alias("key"), F.lit("tool").alias("value"))
    )
    path = str(tmp_path / "0_overlay.zip")
    m = proto_io.export_overlay_zip(path, add_nodes=new_node, set_node_props=upd)
    assert m["overlay"] is True

    # wire shape: every entry is a CpgOverlay — direct LEN fields 1..4 only
    with zipfile.ZipFile(path) as zf:
        for entry in zf.namelist():
            for field, wt, _ in proto_io._iter_fields(zf.read(entry)):
                assert wt == 2 and 1 <= field <= 4

    ov, m2 = proto_io.load_overlay_zip(spark, path)
    assert m2 == m
    got_n, got_e = proto_io.apply_diff(nodes, edges, ov)
    exp_n, exp_e = proto_io.apply_diff(
        nodes, edges, {"add_nodes": new_node, "set_node_props": upd}
    )
    assert _rowset(got_n) == _rowset(exp_n)
    assert _rowset(got_e) == _rowset(exp_e)

    with pytest.raises(ValueError, match="additive-only"):
        proto_io.export_overlay_zip(
            str(tmp_path / "bad.zip"), remove_nodes=nodes.limit(1).select("id")
        )


# -- DiffGraph serialization --------------------------------------------------


def test_diff_zip_roundtrip_and_apply(catalog, spark, tmp_path):
    """DiffGraphProtoSerializer parity loop: build a change set touching all
    eight entry kinds, serialize → load → apply; the applied graph must be
    row-identical to applying the same primitives directly."""
    from codepropertygraph_spark.plans import diff as D

    nodes, edges = catalog.nodes(), catalog.edges()
    some_turns = nodes.filter(F.col("label") == "TURN").limit(3).select("id")
    upd = some_turns.select(
        "id", F.lit("role").alias("key"), F.lit("assistant").alias("value")
    )
    rm_prop = some_turns.select("id", F.lit("tool").alias("key"))
    victims = nodes.filter(F.col("label") == "MENTION").limit(2).select("id")
    # prop mutations and content-addressed removals must target DISJOINT
    # edges: a mutated edge's sha2 identity no longer matches an id computed
    # from its pre-mutation props (the same constraint the reference's
    # propertiesHash addressing imposes)
    rel = (
        edges.filter(F.col("label") == "REL")
        .dropDuplicates(["src", "dst", "label"])
        .limit(2)
    )
    rm_edges = D.edge_identity(edges.filter(F.col("label") == "AST").limit(2)).select(
        "src", "dst", "label", "edge_id"
    )
    new_node = spark.createDataFrame(
        [(999999, "ENTITY", "x", "x", None, None, None, None, {"entity_type": "TOOL"})],
        nodes.schema,
    )
    # a genuinely NEW edge (adding an already-existing edge and undoing it
    # is ill-posed under content addressing: the undo removes both copies)
    new_edge = spark.createDataFrame(
        [(999999, 999999, "REL", {"pred": "self"})], edges.schema
    )
    eupd = rel.select(
        "src", "dst", "label", F.lit("score").alias("key"), F.lit("0.5").alias("value")
    )

    path = str(tmp_path / "change.diff.zip")
    m = proto_io.export_diff_zip(
        path,
        add_nodes=new_node,
        set_node_props=upd,
        set_edge_props=eupd,
        remove_node_props=rm_prop,
        remove_nodes=victims,
        remove_edges=rm_edges,
        remove_edge_props=rel.select(
            "src", "dst", "label",
            F.sha2(F.lit("x"), 256).alias("edge_id"), F.lit("pred").alias("key"),
        ),
        add_edges=new_edge,
    )
    assert set(m["kinds"]) == {
        "add_nodes", "add_edges", "set_node_props", "set_edge_props",
        "remove_node_props", "remove_nodes", "remove_edges", "remove_edge_props",
    }

    diff, m2 = proto_io.load_diff_zip(spark, path)
    assert m2 == m
    # loaded delta frames equal the originals (set_node_props as exemplar)
    assert {tuple(r) for r in diff["set_node_props"].collect()} == {
        tuple(r) for r in upd.collect()
    }
    assert {tuple(r) for r in diff["remove_edges"].collect()} == {
        tuple(r) for r in rm_edges.collect()
    }

    # every entry is wire-valid DiffGraph: only field 1 (entries, LEN), and
    # every entry body holds exactly one oneof member in 1..8
    with zipfile.ZipFile(path) as zf:
        for entry in zf.namelist():
            for field, wt, msg in proto_io._iter_fields(zf.read(entry)):
                assert (field, wt) == (1, 2)
                kinds = [f for f, w, _ in proto_io._iter_fields(msg) if w == 2]
                assert len(kinds) == 1 and 1 <= kinds[0] <= 8

    # InverseBuilder parity: apply(diff) then apply(invert(base, diff))
    # restores the base graph exactly — including the node-removal cascade
    # (removed nodes' incident edges come back) and props set/remove undo
    inverse = proto_io.invert_diff(nodes, edges, diff)
    fwd_n, fwd_e = proto_io.apply_diff(nodes, edges, diff)
    und_n, und_e = proto_io.apply_diff(fwd_n, fwd_e, inverse)
    assert _rowset(und_n) == _rowset(nodes)
    assert _rowset(und_e) == _rowset(edges)
    # ...and the inverse itself survives a proto roundtrip
    ipath = str(tmp_path / "inverse.diff.zip")
    proto_io.export_diff_zip(ipath, n_shards=2, **inverse)
    inv2, _ = proto_io.load_diff_zip(spark, ipath)
    und2_n, und2_e = proto_io.apply_diff(fwd_n, fwd_e, inv2)
    assert _rowset(und2_n) == _rowset(nodes)
    assert _rowset(und2_e) == _rowset(edges)

    got_n, got_e = proto_io.apply_diff(nodes, edges, diff)
    exp_n, exp_e = proto_io.apply_diff(
        nodes, edges,
        {
            "add_nodes": new_node,
            "add_edges": new_edge,
            "set_node_props": upd,
            "set_edge_props": eupd,
            "remove_node_props": rm_prop,
            "remove_nodes": victims,
            "remove_edges": rm_edges,
            "remove_edge_props": rel.select(
                "src", "dst", "label",
                F.sha2(F.lit("x"), 256).alias("edge_id"), F.lit("pred").alias("key"),
            ),
        },
    )
    assert _rowset(got_n) == _rowset(exp_n)
    assert _rowset(got_e) == _rowset(exp_e)


def test_invert_restores_parallel_rel_edges(spark):
    """Regression (ADVICE r4, high): removing a node that carries TWO REL
    edges to the same neighbor — same (src, dst, label), different props,
    exactly the shape graph.rel_edges produces per (pred, conv_id) — must
    restore BOTH edges on undo.  The old cascade dedup'd incident edges on
    (src, dst, label) and silently dropped one."""
    nodes = spark.createDataFrame(
        [
            (1, "ENTITY", "a", "a", None, None, None, None, {}),
            (2, "ENTITY", "b", "b", None, None, None, None, {}),
        ],
        proto_io._NODE_OUT_SCHEMA,
    )
    edges = spark.createDataFrame(
        [
            (1, 2, "REL", {"pred": "uses", "conv_id": "c1"}),
            (1, 2, "REL", {"pred": "calls", "conv_id": "c2"}),
            (2, 1, "REL", {"pred": "uses", "conv_id": "c1"}),
        ],
        proto_io._EDGE_OUT_SCHEMA,
    )
    diff = {"remove_nodes": spark.createDataFrame([(1,)], "id long")}
    inverse = proto_io.invert_diff(nodes, edges, diff)
    fwd_n, fwd_e = proto_io.apply_diff(nodes, edges, diff)
    assert fwd_e.count() == 0
    und_n, und_e = proto_io.apply_diff(fwd_n, fwd_e, inverse)
    assert _rowset(und_n) == _rowset(nodes)
    assert _rowset(und_e) == _rowset(edges)


def test_invert_remove_edge_props_uses_content_edge_id(spark):
    """Regression (ADVICE r4, low): the remove_edge_props rows emitted by
    invert_diff must carry the module-wide content identity
    (plans.diff.edge_identity over src|dst|label|props-json), not an ad-hoc
    sha2(src|dst|label) — so content-addressed consumers of the inverse zip
    resolve the same edge every other writer names."""
    from codepropertygraph_spark.plans import diff as D

    nodes = spark.createDataFrame(
        [(1, "ENTITY", "a", "a", None, None, None, None, {})],
        proto_io._NODE_OUT_SCHEMA,
    )
    edges = spark.createDataFrame(
        [(1, 1, "REL", {"pred": "self"})], proto_io._EDGE_OUT_SCHEMA
    )
    # setting a key that does NOT exist on the edge inverts to a removal
    setp = spark.createDataFrame(
        [(1, 1, "REL", "score", "0.5")], "src long, dst long, label string, key string, value string"
    )
    inverse = proto_io.invert_diff(nodes, edges, {"set_edge_props": setp})
    [row] = inverse["remove_edge_props"].collect()
    [expected] = D.edge_identity(edges).select("edge_id").collect()
    assert row["edge_id"] == expected["edge_id"]
    assert row["key"] == "score"


def test_diff_zip_export_byte_deterministic(spark, tmp_path):
    """Replay contract (ADVICE r4): exporting the SAME change set twice —
    with different upstream partitioning — must produce byte-identical
    archives (canonical hash-bucket sharding + in-partition sort + pinned
    zip timestamps), not merely the same row set. stream_diff_zips'
    exactly-once claim rests on this."""
    nodes = spark.createDataFrame(
        [(i, "ENTITY", f"n{i}", f"n{i}", None, None, None, None, {"entity_type": "TOOL"})
         for i in range(200)],
        proto_io._NODE_OUT_SCHEMA,
    )
    edges = spark.createDataFrame(
        [(i, (i * 7) % 200, "REL", {"pred": "uses", "conv_id": f"c{i % 5}"})
         for i in range(200)],
        proto_io._EDGE_OUT_SCHEMA,
    )
    p1, p2 = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    proto_io.export_diff_zip(p1, n_shards=3, add_nodes=nodes, add_edges=edges)
    proto_io.export_diff_zip(
        p2, n_shards=3,
        add_nodes=nodes.repartition(7).sortWithinPartitions("label"),
        add_edges=edges.coalesce(1),
    )
    b1, b2 = open(p1, "rb").read(), open(p2, "rb").read()
    assert b1 == b2
