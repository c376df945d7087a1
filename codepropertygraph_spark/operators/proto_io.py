"""Proto wire-format graph interchange — the ``cpg.bin.zip`` analog.

The reference serializes the whole graph as a zip archive whose entries are
proto3-serialized ``CpgStruct`` messages (nodes + edges with enum-keyed
properties) and loads it back entry by entry
(``codepropertygraph/src/main/scala/io/shiftleft/codepropertygraph/
cpgloading/ProtoCpgLoader.scala:23-40`` — every entry is parsed as a
``CpgStruct``, all node lists are added before any edge list; the message
layout is ``codepropertygraph/codegen/src/main/resources/templates/
cpg.proto.tpl``: ``CpgStruct{repeated Node node=1; repeated Edge edge=2}``,
``Node{int64 key=1; NodeType type=2; repeated Property property=3}``,
``Edge{int64 src=1; int64 dst=2; EdgeType type=3; repeated Property
property=4}``, ``Property{Name name=1; PropertyValue value=2}``,
``PropertyValue{oneof: string_value=1 | int_value=3 | long_value=4 | ...}``).

This module implements that exact wire layout with a hand-written proto3
codec (stdlib only — the proto3 encoding is public: base-128 varints,
``tag = field_number << 3 | wire_type``, length-delimited submessages), so
the produced archive is structurally parseable by any proto3 consumer of
the reference's ``cpg.proto`` — the one seam the parquet bundle
(``exports.export_bundle``) cannot cover.

Differences from the reference, by design:

- **Enum tables travel with the file.** The reference compiles its node/
  edge/property-name enums into the bindings; here the label and
  property-name vocabularies come from ``schema.py`` and are embedded as a
  JSON manifest in the **zip archive comment** (NOT a zip entry — the
  reference loader proto-parses every entry, so metadata must stay out of
  the entry list). A consumer with the reference bindings still decodes all
  structure; enum *numbers* resolve via the comment manifest.
- **Scale contract.** Shard encoding is fully distributed (one
  ``CpgStruct`` per partition via ``mapInPandas``, deterministic hash
  bucketing + in-partition sort); only the final zip assembly streams
  through the driver (``toLocalIterator``, one shard in memory at a time) —
  a single-file archive is inherently a single-writer artifact, exactly as
  in the reference. For 100-TB interchange use ``exports.export_bundle``
  (parquet, parallel writers); use this writer when a reference-tooling-
  compatible artifact is the point.
"""

from __future__ import annotations

import json
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import schema as S

PROTO_BUNDLE_VERSION = 1

# ---------------------------------------------------------------------------
# Enum tables (cpg.proto NodeType / EdgeType / NodePropertyName analogs) —
# derived in schema.py from THE single declaration (schema_decl.json), so a
# new label / edge prop / decorator-derived key is added in exactly one
# place (r4 VERDICT #5 killed the two-places-to-edit hazard this module
# used to carry as _DERIVED_PROP_KEYS).
# ---------------------------------------------------------------------------

NODE_TYPE_ENUM: dict[str, int] = S.NODE_TYPE_ENUM
EDGE_TYPE_ENUM: dict[str, int] = S.EDGE_TYPE_ENUM
PROPERTY_NAME_ENUM: dict[str, int] = S.PROPERTY_NAME_ENUM

# Columns of the graph tables and how each encodes (PropertyValue oneof
# field: 1 = string_value, 3 = int_value).
_NODE_COLS = S.HOT_NODE_COLUMNS
_INT_COLS = frozenset({"order", "turn_idx"})

# PropertyValue oneof field numbers (cpg.proto.tpl PropertyValue)
_PV_STRING = 1
_PV_INT = 3
_PV_LONG = 4

# ---------------------------------------------------------------------------
# proto3 wire primitives (public encoding: varint / length-delimited)
# ---------------------------------------------------------------------------


def _uvarint(n: int) -> bytes:
    """Base-128 varint of an unsigned 64-bit value."""
    n &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _fv(field: int, n: int) -> bytes:
    """varint field (wire type 0); int64/enum semantics (two's complement)."""
    return _uvarint(field << 3) + _uvarint(n)


def _fb(field: int, payload: bytes) -> bytes:
    """length-delimited field (wire type 2)."""
    return _uvarint((field << 3) | 2) + _uvarint(len(payload)) + payload


def _property(name_enum: int, value: object, is_int: bool) -> bytes:
    if is_int:
        pv = _fv(_PV_INT, int(value))
    else:
        pv = _fb(_PV_STRING, str(value).encode("utf-8"))
    # Property{name=1 (enum, varint), value=2 (PropertyValue)}
    body = (_fv(1, name_enum) if name_enum else b"") + _fb(2, pv)
    return body


def _is_null(v: object) -> bool:
    if v is None:
        return True
    try:
        return bool(pd.isna(v))  # NaN / pd.NA / NaT
    except (TypeError, ValueError):  # arrays/dicts are never "null"
        return False


def _prop_enum(key: str) -> int:
    try:
        return PROPERTY_NAME_ENUM[key]
    except KeyError:
        raise ValueError(
            f"property key {key!r} is not in the declared vocabulary "
            f"(schema_decl.json node_types / edge_prop_keys / "
            f"derived_prop_keys) — the proto interchange format is a "
            f"closed-enum format like the reference's"
        ) from None


def encode_node(row: dict) -> bytes:
    """Wire bytes of one ``CpgStruct.Node`` (NOT wrapped in the CpgStruct
    field tag — the shard encoder adds that)."""
    body = _fv(1, int(row["id"])) + _fv(2, NODE_TYPE_ENUM[row["label"]])
    for col in _NODE_COLS:
        v = row.get(col)
        if _is_null(v):
            continue
        body += _fb(3, _property(_prop_enum(col), v, col in _INT_COLS))
    props = row.get("props") or {}
    for k in sorted(props):
        if props[k] is None:
            continue
        if k in _NODE_COLS:
            # the wire format has ONE property namespace (the reference's
            # NodePropertyName enum); a props-tail key shadowing a hot
            # column would silently migrate into the column on decode —
            # reject instead (found by the hypothesis roundtrip property)
            raise ValueError(
                f"props key {k!r} shadows a hot node column; set the column"
            )
        body += _fb(3, _property(_prop_enum(k), props[k], False))
    return body


def encode_edge(row: dict) -> bytes:
    body = (
        _fv(1, int(row["src"]))
        + _fv(2, int(row["dst"]))
        + _fv(3, EDGE_TYPE_ENUM[row["label"]])
    )
    props = row.get("props") or {}
    for k in sorted(props):
        if props[k] is None:
            continue
        body += _fb(4, _property(_prop_enum(k), props[k], False))
    return body


# ---------------------------------------------------------------------------
# Decoder: a full proto3 wire-format reader (skips unknown fields/types, so
# archives written by richer producers still load — proto3 parseFrom parity).
# ---------------------------------------------------------------------------


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long / corrupt stream")


def _to_int64(n: int) -> int:
    n &= 0xFFFFFFFFFFFFFFFF
    return n - (1 << 64) if n >= (1 << 63) else n


def _iter_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) skipping nothing — unknown
    fields are the CALLER's choice to ignore (value is the varint int or the
    length-delimited bytes; fixed32/64 come back as raw bytes)."""
    pos, end = 0, len(buf)
    while pos < end:
        tag, pos = _read_uvarint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _read_uvarint(buf, pos)
            yield field, wt, v
        elif wt == 2:
            ln, pos = _read_uvarint(buf, pos)
            yield field, wt, buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            yield field, wt, buf[pos : pos + 4]
            pos += 4
        elif wt == 1:
            yield field, wt, buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt} (field {field})")


def _decode_value(buf: bytes) -> object:
    """PropertyValue oneof → python value (string/int/long only — the subset
    this producer emits; unknown oneof members decode to None)."""
    for field, wt, v in _iter_fields(buf):
        if field == _PV_STRING and wt == 2:
            return v.decode("utf-8")
        if field in (_PV_INT, _PV_LONG) and wt == 0:
            return _to_int64(v)
    return None


def _decode_property(buf: bytes) -> tuple[int, object]:
    name = 0
    value: object = None
    for field, wt, v in _iter_fields(buf):
        if field == 1 and wt == 0:
            name = v
        elif field == 2 and wt == 2:
            value = _decode_value(v)
    return name, value


def decode_struct(buf: bytes, prop_names: dict[int, str],
                  node_types: dict[int, str], edge_types: dict[int, str]
                  ) -> tuple[list[dict], list[dict]]:
    """Parse one CpgStruct's bytes into (node row dicts, edge row dicts)."""
    nodes: list[dict] = []
    edges: list[dict] = []
    for field, wt, msg in _iter_fields(buf):
        if field == 1 and wt == 2:  # Node
            row: dict = {"id": None, "label": None, "props": {}}
            hot = dict.fromkeys(_NODE_COLS)
            for f2, w2, v2 in _iter_fields(msg):
                if f2 == 1 and w2 == 0:
                    row["id"] = _to_int64(v2)
                elif f2 == 2 and w2 == 0:
                    row["label"] = node_types.get(v2)
                elif f2 == 3 and w2 == 2:
                    n, val = _decode_property(v2)
                    key = prop_names.get(n)
                    if key in hot:
                        hot[key] = val
                    elif key is not None:
                        row["props"][key] = None if val is None else str(val)
            row.update(hot)
            nodes.append(row)
        elif field == 2 and wt == 2:  # Edge
            erow: dict = {"src": None, "dst": None, "label": None, "props": {}}
            for f2, w2, v2 in _iter_fields(msg):
                if f2 == 1 and w2 == 0:
                    erow["src"] = _to_int64(v2)
                elif f2 == 2 and w2 == 0:
                    erow["dst"] = _to_int64(v2)
                elif f2 == 3 and w2 == 0:
                    erow["label"] = edge_types.get(v2)
                elif f2 == 4 and w2 == 2:
                    n, val = _decode_property(v2)
                    key = prop_names.get(n)
                    if key is not None:
                        erow["props"][key] = None if val is None else str(val)
            edges.append(erow)
    return nodes, edges


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

_SHARD_SCHEMA = "shard binary"

# Pinned entry timestamp (the zip epoch): zipfile.writestr stamps wall-clock
# time into each entry header, which would break the byte-identical-replay
# contract of the exporters even with canonical shard contents.
_ZIP_EPOCH = (1980, 1, 1, 0, 0, 0)


def _zip_writestr(zf: zipfile.ZipFile, name: str, data: bytes) -> None:
    info = zipfile.ZipInfo(name, date_time=_ZIP_EPOCH)
    info.compress_type = zipfile.ZIP_DEFLATED
    info.external_attr = 0o600 << 16
    zf.writestr(info, data)


def _encode_partition(kind: str):
    enc = encode_node if kind == "nodes" else encode_edge
    field = 1 if kind == "nodes" else 2
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks: list[bytes] = []
        for pdf in batches:
            for row in pdf.to_dict("records"):
                chunks.append(_fb(field, enc(row)))
        if chunks:
            yield pd.DataFrame({"shard": [b"".join(chunks)]})
    return fn


def _canonical_shards(df: DataFrame, kind: str, n_shards: int) -> DataFrame:
    if kind == "nodes":
        keyed = df.repartition(n_shards, F.pmod(F.xxhash64("id"), F.lit(n_shards)))
        keyed = keyed.sortWithinPartitions("id")
    else:
        keyed = df.repartition(
            n_shards, F.pmod(F.xxhash64("src", "dst", "label"), F.lit(n_shards))
        ).sortWithinPartitions("src", "dst", "label")
    return keyed.mapInPandas(_encode_partition(kind), schema=_SHARD_SCHEMA)


def export_proto_zip(
    nodes: DataFrame, edges: DataFrame, path: str, n_shards: int = 8
) -> dict:
    """Write the graph as a ``cpg.bin.zip``-layout archive: every entry a
    serialized ``CpgStruct`` (node shards first, then edge shards — though
    the reference loader is order-insensitive for CpgStruct zips, adding all
    nodes before any edges itself, ProtoCpgLoader.scala:27-35). Returns the
    manifest also stored as the zip archive comment."""
    manifest = {
        "proto_bundle_version": PROTO_BUNDLE_VERSION,
        "node_types": NODE_TYPE_ENUM,
        "edge_types": EDGE_TYPE_ENUM,
        "property_names": PROPERTY_NAME_ENUM,
    }
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        i = 0
        for kind, df in (("nodes", nodes), ("edges", edges)):
            # toLocalIterator: one encoded shard in driver memory at a time
            for row in _canonical_shards(df, kind, n_shards).toLocalIterator():
                _zip_writestr(zf, f"{i}_{kind}.bin", bytes(row.shard))
                i += 1
        zf.comment = json.dumps(manifest, sort_keys=True).encode()
    return manifest


# ---------------------------------------------------------------------------
# DiffGraph serialization (DiffGraphProtoSerializer analog).
#
# Wire layout per cpg.proto.tpl: ``DiffGraph{repeated Entry entries=1}``,
# ``Entry{oneof: node=1 | edge=2 | node_property=3 | edge_property=4 |
# remove_node=5 | remove_node_property=6 | remove_edge=7 |
# remove_edge_property=8}``; ``AdditionalNodeProperty{node_id=1,
# property=2}``; ``AdditionalEdgeProperty{property=2, out_node_key=3,
# in_node_key=4, edge_type=5}``; ``RemoveNode{key=1}``;
# ``RemoveNodeProperty{key=1, name=2}``; ``RemoveEdge{out_node_key=1,
# in_node_key=2, edge_type=3, propertiesHash=4}`` (the reference identifies
# edges by a content hash because its edges carry no id —
# ``DiffGraph.scala:187-190`` — exactly the role of ``diff.edge_identity``'s
# sha2, which travels here as the propertiesHash bytes).
#
# The overlay/diff zip mirrors ProtoCpgLoader.loadOverlays/loadDiffGraphs
# (ProtoCpgLoader.scala:52-66): entries named ``{i}_diff.bin`` so the
# reference's ``compareOverlayPath`` int-prefix sort reproduces shard order.
# ---------------------------------------------------------------------------

# Entry oneof field numbers
_E_NODE, _E_EDGE, _E_NODE_PROP, _E_EDGE_PROP = 1, 2, 3, 4
_E_RM_NODE, _E_RM_NODE_PROP, _E_RM_EDGE, _E_RM_EDGE_PROP = 5, 6, 7, 8

# (frame kind) -> columns contract for export_diff_zip
DIFF_KINDS = {
    "add_nodes": None,        # node-table schema
    "add_edges": None,        # edge-table schema
    "set_node_props": ("id", "key", "value"),
    "set_edge_props": ("src", "dst", "label", "key", "value"),
    "remove_nodes": ("id",),
    "remove_node_props": ("id", "key"),
    "remove_edges": ("src", "dst", "label", "edge_id"),
    "remove_edge_props": ("src", "dst", "label", "edge_id", "key"),
}


# per-kind row-identity columns used to canonicalize shard assignment and
# in-shard order, so a replayed export writes byte-identical entries (the
# exactly-once contract stream_diff_zips documents); props-bearing kinds get
# the props JSON folded in so parallel edges land deterministically too
_DIFF_SORT_KEYS = {
    "add_nodes": ("id",),
    "add_edges": ("src", "dst", "label"),
    "set_node_props": ("id", "key"),
    "set_edge_props": ("src", "dst", "label", "key"),
    "remove_nodes": ("id",),
    "remove_node_props": ("id", "key"),
    "remove_edges": ("edge_id",),
    "remove_edge_props": ("edge_id", "key"),
}


def _canonical_change_shards(df: DataFrame, kind: str, n_shards: int,
                             wrap_entry: bool = True) -> DataFrame:
    parts = [F.col(c).cast("string") for c in _DIFF_SORT_KEYS[kind]]
    if "props" in df.columns:
        parts.append(F.coalesce(F.to_json("props"), F.lit("")))
    key = F.concat_ws("\x1f", *parts)
    keyed = (
        df.withColumn("__ck", key)
        .repartition(n_shards, F.pmod(F.xxhash64("__ck"), F.lit(n_shards)))
        .sortWithinPartitions("__ck")
        .drop("__ck")
    )
    return keyed.mapInPandas(
        _encode_diff_partition(kind, wrap_entry=wrap_entry), schema=_SHARD_SCHEMA
    )


def _encode_diff_entry(kind: str, row: dict) -> bytes:
    if kind == "add_nodes":
        return _fb(_E_NODE, encode_node(row))
    if kind == "add_edges":
        return _fb(_E_EDGE, encode_edge(row))
    if kind == "set_node_props":
        prop = _property(_prop_enum(row["key"]), row["value"], False)
        return _fb(_E_NODE_PROP, _fv(1, int(row["id"])) + _fb(2, prop))
    if kind == "set_edge_props":
        prop = _property(_prop_enum(row["key"]), row["value"], False)
        body = (
            _fb(2, prop)
            + _fv(3, int(row["src"]))
            + _fv(4, int(row["dst"]))
            + _fv(5, EDGE_TYPE_ENUM[row["label"]])
        )
        return _fb(_E_EDGE_PROP, body)
    if kind == "remove_nodes":
        return _fb(_E_RM_NODE, _fv(1, int(row["id"])))
    if kind == "remove_node_props":
        return _fb(
            _E_RM_NODE_PROP, _fv(1, int(row["id"])) + _fv(2, _prop_enum(row["key"]))
        )
    if kind == "remove_edges":
        body = (
            _fv(1, int(row["src"]))
            + _fv(2, int(row["dst"]))
            + _fv(3, EDGE_TYPE_ENUM[row["label"]])
            + _fb(4, bytes.fromhex(row["edge_id"]))
        )
        return _fb(_E_RM_EDGE, body)
    if kind == "remove_edge_props":
        body = (
            _fv(1, int(row["src"]))
            + _fv(2, int(row["dst"]))
            + _fv(3, EDGE_TYPE_ENUM[row["label"]])
            + _fb(4, bytes.fromhex(row["edge_id"]))
            + _fv(5, _prop_enum(row["key"]))
        )
        return _fb(_E_RM_EDGE_PROP, body)
    raise ValueError(f"unknown diff kind {kind!r}")


def _encode_diff_partition(kind: str, wrap_entry: bool = True):
    """Encode one partition's rows as a DiffGraph shard (each row a
    ``DiffGraph.Entry``, field 1) or — with ``wrap_entry=False`` — as a
    ``CpgOverlay`` shard, whose node/edge/node_property/edge_property fields
    (1..4, ``cpg.proto.tpl`` CpgOverlay) are DIRECT repeated fields carrying
    the same messages as the Entry oneof's first four members."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks: list[bytes] = []
        for pdf in batches:
            for row in pdf.to_dict("records"):
                entry = _encode_diff_entry(kind, row)
                chunks.append(_fb(1, entry) if wrap_entry else entry)
        if chunks:
            yield pd.DataFrame({"shard": [b"".join(chunks)]})
    return fn


#: the four CpgOverlay field kinds (additive-only — overlays stack, they
#: never remove; removal requires the DiffGraph form)
OVERLAY_KINDS = ("add_nodes", "add_edges", "set_node_props", "set_edge_props")


def export_overlay_zip(path: str, n_shards: int = 4, **frames: DataFrame) -> dict:
    """Serialize an ADDITIVE change set as a zip of ``CpgOverlay`` messages
    (``cpg.proto.tpl`` CpgOverlay; applied in int-prefix order by
    ``CpgOverlayLoader``/``ProtoCpgLoader.loadOverlays``,
    ProtoCpgLoader.scala:52-66). Overlays are the additive subset — pass
    removal kinds and this raises; use :func:`export_diff_zip`."""
    bad = set(frames) - set(OVERLAY_KINDS)
    if bad:
        raise ValueError(
            f"CpgOverlay is additive-only; {sorted(bad)} need export_diff_zip"
        )
    manifest = {
        "proto_bundle_version": PROTO_BUNDLE_VERSION,
        "overlay": True,
        "node_types": NODE_TYPE_ENUM,
        "edge_types": EDGE_TYPE_ENUM,
        "property_names": PROPERTY_NAME_ENUM,
        "kinds": sorted(frames),
    }
    order = [k for k in OVERLAY_KINDS if k in frames]
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        i = 0
        for kind in order:
            df = frames[kind]
            cols = DIFF_KINDS[kind]
            if cols is not None:
                df = df.select(*cols)
            shards = _canonical_change_shards(df, kind, n_shards, wrap_entry=False)
            for row in shards.toLocalIterator():
                _zip_writestr(zf, f"{i}_overlay.bin", bytes(row.shard))
                i += 1
        zf.comment = json.dumps(manifest, sort_keys=True).encode()
    return manifest


def load_overlay_zip(spark, path: str) -> tuple[dict[str, DataFrame], dict]:
    """Load a CpgOverlay zip back as {kind: DataFrame}; apply with
    :func:`apply_diff` (overlay application is the additive prefix of the
    diff applier)."""
    diff, manifest = _load_change_zip(spark, path, "overlay")
    return diff, manifest


def export_diff_zip(path: str, n_shards: int = 4, **frames: DataFrame) -> dict:
    """Serialize a change set as a zip of ``DiffGraph`` messages. Keyword
    args name the frame kinds (see ``DIFF_KINDS``); entry kinds keep the
    reference applier's safe order — adds and property sets before removes
    (removes address the global id space, ``cpg.proto.tpl`` DiffGraph
    comment). Encoding is distributed per shard; the zip assembly streams
    one shard at a time through the driver."""
    unknown = set(frames) - set(DIFF_KINDS)
    if unknown:
        raise ValueError(f"unknown diff kinds {sorted(unknown)}")
    manifest = {
        "proto_bundle_version": PROTO_BUNDLE_VERSION,
        "diff": True,
        "node_types": NODE_TYPE_ENUM,
        "edge_types": EDGE_TYPE_ENUM,
        "property_names": PROPERTY_NAME_ENUM,
        "kinds": sorted(frames),
    }
    order = [k for k in DIFF_KINDS if k in frames]
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        i = 0
        for kind in order:
            df = frames[kind]
            cols = DIFF_KINDS[kind]
            if cols is not None:
                df = df.select(*cols)
            shards = _canonical_change_shards(df, kind, n_shards)
            for row in shards.toLocalIterator():
                _zip_writestr(zf, f"{i}_diff.bin", bytes(row.shard))
                i += 1
        zf.comment = json.dumps(manifest, sort_keys=True).encode()
    return manifest


def _decode_diff_entry(buf: bytes, prop_names, node_types, edge_types
                       ) -> tuple[str, dict] | None:
    for field, wt, msg in _iter_fields(buf):
        if wt != 2:
            continue
        if field == _E_NODE:
            n, _ = decode_struct(b"\x0a" + _uvarint(len(msg)) + msg,
                                 prop_names, node_types, edge_types)
            return ("add_nodes", n[0])
        if field == _E_EDGE:
            _, e = decode_struct(b"\x12" + _uvarint(len(msg)) + msg,
                                 prop_names, node_types, edge_types)
            return ("add_edges", e[0])
        if field == _E_NODE_PROP:
            out: dict = {}
            for f2, w2, v2 in _iter_fields(msg):
                if f2 == 1 and w2 == 0:
                    out["id"] = _to_int64(v2)
                elif f2 == 2 and w2 == 2:
                    n, val = _decode_property(v2)
                    out["key"] = prop_names.get(n)
                    out["value"] = None if val is None else str(val)
            return ("set_node_props", out)
        if field == _E_EDGE_PROP:
            out = {}
            for f2, w2, v2 in _iter_fields(msg):
                if f2 == 2 and w2 == 2:
                    n, val = _decode_property(v2)
                    out["key"] = prop_names.get(n)
                    out["value"] = None if val is None else str(val)
                elif f2 == 3 and w2 == 0:
                    out["src"] = _to_int64(v2)
                elif f2 == 4 and w2 == 0:
                    out["dst"] = _to_int64(v2)
                elif f2 == 5 and w2 == 0:
                    out["label"] = edge_types.get(v2)
            return ("set_edge_props", out)
        if field == _E_RM_NODE:
            for f2, w2, v2 in _iter_fields(msg):
                if f2 == 1 and w2 == 0:
                    return ("remove_nodes", {"id": _to_int64(v2)})
            return ("remove_nodes", {"id": None})
        if field == _E_RM_NODE_PROP:
            out = {}
            for f2, w2, v2 in _iter_fields(msg):
                if f2 == 1 and w2 == 0:
                    out["id"] = _to_int64(v2)
                elif f2 == 2 and w2 == 0:
                    out["key"] = prop_names.get(v2)
            return ("remove_node_props", out)
        if field in (_E_RM_EDGE, _E_RM_EDGE_PROP):
            out = {}
            for f2, w2, v2 in _iter_fields(msg):
                if f2 == 1 and w2 == 0:
                    out["src"] = _to_int64(v2)
                elif f2 == 2 and w2 == 0:
                    out["dst"] = _to_int64(v2)
                elif f2 == 3 and w2 == 0:
                    out["label"] = edge_types.get(v2)
                elif f2 == 4 and w2 == 2:
                    out["edge_id"] = v2.hex()
                elif f2 == 5 and w2 == 0:
                    out["key"] = prop_names.get(v2)
            return (
                "remove_edges" if field == _E_RM_EDGE else "remove_edge_props",
                out,
            )
    return None


def load_diff_zip(spark, path: str) -> tuple[dict[str, DataFrame], dict]:
    """Load a DiffGraph zip back as {kind: DataFrame}. Entries decode in
    parallel (one task per zip entry), sorted by the int prefix exactly as
    ``ProtoCpgLoader.compareOverlayPath`` prescribes (order matters for
    overlay stacks)."""
    return _load_change_zip(spark, path, "diff")


def _load_change_zip(spark, path: str, flavor: str) -> tuple[dict[str, DataFrame], dict]:
    with zipfile.ZipFile(path) as zf:
        manifest = json.loads(zf.comment.decode()) if zf.comment else {}
        names = sorted(zf.namelist(), key=lambda n: int(n.split("_", 1)[0]))
        entries = [(n, zf.read(n)) for n in names]
    if not manifest.get(flavor):
        raise ValueError(f"not a {flavor} zip (manifest lacks {flavor}=true)")
    prop_names = {v: k for k, v in manifest["property_names"].items()}
    node_types = {v: k for k, v in manifest["node_types"].items()}
    edge_types = {v: k for k, v in manifest["edge_types"].items()}

    schemas = {
        "add_nodes": _NODE_OUT_SCHEMA,
        "add_edges": _EDGE_OUT_SCHEMA,
        "set_node_props": "id long, key string, value string",
        "set_edge_props": "src long, dst long, label string, key string, value string",
        "remove_nodes": "id long",
        "remove_node_props": "id long, key string",
        "remove_edges": "src long, dst long, label string, edge_id string",
        "remove_edge_props": "src long, dst long, label string, edge_id string, key string",
    }
    raw = spark.createDataFrame(entries, "name string, data binary").repartition(
        max(len(entries), 1)
    )

    def decode(kind: str):
        cols = [f.split()[0] for f in schemas[kind].split(", ")]
        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows: list[dict] = []
                for buf in pdf["data"]:
                    for field, wt, msg in _iter_fields(bytes(buf)):
                        if wt != 2:
                            continue
                        if flavor == "diff":
                            if field != 1:
                                continue
                            body = msg  # DiffGraph.Entry body
                        else:
                            if not 1 <= field <= 4:
                                continue
                            # CpgOverlay direct field -> synthetic Entry body
                            body = _fb(field, msg)
                        decoded = _decode_diff_entry(
                            body, prop_names, node_types, edge_types
                        )
                        if decoded and decoded[0] == kind:
                            rows.append(decoded[1])
                if rows:
                    yield pd.DataFrame(rows, columns=cols)
        return fn

    out = {
        kind: raw.mapInPandas(decode(kind), schema=schemas[kind])
        for kind in manifest.get("kinds", [])
    }
    return out, manifest


def apply_diff(
    nodes: DataFrame, edges: DataFrame, diff: dict[str, DataFrame]
) -> tuple[DataFrame, DataFrame]:
    """Apply a loaded DiffGraph to a graph via the plans.diff primitives —
    the applier half of DiffGraphProtoSerializer parity (reference:
    ``passes/DiffGraph.scala`` Applier). Order: creates, property sets,
    property removes, node removes (with edge cascade), edge removes."""
    from ..plans import diff as D

    if "add_nodes" in diff:
        nodes = nodes.unionByName(diff["add_nodes"].select(*nodes.columns))
    if "add_edges" in diff:
        edges = edges.unionByName(diff["add_edges"].select(*edges.columns))
    if "set_node_props" in diff:
        nodes = D.set_node_props(nodes, diff["set_node_props"])
    if "set_edge_props" in diff:
        edges = D.set_edge_props(edges, diff["set_edge_props"])
    if "remove_node_props" in diff:
        nodes = D.remove_node_property(nodes, diff["remove_node_props"])
    if "remove_edge_props" in diff:
        edges = D.remove_edge_property(edges, diff["remove_edge_props"])
    if "remove_nodes" in diff:
        nodes, edges = D.remove_nodes(nodes, edges, diff["remove_nodes"])
    if "remove_edges" in diff:
        edges = D.remove_edges(edges, diff["remove_edges"])
    return nodes, edges


def invert_diff(
    nodes: DataFrame, edges: DataFrame, diff: dict[str, DataFrame]
) -> dict[str, DataFrame]:
    """Build the INVERSE change set of ``diff`` against base graph state —
    the DiffGraph InverseBuilder analog (the reference records the undo
    entry for every applied entry, ``passes/DiffGraph.scala`` InverseBuilder;
    here the inverse is computed set-wise from the base tables BEFORE
    application, so ``apply_diff(apply_diff(g, diff), invert_diff(g, diff))
    == g`` — tested in test_proto_io).

    Inversion rules (all plain joins, fully distributed):
    - add_nodes / add_edges        → remove_nodes / remove_edges (by sha2 id)
    - set_node_props (id,key,v)    → set back to the OLD value where the key
                                     existed, remove_node_props where it
                                     did not
    - remove_node_props            → set back to the old value (rows whose
                                     key was absent invert to nothing)
    - remove_nodes                 → add back the node rows AND every
                                     incident edge (the cascade's inverse)
    - remove_edges (by edge_id)    → add back the matching edge rows

    Limitation (documented): set_edge_props/remove_edge_props invert via the
    same (src, dst, label) addressing the forward primitives use."""
    from ..plans import diff as D

    inv: dict[str, DataFrame] = {}
    old_prop = F.element_at(
        F.coalesce(F.col("props"), F.create_map().cast("map<string,string>")),
        F.col("key"),
    )

    if "add_nodes" in diff:
        inv["remove_nodes"] = diff["add_nodes"].select("id")
    if "add_edges" in diff:
        inv["remove_edges"] = D.edge_identity(diff["add_edges"]).select(
            "src", "dst", "label", "edge_id"
        )
    if "set_node_props" in diff:
        upd = diff["set_node_props"].alias("u").join(
            nodes.select("id", "props").alias("n"), "id", "left"
        ).select("id", "key", old_prop.alias("old"))
        inv["set_node_props"] = upd.where(F.col("old").isNotNull()).select(
            "id", "key", F.col("old").alias("value")
        )
        inv["remove_node_props"] = upd.where(F.col("old").isNull()).select("id", "key")
    if "remove_node_props" in diff:
        restore = diff["remove_node_props"].join(
            nodes.select("id", "props"), "id", "left"
        ).select("id", "key", old_prop.alias("old"))
        prior = inv.get("set_node_props")
        restored = restore.where(F.col("old").isNotNull()).select(
            "id", "key", F.col("old").alias("value")
        )
        inv["set_node_props"] = (
            prior.unionByName(restored) if prior is not None else restored
        )
    if "remove_nodes" in diff:
        ids = diff["remove_nodes"].select("id")
        inv["add_nodes"] = nodes.join(ids, "id", "left_semi")
        # No (src,dst,label)-level dedup here: REL edges between the same
        # entity pair legitimately differ only in props (graph.rel_edges),
        # and a coarse dedup would restore only one of them.  The src-side /
        # dst-side union overlap (an edge whose two endpoints are both
        # removed) is handled by the full-content edge_identity dedup below.
        incident = edges.join(
            ids.withColumnRenamed("id", "src"), "src", "left_semi"
        ).unionByName(
            edges.join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        inv["add_edges"] = incident
    if "remove_edges" in diff:
        back = D.edge_identity(edges).join(
            diff["remove_edges"].select("edge_id"), "edge_id", "left_semi"
        ).drop("edge_id")
        prior_e = inv.get("add_edges")
        inv["add_edges"] = (
            prior_e.unionByName(back) if prior_e is not None else back
        )
    if "set_edge_props" in diff:
        eupd = diff["set_edge_props"].join(
            edges.select("src", "dst", "label", "props"),
            ["src", "dst", "label"],
            "left",
        ).select("src", "dst", "label", "props", "key", old_prop.alias("old"))
        inv["set_edge_props"] = eupd.where(F.col("old").isNotNull()).select(
            "src", "dst", "label", "key", F.col("old").alias("value")
        )
        # edge_id via the module-wide content identity (src|dst|label|props),
        # not an ad-hoc sha2 — keeps the serialized propertiesHash in the
        # inverse zip consistent with every other edge_id this module writes.
        inv["remove_edge_props"] = D.edge_identity(
            eupd.where(F.col("old").isNull())
        ).select("src", "dst", "label", "edge_id", "key")
    if "remove_edge_props" in diff:
        erestore = diff["remove_edge_props"].select("src", "dst", "label", "key").join(
            edges.select("src", "dst", "label", "props"),
            ["src", "dst", "label"],
            "left",
        ).select("src", "dst", "label", "key", old_prop.alias("old"))
        prior_s = inv.get("set_edge_props")
        erestored = erestore.where(F.col("old").isNotNull()).select(
            "src", "dst", "label", "key", F.col("old").alias("value")
        )
        inv["set_edge_props"] = (
            prior_s.unionByName(erestored) if prior_s is not None else erestored
        )
    if "add_edges" in inv:
        # the node-removal cascade and explicit edge removals can name the
        # same edge — dedup by full content identity before re-adding
        inv["add_edges"] = (
            D.edge_identity(inv["add_edges"]).dropDuplicates(["edge_id"]).drop("edge_id")
        )
    return inv


_NODE_OUT_SCHEMA = (
    "id long, label string, name string, full_name string, code string, "
    "order int, conv_id string, turn_idx int, props map<string,string>"
)
_EDGE_OUT_SCHEMA = "src long, dst long, label string, props map<string,string>"


def load_proto_zip(spark, path: str) -> tuple[DataFrame, DataFrame, dict]:
    """Load a proto zip back into (nodes, edges, manifest) DataFrames.

    Entry bytes are read once on the driver (zip central directories are not
    splittable — the reference loader is likewise single-node) but decoded
    in PARALLEL: one Spark task per zip entry via ``mapInPandas``."""
    with zipfile.ZipFile(path) as zf:
        manifest = json.loads(zf.comment.decode()) if zf.comment else {}
        entries = [(n, zf.read(n)) for n in zf.namelist()]
    if manifest.get("proto_bundle_version") not in (PROTO_BUNDLE_VERSION,):
        raise ValueError(
            f"unsupported proto bundle version: {manifest.get('proto_bundle_version')!r}"
        )
    prop_names = {v: k for k, v in manifest["property_names"].items()}
    node_types = {v: k for k, v in manifest["node_types"].items()}
    edge_types = {v: k for k, v in manifest["edge_types"].items()}

    raw = spark.createDataFrame(entries, "name string, data binary").repartition(
        max(len(entries), 1)
    )

    def decode(kind: str):
        idx = 0 if kind == "nodes" else 1
        out_cols = (
            ["id", "label", *_NODE_COLS, "props"]
            if kind == "nodes"
            else ["src", "dst", "label", "props"]
        )
        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows: list[dict] = []
                for buf in pdf["data"]:
                    rows.extend(
                        decode_struct(bytes(buf), prop_names, node_types, edge_types)[idx]
                    )
                if rows:
                    yield pd.DataFrame(rows, columns=out_cols)
        return fn

    nodes = raw.mapInPandas(decode("nodes"), schema=_NODE_OUT_SCHEMA)
    edges = raw.mapInPandas(decode("edges"), schema=_EDGE_OUT_SCHEMA)
    return nodes, edges, manifest
