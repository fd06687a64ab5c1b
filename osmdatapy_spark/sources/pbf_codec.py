"""Pure-Python OSM PBF wire codec (decode *and* encode).

Decode side replaces the reference's Cython kernels
(``osmdatapy/protobuf.pyx:10-156``) and block parsers
(``osmdatapy/headers.py:9-121``, ``primitives.py:9-147``,
``dense.py:8-51``): varint/zigzag primitives, the file framing scan, and
per-block element decoding.  It runs *inside data-source partitions* —
one blob per partition — so single-core Python speed is multiplied by the
cluster; there is no driver-side whole-file pass (the reference's pass 1,
``osmdata.py:95-125``, becomes the cheap framing scan in
``scan_blob_spans``, which reads only the 4-byte lengths + BlobHeaders).

Encode side exists for tests/fixtures: build small deterministic ``.pbf``
files without any protobuf library.

Wire format (public OSM PBF spec, fileformat.proto / osmformat.proto):

    file   := { uint32_be(len(BlobHeader)) BlobHeader Blob }
    BlobHeader := 1:type(string) 3:datasize(int32)
    Blob       := 1:raw(bytes) | (2:raw_size(int32) 3:zlib_data(bytes))
    HeaderBlock    := 4:required_features* 5:optional_features*
    PrimitiveBlock := 1:stringtable 2:primitivegroup* 17:granularity
                      18:date_granularity 19:lat_offset 20:lon_offset
    StringTable    := 1:bytes*
    PrimitiveGroup := 1:node* 2:dense 3:way* 4:relation*
    Node     := 1:id(sint64) 2:keys(packed u32) 3:vals 4:info
                8:lat(sint64) 9:lon(sint64)
    DenseNodes := 1:id(packed sint64 Δ) 5:denseinfo 8:lat(packed sint64 Δ)
                  9:lon(packed sint64 Δ) 10:keys_vals(packed u32,
                  0-terminated per node)
    Way      := 1:id 2:keys 3:vals 4:info 8:refs(packed sint64 Δ)
    Relation := 1:id 2:keys 3:vals 4:info 8:roles_sid(packed u32)
                9:memids(packed sint64 Δ) 10:types(packed enum)
    Info     := 1:version(int32) 2:timestamp(int64) 3:changeset(int64)
    DenseInfo:= 1:version(packed i32) 2:timestamp(packed sint64 Δ)
                3:changeset(packed sint64 Δ)
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass
from itertools import accumulate
from typing import Iterator, Optional

# ---------------------------------------------------------------------------
# varint primitives (reference protobuf.pyx:177-287)
# ---------------------------------------------------------------------------


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Unsigned LEB128 varint at ``pos`` → (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def zigzag(n: int) -> int:
    """Decode zigzag-encoded signed int."""
    return (n >> 1) ^ -(n & 1)


def read_packed_varints(buf: bytes, start: int, end: int) -> list[int]:
    """Packed unsigned varints with the 1-byte fast path inlined — this is
    the decode hot loop (ids/lats/lons/keyvals), worth keeping call-free."""
    out: list[int] = []
    append = out.append
    pos = start
    while pos < end:
        b = buf[pos]
        pos += 1
        if b < 0x80:
            append(b)
            continue
        result = b & 0x7F
        shift = 7
        b = buf[pos]
        pos += 1
        while b & 0x80:
            result |= (b & 0x7F) << shift
            shift += 7
            b = buf[pos]
            pos += 1
        append(result | (b << shift))
    return out


_NP_MIN_BYTES = 512  # below this the numpy constant overhead loses to the loop


def np_read_packed_varints(buf, start: int, end: int):
    """Vectorized packed-varint decode: continuation-bit group boundaries
    via flatnonzero, per-byte shifts via repeat of group starts, group sums
    via add.reduceat — ~5× the inlined Python loop on blob-sized buffers
    (the decode hot path; the reference needed Cython for the same reason,
    protobuf.pyx:175-287).  Falls back to the loop for tiny buffers and for
    >9-byte varints (would overflow the int64 shift; never produced by
    OSM-scale values).  Returns a numpy int64 array."""
    import numpy as np

    n_bytes = end - start
    if n_bytes < _NP_MIN_BYTES:
        return _varints_to_int64(read_packed_varints(buf, start, end))
    arr8 = np.frombuffer(buf, dtype=np.uint8, count=n_bytes, offset=start)
    ends = arr8 < 0x80
    end_pos = np.flatnonzero(ends)
    starts_pos = np.empty_like(end_pos)
    starts_pos[0] = 0
    starts_pos[1:] = end_pos[:-1] + 1
    lengths = end_pos - starts_pos + 1
    if lengths.max() > 9:
        return _varints_to_int64(read_packed_varints(buf, start, end))
    arr = arr8.astype(np.int64)
    payload = arr & 0x7F
    shifts = (np.arange(n_bytes, dtype=np.int64) - np.repeat(starts_pos, lengths)) * 7
    return np.add.reduceat(payload << shifts, starts_pos)


def _varints_to_int64(vals):
    """Python varint ints → int64 array with protobuf wrap-around semantics:
    a 10-byte varint carries a value >= 2^63 (any negative int64 on the
    wire), which np.asarray(..., int64) rejects with OverflowError — mask to
    64 bits and reinterpret the uint64 pattern as signed instead."""
    import numpy as np

    if vals and (max(vals) >> 63):
        return np.array(
            [v & 0xFFFFFFFFFFFFFFFF for v in vals], dtype=np.uint64
        ).view(np.int64)
    return np.asarray(vals, dtype=np.int64)


def np_read_packed_signed(buf, start: int, end: int):
    """Vectorized packed zigzag-signed decode (delta streams: ids, lats,
    lons, timestamps).  Returns a numpy int64 array.

    Zigzag is defined on the *unsigned* wire value, so the shift must be
    logical — compute in uint64 and reinterpret, or a 10-byte varint
    (wire value >= 2^63) decodes to the wrong sign."""
    import numpy as np

    v = np_read_packed_varints(buf, start, end)
    u = v.view(np.uint64)
    one = np.uint64(1)
    return ((u >> one) ^ (np.uint64(0) - (u & one))).view(np.int64)


def read_packed_signed(buf: bytes, start: int, end: int) -> list[int]:
    """Packed zigzag-signed varints, decode + zigzag in one pass."""
    out: list[int] = []
    append = out.append
    pos = start
    while pos < end:
        b = buf[pos]
        pos += 1
        if b < 0x80:
            append((b >> 1) ^ -(b & 1))
            continue
        result = b & 0x7F
        shift = 7
        b = buf[pos]
        pos += 1
        while b & 0x80:
            result |= (b & 0x7F) << shift
            shift += 7
            b = buf[pos]
            pos += 1
        result |= b << shift
        append((result >> 1) ^ -(result & 1))
    return out


def iter_fields(buf: bytes, start: int, end: int) -> Iterator[tuple[int, int, int | bytes]]:
    """Walk protobuf fields in buf[start:end] → (field_no, wire_type, value).

    wire 0 → varint value (int); wire 2 → the raw bytes slice; wire 1/5 →
    8/4-byte slices (unused by OSM PBF but handled for robustness).
    """
    pos = start
    while pos < end:
        key, pos = read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = read_varint(buf, pos)
            yield field, 0, v
        elif wire == 2:
            ln, pos = read_varint(buf, pos)
            yield field, 2, buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            yield field, 5, buf[pos : pos + 4]
            pos += 4
        elif wire == 1:
            yield field, 1, buf[pos : pos + 8]
            pos += 8
        else:  # pragma: no cover - malformed input
            raise ValueError(f"unsupported wire type {wire} at {pos}")


# ---------------------------------------------------------------------------
# framing scan (reference S1/S2, osmdata.py:95-125 + headers.py:9-30)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BlobSpan:
    """One blob's location in the file: the data-source partition unit."""

    blob_type: str  # 'OSMHeader' | 'OSMData'
    offset: int  # file offset of the Blob payload
    size: int  # payload byte length


def scan_blob_spans(path: str) -> list[BlobSpan]:
    """Enumerate blob frames by reading only lengths + BlobHeaders.

    This is the driver-side planning pass: O(#blobs) tiny reads, not a
    full-file decode (contrast reference pass 1 which decodes every block
    to build caches, ``headers.py:124-201``)."""
    import os

    spans: list[BlobSpan] = []
    fsize = os.path.getsize(path)
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (hlen,) = struct.unpack(">I", head)
            # spec caps BlobHeader at 64 KiB — a larger value means this
            # is not a PBF frame boundary (garbage input), not a big header
            if hlen == 0 or hlen > 64 * 1024:
                raise ValueError(
                    f"invalid BlobHeader length {hlen} at offset {f.tell() - 4} "
                    f"(not an OSM PBF file?)"
                )
            header = f.read(hlen)
            if len(header) < hlen:
                raise ValueError(f"truncated BlobHeader at offset {f.tell() - len(header)}")
            btype = "OSMData"
            datasize = 0
            for field, _, val in iter_fields(header, 0, len(header)):
                if field == 1:
                    btype = bytes(val).decode("utf-8")
                elif field == 3:
                    datasize = val
            offset = f.tell()
            if offset + datasize > fsize:
                raise ValueError(
                    f"truncated blob: {btype} at {offset} claims {datasize} bytes "
                    f"but the file ends at {fsize}"
                )
            spans.append(BlobSpan(btype, offset, datasize))
            f.seek(datasize, 1)
    return spans


def decompress_blob_field(field: int, data: bytes) -> bytes:
    """Decode one Blob `data` oneof member by proto field number
    (fileformat.proto: 1 raw, 3 zlib, 4 lzma, 5 bzip2[obsolete], 6 lz4,
    7 zstd).  The reference enforces zlib-only (headers.py:84-85); we
    support every codec the spec names — stdlib where possible, lz4/zstd
    behind import-tries since mainstream producers emit zlib."""
    if field == 1:
        return data
    if field == 3:
        return zlib.decompress(data)
    if field == 4:
        import lzma

        return lzma.decompress(data)
    if field == 5:
        import bz2

        return bz2.decompress(data)
    if field == 6:
        try:
            import lz4.frame  # type: ignore[import-not-found]
        except ImportError as e:  # pragma: no cover - lib absent in container
            raise ValueError("lz4-compressed PBF blob but the lz4 package is not installed") from e
        return lz4.frame.decompress(data)
    if field == 7:
        try:
            import zstandard  # type: ignore[import-not-found]
        except ImportError as e:  # pragma: no cover - lib absent in container
            raise ValueError("zstd-compressed PBF blob but the zstandard package is not installed") from e
        return zstandard.ZstdDecompressor().decompress(data)
    raise ValueError(f"unknown PBF Blob data field {field}")


def read_blob(path: str, span: BlobSpan) -> bytes:
    """Read + decompress one blob payload (reference S3, headers.py:33-78).
    zlib is the codec in the wild; every spec codec dispatches through
    decompress_blob_field."""
    with open(path, "rb") as f:
        f.seek(span.offset)
        payload = f.read(span.size)
    raw: Optional[bytes] = None
    for field, _, val in iter_fields(payload, 0, len(payload)):
        if field in (1, 3, 4, 5, 6, 7):
            raw = decompress_blob_field(field, bytes(val))
    if raw is None:
        raise ValueError("empty Blob")
    return raw


_ST_NOT_AT_HEAD = object()  # sentinel: PrimitiveBlock doesn't lead with field 1


def _dict_allows(strings: set, needed: "frozenset[str]", any_of) -> bool:
    """Conjunctive (ALL of ``needed``) + disjunctive (ANY of ``any_of``)
    membership against a block string table."""
    if needed and not needed <= strings:
        return False
    if any_of and not any_of & strings:
        return False
    return True


def _stringtable_head_slice(buf: bytes):
    """If ``buf`` (a decompressed PrimitiveBlock prefix) starts with the
    complete stringtable field (field 1, length-delimited), return its
    payload bytes; ``None`` if more bytes are needed; the
    ``_ST_NOT_AT_HEAD`` sentinel if the block leads with some other
    field (legal per proto — caller falls back to a full parse)."""
    if not buf:
        return None
    try:
        tag, pos = read_varint(buf, 0)
        if (tag >> 3) != 1 or (tag & 7) != 2:
            return _ST_NOT_AT_HEAD
        ln, pos = read_varint(buf, pos)
    except IndexError:
        return None
    if len(buf) >= pos + ln:
        return buf[pos : pos + ln]
    return None


def blob_dictionary_has(
    path: str,
    span: "BlobSpan",
    needed: "frozenset[str]",
    any_of: "frozenset[str] | None" = None,
) -> bool:
    """True iff the blob's PrimitiveBlock string table contains EVERY
    string in ``needed`` AND at least one string in ``any_of`` (when
    given) — the dictionary-skip probe (reference
    ``osmquery.py:242-257`` skips a block when a required predicate
    string is absent from its table; here the same decision is made at
    blob granularity during scan planning).

    Cheap by construction: the stringtable is the head field of every
    tool-produced PrimitiveBlock and the compressed payload is read from
    disk PROGRESSIVELY — for zlib blobs the probe reads the first chunks
    and stream-decompresses until the table is complete, so a planning
    pass over a planet file touches kilobytes per blob (disk AND CPU),
    not the blob body.  Any structural surprise (data field not last,
    stringtable not at the block head, non-zlib codec) falls back to a
    full read+decode — correctness never depends on the fast path.
    Blocks whose table lacks a needed string cannot contain a matching
    element (tag keys/values are dictionary indices), so skipping them
    is exact, never approximate."""
    chunk = 16384
    with open(path, "rb") as f:
        f.seek(span.offset)
        first = f.read(min(chunk, span.size))
        # locate the Blob's data oneof inside the first chunk: fields
        # before it (raw_size) are tiny varints, so the data header is
        # within the first bytes of every real file
        dfield = None
        dstart = dlen = 0
        pos = 0
        try:
            while pos < len(first):
                tag, pos = read_varint(first, pos)
                field, wire = tag >> 3, tag & 7
                if wire == 0:
                    _, pos = read_varint(first, pos)
                elif wire == 2:
                    ln, pos = read_varint(first, pos)
                    if field in (1, 3, 4, 5, 6, 7):
                        dfield, dstart, dlen = field, pos, ln
                        break
                    pos += ln
                else:
                    break  # unexpected wire type — full fallback
        except IndexError:
            dfield = None
        if dfield == 3:
            d = zlib.decompressobj()
            head = b""
            avail = first[dstart : dstart + dlen]
            # compressed bytes of the data field still on disk
            remaining = dlen - len(avail)
            while True:
                if avail:
                    head += d.decompress(avail)
                    avail = b""
                probe = _stringtable_head_slice(head)
                if probe is _ST_NOT_AT_HEAD:
                    break
                if probe is not None:
                    return _dict_allows(
                        set(_decode_stringtable(probe)), needed, any_of
                    )
                if remaining <= 0:
                    break
                nxt = f.read(min(chunk, remaining))
                if not nxt:
                    break
                remaining -= len(nxt)
                avail = nxt
        elif dfield == 1 and dstart + dlen <= len(first):
            # raw blob fully inside the first chunk: probe directly
            probe = _stringtable_head_slice(first[dstart : dstart + dlen])
            if probe is not None and probe is not _ST_NOT_AT_HEAD:
                return _dict_allows(set(_decode_stringtable(probe)), needed, any_of)
        # fallback: full payload read + full decode (rare: unusual field
        # order, exotic codec, or a stringtable that is not at the head)
        f.seek(span.offset)
        payload = f.read(span.size)
    dfield2 = None
    data = b""
    for field, _, val in iter_fields(payload, 0, len(payload)):
        if field in (1, 3, 4, 5, 6, 7):
            dfield2, data = field, bytes(val)
    if dfield2 is None:
        raise ValueError("empty Blob")
    block = decompress_blob_field(dfield2, data)
    for field, _, val in iter_fields(block, 0, len(block)):
        if field == 1:
            return _dict_allows(set(_decode_stringtable(val)), needed, any_of)
    # no stringtable at all: only untagged elements live here
    return False


def parse_header_block(block: bytes) -> tuple[list[str], list[str]]:
    """HeaderBlock → (required_features, optional_features)
    (reference S4, headers.py:81-121)."""
    req, opt = [], []
    for field, _, val in iter_fields(block, 0, len(block)):
        if field == 4:
            req.append(bytes(val).decode("utf-8"))
        elif field == 5:
            opt.append(bytes(val).decode("utf-8"))
    return req, opt


# ---------------------------------------------------------------------------
# PrimitiveBlock decode (reference S5-S12)
# ---------------------------------------------------------------------------

NODE, WAY, RELATION = 0, 1, 2

# shared read-only tags dict for untagged elements (see _decode_dense)
_EMPTY_TAGS: dict = {}


@dataclass(slots=True)
class Element:
    """Unified decoded element row (SURVEY.md §1.5 data model).

    ``slots=True``: hundreds of thousands of these materialize per decode
    task (one per element between wire and Arrow batch) — slots cut the
    per-object dict allocation and speed attribute writes/reads in the
    hot loops (~10% off dense-node decode, measured)."""

    osmid: int
    osmtype: int
    tags: dict[str, str]
    lon: Optional[float] = None
    lat: Optional[float] = None
    refs: Optional[list[int]] = None
    members: Optional[list[tuple[int, int, str]]] = None  # (ref, type, role)
    version: Optional[int] = None
    timestamp: Optional[int] = None
    changeset: Optional[int] = None


def _decode_stringtable(data: bytes) -> list[str]:
    return [
        bytes(val).decode("utf-8", "replace")
        for field, _, val in iter_fields(data, 0, len(data))
        if field == 1
    ]


def _decode_info(data: bytes) -> tuple[Optional[int], Optional[int], Optional[int]]:
    # Info fields are proto int32/int64 (NOT sint): negatives arrive as
    # 10-byte two's-complement varints and must sign-interpret, matching
    # write_varint_i64 on the encode side (pre-1970 timestamps are legal)
    version = timestamp = changeset = None
    for field, _, val in iter_fields(data, 0, len(data)):
        if field == 1:
            version = decode_i64(val)
        elif field == 2:
            timestamp = decode_i64(val)
        elif field == 3:
            changeset = decode_i64(val)
    return version, timestamp, changeset


def decode_primitive_block(
    block: bytes,
    with_metadata: bool = False,
    wanted_types: "set[int] | None" = None,
) -> list[Element]:
    """Decode every element of one PrimitiveBlock.

    Predicate evaluation does NOT happen here (contrast reference
    primitives.py:26-27 early aborts): rows flow into Spark and Catalyst
    filters them — pushed filters instead prune whole *partitions* in
    ``PbfDataSourceReader.partitions``/``read``.

    The ONE exception is ``wanted_types`` (the ``osmtypes`` read option,
    P2 block pruning, reference osmdata.py:140-168 block-kind skip): a
    primitive GROUP of an unselected kind is skipped before any varint is
    touched.  On planet-shaped files dense-node groups are ~90% of the
    decode work, so a ways/relations query drops most of the CPU here —
    far cheaper than decode-then-filter.  The skip is by wire field id
    (1/2=nodes, 3=ways, 4=relations), so it cannot change the VALUES of
    decoded rows — only avoid decoding rows Catalyst would discard."""
    strings: list[str] = []
    groups: list[bytes] = []
    granularity = 100
    lat_off = lon_off = 0
    date_gran = 1000
    for field, _, val in iter_fields(block, 0, len(block)):
        if field == 1:
            strings = _decode_stringtable(val)
        elif field == 2:
            groups.append(bytes(val))
        elif field == 17:
            granularity = val
        elif field == 18:
            date_gran = val
        elif field == 19:
            lat_off = val
        elif field == 20:
            lon_off = val

    scale = 1e-9
    w = wanted_types
    nodes_on = w is None or 0 in w
    ways_on = w is None or 1 in w
    rels_on = w is None or 2 in w
    out: list[Element] = []
    for group in groups:
        for field, _, val in iter_fields(group, 0, len(group)):
            if field == 1:
                if nodes_on:
                    out.append(_decode_node(val, strings, granularity, lat_off, lon_off, scale, with_metadata, date_gran))
            elif field == 2:
                if nodes_on:
                    out.extend(_decode_dense(val, strings, granularity, lat_off, lon_off, scale, with_metadata, date_gran))
            elif field == 3:
                if ways_on:
                    out.append(_decode_way(val, strings, with_metadata, date_gran))
            elif field == 4:
                if rels_on:
                    out.append(_decode_relation(val, strings, with_metadata, date_gran))
    return out


def _tags_from_keyvals(keys: list[int], vals: list[int], strings: list[str]) -> dict[str, str]:
    return {strings[k]: strings[v] for k, v in zip(keys, vals)}


class DenseColumns:
    """Columnar dense-node segment (the Arrow scan fast path).

    Planet files are ~90% dense nodes; materializing an ``Element`` per
    node (then re-reading it attribute-by-attribute for each Arrow
    column) was ~70% of block-decode CPU (profiled round 4).  This keeps
    the delta/cumsum decode's numpy arrays AS the columns and flattens
    tags into (offsets, keys, vals) ready for ``pa.MapArray.from_arrays``
    — the only remaining Python loop is over tag PAIRS (sparse: most
    nodes are untagged), not nodes."""

    __slots__ = (
        "n", "ids", "lons", "lats",
        "tag_offsets", "tag_keys", "tag_vals",
        "versions", "timestamps", "changesets",
    )

    def __init__(self, n, ids, lons, lats, tag_offsets, tag_keys, tag_vals,
                 versions=None, timestamps=None, changesets=None):
        self.n = n
        self.ids = ids
        self.lons = lons
        self.lats = lats
        self.tag_offsets = tag_offsets
        self.tag_keys = tag_keys
        self.tag_vals = tag_vals
        self.versions = versions
        self.timestamps = timestamps
        self.changesets = changesets


def _decode_dense_columns(
    data: bytes, strings, gran, lat_off, lon_off, scale, with_metadata, date_gran,
    with_tags: bool = True,
) -> Optional[DenseColumns]:
    """DenseNodes → columnar segment; same wire walk as ``_decode_dense``
    but no per-node Python objects.  Tag flattening: the keys_vals stream
    is ``[k,v,...,0]`` per node (string index 0 is the reserved empty
    string, so 0 appears only as the terminator); dropping the zero
    terminators leaves the global ``k,v,k,v,...`` pair stream intact, and
    per-node pair counts come from the gaps between zero positions —
    fully vectorized."""
    import numpy as np

    ids = lats = lons = None
    kv = None
    versions: list[int] = []
    timestamps: list[int] = []
    changesets: list[int] = []
    for field, _, val in iter_fields(data, 0, len(data)):
        if field == 1:
            ids = np_read_packed_signed(val, 0, len(val))
        elif field == 5:
            if with_metadata:
                for f2, _, v2 in iter_fields(val, 0, len(val)):
                    if f2 == 1:
                        # proto int32: sign-interpret two's-complement
                        versions = [decode_i64(v) for v in read_packed_varints(v2, 0, len(v2))]
                    elif f2 == 2:
                        timestamps = read_packed_signed(v2, 0, len(v2))
                    elif f2 == 3:
                        changesets = read_packed_signed(v2, 0, len(v2))
        elif field == 8:
            lats = np_read_packed_signed(val, 0, len(val))
        elif field == 9:
            lons = np_read_packed_signed(val, 0, len(val))
        elif field == 10:
            if with_tags:
                kv = np_read_packed_varints(val, 0, len(val))
    if ids is None:
        return None
    n = len(ids)

    abs_ids = np.cumsum(ids)
    abs_lats = (np.cumsum(lats) * gran + lat_off) * scale
    abs_lons = (np.cumsum(lons) * gran + lon_off) * scale

    if kv is None or len(kv) == 0:
        tag_offsets = np.zeros(n + 1, dtype=np.int32)
        tag_keys: list[str] = []
        tag_vals: list[str] = []
    else:
        z = np.flatnonzero(kv == 0)
        if len(z) != n:
            # malformed stream — fall back to the per-element decoder's
            # semantics by letting the caller use _decode_dense
            return None
        pairs_per_node = (np.diff(np.concatenate(([-1], z))) - 1) // 2
        tag_offsets = np.concatenate(
            ([0], np.cumsum(pairs_per_node))
        ).astype(np.int32)
        nonzero = kv[kv != 0]
        tag_keys = [strings[i] for i in nonzero[0::2].tolist()]
        tag_vals = [strings[i] for i in nonzero[1::2].tolist()]

    vers = ts = cs = None
    if with_metadata and versions:
        vers = np.asarray(versions, dtype=np.int32)
        if len(vers) != n:
            return None

        def _padded_cumsum(deltas: list) -> "np.ndarray":
            # short delta streams behave as trailing zero deltas (the
            # per-element decoder's `deltas[i] if i < len else 0`), so
            # pad BEFORE the cumsum — zero-filling the whole array would
            # diverge on the prefix that IS present
            arr = np.zeros(n, dtype=np.int64)
            k = min(len(deltas), n)
            arr[:k] = deltas[:k]
            return np.cumsum(arr)

        ts = _padded_cumsum(timestamps) * date_gran // 1000
        cs = _padded_cumsum(changesets)
    return DenseColumns(n, abs_ids, abs_lons, abs_lats, tag_offsets, tag_keys, tag_vals, vers, ts, cs)


class WayColumns:
    """Columnar way segment builder (Arrow scan fast path for ways).

    Ways decode TWICE per engine query (the kind-pruned elements relation
    and the exploded way_refs relation are separate scans), so the same
    no-per-element-object treatment as ``DenseColumns`` pays double:
    osmids/refs/tags append into flat lists + offset arrays, ready for
    ``ListArray.from_arrays`` / ``MapArray.from_arrays``."""

    __slots__ = (
        "ids", "tag_offsets", "tag_keys", "tag_vals",
        "ref_offsets", "refs", "versions", "timestamps", "changesets",
    )

    def __init__(self) -> None:
        self.ids: list[int] = []
        self.tag_offsets: list[int] = [0]
        self.tag_keys: list[str] = []
        self.tag_vals: list[str] = []
        self.ref_offsets: list[int] = [0]
        self.refs: list[int] = []
        self.versions: list[Optional[int]] = []
        self.timestamps: list[Optional[int]] = []
        self.changesets: list[Optional[int]] = []

    @property
    def n(self) -> int:
        return len(self.ids)


def _decode_way_into(
    data: bytes, strings, wb: WayColumns, with_metadata, date_gran,
    with_tags: bool = True, with_refs: bool = True,
) -> None:
    """One way → columnar append (same wire walk as ``_decode_way``).
    ``with_tags``/``with_refs`` gate the packed-payload decodes for pruned
    scans (the exploded way_refs relation never touches tag strings; a
    tags-only projection never delta-accumulates refs)."""
    osmid = 0
    keys: list[int] = []
    vals: list[int] = []
    refs: list[int] = []
    info = None
    for field, _, val in iter_fields(data, 0, len(data)):
        if field == 1:
            osmid = val
        elif field == 2:
            if with_tags:
                keys = read_packed_varints(val, 0, len(val))
        elif field == 3:
            if with_tags:
                vals = read_packed_varints(val, 0, len(val))
        elif field == 4:
            info = bytes(val)
        elif field == 8:
            if with_refs:
                refs = list(accumulate(read_packed_signed(val, 0, len(val))))
    wb.ids.append(osmid)
    if keys:
        wb.tag_keys += [strings[k] for k in keys]
        wb.tag_vals += [strings[v] for v in vals]
    wb.tag_offsets.append(wb.tag_offsets[-1] + len(keys))
    wb.refs += refs
    wb.ref_offsets.append(wb.ref_offsets[-1] + len(refs))
    if with_metadata:
        if info is not None:
            v, ts, cs = _decode_info(info)
            wb.versions.append(v)
            wb.timestamps.append(ts * date_gran // 1000 if ts is not None else None)
            wb.changesets.append(cs)
        else:
            wb.versions.append(None)
            wb.timestamps.append(None)
            wb.changesets.append(None)


class RelationColumns:
    """Columnar relation segment builder (Arrow scan fast path for
    relations — round 6, completing the ``DenseColumns``/``WayColumns``
    trio; reference per-element anchor primitives.py:93-147).  Member
    triples flatten into parallel (refs, types, roles) arrays + one
    offsets array, ready for ``ListArray.from_arrays`` over a
    ``StructArray`` — no per-relation Element object, no per-member
    tuple."""

    __slots__ = (
        "ids", "tag_offsets", "tag_keys", "tag_vals",
        "mem_offsets", "mem_refs", "mem_types", "mem_roles",
        "versions", "timestamps", "changesets",
    )

    def __init__(self) -> None:
        self.ids: list[int] = []
        self.tag_offsets: list[int] = [0]
        self.tag_keys: list[str] = []
        self.tag_vals: list[str] = []
        self.mem_offsets: list[int] = [0]
        self.mem_refs: list[int] = []
        self.mem_types: list[int] = []
        self.mem_roles: list[str] = []
        self.versions: list[Optional[int]] = []
        self.timestamps: list[Optional[int]] = []
        self.changesets: list[Optional[int]] = []

    @property
    def n(self) -> int:
        return len(self.ids)


def _decode_relation_into(
    data: bytes, strings, rb: RelationColumns, with_metadata, date_gran,
    with_tags: bool = True, with_members: bool = True,
) -> None:
    """One relation → columnar append (same wire walk as
    ``_decode_relation``).  ``with_tags``/``with_members`` gate the packed
    payload decodes for pruned scans (an id-only projection never
    delta-accumulates member ids or touches role strings)."""
    osmid = 0
    keys: list[int] = []
    vals: list[int] = []
    roles: list[int] = []
    memids: list[int] = []
    types: list[int] = []
    info = None
    for field, _, val in iter_fields(data, 0, len(data)):
        if field == 1:
            osmid = val
        elif field == 2:
            if with_tags:
                keys = read_packed_varints(val, 0, len(val))
        elif field == 3:
            if with_tags:
                vals = read_packed_varints(val, 0, len(val))
        elif field == 4:
            info = bytes(val)
        elif field == 8:
            if with_members:
                roles = read_packed_varints(val, 0, len(val))
        elif field == 9:
            if with_members:
                memids = list(accumulate(read_packed_signed(val, 0, len(val))))
        elif field == 10:
            if with_members:
                types = read_packed_varints(val, 0, len(val))
    rb.ids.append(osmid)
    if keys:
        rb.tag_keys += [strings[k] for k in keys]
        rb.tag_vals += [strings[v] for v in vals]
    rb.tag_offsets.append(rb.tag_offsets[-1] + len(keys))
    if memids:
        rb.mem_refs += memids
        rb.mem_types += types
        rb.mem_roles += [
            strings[roles[i]] if i < len(roles) else "" for i in range(len(memids))
        ]
    rb.mem_offsets.append(rb.mem_offsets[-1] + len(memids))
    if with_metadata:
        if info is not None:
            v, ts, cs = _decode_info(info)
            rb.versions.append(v)
            rb.timestamps.append(ts * date_gran // 1000 if ts is not None else None)
            rb.changesets.append(cs)
        else:
            rb.versions.append(None)
            rb.timestamps.append(None)
            rb.changesets.append(None)


def decode_block_segments(
    block: bytes,
    with_metadata: bool = False,
    wanted_types: "set[int] | None" = None,
    with_tags: bool = True,
    with_refs: bool = True,
    with_members: bool = True,
    must_strings: "frozenset[str] | None" = None,
    any_strings: "frozenset[str] | None" = None,
) -> list:
    """Segment-structured block decode for the Arrow scan path: dense-node
    groups come back as ``DenseColumns``, way runs as ``WayColumns``, and
    relation runs as ``RelationColumns`` (columnar, no per-element
    objects — round 6 completes the trio); non-dense Nodes remain
    ``Element`` lists (rare in real files), in wire encounter order — so
    row order is identical to ``decode_primitive_block``.  Semantics
    parity is pinned by tests/test_pbf_source.py (same rows either path).
    ``with_tags`` / ``with_refs`` / ``with_members`` skip the packed
    payload decodes for pruned scans (the 'columns' read option —
    reference field-decode pruning, primitives.py:23-29, end-to-end).
    ``must_strings`` is the executor-side dictionary skip: a block whose
    string table lacks any required string decodes to NOTHING (tag
    keys/values are indices into that table, so absence is exact proof
    no element matches — reference osmquery.py:242-257 semantics at
    block granularity).  ``any_strings`` is the disjunctive variant
    (skip only when NONE is present) — the shape Query.must_tags needs
    ("element has at least one of these keys")."""
    strings: list[str] = []
    groups: list[bytes] = []
    granularity = 100
    lat_off = lon_off = 0
    date_gran = 1000
    for field, _, val in iter_fields(block, 0, len(block)):
        if field == 1:
            strings = _decode_stringtable(val)
            if (must_strings or any_strings) and not _dict_allows(
                set(strings), must_strings or frozenset(), any_strings
            ):
                return []
        elif field == 2:
            groups.append(bytes(val))
        elif field == 17:
            granularity = val
        elif field == 18:
            date_gran = val
        elif field == 19:
            lat_off = val
        elif field == 20:
            lon_off = val
    # a block with no stringtable holds only untagged elements — the
    # dictionary skip drops it the same way
    if (must_strings or any_strings) and not strings:
        return []

    scale = 1e-9
    w = wanted_types
    nodes_on = w is None or 0 in w
    ways_on = w is None or 1 in w
    rels_on = w is None or 2 in w
    segments: list = []
    els: list[Element] = []
    wb: Optional[WayColumns] = None
    rb: Optional[RelationColumns] = None

    def flush_els():
        nonlocal els
        if els:
            segments.append(els)
            els = []

    def flush_ways():
        nonlocal wb
        if wb is not None and wb.ids:
            segments.append(wb)
            wb = None

    def flush_rels():
        nonlocal rb
        if rb is not None and rb.ids:
            segments.append(rb)
            rb = None

    for group in groups:
        for field, _, val in iter_fields(group, 0, len(group)):
            if field == 1:
                if nodes_on:
                    flush_ways()
                    flush_rels()
                    els.append(_decode_node(val, strings, granularity, lat_off, lon_off, scale, with_metadata, date_gran))
            elif field == 2:
                if nodes_on:
                    dc = _decode_dense_columns(val, strings, granularity, lat_off, lon_off, scale, with_metadata, date_gran, with_tags)
                    if dc is None:
                        flush_ways()
                        flush_rels()
                        els.extend(_decode_dense(val, strings, granularity, lat_off, lon_off, scale, with_metadata, date_gran))
                    else:
                        flush_els()
                        flush_ways()
                        flush_rels()
                        segments.append(dc)
            elif field == 3:
                if ways_on:
                    flush_els()
                    flush_rels()
                    if wb is None:
                        wb = WayColumns()
                    _decode_way_into(val, strings, wb, with_metadata, date_gran, with_tags, with_refs)
            elif field == 4:
                if rels_on:
                    flush_els()
                    flush_ways()
                    if rb is None:
                        rb = RelationColumns()
                    _decode_relation_into(val, strings, rb, with_metadata, date_gran, with_tags, with_members)
    flush_ways()
    flush_rels()
    flush_els()
    return segments


def _apply_info(el: Element, info: Optional[bytes], with_metadata: bool, date_gran: int) -> None:
    if not with_metadata or info is None:
        return
    v, ts, cs = _decode_info(info)
    el.version = v
    el.timestamp = ts * date_gran // 1000 if ts is not None else None
    el.changeset = cs


def _decode_node(
    data: bytes, strings, gran, lat_off, lon_off, scale, with_metadata, date_gran
) -> Element:
    """Non-dense Node (reference primitives.py:9-44 — whose cached-node path
    is broken, SURVEY §2.12; implemented per spec here)."""
    osmid = 0
    keys: list[int] = []
    vals: list[int] = []
    lat = lon = 0
    info = None
    for field, wire, val in iter_fields(data, 0, len(data)):
        if field == 1:
            osmid = zigzag(val)
        elif field == 2:
            keys = read_packed_varints(val, 0, len(val))
        elif field == 3:
            vals = read_packed_varints(val, 0, len(val))
        elif field == 4:
            info = bytes(val)
        elif field == 8:
            lat = zigzag(val)
        elif field == 9:
            lon = zigzag(val)
    el = Element(
        osmid,
        NODE,
        _tags_from_keyvals(keys, vals, strings),
        lon=(lon * gran + lon_off) * scale,
        lat=(lat * gran + lat_off) * scale,
    )
    _apply_info(el, info, with_metadata, date_gran)
    return el


def _decode_dense(
    data: bytes, strings, gran, lat_off, lon_off, scale, with_metadata, date_gran
) -> list[Element]:
    """DenseNodes with delta decoding (reference dense.py:8-51; its metadata
    path is broken — SURVEY §2.12 — spec semantics here)."""
    import numpy as np

    ids = lats = lons = None
    keyvals: list[int] = []
    versions: list[int] = []
    timestamps: list[int] = []
    changesets: list[int] = []
    for field, _, val in iter_fields(data, 0, len(data)):
        if field == 1:
            ids = np_read_packed_signed(val, 0, len(val))
        elif field == 5:
            for f2, _, v2 in iter_fields(val, 0, len(val)):
                if f2 == 1:
                    # proto int32: sign-interpret two's-complement
                    versions = [decode_i64(v) for v in read_packed_varints(v2, 0, len(v2))]
                elif f2 == 2:
                    timestamps = read_packed_signed(v2, 0, len(v2))
                elif f2 == 3:
                    changesets = read_packed_signed(v2, 0, len(v2))
        elif field == 8:
            lats = np_read_packed_signed(val, 0, len(val))
        elif field == 9:
            lons = np_read_packed_signed(val, 0, len(val))
        elif field == 10:
            keyvals = np_read_packed_varints(val, 0, len(val)).tolist()
    if ids is None:
        return []

    # delta-decode + coordinate scaling vectorized (the reference needs the
    # same trick in numpy, dense.py:38-46); .tolist() hands plain
    # ints/floats to the Element loop
    abs_ids = np.cumsum(ids).tolist()
    abs_lats = ((np.cumsum(lats) * gran + lat_off) * scale).tolist()
    abs_lons = ((np.cumsum(lons) * gran + lon_off) * scale).tolist()

    out: list[Element] = []
    cur_ts = cur_cs = 0
    kv_pos = 0
    n_kv = len(keyvals)
    for i in range(len(abs_ids)):
        # untagged nodes share ONE empty dict (planet files are ~95%
        # untagged nodes; a fresh dict per node is pure allocator churn).
        # Decode output is read-only by contract — nothing downstream
        # mutates el.tags (the Arrow conversion only iterates items).
        if kv_pos < n_kv and keyvals[kv_pos] != 0:
            tags: dict[str, str] = {}
            while kv_pos < n_kv and keyvals[kv_pos] != 0:
                tags[strings[keyvals[kv_pos]]] = strings[keyvals[kv_pos + 1]]
                kv_pos += 2
        else:
            tags = _EMPTY_TAGS
        kv_pos += 1  # skip the 0 terminator
        el = Element(abs_ids[i], NODE, tags, lon=abs_lons[i], lat=abs_lats[i])
        if with_metadata and versions:
            cur_ts += timestamps[i] if i < len(timestamps) else 0
            cur_cs += changesets[i] if i < len(changesets) else 0
            el.version = versions[i] if i < len(versions) else None
            el.timestamp = cur_ts * date_gran // 1000
            el.changeset = cur_cs
        out.append(el)
    return out


def _decode_way(data: bytes, strings, with_metadata, date_gran) -> Element:
    """Way with delta-decoded refs (reference primitives.py:47-90)."""
    osmid = 0
    keys: list[int] = []
    vals: list[int] = []
    refs: list[int] = []
    info = None
    for field, _, val in iter_fields(data, 0, len(data)):
        if field == 1:
            osmid = val
        elif field == 2:
            keys = read_packed_varints(val, 0, len(val))
        elif field == 3:
            vals = read_packed_varints(val, 0, len(val))
        elif field == 4:
            info = bytes(val)
        elif field == 8:
            # delta → absolute refs via C-speed accumulate (no Python loop)
            refs = list(accumulate(read_packed_signed(val, 0, len(val))))
    el = Element(osmid, WAY, _tags_from_keyvals(keys, vals, strings), refs=refs)
    _apply_info(el, info, with_metadata, date_gran)
    return el


def _decode_relation(data: bytes, strings, with_metadata, date_gran) -> Element:
    """Relation with delta-decoded member ids (reference primitives.py:93-147)."""
    osmid = 0
    keys: list[int] = []
    vals: list[int] = []
    roles: list[int] = []
    memids: list[int] = []
    types: list[int] = []
    info = None
    for field, _, val in iter_fields(data, 0, len(data)):
        if field == 1:
            osmid = val
        elif field == 2:
            keys = read_packed_varints(val, 0, len(val))
        elif field == 3:
            vals = read_packed_varints(val, 0, len(val))
        elif field == 4:
            info = bytes(val)
        elif field == 8:
            roles = read_packed_varints(val, 0, len(val))
        elif field == 9:
            memids = list(accumulate(read_packed_signed(val, 0, len(val))))
        elif field == 10:
            types = read_packed_varints(val, 0, len(val))
    members = [
        (memids[i], types[i], strings[roles[i]] if i < len(roles) else "")
        for i in range(len(memids))
    ]
    el = Element(osmid, RELATION, _tags_from_keyvals(keys, vals, strings), members=members)
    _apply_info(el, info, with_metadata, date_gran)
    return el


# ---------------------------------------------------------------------------
# encode side (fixtures/tests only — the reference has no writer at all)
# ---------------------------------------------------------------------------


def write_varint(n: int) -> bytes:
    # unsigned by contract: a negative Python int stays negative under
    # >>= 7 forever, so without this guard bad input (e.g. a -1 version
    # or pre-1970 timestamp through to_pbf(metadata=True)) would hang the
    # encoder appending continuation bytes until OOM instead of erroring
    if n < 0:
        raise ValueError(
            f"write_varint: negative value {n} for an unsigned field — "
            "signed values must go through write_zigzag"
        )
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def write_zigzag(n: int) -> bytes:
    return write_varint((n << 1) ^ (n >> 63) if n < 0 else n << 1)


_U64_MASK = (1 << 64) - 1


def write_varint_i64(n: int) -> bytes:
    """Proto ``int32``/``int64`` wire encode: negatives sign-extend to 64
    bits and emit as a 10-byte two's-complement varint (the protobuf
    spec rule for non-zigzag signed fields).  This is how Info.timestamp
    (int64 — pre-1970 timestamps are legal) round-trips through the
    ways/relations write path consistently with DenseInfo's zigzag
    deltas; plain ``write_varint`` stays unsigned-only and raises."""
    if not -(1 << 63) <= n < (1 << 63):
        raise ValueError(f"write_varint_i64: {n} outside int64 range")
    return write_varint(n & _U64_MASK)


def decode_i64(v: int) -> int:
    """Sign-interpret a decoded varint as proto int64: wire values with
    the top bit set are two's-complement negatives."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _field(field_no: int, wire: int) -> bytes:
    return write_varint(field_no << 3 | wire)


def enc_varint_field(field_no: int, value: int) -> bytes:
    return _field(field_no, 0) + write_varint(value)


def enc_bytes_field(field_no: int, data: bytes) -> bytes:
    return _field(field_no, 2) + write_varint(len(data)) + data


def enc_packed_field(field_no: int, values: list[int], signed: bool = False) -> bytes:
    body = b"".join(write_zigzag(v) if signed else write_varint(v) for v in values)
    return enc_bytes_field(field_no, body)


def enc_packed_deltas(field_no: int, values: list[int]) -> bytes:
    deltas = [values[0]] + [values[i] - values[i - 1] for i in range(1, len(values))] if values else []
    return enc_packed_field(field_no, deltas, signed=True)


class PbfWriter:
    """Minimal deterministic .osm.pbf writer.

    Each OSMData block carries its own BLOCK-LOCAL string table — the
    layout real producers (osmium/osmosis) emit, and the one that makes
    dictionary-based blob pruning effective: a scanner can drop a block
    whose table lacks a required tag key without decoding any element.
    To build local tables, ``add_*`` calls STAGE raw groups and all
    encoding happens in ``write()``, once the block boundaries are
    known (input validation still happens at add time, so bad input
    fails before any shard byte is written)."""

    def __init__(self, granularity: int = 100, codec: str = "zlib"):
        self.granularity = granularity
        self.codec = codec  # zlib | lzma | bz2 | raw (spec fields 3/4/5/1)
        # staged (kind, items) groups; encoded per block in write()
        self.groups: list[tuple[str, list]] = []
        # block-local string state, reset per block in write()
        self._strings: list[str] = [""]  # index 0 reserved (spec)
        self._sidx: dict[str, int] = {}

    def _reset_strings(self) -> None:
        self._strings = [""]
        self._sidx = {}

    def sid(self, s: str) -> int:
        if s not in self._sidx:
            self._sidx[s] = len(self._strings)
            self._strings.append(s)
        return self._sidx[s]

    def _kv(self, tags: dict[str, str]) -> tuple[list[int], list[int]]:
        return [self.sid(k) for k in tags], [self.sid(v) for v in tags.values()]

    @staticmethod
    def _enc_info(meta: "tuple[int, int, int]") -> bytes:
        """Info submessage (field 4 of Node/Way/Relation): (version,
        timestamp, changeset).  Timestamp is in SECONDS — the block's
        date_granularity stays at the spec default 1000 ms, so the wire
        value IS seconds (the decoder's ``ts * date_gran // 1000``)."""
        v, ts, cs = meta
        # int32/int64 fields encode negatives as two's-complement (spec) —
        # a pre-1970 timestamp must not fail mid-write after shards of the
        # same job already landed, and must round-trip like DenseInfo's
        # zigzag deltas do for dense nodes
        return enc_bytes_field(
            4,
            _field(1, 0) + write_varint_i64(v)
            + _field(2, 0) + write_varint_i64(ts)
            + _field(3, 0) + write_varint_i64(cs),
        )

    def add_dense_nodes(self, nodes: "list[tuple]") -> None:
        """nodes: [(id, lon, lat, tags)] or [(id, lon, lat, tags,
        (version, ts_sec, changeset))] — becomes one DenseNodes group.
        DenseInfo is parallel-array (spec), so metadata is all-or-nothing
        within a group."""
        nodes = list(nodes)
        metas = [n[4] for n in nodes if len(n) > 4]
        if metas and len(metas) != len(nodes):
            raise ValueError(
                "DenseInfo is a parallel array: either every node in the "
                "group carries (version, timestamp, changeset) or none does"
            )
        self.groups.append(("dense", nodes))

    def _enc_dense_group(self, nodes: "list[tuple]") -> bytes:
        ids = [n[0] for n in nodes]
        lons = [round(n[1] * 1e9) // self.granularity for n in nodes]
        lats = [round(n[2] * 1e9) // self.granularity for n in nodes]
        keyvals: list[int] = []
        for n in nodes:
            for k, v in n[3].items():
                keyvals += [self.sid(k), self.sid(v)]
            keyvals.append(0)
        dense = (
            enc_packed_deltas(1, ids)
            + enc_packed_deltas(8, lats)
            + enc_packed_deltas(9, lons)
            + enc_packed_field(10, keyvals)
        )
        metas = [n[4] for n in nodes if len(n) > 4]
        if metas:
            dense += enc_bytes_field(
                5,
                # version is proto int32 (not sint32): negatives mask to
                # two's complement, same rule as write_varint_i64
                enc_packed_field(1, [m[0] & _U64_MASK for m in metas])
                + enc_packed_deltas(2, [m[1] for m in metas])
                + enc_packed_deltas(3, [m[2] for m in metas]),
            )
        return enc_bytes_field(2, dense)

    def _enc_way(
        self, osmid: int, refs: list[int], tags: dict[str, str], meta=None
    ) -> bytes:
        keys, vals = self._kv(tags)
        return (
            enc_varint_field(1, osmid)
            + enc_packed_field(2, keys)
            + enc_packed_field(3, vals)
            + (self._enc_info(meta) if meta is not None else b"")
            + enc_packed_deltas(8, refs)
        )

    def add_way(self, osmid: int, refs: list[int], tags: dict[str, str], meta=None) -> None:
        self.groups.append(("ways", [(osmid, refs, tags, meta)]))

    def add_ways(self, ways: "list[tuple]") -> None:
        """Batch: one PrimitiveGroup holding many ways (the realistic block
        shape — ~8k elements per group in tool-produced files).  Each way
        is (id, refs, tags) or (id, refs, tags, (version, ts, changeset))."""
        self.groups.append(("ways", list(ways)))

    def _enc_relation(
        self,
        osmid: int,
        members: list[tuple[int, int, str]],
        tags: dict[str, str],
        meta=None,
    ) -> bytes:
        keys, vals = self._kv(tags)
        return (
            enc_varint_field(1, osmid)
            + enc_packed_field(2, keys)
            + enc_packed_field(3, vals)
            + (self._enc_info(meta) if meta is not None else b"")
            + enc_packed_field(8, [self.sid(m[2]) for m in members])
            + enc_packed_deltas(9, [m[0] for m in members])
            + enc_packed_field(10, [m[1] for m in members])
        )

    def add_relation(
        self, osmid: int, members: list[tuple[int, int, str]], tags: dict[str, str], meta=None
    ) -> None:
        """members: [(ref, type, role)]"""
        self.groups.append(("rels", [(osmid, members, tags, meta)]))

    def add_relations(self, rels: "list[tuple]") -> None:
        """Batch: one PrimitiveGroup holding many relations (realistic block
        shape, same rationale as ``add_ways``).  Each relation is
        (id, members, tags) or (id, members, tags, (version, ts, changeset))."""
        self.groups.append(("rels", list(rels)))

    def _enc_group(self, kind: str, items: list) -> bytes:
        if kind == "dense":
            return self._enc_dense_group(items)
        if kind == "ways":
            return b"".join(enc_bytes_field(3, self._enc_way(*w)) for w in items)
        return b"".join(enc_bytes_field(4, self._enc_relation(*r)) for r in items)

    def _blob(self, block: bytes) -> bytes:
        if self.codec == "raw":
            return enc_bytes_field(1, block)
        if self.codec == "lzma":
            import lzma

            return enc_varint_field(2, len(block)) + enc_bytes_field(4, lzma.compress(block))
        if self.codec == "bz2":
            import bz2

            return enc_varint_field(2, len(block)) + enc_bytes_field(5, bz2.compress(block))
        compressed = zlib.compress(block)
        return enc_varint_field(2, len(block)) + enc_bytes_field(3, compressed)

    def _frame(self, blob_type: str, blob: bytes) -> bytes:
        header = enc_bytes_field(1, blob_type.encode()) + enc_varint_field(3, len(blob))
        return struct.pack(">I", len(header)) + header + blob

    def write(self, path: str, groups_per_block: int = 1) -> None:
        header_block = enc_bytes_field(4, b"OsmSchema-V0.6") + enc_bytes_field(
            4, b"DenseNodes"
        )
        with open(path, "wb") as f:
            f.write(self._frame("OSMHeader", self._blob(header_block)))
            for i in range(0, len(self.groups), groups_per_block):
                chunk = self.groups[i : i + groups_per_block]
                # BLOCK-LOCAL string table: encode this block's groups
                # against a fresh dictionary so the table names exactly
                # the strings the block uses (the pruning contract)
                self._reset_strings()
                bodies = [self._enc_group(kind, items) for kind, items in chunk]
                st = b"".join(enc_bytes_field(1, s.encode()) for s in self._strings)
                block = (
                    enc_bytes_field(1, st)
                    + b"".join(enc_bytes_field(2, g) for g in bodies)
                    + enc_varint_field(17, self.granularity)
                )
                f.write(self._frame("OSMData", self._blob(block)))
