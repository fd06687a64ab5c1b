"""PBF data source: codec round-trip, partition planning, pushdown,
bronze-table split, and the OSM facade end-to-end on a real .pbf file."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from osmdatapy_spark.engine import OSM
from osmdatapy_spark.query import Query
from osmdatapy_spark.sources.pbf import read_pbf, read_pbf_tables
from osmdatapy_spark.sources.pbf_codec import (
    decode_primitive_block,
    read_blob,
    scan_blob_spans,
    read_varint,
    write_varint,
    write_zigzag,
    zigzag,
)


def test_varint_roundtrip():
    for n in (0, 1, 127, 128, 300, 2**31, 2**63 - 1):
        buf = write_varint(n)
        v, pos = read_varint(buf, 0)
        assert v == n and pos == len(buf)


def test_zigzag_roundtrip():
    for n in (0, -1, 1, -2, 2, -(2**31), 2**31, -(2**62)):
        buf = write_zigzag(n)
        v, _ = read_varint(buf, 0)
        assert zigzag(v) == n


def test_ten_byte_varint_decodes_via_int64_wraparound():
    # a 10-byte varint (any negative int64 on the wire, or zigzag of
    # |delta| >= 2^62) exceeds int64 as an unsigned value; the vectorized
    # decoder must reinterpret the 64-bit pattern, not raise OverflowError
    from osmdatapy_spark.sources.pbf_codec import np_read_packed_varints

    big = (-5) & 0xFFFFFFFFFFFFFFFF  # wire encoding of int64 -5
    buf = write_varint(big) + write_varint(7) + write_varint(2**63 - 1)
    out = np_read_packed_varints(buf, 0, len(buf))
    assert list(out) == [-5, 7, 2**63 - 1]
    # zigzag path: |delta| >= 2^62 round-trips through the signed decoder
    from osmdatapy_spark.sources.pbf_codec import np_read_packed_signed

    buf2 = write_zigzag(-(2**62) - 3) + write_zigzag(11)
    out2 = np_read_packed_signed(buf2, 0, len(buf2))
    assert list(out2) == [-(2**62) - 3, 11]


def test_framing_scan(fixture_pbf):
    spans = scan_blob_spans(fixture_pbf)
    types = [s.blob_type for s in spans]
    assert types[0] == "OSMHeader"
    assert types.count("OSMData") >= 2  # groups_per_block=3 over 8 groups


def test_codec_decode(fixture_pbf):
    spans = [s for s in scan_blob_spans(fixture_pbf) if s.blob_type == "OSMData"]
    els = [e for s in spans for e in decode_primitive_block(read_blob(fixture_pbf, s))]
    by_id = {(e.osmtype, e.osmid): e for e in els}
    assert len(by_id) == 9 + 7 + 3
    n5 = by_id[(0, 5)]
    assert n5.tags == {"amenity": "cafe"}
    assert abs(n5.lon - 10.001) < 1e-7 and abs(n5.lat - 50.001) < 1e-7
    w101 = by_id[(1, 101)]
    assert w101.refs == [1, 2, 3]
    assert w101.tags["highway"] == "primary"
    r201 = by_id[(2, 201)]
    assert [m[0] for m in r201.members] == [101, 102, 103, 104]
    assert r201.members[0][2] == "outer"


def test_all_stdlib_codecs_roundtrip(tmp_path):
    # the reference enforces zlib-only (headers.py:84-85); we decode every
    # spec codec — raw/zlib/lzma/bz2 here, lz4/zstd import-gated
    from osmdatapy_spark.sources.pbf_codec import PbfWriter

    for codec in ("raw", "zlib", "lzma", "bz2"):
        path = str(tmp_path / f"{codec}.osm.pbf")
        w = PbfWriter(codec=codec)
        w.add_dense_nodes([(1, 10.0, 50.0, {"amenity": "cafe"})])
        w.add_way(101, [1, 1], {"highway": "primary"})
        w.write(path)
        spans = [s for s in scan_blob_spans(path) if s.blob_type == "OSMData"]
        els = [e for s in spans for e in decode_primitive_block(read_blob(path, s))]
        assert {(e.osmtype, e.osmid) for e in els} == {(0, 1), (1, 101)}, codec
        assert els[0].tags == {"amenity": "cafe"}


def test_spark_read(spark, fixture_pbf):
    df = read_pbf(spark, fixture_pbf)
    assert df.count() == 19
    counts = {r["osmtype"]: r["n"] for r in df.groupBy("osmtype").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 9, 1: 7, 2: 3}


def test_osmtypes_option_prunes_kinds(spark, fixture_pbf):
    assert read_pbf(spark, fixture_pbf, osmtypes={1}).count() == 7
    assert read_pbf(spark, fixture_pbf, osmtypes={0, 2}).count() == 12


def test_two_filters_one_relation_is_correct(spark, fixture_pbf):
    """Regression: scan reuse must not merge differently-filtered scans of
    one relation (the hazard that absorbed pushFilters state triggers —
    see sources/pbf.py module docstring)."""
    scan = read_pbf(spark, fixture_pbf)
    a = scan.filter(col("osmtype") == 0).select("osmid")
    b = scan.filter(col("osmtype") == 1).select("osmid")
    assert a.unionAll(b).count() == 16


def test_bronze_tables(spark, fixture_pbf):
    t = read_pbf_tables(spark, fixture_pbf)
    assert t["nodes"].count() == 9
    refs = {r["way_id"]: r["node_id"] for r in t["way_refs"].filter(col("pos") == 0).collect()}
    assert refs[101] == 1 and refs[106] == 1
    m = t["rel_members"].filter(col("rel_id") == 201).orderBy("pos").collect()
    assert [r["member_id"] for r in m] == [101, 102, 103, 104]
    assert m[0]["role"] == "outer"


def test_osm_facade_from_pbf(spark, fixture_pbf):
    osm = OSM.from_pbf(spark, fixture_pbf)
    q = Query(ways=True, keep={"highway": []})
    res = osm.query(q).collect()
    assert sorted(r["osmid"] for r in res) == [101, 102, 105]

    # geometry mode: node points + way linestrings as WKT
    qg = Query(nodes=True, ways=True, keep={"amenity": [], "highway": []}, geometry=True)
    geo = {r["osmid"]: r["geometry"] for r in osm.query(qg).collect()}
    assert geo[5].startswith("POINT")
    assert geo[101].startswith("LINESTRING")

    # ring assembly: the multipolygon relation chains into one closed ring
    # (the route relation 202 also yields chain-break rings — not asserted)
    rings = [r for r in osm.relation_rings().collect() if r["rel_id"] == 201]
    assert len(rings) == 1
    nodes = rings[0]["nodes"]
    assert nodes[0] == nodes[-1]
    assert set(nodes) == {1, 2, 3, 6, 9, 8, 7, 4}


def test_topology_from_pbf(spark, fixture_pbf):
    """Way 105 (2-5-8) shares node 2 with 101 and node 8 with 103: the
    shared nodes split 101 and 103 into two segments each."""
    osm = OSM.from_pbf(spark, fixture_pbf)
    segs = osm.topology().collect()
    by_way: dict[int, list] = {}
    for s in segs:
        by_way.setdefault(s["way_id"], []).append(s)
    assert len(by_way[101]) == 2  # split at node 2
    assert len(by_way[103]) == 2  # split at node 8
    assert len(by_way[105]) == 1  # interior node 5 unshared
    seg_101 = sorted(by_way[101], key=lambda s: s["seg"])
    assert (seg_101[0]["source"], seg_101[0]["target"]) == (1, 2)
    assert (seg_101[1]["source"], seg_101[1]["target"]) == (2, 3)


def test_relation_areas(spark, fixture_pbf):
    """Full area pipeline: rel 201 (4 outer ways) → POLYGON; rel 203
    (closed outer square 106 + inner diamond 107) → POLYGON with a hole;
    the route relation 202 is excluded by the G5 type dispatch."""
    osm = OSM.from_pbf(spark, fixture_pbf)
    areas = {r["rel_id"]: r["wkt"] for r in osm.relation_areas().collect()}
    assert set(areas) == {201, 203}
    assert areas[201].startswith("POLYGON ((") and areas[201].count("(") == 2
    # holed polygon: two rings → three '(' (POLYGON ((outer), (hole)))
    assert areas[203].startswith("POLYGON ((") and areas[203].count("(") == 3
    # hole contains the inner diamond's coordinates (node 2 = 10.001, 50.0)
    assert "10.0010000 50.0000000" in areas[203].split("), (")[1]


def test_relation_lines(spark, fixture_pbf):
    """Route relation 202 = ways 101 (1-2-3) and 105 (2-5-8): the two ways
    don't chain end-to-end, so the route assembles as a MULTILINESTRING of
    two open chains (reference line branch _frame.py:87-105); area
    relations 201/203 are excluded by the G5 type dispatch."""
    osm = OSM.from_pbf(spark, fixture_pbf)
    lines = {r["rel_id"]: r["wkt"] for r in osm.relation_lines().collect()}
    assert set(lines) == {202}
    wkt = lines[202]
    assert wkt.startswith("MULTILINESTRING ((")
    chains = wkt[len("MULTILINESTRING ("):-1].split("), (")
    assert len(chains) == 2
    # chain 0 = way 101 nodes 1,2,3 (lat 50.0 row); open — 3 points, not closed
    assert chains[0].count(",") == 2
    assert "10.0000000 50.0000000" in chains[0]
    # chain 1 = way 105 nodes 2,5,8 (lon 10.001 column)
    assert "10.0010000 50.0020000" in chains[1]


def test_query_attaches_route_linestrings(spark, fixture_pbf):
    """OSM.query(geometry=True) coalesces route linestrings into the
    geometry column next to relation areas (reference _frame.py:87-105)."""
    osm = OSM.from_pbf(spark, fixture_pbf)
    q = Query(relations=True, geometry=True)
    got = {r["osmid"]: r["geometry"] for r in osm.query(q).collect()}
    assert got[202].startswith("MULTILINESTRING (")
    assert got[201].startswith("POLYGON (")
    assert got[203].startswith("POLYGON (")


def test_bronze_roundtrip(spark, fixture_pbf, tmp_path):
    """PBF → bronze parquet → engine: results identical to the direct scan."""
    osm = OSM.from_pbf(spark, fixture_pbf)
    bronze = str(tmp_path / "bronze")
    osm.to_bronze(bronze)
    osm2 = OSM.from_bronze(spark, bronze)
    q = Query(ways=True, keep={"highway": []})
    direct = sorted(r["osmid"] for r in osm.query(q).collect())
    via_bronze = sorted(r["osmid"] for r in osm2.query(q).collect())
    assert direct == via_bronze
    segs_a = sorted((s["way_id"], s["seg"], s["source"], s["target"]) for s in osm.topology().collect())
    segs_b = sorted((s["way_id"], s["seg"], s["source"], s["target"]) for s in osm2.topology().collect())
    assert segs_a == segs_b


def test_bucketed_bronze_join_has_no_exchange(spark, fixture_pbf, tmp_path):
    """The SCALE.md headline: co-bucketed nodes/way_refs join WITHOUT a
    shuffle — the biggest exchange in the topology/coords pipeline
    disappears when the bronze tier is bucketed on the join key."""
    from osmdatapy_spark.plans.audit import plan_summary

    osm = OSM.from_pbf(spark, fixture_pbf)
    osm.to_bronze(str(tmp_path / "bronze"), buckets=4)
    try:
        nodes = spark.table("bronze_nodes")
        refs = spark.table("bronze_way_refs")
        joined = refs.join(nodes, refs["node_id"] == nodes["osmid"]).select(
            "way_id", "node_id", "lon", "lat"
        )
        assert joined.count() > 0
        s = plan_summary(joined)
        assert s.n_exchanges == 0, s.text
    finally:
        spark.sql("DROP TABLE IF EXISTS bronze_nodes")
        spark.sql("DROP TABLE IF EXISTS bronze_way_refs")


def test_osm_filepath_constructor_parity(spark, tmp_path):
    """Reference drop-in: OSM('file.pbf') on the active session must equal
    OSM.from_pbf(spark, path) (osmdata.py:29 entry point)."""
    from osmdatapy_spark.engine import OSM
    from osmdatapy_spark.sources.pbf_codec import PbfWriter

    w = PbfWriter(codec="zlib")
    w.add_dense_nodes([(1, 1.0, 2.0, {"amenity": "cafe"}), (2, 3.0, 4.0, {})])
    w.add_ways([(10, [1, 2], {"highway": "path"})])
    path = str(tmp_path / "tiny.osm.pbf")
    w.write(path)

    via_str = OSM(path)
    via_cls = OSM.from_pbf(spark, path)
    assert via_str.elements.count() == via_cls.elements.count() == 3
    assert via_str.nodes.count() == 2


def test_to_pbf_roundtrip(spark, fixture_pbf, tmp_path):
    """Sink → source round-trip: to_pbf shards decode back to the same
    elements, coordinates, tags, way refs, and relation members."""
    src = OSM.from_pbf(spark, fixture_pbf)
    out_dir = str(tmp_path / "sharded")
    n_shards = src.to_pbf(out_dir, elements_per_group=4)
    assert n_shards >= 1

    import glob

    parts = sorted(glob.glob(f"{out_dir}/part-*.osm.pbf"))
    assert len(parts) == n_shards
    backs = [OSM.from_pbf(spark, p) for p in parts]
    elements = backs[0].elements
    nodes = backs[0].nodes
    refs = backs[0].way_refs
    mems = backs[0].rel_members
    for b in backs[1:]:
        elements = elements.unionByName(b.elements, allowMissingColumns=True)
        nodes = nodes.unionByName(b.nodes)
        refs = refs.unionByName(b.way_refs)
        mems = mems.unionByName(b.rel_members)

    # element population by kind
    want = {(r["osmtype"], r["osmid"]) for r in src.elements.select("osmtype", "osmid").collect()}
    got = {(r["osmtype"], r["osmid"]) for r in elements.select("osmtype", "osmid").collect()}
    assert got == want

    # coordinates survive (granularity 100 => 1e-7 exact)
    want_xy = {r["osmid"]: (r["lon"], r["lat"]) for r in src.nodes.collect()}
    got_xy = {r["osmid"]: (r["lon"], r["lat"]) for r in nodes.collect()}
    assert got_xy == want_xy

    # tags survive
    want_tags = {r["osmid"]: dict(r["tags"]) for r in src.elements.filter(F.size("tags") > 0).select("osmid", "tags").collect()}
    got_tags = {r["osmid"]: dict(r["tags"]) for r in elements.filter(F.size("tags") > 0).select("osmid", "tags").collect()}
    assert got_tags == want_tags

    # way refs and relation members, order included
    want_refs = sorted((r["way_id"], r["pos"], r["node_id"]) for r in src.way_refs.collect())
    got_refs = sorted((r["way_id"], r["pos"], r["node_id"]) for r in refs.collect())
    assert got_refs == want_refs
    want_m = sorted(tuple(r) for r in src.rel_members.collect())
    got_m = sorted(tuple(r) for r in mems.collect())
    assert got_m == want_m


def test_query_on_path_backed_osm_uses_kind_pruned_scan(spark, fixture_pbf):
    """A ways-only query on an OSM opened from a .pbf path must re-derive
    its elements relation with the osmtypes option pushed to the source
    (P2 block pruning end-to-end) — and still return identical rows to
    the unpruned table-backed pipeline."""
    from osmdatapy_spark.engine import OSM
    from osmdatapy_spark.query import Query

    osm = OSM.from_pbf(spark, fixture_pbf)
    q = Query(ways=True, nodes=False, relations=False)
    pruned = osm._elements_for(q)
    # the pruned relation is a fresh scan, not the shared 3-kind elements
    assert pruned is not osm.elements
    assert "osmtypes -> 1" in pruned._jdf.queryExecution().toString() or \
        pruned.count() == osm.elements.filter(col("osmtype") == 1).count()
    # end-to-end equality against the post-decode-filter pipeline
    table_backed = OSM.from_tables(osm.elements, osm.nodes, osm.way_refs, osm.rel_members)
    a = sorted(r["osmid"] for r in osm.query(q).collect())
    b = sorted(r["osmid"] for r in table_backed.query(q).collect())
    assert a == b and len(a) > 0


def test_corrupt_pbf_fails_cleanly(spark, fixture_pbf, tmp_path):
    """Malformed input must raise a diagnosable error, not decode garbage:
    (a) truncated mid-frame, (b) flipped bytes inside a zlib blob, (c) a
    non-PBF file.  At cluster scale a clean per-file error is the
    difference between one failed task and a silently wrong table."""
    import zlib

    import pytest as _pytest

    from osmdatapy_spark.sources.pbf_codec import read_blob, scan_blob_spans

    raw = open(fixture_pbf, "rb").read()

    # (a) truncated mid-frame: the final span would extend past EOF —
    # the planning scan must refuse it, not return a phantom partition
    trunc = tmp_path / "trunc.osm.pbf"
    trunc.write_bytes(raw[: len(raw) - 7])
    full_spans = list(scan_blob_spans(fixture_pbf))
    with _pytest.raises(ValueError, match="truncated"):
        list(scan_blob_spans(str(trunc)))

    # (b) corrupted compressed payload: zlib must raise, not yield noise
    spans = [s for s in full_spans if s.blob_type == "OSMData"]
    assert spans
    s0 = spans[0]
    corrupted = bytearray(raw)
    mid = s0.offset + (s0.size // 2)
    for i in range(mid, mid + 8):
        corrupted[i] ^= 0xFF
    bad = tmp_path / "bad.osm.pbf"
    bad.write_bytes(bytes(corrupted))
    with _pytest.raises((zlib.error, ValueError)):
        for sp in scan_blob_spans(str(bad)):
            if sp.blob_type == "OSMData":
                read_blob(str(bad), sp)

    # (c) not a PBF at all
    junk = tmp_path / "junk.osm.pbf"
    junk.write_bytes(b"\x00\x01parquet-not-pbf" * 100)
    with _pytest.raises(ValueError):
        list(scan_blob_spans(str(junk)))


def test_segment_decode_parity_with_element_decode(fixture_pbf):
    """The columnar scan path (decode_block_segments: DenseColumns /
    WayColumns) must produce EXACTLY the rows of decode_primitive_block,
    in the same order — metadata included."""
    from osmdatapy_spark.sources.pbf_codec import (
        DenseColumns,
        RelationColumns,
        WayColumns,
        decode_block_segments,
    )

    spans = [s for s in scan_blob_spans(fixture_pbf) if s.blob_type == "OSMData"]
    for with_meta in (False, True):
        flat = []
        for s in spans:
            block = read_blob(fixture_pbf, s)
            for seg in decode_block_segments(block, with_metadata=with_meta):
                if isinstance(seg, DenseColumns):
                    for i in range(seg.n):
                        lo, hi = seg.tag_offsets[i], seg.tag_offsets[i + 1]
                        flat.append((
                            int(seg.ids[i]), 0,
                            dict(zip(seg.tag_keys[lo:hi], seg.tag_vals[lo:hi])),
                            float(seg.lons[i]), float(seg.lats[i]), None, None,
                            int(seg.versions[i]) if seg.versions is not None else None,
                            int(seg.timestamps[i]) if seg.timestamps is not None else None,
                            int(seg.changesets[i]) if seg.changesets is not None else None,
                        ))
                elif isinstance(seg, WayColumns):
                    for i in range(len(seg.ids)):
                        lo, hi = seg.tag_offsets[i], seg.tag_offsets[i + 1]
                        rlo, rhi = seg.ref_offsets[i], seg.ref_offsets[i + 1]
                        flat.append((
                            seg.ids[i], 1,
                            dict(zip(seg.tag_keys[lo:hi], seg.tag_vals[lo:hi])),
                            None, None, seg.refs[rlo:rhi], None,
                            seg.versions[i] if seg.versions else None,
                            seg.timestamps[i] if seg.timestamps else None,
                            seg.changesets[i] if seg.changesets else None,
                        ))
                elif isinstance(seg, RelationColumns):
                    for i in range(seg.n):
                        lo, hi = seg.tag_offsets[i], seg.tag_offsets[i + 1]
                        mlo, mhi = seg.mem_offsets[i], seg.mem_offsets[i + 1]
                        flat.append((
                            seg.ids[i], 2,
                            dict(zip(seg.tag_keys[lo:hi], seg.tag_vals[lo:hi])),
                            None, None, None,
                            [
                                (seg.mem_refs[j], seg.mem_types[j], seg.mem_roles[j])
                                for j in range(mlo, mhi)
                            ],
                            seg.versions[i] if seg.versions else None,
                            seg.timestamps[i] if seg.timestamps else None,
                            seg.changesets[i] if seg.changesets else None,
                        ))
                else:
                    for e in seg:
                        flat.append((
                            e.osmid, e.osmtype, e.tags, e.lon, e.lat, e.refs,
                            e.members, e.version, e.timestamp, e.changeset,
                        ))
        expect = [
            (e.osmid, e.osmtype, e.tags, e.lon, e.lat, e.refs, e.members,
             e.version, e.timestamp, e.changeset)
            for s in spans
            for e in decode_primitive_block(read_blob(fixture_pbf, s), with_metadata=with_meta)
        ]
        assert flat == expect, f"with_metadata={with_meta}"


def test_columns_option_prunes_relation_schema(spark, fixture_pbf):
    """The 'columns' read option IS the column pruning (the Python DS API
    has no pruning pushdown): the relation schema shrinks, the scan's
    ReadSchema shows only the requested fields, and values match the
    full-schema read."""
    pruned = read_pbf(spark, fixture_pbf, osmtypes={0}, columns=["osmid", "lon", "lat"])
    assert pruned.columns == ["osmid", "lon", "lat"]
    full = read_pbf(spark, fixture_pbf, osmtypes={0}).select("osmid", "lon", "lat")
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))
    # ways with refs but no tag decode
    refs = read_pbf(spark, fixture_pbf, osmtypes={1}, columns=["osmid", "refs"])
    assert refs.columns == ["osmid", "refs"]
    full_refs = read_pbf(spark, fixture_pbf, osmtypes={1}).select("osmid", "refs")
    assert sorted(map(tuple, ((r[0], tuple(r[1])) for r in refs.collect()))) == sorted(
        map(tuple, ((r[0], tuple(r[1])) for r in full_refs.collect()))
    )
    import pytest

    with pytest.raises(Exception, match="unknown pbf columns"):
        read_pbf(spark, fixture_pbf, columns=["osmid", "nope"]).count()


def test_dense_columns_partial_metadata_parity():
    """Partial-length DenseInfo delta streams (fewer timestamps/changesets
    than nodes) must decode identically on both paths: the per-element
    decoder treats missing deltas as 0, so the columnar cumsum pads
    BEFORE accumulating — the prefix that IS present must survive."""
    from osmdatapy_spark.sources.pbf_codec import (
        DenseColumns,
        decode_block_segments,
        decode_primitive_block,
        enc_bytes_field,
        enc_packed_deltas,
        enc_packed_field,
    )

    # hand-assemble a DenseNodes message with 4 nodes but only 2
    # timestamp deltas and 1 changeset delta
    dense = (
        enc_packed_deltas(1, [10, 11, 12, 13])        # ids
        + enc_bytes_field(
            5,
            enc_packed_field(1, [1, 1, 1, 1])          # versions (4)
            + enc_packed_deltas(2, [100, 5])           # timestamps (2 < 4)
            + enc_packed_deltas(3, [7]),               # changesets (1 < 4)
        )
        + enc_packed_deltas(8, [500000000, 0, 0, 0])   # lats
        + enc_packed_deltas(9, [100000000, 0, 0, 0])   # lons
    )
    group = enc_bytes_field(2, dense)
    block = enc_bytes_field(2, group)  # PrimitiveBlock.primitivegroup

    els = decode_primitive_block(block, with_metadata=True)
    segs = decode_block_segments(block, with_metadata=True)
    (dc,) = [s for s in segs if isinstance(s, DenseColumns)]
    assert [int(x) for x in dc.timestamps] == [e.timestamp for e in els]
    assert [int(x) for x in dc.changesets] == [e.changeset for e in els]
    # enc_packed_deltas takes ABSOLUTE values; missing trailing deltas
    # hold the last accumulated value
    assert [e.timestamp for e in els] == [100, 5, 5, 5]
    assert [e.changeset for e in els] == [7, 7, 7, 7]


def test_multi_file_read(spark, tmp_path):
    """A directory (or glob) of .pbf extracts scans as their union —
    partitions are planned per file, deterministic sorted order."""
    from osmdatapy_spark.sources.pbf_codec import PbfWriter

    d = tmp_path / "extracts"
    d.mkdir()
    for part, base in (("a", 0), ("b", 100)):
        w = PbfWriter()
        w.add_dense_nodes(
            [(base + i + 1, 10.0 + i, 50.0, {"amenity": "cafe"} if i == 0 else {}) for i in range(5)]
        )
        w.add_way(base + 50, [base + 1, base + 2], {"highway": "x"})
        w.write(str(d / f"region_{part}.osm.pbf"))

    df = read_pbf(spark, str(d))
    assert df.count() == 12  # 2 files x (5 nodes + 1 way)
    ids = {r["osmid"] for r in df.filter(col("osmtype") == 1).collect()}
    assert ids == {50, 150}

    # glob form selects a subset
    df_a = read_pbf(spark, str(d / "region_a*.pbf"))
    assert df_a.count() == 6

    # empty dir / no-match glob fail loudly
    import pytest

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(Exception):
        read_pbf(spark, str(empty)).count()
    with pytest.raises(Exception):
        read_pbf(spark, str(d / "nope_*.pbf")).count()


def test_writer_metadata_roundtrip(tmp_path):
    """Info/DenseInfo WRITE support (the reference is read-only; our read
    side decoded metadata since round 1): version/timestamp/changeset
    round-trip exactly through the wire format for all three element
    kinds, metadata-less groups still decode as None, and a mixed
    DenseNodes group (some nodes with meta, some without) is rejected
    loudly — DenseInfo is a parallel array by spec."""
    import pytest

    from osmdatapy_spark.sources.pbf_codec import (
        PbfWriter,
        decode_primitive_block,
        read_blob,
        scan_blob_spans,
    )

    w = PbfWriter()
    w.add_dense_nodes([
        (1, 1.0, 2.0, {"a": "b"}, (3, 1_000_000, 42)),
        (2, 3.0, 4.0, {}, (7, 1_000_100, 43)),
    ])
    w.add_ways([(10, [1, 2], {"h": "r"}, (5, 2_000_000, 99))])
    w.add_relations([(20, [(10, 1, "outer")], {"type": "multipolygon"}, (2, 3_000_000, 7))])
    w.add_dense_nodes([(5, 5.0, 5.0, {})])  # meta-less group
    p = str(tmp_path / "meta.osm.pbf")
    w.write(p)

    els = []
    for span in scan_blob_spans(p):
        if span.blob_type == "OSMData":
            els += decode_primitive_block(read_blob(p, span), with_metadata=True)
    got = {(e.osmid, e.osmtype): (e.version, e.timestamp, e.changeset) for e in els}
    assert got[(1, 0)] == (3, 1_000_000, 42)
    assert got[(2, 0)] == (7, 1_000_100, 43)
    assert got[(10, 1)] == (5, 2_000_000, 99)
    assert got[(20, 2)] == (2, 3_000_000, 7)
    assert got[(5, 0)] == (None, None, None)

    w2 = PbfWriter()
    with pytest.raises(ValueError, match="parallel array"):
        w2.add_dense_nodes([(1, 0.0, 0.0, {}, (1, 1, 1)), (2, 0.0, 0.0, {})])


def test_write_varint_rejects_negative():
    """write_varint is unsigned by contract; a negative input must raise
    instead of hanging the encoder in an infinite loop.  Signed proto
    int32/int64 fields go through write_varint_i64 (two's complement),
    which bounds its domain to int64."""
    import pytest

    from osmdatapy_spark.sources.pbf_codec import write_varint, write_varint_i64

    with pytest.raises(ValueError, match="negative"):
        write_varint(-1)
    with pytest.raises(ValueError, match="int64 range"):
        write_varint_i64(1 << 63)
    with pytest.raises(ValueError, match="int64 range"):
        write_varint_i64(-(1 << 63) - 1)


def test_negative_metadata_roundtrip(tmp_path):
    """Pre-1970 (negative) timestamps and negative changesets are legal
    proto int64 values and must round-trip through BOTH metadata wire
    forms: Info submessages (ways/relations/plain nodes — two's-
    complement 10-byte varints) and DenseInfo (zigzag deltas).  Round 10
    shipped an asymmetry where dense nodes accepted them but ways and
    relations raised mid-write, stranding partial shards."""
    from osmdatapy_spark.sources.pbf_codec import (
        PbfWriter,
        decode_primitive_block,
        read_blob,
        scan_blob_spans,
    )

    w = PbfWriter()
    w.add_dense_nodes([
        (1, 1.0, 2.0, {}, (1, -86_400, 42)),       # 1969-12-31
        (2, 3.0, 4.0, {}, (2, -1, -7)),
    ])
    w.add_ways([(10, [1, 2], {}, (5, -2_208_988_800, 99))])   # 1900-01-01
    w.add_relations([(20, [(10, 1, "outer")], {}, (2, -100, -3))])
    p = str(tmp_path / "neg.osm.pbf")
    w.write(p)

    els = []
    for span in scan_blob_spans(p):
        if span.blob_type == "OSMData":
            els += decode_primitive_block(read_blob(p, span), with_metadata=True)
    got = {(e.osmid, e.osmtype): (e.version, e.timestamp, e.changeset) for e in els}
    assert got[(1, 0)] == (1, -86_400, 42)
    assert got[(2, 0)] == (2, -1, -7)
    assert got[(10, 1)] == (5, -2_208_988_800, 99)
    assert got[(20, 2)] == (2, -100, -3)


def _dict_prune_fixture(tmp_path) -> str:
    """40 one-group blocks of 50 ways each; blocks where b % 8 == 3 tag
    every way with the rare 'bridge' key (5 of 40 blocks).  Per-block
    string tables (the PbfWriter contract) make the dictionary skip
    observable at blob granularity."""
    from osmdatapy_spark.sources.pbf_codec import PbfWriter

    w = PbfWriter()
    for b in range(40):
        tags = {"highway": "residential"}
        if b % 8 == 3:
            tags = {"highway": "residential", "bridge": "yes"}
        w.add_ways([
            (b * 50 + i + 1, [1, 2], dict(tags)) for i in range(50)
        ])
    p = str(tmp_path / "prune.osm.pbf")
    w.write(p, groups_per_block=1)
    return p


def test_dictionary_prune_plans_fewer_partitions(tmp_path):
    """The plan_prune pass must plan strictly fewer partitions for a rare
    must key (5 of 40 blobs survive → 1 run at the 8-blob coalesce cap
    vs 5 runs unpruned), and the executor-side skip alone must leave
    planning untouched."""
    from osmdatapy_spark.sources.pbf import PBF_SCHEMA, PbfDataSourceReader

    p = _dict_prune_fixture(tmp_path)
    full = PbfDataSourceReader(PBF_SCHEMA, {"path": p})
    skip = PbfDataSourceReader(
        PBF_SCHEMA, {"path": p, "must_tag_keys": "bridge"}
    )
    pruned = PbfDataSourceReader(
        PBF_SCHEMA, {"path": p, "must_tag_keys": "bridge", "plan_prune": "true"}
    )
    n_full = len(full.partitions())
    n_skip = len(skip.partitions())
    n_pruned = len(pruned.partitions())
    assert n_full == 5  # 40 blobs / 8-blob runs
    assert n_skip == n_full  # executor-side skip does not replan
    assert n_pruned == 1  # 5 surviving blobs coalesce into one run
    # planned spans must be exactly the bridge blocks' blobs
    spans = [s for part in pruned.partitions() for s in part.spans]
    assert len(spans) == 5


def test_dictionary_prune_workers_invariant(tmp_path, monkeypatch):
    """The parallel probe (round-12: bounded process pool instead of a
    sequential driver loop) must plan EXACTLY the same partitions at any
    worker count — the pool changes wall-time only, never the keep-mask
    or span order.  The pool threshold is forced to 1 so the 40-blob
    fixture actually exercises the process path."""
    import pytest

    from osmdatapy_spark.sources import pbf as pbf_mod
    from osmdatapy_spark.sources.pbf import PBF_SCHEMA, PbfDataSourceReader

    monkeypatch.setattr(pbf_mod, "_PROBE_POOL_MIN_SPANS", 1)
    p = _dict_prune_fixture(tmp_path)

    def plan(workers):
        r = PbfDataSourceReader(
            PBF_SCHEMA,
            {
                "path": p,
                "must_tag_keys": "bridge",
                "plan_prune": "true",
                "plan_prune_workers": str(workers),
            },
        )
        return [(part.path, tuple(part.spans)) for part in r.partitions()]

    sequential = plan(1)
    assert plan(16) == sequential
    assert plan(3) == sequential
    with pytest.raises(ValueError, match="plan_prune_workers"):
        PbfDataSourceReader(
            PBF_SCHEMA,
            {"path": p, "plan_prune": "true", "plan_prune_workers": "0"},
        )
    # inert knob (round-12 advice): with plan_prune off the option is
    # unused, so a nonsense value must NOT raise — out-of-range or even
    # unparseable
    PbfDataSourceReader(PBF_SCHEMA, {"path": p, "plan_prune_workers": "0"})
    PbfDataSourceReader(PBF_SCHEMA, {"path": p, "plan_prune_workers": "auto"})


def test_dictionary_prune_pool_inside_spark_planning(spark, tmp_path):
    """The process pool must work INSIDE Spark's planning worker, not just
    when partitions() is called directly: 200 blobs crosses the 192-span
    pool threshold, so this read forks the ProcessPoolExecutor from the
    data-source planning process — the environment the other prune tests
    never reach (40 blobs stay sequential; the invariance test calls
    partitions() outside Spark)."""
    from osmdatapy_spark.sources.pbf import read_pbf
    from osmdatapy_spark.sources.pbf_codec import PbfWriter

    w = PbfWriter()
    for b in range(200):
        tags = {"highway": "residential"}
        if b % 8 == 3:
            tags = {"highway": "residential", "bridge": "yes"}
        w.add_ways([(b * 50 + i + 1, [1, 2], dict(tags)) for i in range(50)])
    p = str(tmp_path / "pool200.osm.pbf")
    w.write(p, groups_per_block=1)
    want = sorted(b * 50 + i + 1 for b in range(200) if b % 8 == 3 for i in range(50))
    df = read_pbf(spark, p, must_tag_keys={"bridge"}, plan_prune=True)
    got = sorted(r.osmid for r in df.select("osmid").collect())
    assert got == want


def test_dictionary_prune_rows_exact(spark, tmp_path):
    """Both skip modes return exactly the elements of surviving blocks —
    and composed with the matching tag filter, exactly the rows the
    unpruned scan + filter returns (pruning is a plan optimization,
    never a semantics change for the promised contract)."""
    from osmdatapy_spark.sources.pbf import read_pbf

    p = _dict_prune_fixture(tmp_path)
    want = sorted(
        b * 50 + i + 1 for b in range(40) if b % 8 == 3 for i in range(50)
    )
    base = read_pbf(spark, p).filter("element_at(tags, 'bridge') IS NOT NULL")
    got_base = sorted(r.osmid for r in base.select("osmid").collect())
    assert got_base == want
    for plan_prune in (False, True):
        df = read_pbf(
            spark, p, must_tag_keys={"bridge"}, plan_prune=plan_prune
        ).filter("element_at(tags, 'bridge') IS NOT NULL")
        got = sorted(r.osmid for r in df.select("osmid").collect())
        assert got == want, f"plan_prune={plan_prune}"


def test_blob_dictionary_has_streams_head(tmp_path):
    """The planning probe answers from the stringtable without a full
    block decode, for present and absent keys, across codecs."""
    from osmdatapy_spark.sources.pbf_codec import (
        PbfWriter,
        blob_dictionary_has,
        scan_blob_spans,
    )

    for codec in ("zlib", "raw", "lzma"):
        w = PbfWriter(codec=codec)
        w.add_ways([(1, [1, 2], {"highway": "residential"})])
        w.add_ways([(2, [1, 2], {"bridge": "yes"})])
        p = str(tmp_path / f"probe_{codec}.osm.pbf")
        w.write(p, groups_per_block=1)
        data = [s for s in scan_blob_spans(p) if s.blob_type == "OSMData"]
        assert len(data) == 2
        assert blob_dictionary_has(p, data[0], frozenset({"highway"}))
        assert not blob_dictionary_has(p, data[0], frozenset({"bridge"}))
        assert blob_dictionary_has(p, data[1], frozenset({"bridge", "yes"}))
        assert not blob_dictionary_has(p, data[1], frozenset({"bridge", "nope"}))


def test_any_tag_keys_disjunctive_skip(spark, tmp_path):
    """any_tag_keys skips a block only when NONE of the keys is present —
    the Query.must_tags shape — and the engine's query path pushes
    must_tags through it with unchanged results."""
    from osmdatapy_spark.sources.pbf import PBF_SCHEMA, PbfDataSourceReader, read_pbf

    p = _dict_prune_fixture(tmp_path)
    # 'bridge' OR 'nonexistent': same 5 blocks survive planning
    pruned = PbfDataSourceReader(
        PBF_SCHEMA,
        {"path": p, "any_tag_keys": "bridge,nonexistent", "plan_prune": "true"},
    )
    assert len(pruned.partitions()) == 1
    # 'highway' OR 'bridge': every block has highway — nothing prunes
    allb = PbfDataSourceReader(
        PBF_SCHEMA,
        {"path": p, "any_tag_keys": "highway,bridge", "plan_prune": "true"},
    )
    assert len(allb.partitions()) == 5
    want = sorted(
        b * 50 + i + 1 for b in range(40) if b % 8 == 3 for i in range(50)
    )
    df = read_pbf(spark, p, any_tag_keys={"bridge", "nonexistent"}).filter(
        "element_at(tags, 'bridge') IS NOT NULL"
    )
    assert sorted(r.osmid for r in df.select("osmid").collect()) == want


def test_engine_query_pushes_must_tags_dictionary_skip(spark, tmp_path):
    """OSM.query with must_tags returns identical rows whether or not the
    scan-level dictionary skip fires (it always does now for pbf-backed
    OSMs) — pinned against a keys-absent-in-most-blocks fixture."""
    from osmdatapy_spark.engine import OSM
    from osmdatapy_spark.query import Query

    p = _dict_prune_fixture(tmp_path)
    osm = OSM.from_pbf(spark, p)
    res = osm.query(Query(ways=True, must_tags=["bridge"])).collect()
    want = sorted(
        b * 50 + i + 1 for b in range(40) if b % 8 == 3 for i in range(50)
    )
    assert sorted(r["osmid"] for r in res) == want


def test_blob_dictionary_probe_large_block(tmp_path):
    """Progressive probe on a block whose compressed payload spans many
    read chunks: the stringtable still resolves from the head (and the
    absent-key answer is still exact)."""
    from osmdatapy_spark.sources.pbf_codec import (
        PbfWriter,
        blob_dictionary_has,
        scan_blob_spans,
    )

    w = PbfWriter()
    # 60k ways with high-entropy ref deltas → compressed payload well
    # beyond the 16 KiB probe chunk
    w.add_ways([
        (i + 1, [i * 7919 % 100000, i * 104729 % 100000], {"highway": "x"})
        for i in range(60000)
    ])
    p = str(tmp_path / "big.osm.pbf")
    w.write(p, groups_per_block=1)
    span = [s for s in scan_blob_spans(p) if s.blob_type == "OSMData"][0]
    assert span.size > 64 * 1024  # genuinely multi-chunk
    assert blob_dictionary_has(p, span, frozenset({"highway"}))
    assert not blob_dictionary_has(p, span, frozenset({"bridge"}))
    assert blob_dictionary_has(
        p, span, frozenset(), any_of=frozenset({"bridge", "highway"})
    )
    assert not blob_dictionary_has(
        p, span, frozenset(), any_of=frozenset({"bridge", "tunnel"})
    )


def test_engine_query_pushes_keep_first_keys(spark, tmp_path):
    """With keep_first=True (the constructor default) a keep match is
    mandatory, so keep KEYS ride the dictionary skip; with
    keep_first=False keep is advisory (~exclude | keep) and must NOT
    prune — unmatched-but-unexcluded elements still flow."""
    from osmdatapy_spark.engine import OSM
    from osmdatapy_spark.query import Query

    p = _dict_prune_fixture(tmp_path)
    osm = OSM.from_pbf(spark, p)
    want = sorted(
        b * 50 + i + 1 for b in range(40) if b % 8 == 3 for i in range(50)
    )
    got = osm.query(Query(ways=True, keep={"bridge": []})).collect()
    assert sorted(r["osmid"] for r in got) == want
    # advisory mode: every way survives (none is excluded), including
    # those in blocks without 'bridge' — pruning here would be a bug
    got_all = osm.query(
        Query(
            ways=True,
            keep={"bridge": []},
            exclude={"nonexistent": []},
            keep_first=False,
        )
    ).collect()
    assert len(got_all) == 2000
