"""OSM XML data source: ``.osm`` (planet-dump XML) and ``.osc``
(osmChange changefile) as DataFrames.

Beyond-reference scope (the reference reads PBF only,
``osmdatapy/osmdata.py:29-39``), but table stakes for a real OSM
pipeline: JOSM/iD exports, Overpass responses, and minutely/hourly diff
feeds are XML.  The unified row shape is exactly the PBF source's
(``sources/pbf.py::PBF_SCHEMA``) so every downstream operator — Query,
geometry, topology, bronze split — works unchanged; ``.osc`` adds one
``action`` column (``create | modify | delete``) that feeds the CDC
upsert/apply operators (suite ``osm_apply_changes``,
``streaming/stateful.py`` changefile face).

Scale positioning (deliberate): XML is NOT splittable (no framing), so
the partition unit is the FILE — a directory of diffs parallelizes per
file, and bulk data belongs in PBF or bronze parquet.  That mirrors the
osmium ecosystem, where XML is the interchange/diff format and PBF the
bulk format.  Parsing is ``iterparse`` streaming with element.clear()
— memory stays bounded however large one file is — and rows leave
Python as Arrow RecordBatches of ``batch_rows`` elements, never
per-row pickling.
"""

from __future__ import annotations

import bz2
import gzip
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

from osmdatapy_spark.sources.pbf import PBF_SCHEMA

_TYPE_CODE = {"node": 0, "way": 1, "relation": 2}
_ACTIONS = ("create", "modify", "delete")

OSC_SCHEMA = StructType(list(PBF_SCHEMA.fields) + [StructField("action", StringType(), False)])


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    if path.endswith(".bz2"):
        return bz2.open(path, "rb")
    return open(path, "rb")


def _parse_ts(ts: str | None) -> int | None:
    """ISO-8601 ``2013-09-05T22:15:24Z`` → epoch SECONDS — the PBF
    decode's timestamp unit (``ts * date_granularity // 1000`` with
    date_granularity in millis, ``pbf_codec.py``), so PBF-base +
    ``.osc``-changefile pipelines compare and order timestamps in one
    unit.  Round 5 shipped millis here — a 1000× cross-source mismatch
    on the CDC path; ``test_xml_source.py`` now pins the parity."""
    if not ts:
        return None
    from datetime import datetime, timezone

    s = ts.replace("Z", "+00:00")
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def _format_ts(ts: int | None) -> str | None:
    """Epoch seconds → ISO-8601 Zulu (inverse of ``_parse_ts``)."""
    if ts is None:
        return None
    from datetime import datetime, timezone

    return (
        datetime.fromtimestamp(int(ts), tz=timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ")
    )


def iter_osm_xml(
    path: str,
    osmtypes: "set[int] | None" = None,
    columns: "Sequence[str] | None" = None,
) -> Iterator[tuple[str, dict]]:
    """Stream (action, element-dict) pairs from an ``.osm``/``.osc`` file.

    For plain ``.osm`` the action is ``""``; for osmChange it is the
    enclosing ``create``/``modify``/``delete`` wrapper.  Element dicts
    carry the unified-schema fields; ``<delete>`` entries are typically
    skeleton elements (id only) and come through with empty tags.

    ``osmtypes`` / ``columns`` are the PBF source's pruning contract
    (sources/pbf.py read options) on the XML side: non-requested element
    KINDS are skipped before any child walk or dict build, and dropped
    COLUMNS skip their parse work (the tag/nd/member child scans and the
    int/float attribute conversions — iterparse must still stream the
    raw XML, there is no framing to seek over, but the Python-side work
    per element prunes).  ``columns=None`` builds every field."""
    import xml.etree.ElementTree as ET

    need = None if columns is None else set(columns)

    def want(f: str) -> bool:
        return need is None or f in need

    w_tags, w_lon, w_lat = want("tags"), want("lon"), want("lat")
    w_refs, w_members = want("refs"), want("members")
    w_version, w_ts, w_cs = want("version"), want("timestamp"), want("changeset")

    action = ""
    root = None
    wrapper = None
    with _open(path) as f:
        # events on start gives the wrapper context; elements complete on end
        for event, el in ET.iterparse(f, events=("start", "end")):
            tag = el.tag
            if event == "start":
                if root is None:
                    root = el  # first start event is the document root
                if tag in _ACTIONS:
                    action = tag
                    wrapper = el
                continue
            if tag in _ACTIONS:
                action = ""
                wrapper = None
                el.clear()
                root.clear()
                continue
            if tag not in _TYPE_CODE:
                continue
            tc = _TYPE_CODE[tag]
            if osmtypes is not None and tc not in osmtypes:
                el.clear()
                (wrapper if wrapper is not None else root).clear()
                continue
            a = el.attrib
            row = {
                "osmid": int(a["id"]),
                "osmtype": tc,
                "tags": (
                    {t.attrib["k"]: t.attrib["v"] for t in el if t.tag == "tag"}
                    if w_tags
                    else {}
                ),
                "lon": float(a["lon"]) if w_lon and "lon" in a else None,
                "lat": float(a["lat"]) if w_lat and "lat" in a else None,
                "refs": [int(nd.attrib["ref"]) for nd in el if nd.tag == "nd"]
                if w_refs and tag == "way"
                else None,
                "members": [
                    (
                        int(m.attrib["ref"]),
                        _TYPE_CODE.get(m.attrib.get("type", "node"), 0),
                        m.attrib.get("role", ""),
                    )
                    for m in el
                    if m.tag == "member"
                ]
                if w_members and tag == "relation"
                else None,
                "version": int(a["version"]) if w_version and "version" in a else None,
                "timestamp": _parse_ts(a.get("timestamp")) if w_ts else None,
                "changeset": int(a["changeset"]) if w_cs and "changeset" in a else None,
            }
            yield action, row
            # el.clear() alone leaves an O(elements) list of empty Element
            # shells in the enclosing container's child list (the round-5
            # leak) — clear the container too: the root for plain .osm,
            # the open create/modify/delete wrapper for .osc.  Both are
            # safe mid-parse: the expat TreeBuilder appends to its own
            # open-element stack, not via the parent's child list.
            el.clear()
            (wrapper if wrapper is not None else root).clear()


class _XmlPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class OsmXmlDataSourceReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("osmxml source requires a path")
        self.batch_rows = int(options.get("batch_rows", 20_000))
        self.is_osc = options.get("osc", "false").lower() == "true"
        self.osmtypes = _parse_osmtypes(options.get("osmtypes"))

    def partitions(self) -> Sequence[_XmlPartition]:
        import glob
        import os

        p = self.path
        if os.path.isdir(p):
            # skip hidden dotfiles (AppleDouble sidecars etc. — same
            # rationale as sources/_watch.py and the pbf batch expander)
            files = sorted(
                f
                for f in glob.glob(os.path.join(p, "*"))
                if f.endswith((".osm", ".osc", ".osm.gz", ".osc.gz", ".osm.bz2", ".osc.bz2"))
                and not os.path.basename(f).startswith(".")
            )
        else:
            files = sorted(glob.glob(p)) or [p]
        if not files:
            raise FileNotFoundError(f"no OSM XML files under {p!r}")
        return [_XmlPartition(f) for f in files]

    def read(self, partition: _XmlPartition) -> Iterator:
        import pyarrow as pa

        fields = [f.name for f in self.schema.fields]
        arrow_types = {
            "osmid": pa.int64(),
            "osmtype": pa.int32(),
            "tags": pa.map_(pa.string(), pa.string()),
            "lon": pa.float64(),
            "lat": pa.float64(),
            "refs": pa.list_(pa.int64()),
            "members": pa.list_(
                pa.struct(
                    [
                        pa.field("ref", pa.int64(), nullable=False),
                        pa.field("type", pa.int32(), nullable=False),
                        pa.field("role", pa.string()),
                    ]
                )
            ),
            "version": pa.int32(),
            "timestamp": pa.int64(),
            "changeset": pa.int64(),
            "action": pa.string(),
        }

        def to_batch(rows: list[tuple[str, dict]]):
            def column(name: str) -> list:
                if name == "action":
                    return [a for a, _ in rows]
                if name == "tags":
                    return [list(r["tags"].items()) for _, r in rows]
                if name == "members":
                    return [
                        [{"ref": m[0], "type": m[1], "role": m[2]} for m in r["members"]]
                        if r["members"] is not None
                        else None
                        for _, r in rows
                    ]
                return [r[name] for _, r in rows]

            return pa.RecordBatch.from_arrays(
                [pa.array(column(n), type=arrow_types[n]) for n in fields], names=fields
            )

        buf: list[tuple[str, dict]] = []
        # fields IS the pruned column set: schema() already dropped the
        # unrequested columns, so the parse skips their work and to_batch
        # never builds their Arrow arrays — PBF-source contract parity
        for action, row in iter_osm_xml(
            partition.path, osmtypes=self.osmtypes, columns=fields
        ):
            buf.append((action, row))
            if len(buf) >= self.batch_rows:
                yield to_batch(buf)
                buf = []
        if buf:
            yield to_batch(buf)


class OsmXmlSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the osmxml source: watch a DIRECTORY of
    ``.osc``/``.osm`` files and emit each file's elements exactly once —
    the planet minutely/hourly-diff watcher (osmosis' replication
    pipeline) as a Structured Streaming source, feeding the CDC fold
    (``osm_osc_apply`` / ``stream_upsert_latest``) incrementally.

    Offset = the last processed file NAME: replication diffs are
    sequence-numbered (``000/123/456.osc.gz``), so lexicographic file
    order IS the replication order, the offset is a single scalar, and
    ``readBetweenOffsets`` replays any (start, end] window
    deterministically for recovery.  Files must be appended with
    ever-increasing names (the replication contract); a name ≤ the
    offset is never re-read.  The unit of progress is the FILE — the
    same non-splittable-XML positioning as the batch reader."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("osmxml stream source requires a directory path")
        self.osmtypes = _parse_osmtypes(options.get("osmtypes"))
        self.fields = [f.name for f in schema.fields]
        # optional arrival ration (same opt-in contract as the pbf
        # watcher): 0 = unlimited; set it when pointing a continuously-
        # triggered watcher at a deep backlog of diffs.  .osc replication
        # diffs are small by contract, so unlimited is the sane default.
        # Looked up case-insensitively: Spark lowercases option keys
        # (sources/_watch.py:get_option).
        from osmdatapy_spark.sources._watch import get_option

        self.max_files = int(get_option(options, "maxFilesPerTrigger", "0"))
        if self.max_files < 0:
            raise ValueError("osmxml stream source: maxFilesPerTrigger must be >= 0")

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _all_files(self) -> "list[str]":
        from osmdatapy_spark.sources._watch import list_watched_files

        return list_watched_files(
            self.path,
            (".osm", ".osc", ".osm.gz", ".osc.gz", ".osm.bz2", ".osc.bz2"),
            "osmxml",
        )

    def _rows(self, files: "list[str]") -> "list[tuple]":
        # a LIST, not a generator: the simple-reader wrapper prefetches
        # and PICKLES the batch to cache it against replay — bounded by
        # per-microbatch diff size (replication diffs are small by
        # contract; bulk loads go through the batch/PBF path)
        has_action = "action" in self.fields
        data_fields = [f for f in self.fields if f != "action"]
        out = []
        for path in files:
            for action, row in iter_osm_xml(
                path, osmtypes=self.osmtypes, columns=data_fields
            ):
                vals = [row.get(f) for f in data_fields]
                if has_action:
                    vals.append(action)
                out.append(tuple(vals))
        return out

    def read(self, start: dict):
        import os

        new = [f for f in self._all_files() if os.path.basename(f) > start["last"]]
        if self.max_files > 0:
            new = new[: self.max_files]
        if not new:
            return [], start
        end = {"last": os.path.basename(new[-1])}
        return self._rows(new), end

    def readBetweenOffsets(self, start: dict, end: dict) -> "list[tuple]":
        import os

        files = [
            f
            for f in self._all_files()
            if start["last"] < os.path.basename(f) <= end["last"]
        ]
        return self._rows(files)


class OsmXmlDataSource(DataSource):
    """``spark.read.format("osmxml")`` — OSM XML / osmChange as a DataFrame."""

    @classmethod
    def name(cls) -> str:
        return "osmxml"

    def schema(self) -> StructType:
        base = (
            OSC_SCHEMA
            if self.options.get("osc", "false").lower() == "true"
            else PBF_SCHEMA
        )
        # the 'columns' option is the relation-level projection — same
        # contract as the PBF source (sources/pbf.py schema()): the Python
        # DataSource API has no pruning pushdown, so a .select() above the
        # scan would still parse and ship every field; pruning HERE makes
        # the reader skip the per-element tag/ref/member child walks and
        # never build the dropped Arrow arrays.
        raw = self.options.get("columns")
        if raw:
            wanted = [c.strip() for c in str(raw).split(",") if c.strip()]
            by_name = {f.name: f for f in base.fields}
            unknown = [c for c in wanted if c not in by_name]
            if unknown:
                raise ValueError(f"unknown osmxml columns: {unknown}")
            return StructType([by_name[f.name] for f in base.fields if f.name in wanted])
        return base

    def reader(self, schema: StructType) -> OsmXmlDataSourceReader:
        return OsmXmlDataSourceReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> OsmXmlSimpleStreamReader:
        return OsmXmlSimpleStreamReader(schema, dict(self.options))


def _parse_osmtypes(raw) -> "set[int] | None":
    if raw is None or raw == "":
        return None
    return {int(t) for t in str(raw).split(",") if t.strip() != ""}


def register(spark: SparkSession) -> None:
    spark.dataSource.register(OsmXmlDataSource)


def read_osm_xml(
    spark: SparkSession,
    path: str,
    osc: bool = False,
    osmtypes: "set[int] | None" = None,
    columns: "list[str] | None" = None,
) -> DataFrame:
    """Open ``.osm`` XML (or ``.osc`` changefiles with ``osc=True``, adding
    the ``action`` column) as a DataFrame in the unified element schema.

    ``osmtypes`` restricts parsed element kinds at the source and
    ``columns`` restricts built fields — the same pruning contract as
    ``read_pbf`` (a ``.select()`` above a Python DataSource scan cannot
    push down, so the options are where pruning becomes real)."""
    register(spark)
    reader = spark.read.format("osmxml")
    if osc:
        reader = reader.option("osc", "true")
    if osmtypes is not None:
        reader = reader.option("osmtypes", ",".join(str(t) for t in sorted(osmtypes)))
    if columns is not None:
        reader = reader.option("columns", ",".join(columns))
    return reader.load(path)


def read_osm_xml_stream(
    spark: SparkSession,
    path: str,
    osc: bool = True,
    osmtypes: "set[int] | None" = None,
    columns: "list[str] | None" = None,
    max_files_per_trigger: int = 0,
) -> DataFrame:
    """``spark.readStream`` over a directory of ``.osc`` changefiles (or
    ``.osm`` snapshots with ``osc=False``): each file that appears under
    ``path`` with a lexicographically LATER name is emitted exactly once
    — the replication-diff watcher as a streaming DataFrame, with the
    same pruning options as the batch reader.  Downstream, the CDC fold
    (latest version per osmid) runs per micro-batch via foreachBatch or
    as a watermarked stateful aggregation.  ``max_files_per_trigger``
    rations arrivals for a continuously-triggered watcher over a deep
    diff backlog (0 = unlimited, the default — an availableNow run plans
    exactly one read per run; same contract as ``read_pbf_stream``)."""
    register(spark)
    reader = spark.readStream.format("osmxml")
    if max_files_per_trigger > 0:
        reader = reader.option("maxFilesPerTrigger", str(int(max_files_per_trigger)))
    if osc:
        reader = reader.option("osc", "true")
    if osmtypes is not None:
        reader = reader.option("osmtypes", ",".join(str(t) for t in sorted(osmtypes)))
    if columns is not None:
        reader = reader.option("columns", ",".join(columns))
    return reader.load(path)


def _element_xml(r: dict, names: dict) -> str:
    """One unified-schema element dict as its ``<node/>``/``<way/>``/
    ``<relation/>`` XML fragment (shared by the ``.osm`` and ``.osc``
    writers so both serialize elements identically)."""
    from xml.sax.saxutils import quoteattr

    kind = names[r["osmtype"]]
    attrs = [f'id="{r["osmid"]}"']
    lon, lat = r.get("lon"), r.get("lat")
    if (lon is None) != (lat is None):
        raise ValueError(
            f"element {kind}/{r['osmid']}: half-set coordinates "
            f"(lon={lon!r}, lat={lat!r}) — both or neither must be present"
        )
    if lon is not None:
        attrs.append(f'lat="{lat:.7f}" lon="{lon:.7f}"')
    if r.get("version") is not None:
        attrs.append(f'version="{r["version"]}"')
    if r.get("timestamp") is not None:
        attrs.append(f'timestamp="{_format_ts(r["timestamp"])}"')
    if r.get("changeset") is not None:
        attrs.append(f'changeset="{r["changeset"]}"')
    body = []
    for k, v in (r.get("tags") or {}).items():
        body.append(f"  <tag k={quoteattr(k)} v={quoteattr(v)}/>")
    for ref in r.get("refs") or []:
        body.append(f'  <nd ref="{ref}"/>')
    for m in r.get("members") or []:
        ref, t, role = m
        body.append(f'  <member type="{names[t]}" ref="{ref}" role={quoteattr(role or "")}/>')
    head = f"<{kind} {' '.join(attrs)}"
    if body:
        return f"{head}>\n" + "\n".join(body) + f"\n</{kind}>\n"
    return f"{head}/>\n"


def write_osm_xml(rows: Iterator, out) -> None:
    """Serialize unified-schema element dict-rows to ``.osm`` XML (test/
    interchange helper — the round-trip counterpart of ``read_osm_xml``;
    the bulk sink remains ``engine.to_pbf``)."""
    out.write("<?xml version='1.0' encoding='UTF-8'?>\n")
    out.write("<osm version=\"0.6\" generator=\"osmdatapy_spark\">\n")
    names = {v: k for k, v in _TYPE_CODE.items()}
    for r in rows:
        out.write(_element_xml(r, names))
    out.write("</osm>\n")


def write_osm_osc(rows: Iterator, out) -> None:
    """Serialize (action, element-dict) pairs to an osmChange ``.osc``
    changefile — the wire format of planet minutely/hourly diffs and the
    round-trip counterpart of ``read_osm_xml(..., osc=True)``.  Action
    must be ``create``/``modify``/``delete``; consecutive same-action
    rows share one wrapper block (the layout osmosis/osmium emit).
    Elements serialize via the same fragment writer as ``.osm``, so the
    two formats cannot drift."""
    out.write("<?xml version='1.0' encoding='UTF-8'?>\n")
    out.write("<osmChange version=\"0.6\" generator=\"osmdatapy_spark\">\n")
    names = {v: k for k, v in _TYPE_CODE.items()}
    open_action = None
    for action, r in rows:
        if action not in _ACTIONS:
            raise ValueError(f"osc action must be one of {_ACTIONS}, got {action!r}")
        if action != open_action:
            if open_action is not None:
                out.write(f"</{open_action}>\n")
            out.write(f"<{action}>\n")
            open_action = action
        out.write(_element_xml(r, names))
    if open_action is not None:
        out.write(f"</{open_action}>\n")
    out.write("</osmChange>\n")
