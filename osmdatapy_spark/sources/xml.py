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
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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


def iter_osm_xml(path: str) -> Iterator[tuple[str, dict]]:
    """Stream (action, element-dict) pairs from an ``.osm``/``.osc`` file.

    For plain ``.osm`` the action is ``""``; for osmChange it is the
    enclosing ``create``/``modify``/``delete`` wrapper.  Element dicts
    carry the unified-schema fields; ``<delete>`` entries are typically
    skeleton elements (id only) and come through with empty tags."""
    import xml.etree.ElementTree as ET

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
            a = el.attrib
            row = {
                "osmid": int(a["id"]),
                "osmtype": _TYPE_CODE[tag],
                "tags": {t.attrib["k"]: t.attrib["v"] for t in el if t.tag == "tag"},
                "lon": float(a["lon"]) if "lon" in a else None,
                "lat": float(a["lat"]) if "lat" in a else None,
                "refs": [int(nd.attrib["ref"]) for nd in el if nd.tag == "nd"]
                if tag == "way"
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
                if tag == "relation"
                else None,
                "version": int(a["version"]) if "version" in a else None,
                "timestamp": _parse_ts(a.get("timestamp")),
                "changeset": int(a["changeset"]) if "changeset" in a else None,
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

    def partitions(self) -> Sequence[_XmlPartition]:
        import glob
        import os

        p = self.path
        if os.path.isdir(p):
            files = sorted(
                f
                for f in glob.glob(os.path.join(p, "*"))
                if f.endswith((".osm", ".osc", ".osm.gz", ".osc.gz", ".osm.bz2", ".osc.bz2"))
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
        for action, row in iter_osm_xml(partition.path):
            buf.append((action, row))
            if len(buf) >= self.batch_rows:
                yield to_batch(buf)
                buf = []
        if buf:
            yield to_batch(buf)


class OsmXmlDataSource(DataSource):
    """``spark.read.format("osmxml")`` — OSM XML / osmChange as a DataFrame."""

    @classmethod
    def name(cls) -> str:
        return "osmxml"

    def schema(self) -> StructType:
        if self.options.get("osc", "false").lower() == "true":
            return OSC_SCHEMA
        return PBF_SCHEMA

    def reader(self, schema: StructType) -> OsmXmlDataSourceReader:
        return OsmXmlDataSourceReader(schema, dict(self.options))


def register(spark: SparkSession) -> None:
    spark.dataSource.register(OsmXmlDataSource)


def read_osm_xml(spark: SparkSession, path: str, osc: bool = False) -> DataFrame:
    """Open ``.osm`` XML (or ``.osc`` changefiles with ``osc=True``, adding
    the ``action`` column) as a DataFrame in the unified element schema."""
    register(spark)
    reader = spark.read.format("osmxml")
    if osc:
        reader = reader.option("osc", "true")
    return reader.load(path)


def write_osm_xml(rows: Iterator, out) -> None:
    """Serialize unified-schema element dict-rows to ``.osm`` XML (test/
    interchange helper — the round-trip counterpart of ``read_osm_xml``;
    the bulk sink remains ``engine.to_pbf``)."""
    from xml.sax.saxutils import quoteattr

    out.write("<?xml version='1.0' encoding='UTF-8'?>\n")
    out.write("<osm version=\"0.6\" generator=\"osmdatapy_spark\">\n")
    names = {v: k for k, v in _TYPE_CODE.items()}
    for r in rows:
        kind = names[r["osmtype"]]
        attrs = [f'id="{r["osmid"]}"']
        if r.get("lon") is not None:
            attrs.append(f'lat="{r["lat"]:.7f}" lon="{r["lon"]:.7f}"')
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
            out.write(f"{head}>\n" + "\n".join(body) + f"\n</{kind}>\n")
        else:
            out.write(f"{head}/>\n")
    out.write("</osm>\n")
