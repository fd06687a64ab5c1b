"""Larger-scale end-to-end check: generate a few-hundred-thousand-element
.osm.pbf, open it through the data source, and run the engine's headline
pipelines with wall-clock + plan-shape reporting.

Not a unit test (minutes, not seconds) — run manually or per-round:

    python tools/scale_check.py [n_nodes] [n_ways]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from osmdatapy_spark.engine import OSM  # noqa: E402
from osmdatapy_spark.plans.audit import plan_summary  # noqa: E402
from osmdatapy_spark.query import Query  # noqa: E402
from osmdatapy_spark.session import get_spark  # noqa: E402
from osmdatapy_spark.sources.pbf_codec import PbfWriter  # noqa: E402


def build_pbf(path: str, n_nodes: int, n_ways: int) -> None:
    w = PbfWriter()
    for start in range(0, n_nodes, 8000):
        w.add_dense_nodes(
            [
                (
                    i + 1,
                    (i % 3600) * 0.1 - 180,
                    (i % 1700) * 0.1 - 85,
                    {"amenity": "cafe"} if i % 97 == 0 else {},
                )
                for i in range(start, min(start + 8000, n_nodes))
            ]
        )
    nodes_per_way = 8
    for start in range(0, n_ways, 8000):
        w.add_ways(
            [
                (
                    n_nodes + wid,
                    # consecutive ways share an endpoint node → topology splits
                    [(wid * (nodes_per_way - 1) + j) % n_nodes + 1 for j in range(nodes_per_way)],
                    {"highway": "residential"} if wid % 3 == 0 else {"building": "yes"},
                )
                for wid in range(start, min(start + 8000, n_ways))
            ]
        )
    w.write(path, groups_per_block=1)


NEST_NODE_BASE = 10_000_000
NEST_WAY_BASE = 50_000_000
NEST_REL_BASE = 90_000_000


def build_nesting_pbf(path: str, n_rels: int) -> None:
    """n_rels COMPLEX multipolygon relations (2 outers + 2 nested inners
    each — the case the reference G8-drops and the round-7 containment
    kernel resolves): 16 nodes / 4 closed ways / 1 relation per entity,
    laid out on a 1000-wide grid so rings never overlap across relations."""
    w = PbfWriter()
    batch = 500  # 8000 nodes per dense group
    for start in range(0, n_rels, batch):
        rng = range(start, min(start + batch, n_rels))
        nodes, ways, rels = [], [], []
        for r in rng:
            x0 = (r % 1000) * 0.02 - 10.0
            y0 = (r // 1000) * 0.02
            squares = [
                (x0, y0, 0.008),                    # outer A
                (x0 + 0.01, y0, 0.008),             # outer B
                (x0 + 0.002, y0 + 0.002, 0.002),    # inner A (in outer A)
                (x0 + 0.012, y0 + 0.002, 0.002),    # inner B (in outer B)
            ]
            members = []
            for s, (bx, by, d) in enumerate(squares):
                corners = [(bx, by), (bx + d, by), (bx + d, by + d), (bx, by + d)]
                nid = [NEST_NODE_BASE + r * 16 + 4 * s + c for c in range(4)]
                nodes += [(nid[c], corners[c][0], corners[c][1], {}) for c in range(4)]
                wid = NEST_WAY_BASE + r * 4 + s
                ways.append((wid, nid + [nid[0]], {}))
                members.append((wid, 1, "outer" if s < 2 else "inner"))
            rels.append((NEST_REL_BASE + r, members, {"type": "multipolygon"}))
        w.add_dense_nodes(nodes)
        w.add_ways(ways)
        w.add_relations(rels)
    w.write(path, groups_per_block=1)


def timed(label: str, df) -> None:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    s = plan_summary(df)
    print(
        f"{label:28s} {time.time() - t0:6.1f}s  shuffles={s.n_exchanges} "
        f"broadcasts={s.n_broadcasts} python={s.n_python_evals}"
    )


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_ways = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    path = f"/tmp/scale_{n_nodes}_{n_ways}.osm.pbf"
    if not Path(path).exists():
        t0 = time.time()
        build_pbf(path, n_nodes, n_ways)
        print(f"built {path} ({Path(path).stat().st_size/1e6:.1f} MB) in {time.time()-t0:.0f}s")

    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    osm = OSM.from_pbf(spark, path)
    print(f"open (plan only)             {time.time()-t0:6.1f}s")

    timed("full scan", osm.elements)
    timed("tag filter + project", osm.query(Query(ways=True, keep={"highway": []}, tags=["highway"])))
    timed("geometry (points+lines)", osm.query(Query(nodes=True, ways=True, must_tags=["amenity", "highway"], geometry=True)))
    timed("topology segments", osm.topology())
    timed("info aggregate", osm.info())

    # relation-geometry at scale: complex multipolygons through the chain
    # + containment-nesting kernels (round 7), with exact assertions —
    # every relation must survive as a MULTIPOLYGON of 2 holed polygons
    # (7 opening parens), i.e. zero inners dropped by the G8 fallback
    n_rels = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    nest_path = f"/tmp/scale_nest_{n_rels}.osm.pbf"
    if not Path(nest_path).exists():
        t0 = time.time()
        build_nesting_pbf(nest_path, n_rels)
        print(f"built {nest_path} ({Path(nest_path).stat().st_size/1e6:.1f} MB) in {time.time()-t0:.0f}s")
    osm2 = OSM.from_pbf(spark, nest_path)
    t0 = time.time()
    areas = osm2.relation_areas()
    from pyspark.sql import functions as F

    stats = areas.select(
        F.count("*").alias("n"),
        F.sum(
            (
                F.col("wkt").startswith("MULTIPOLYGON")
                & (F.length(F.regexp_replace("wkt", r"[^(]", "")) == 7)
            ).cast("long")
        ).alias("n_ok"),
    ).collect()[0]
    s = plan_summary(areas)
    print(
        f"{'relation nesting (' + str(n_rels) + ' rels)':28s} {time.time() - t0:6.1f}s  "
        f"shuffles={s.n_exchanges} python={s.n_python_evals}"
    )
    assert stats["n"] == n_rels, f"expected {n_rels} areas, got {stats['n']}"
    assert stats["n_ok"] == n_rels, f"only {stats['n_ok']}/{n_rels} correctly nested"
    print(f"nesting assertions: {stats['n_ok']}/{n_rels} relations correctly holed")

    # PBF WRITE throughput (the osm_pbf_cdc_roundtrip path at scale):
    # filter+modify the scanned element set, push it back out through the
    # sharded executor-side to_pbf sink, re-scan the shard directory, and
    # assert the re-decoded counts — encode el/s is the number SCALE.md
    # tracks per round for the write side of the wire format.
    import shutil

    from pyspark.sql.functions import col, element_at, lit

    out_dir = f"/tmp/scale_writeback_{n_nodes}_{n_ways}"
    shutil.rmtree(out_dir, ignore_errors=True)
    surv_nodes = osm.nodes.filter(col("osmid") % 7 != 0).withColumn(
        "lon", col("lon") + 1.0
    )
    node_ids = surv_nodes.select("osmid")
    elements = (
        osm.elements.filter(col("osmtype") == 0)
        .join(node_ids, "osmid")
        .select("osmid", "osmtype", "tags", "refs", "members")
        .unionByName(
            osm.elements.filter(
                (col("osmtype") == 1) & element_at("tags", "highway").isNotNull()
            ).select("osmid", "osmtype", "tags", "refs", "members")
        )
    )
    n_expected = elements.count()
    t0 = time.time()
    n_shards = OSM(elements, surv_nodes).to_pbf(out_dir)
    t_enc = time.time() - t0
    from osmdatapy_spark.sources.pbf import read_pbf

    t0 = time.time()
    n_back = read_pbf(spark, out_dir).count()
    t_scan = time.time() - t0
    print(
        f"{'pbf write-back (' + str(n_expected) + ' el)':28s} encode {t_enc:5.1f}s "
        f"({n_expected / max(t_enc, 1e-9):,.0f} el/s, {n_shards} shards)  "
        f"re-scan {t_scan:5.1f}s"
    )
    assert n_back == n_expected, f"write-back lost elements: {n_back} != {n_expected}"


if __name__ == "__main__":
    main()
