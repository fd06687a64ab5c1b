"""Ring assembly: endpoint chaining of relation member ways into rings
(reference G6 ``_reorder_ring``, ``osmdatapy/_frame.py:181-215``).

This is the one genuinely sequential-per-group algorithm in the reference
(SURVEY.md §7 "what's hard" #1): ways of a multipolygon relation must be
chained end-to-end, flipping direction when a way is stored reversed, and
a new ring starts whenever the chain breaks.  Group sizes are small
(a relation's member count), so the Spark shape is a JVM-side
``groupBy(rel_id).agg(collect_list(...))`` — one partial-aggregated
exchange carrying the member arrays through Arrow — followed by ONE
``mapInPandas`` kernel that chains thousands of relations per Arrow
batch (``groupBy().applyInPandas`` was measured at ~4-5 ms of per-GROUP
plumbing; at one group per relation that dominated the pipeline).  At
100 TB this scales linearly: the shuffle key (rel_id) is
high-cardinality and the per-relation work is O(n²) worst-case on
n = ways-per-relation (bounded, typically <1k).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RING_SCHEMA = (
    "rel_id long, way_id long, pos int, direction int, ring int, "
    "ring_role string, kind string"
)


def _chain(s, t, roles):
    """Greedy endpoint chaining, reference semantics (_frame.py:181-215):

    start from the first way (input order), walk from its target node; at
    each step take the first untraversed way whose source matches the open
    node (forward, direction=1), else whose target matches (reversed,
    direction=-1), else start a new ring at the next untraversed way.
    Deterministic given input order (member position within the relation).

    Returns (pos, direction, ring, ring_roles): per-member chain position,
    orientation, 0-based ring index, and per-ring starting-member role.
    """
    n = len(s)
    trav = [False] * n
    pos = [0] * n
    direction = [1] * n
    ring = [0] * n
    ring_roles = [roles[0] if n else None]
    if not n:
        return pos, direction, ring, ring_roles

    trav[0] = True
    node = t[0]
    cur_ring = 0
    for step in range(1, n):
        nxt = next((i for i in range(n) if not trav[i] and s[i] == node), None)
        if nxt is not None:
            node = t[nxt]
        else:
            nxt = next((i for i in range(n) if not trav[i] and t[i] == node), None)
            if nxt is not None:
                node = s[nxt]
                direction[nxt] = -1
            else:
                nxt = next(i for i in range(n) if not trav[i])
                node = t[nxt]
                cur_ring += 1
                ring_roles.append(roles[nxt])
        trav[nxt] = True
        pos[nxt] = step
        ring[nxt] = cur_ring
    return pos, direction, ring, ring_roles


def _member_meta(pdf: pd.DataFrame):
    n = len(pdf)
    roles = list(pdf["role"]) if "role" in pdf.columns else [None] * n
    kind = pdf["kind"].iloc[0] if "kind" in pdf.columns and n else None
    return roles, kind


def _reorder_one(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-relation chaining kernel over endpoint columns (see ``_chain``).

    ``ring_role`` = the member role of the way each ring *started* at
    (reference splits outer/inner by member role, _frame.py:115-136) —
    carried through here so downstream never re-joins members to recover
    it (one whole join + groupBy saved in the area pipeline).
    """
    pdf = pdf.sort_values("member_pos", kind="stable").reset_index(drop=True)
    n = len(pdf)
    roles, kind = _member_meta(pdf)
    pos, direction, ring, ring_roles = _chain(
        pdf["source"].to_numpy(), pdf["target"].to_numpy(), roles
    )
    return pd.DataFrame(
        {
            "rel_id": pdf["rel_id"],
            "way_id": pdf["way_id"],
            "pos": pd.array(pos, dtype="int32"),
            "direction": pd.array(direction, dtype="int32"),
            "ring": pd.array(ring, dtype="int32"),
            "ring_role": [ring_roles[r] for r in ring],
            "kind": [kind] * n,
        }
    )


CHAIN_SCHEMA = "rel_id long, ring int, nodes array<bigint>, ring_role string, kind string"


def _chain_rel(rel_id, ms, kind):
    """Chain + sequence ONE relation from its collected member structs
    (sorted by member_pos) — the per-relation core of ``ring_chains``,
    shared with the batched kernel.  Returns column lists."""
    ms = sorted(ms, key=lambda m: m["member_pos"])
    refs = [list(m["refs"]) if m["refs"] is not None else [] for m in ms]
    roles = [m["role"] if "role" in m else None for m in ms]
    s = [r[0] if r else None for r in refs]
    t = [r[-1] if r else None for r in refs]
    pos, direction, ring, ring_roles = _chain(s, t, roles)
    order = sorted(range(len(ms)), key=lambda i: pos[i])
    seqs: dict[int, list] = {}
    for i in order:
        nodes = refs[i][::-1] if direction[i] == -1 else refs[i]
        r = ring[i]
        if r in seqs:
            seqs[r].extend(nodes[1:])
        else:
            seqs[r] = list(nodes)
    rings = sorted(seqs)
    return (
        [rel_id] * len(rings),
        rings,
        [seqs[r] for r in rings],
        [ring_roles[r] for r in rings],
        [kind] * len(rings),
    )


def ring_chains(members: DataFrame) -> DataFrame:
    """Chain member ways into rings AND expand to ordered node sequences
    (the fused form of ``reorder_rings`` + ``ring_node_sequence`` — same
    semantics, pinned by tests/test_operators.py parity test).

    Input: ``(rel_id, way_id, member_pos, refs ARRAY<LONG>[, role, kind])``.
    Output: ``(rel_id, ring, nodes ARRAY<LONG>, ring_role, kind)`` with
    OPEN node sequences (area callers close via ``close_rings``).

    Scale: ONE shuffle by rel_id (a JVM-side collect_list aggregation —
    partial-aggregated, refs ride the exchange through Arrow), then ONE
    ``mapInPandas`` kernel that chains THOUSANDS of relations per Arrow
    batch.  The round-7 profiling found the previous
    ``groupBy().applyInPandas`` shape paid ~4-5 ms of per-GROUP
    pandas/serialization overhead — at one group per relation that was
    ~40 s per 10k relations of pure plumbing; batching drops it to a
    per-row Python loop (~0.1 ms/relation).  Per-relation payload is the
    relation's total member nodes — bounded by real-world relation sizes.
    """
    has_role = "role" in members.columns
    has_kind = "kind" in members.columns
    m_struct = F.struct(
        F.col("member_pos"),
        F.col("refs"),
        *([F.col("role")] if has_role else []),
    )
    agg = members.groupBy("rel_id").agg(
        F.collect_list(m_struct).alias("ms"),
        *([F.min("kind").alias("kind")] if has_kind else []),
    )

    def batch(batches):
        for pdf in batches:
            rel_l, ring_l, nodes_l, role_l, kind_l = [], [], [], [], []
            kinds = pdf["kind"] if "kind" in pdf.columns else [None] * len(pdf)
            for rel_id, ms, kind in zip(pdf["rel_id"], pdf["ms"], kinds):
                a, b, c, d, e = _chain_rel(rel_id, ms, kind)
                rel_l += a
                ring_l += b
                nodes_l += c
                role_l += d
                kind_l += e
            yield pd.DataFrame(
                {
                    "rel_id": pd.array(rel_l, dtype="int64"),
                    "ring": pd.array(ring_l, dtype="int32"),
                    "nodes": nodes_l,
                    "ring_role": role_l,
                    "kind": kind_l,
                }
            )

    return agg.mapInPandas(batch, schema=CHAIN_SCHEMA)


ASSIGN_SCHEMA = (
    "rel_id long, ring int, role string, poly int, "
    "coords array<struct<lon:double,lat:double>>"
)


def _point_in_ring_py(coords, px: float, py: float) -> bool:
    """Even-odd containment, the exact Python twin of
    ``measures.ray_cast_crossings`` (same division-free IEEE ops on
    float64 — bit-identical verdicts): odd crossings ⇒ inside."""
    closed = list(coords) + [coords[0]]
    cnt = 0
    for a, b in zip(closed[:-1], closed[1:]):
        ax, ay = a["lon"], a["lat"]
        bx, by = b["lon"], b["lat"]
        if (ay > py) != (by > py):
            lhs = (px - ax) * (by - ay)
            rhs = (bx - ax) * (py - ay)
            if (lhs < rhs) if by > ay else (lhs > rhs):
                cnt += 1
    return cnt % 2 == 1


def _assign_rel(rings):
    """Polygon-index assignment for ONE relation's rings — the G8/G9 +
    containment-nesting core shared by the batched kernel.

    ``rings``: list of (ring, role-or-None, coords) sorted by ring.
    Returns rows (ring, role, poly, coords).

    Simple relations (≤1 inner OR ≤1 outer): the reference's positional
    G9 — poly = running count of outer rings (ring order) − 1.  Complex
    relations (>1 inner AND >1 outer, which the reference G8-drops,
    _frame.py:234-244): each inner attaches to the outer ring containing
    its first vertex (bbox gate + even-odd ray cast), choosing the
    smallest containing outer (tie → lowest ring id); uncontained inners
    drop — the reference fallback for truly broken relations.  Ring
    counts are bounded per OSM entity, so per-relation work is O(rings²)
    worst case on tiny n — the same scale contract as the chain kernel."""
    roles = [r if r is not None else "outer" for _, r, _ in rings]
    is_inner = [r == "inner" for r in roles]
    n_in = sum(is_inner)
    n_out = len(roles) - n_in
    rows = []  # (ring, role, poly, coords)
    if n_in > 1 and n_out > 1:
        outers = []  # (ring, poly, coords, |area|, bbox)
        poly = 0
        for i, (ring, _, cs) in enumerate(rings):
            if is_inner[i]:
                continue
            xs = [c["lon"] for c in cs]
            ys = [c["lat"] for c in cs]
            area = abs(
                sum(
                    cs[j]["lon"] * cs[(j + 1) % len(cs)]["lat"]
                    - cs[(j + 1) % len(cs)]["lon"] * cs[j]["lat"]
                    for j in range(len(cs))
                )
                / 2.0
            )
            outers.append((ring, poly, cs, area, (min(xs), max(xs), min(ys), max(ys))))
            rows.append((ring, "outer", poly, cs))
            poly += 1
        for i, (ring, _, cs) in enumerate(rings):
            if not is_inner[i]:
                continue
            px, py = cs[0]["lon"], cs[0]["lat"]
            best = None  # (|area|, ring, poly)
            for oring, pl, ocs, area, (x0, x1, y0, y1) in outers:
                if x0 <= px <= x1 and y0 <= py <= y1 and _point_in_ring_py(ocs, px, py):
                    k = (area, oring, pl)
                    if best is None or k < best:
                        best = k
            if best is not None:
                rows.append((ring, "inner", best[2], cs))
    else:
        run = 0
        for i, (ring, _, cs) in enumerate(rings):
            if not is_inner[i]:
                run += 1
            rows.append((ring, "inner" if is_inner[i] else "outer", run - 1, cs))
    return rows


def assign_polygons(ring_coords: DataFrame) -> DataFrame:
    """Classify closed rings into polygons per relation (G8/G9 +
    containment nesting).

    Input: ``(rel_id, ring, ring_role, coords ARRAY<STRUCT<lon,lat>>)``
    (extra columns ignored).  Output: ``(rel_id, ring, role, poly,
    coords)`` — poly is the 0-based polygon index within the relation;
    dropped inner rings (reference-G8 fallback) are absent.

    Scale: ONE shuffle by rel_id (JVM-side collect_list aggregation —
    coordinate arrays ride the exchange through Arrow), then ONE
    ``mapInPandas`` kernel classifying thousands of relations per Arrow
    batch (the batched shape of ``ring_chains`` — per-GROUP
    applyInPandas overhead was ~4-5 ms/relation of pure plumbing);
    downstream polygon/WKT groupBys reuse the rel_id partitioning
    (subset rule) — zero further exchanges."""
    agg = (
        ring_coords.select("rel_id", "ring", "ring_role", "coords")
        .groupBy("rel_id")
        .agg(F.collect_list(F.struct("ring", "ring_role", "coords")).alias("rs"))
    )

    def batch(batches):
        for pdf in batches:
            rel_l, ring_l, role_l, poly_l, coords_l = [], [], [], [], []
            for rel_id, rs in zip(pdf["rel_id"], pdf["rs"]):
                rings = sorted(
                    ((r["ring"], r["ring_role"], r["coords"]) for r in rs),
                    key=lambda x: x[0],
                )
                for ring, role, poly, cs in _assign_rel(rings):
                    rel_l.append(rel_id)
                    ring_l.append(ring)
                    role_l.append(role)
                    poly_l.append(poly)
                    coords_l.append(cs)
            yield pd.DataFrame(
                {
                    "rel_id": pd.array(rel_l, dtype="int64"),
                    "ring": pd.array(ring_l, dtype="int32"),
                    "role": role_l,
                    "poly": pd.array(poly_l, dtype="int32"),
                    "coords": coords_l,
                }
            )

    return agg.mapInPandas(batch, schema=ASSIGN_SCHEMA)


def reorder_rings(members: DataFrame) -> DataFrame:
    """Chain each relation's member ways into ordered rings.

    Input: ``(rel_id, way_id, member_pos, source, target[, role])`` — one
    row per member way with its endpoint node ids (from
    ``topology.way_endpoints``).  Output adds ``pos`` (order in ring),
    ``direction`` (1 forward / -1 reversed), ``ring`` (0-based ring index
    within the relation), ``ring_role`` (role of the ring's first member).
    """
    cols = ["rel_id", "way_id", "member_pos", "source", "target"]
    cols += [c for c in ("role", "kind") if c in members.columns]
    return (
        members.select(*cols)
        .groupBy("rel_id")
        .applyInPandas(_reorder_one, schema=RING_SCHEMA)
    )


def ring_node_sequence(ordered: DataFrame, way_refs: DataFrame, close: bool = True) -> DataFrame:
    """Expand chained rings to ordered node lists (reference
    _frame.py:152-171): join member ways to their refs, reverse refs where
    direction=-1, drop the duplicated joint node between consecutive ways,
    close the ring if needed (``close=False`` keeps open chains — the
    route/linestring branch, reference _frame.py:87-105).

    Returns ``(rel_id, ring, nodes ARRAY<LONG>, ring_role)`` —
    array-native, no per-node shuffle: the refs arrays ride along the
    rel_id shuffle.
    """
    refs = way_refs.groupBy(F.col("way_id")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos").alias("p"), F.col("node_id").alias("n")))
        ).alias("pn")
    ).select("way_id", F.col("pn.n").alias("refs"))

    j = ordered.join(refs, "way_id")
    oriented = j.withColumn(
        "oriented", F.when(F.col("direction") == -1, F.reverse(F.col("refs"))).otherwise(F.col("refs"))
    )
    # drop each way's first node except for the ring's first way: consecutive
    # ways share the joint node (reference dedup at _frame.py:162-163)
    w_ring = Window.partitionBy("rel_id", "ring")
    trimmed = oriented.withColumn(
        "part",
        F.when(F.col("pos") == F.min("pos").over(w_ring), F.col("oriented")).otherwise(
            F.slice(F.col("oriented"), 2, F.greatest(F.size(F.col("oriented")) - 1, F.lit(0)))
        ),
    )
    seq = (
        trimmed.groupBy("rel_id", "ring")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("part")))),
                    lambda st: st["part"],
                )
            ).alias("nodes"),
            # all rows of a ring carry the same ring_role/kind — min() picks
            # them without another join (see _reorder_one)
            F.min("ring_role").alias("ring_role"),
            F.min("kind").alias("kind"),
        )
    )
    if not close:
        return seq
    # close rings (reference G7 _close_rings, _frame.py:217-232)
    return seq.withColumn(
        "nodes",
        F.when(
            F.element_at("nodes", 1) != F.element_at("nodes", -1),
            F.concat(F.col("nodes"), F.array(F.element_at("nodes", 1))),
        ).otherwise(F.col("nodes")),
    )
