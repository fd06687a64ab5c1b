"""Ring assembly: endpoint chaining of relation member ways into rings
(reference G6 ``_reorder_ring``, ``osmdatapy/_frame.py:181-215``).

This is the one genuinely sequential-per-group algorithm in the reference
(SURVEY.md §7 "what's hard" #1): ways of a multipolygon relation must be
chained end-to-end, flipping direction when a way is stored reversed, and
a new ring starts whenever the chain breaks.  Group sizes are small
(a relation's member count), so the Spark shape is
``groupBy(rel_id).applyInPandas`` — Arrow-batched, parallel across
relations, sequential only within one relation.  At 100 TB this scales
linearly: the shuffle key (rel_id) is high-cardinality and the per-group
work is O(n²) worst-case on n = ways-per-relation (bounded, typically <1k).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RING_SCHEMA = (
    "rel_id long, way_id long, pos int, direction int, ring int"
)


def _reorder_one(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy endpoint chaining, reference semantics (_frame.py:181-215):

    start from the first way (input order), walk from its target node; at
    each step take the first untraversed way whose source matches the open
    node (forward, direction=1), else whose target matches (reversed,
    direction=-1), else start a new ring at the next untraversed way.
    Deterministic given input order (member position within the relation).
    """
    pdf = pdf.sort_values("member_pos", kind="stable").reset_index(drop=True)
    n = len(pdf)
    s = pdf["source"].to_numpy()
    t = pdf["target"].to_numpy()
    trav = [False] * n
    pos = [0] * n
    direction = [1] * n
    ring = [0] * n

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
        trav[nxt] = True
        pos[nxt] = step
        ring[nxt] = cur_ring

    return pd.DataFrame(
        {
            "rel_id": pdf["rel_id"],
            "way_id": pdf["way_id"],
            "pos": pd.array(pos, dtype="int32"),
            "direction": pd.array(direction, dtype="int32"),
            "ring": pd.array(ring, dtype="int32"),
        }
    )


def reorder_rings(members: DataFrame) -> DataFrame:
    """Chain each relation's member ways into ordered rings.

    Input: ``(rel_id, way_id, member_pos, source, target)`` — one row per
    member way with its endpoint node ids (from
    ``topology.way_endpoints``).  Output adds ``pos`` (order in ring),
    ``direction`` (1 forward / -1 reversed), ``ring`` (0-based ring index
    within the relation).
    """
    return (
        members.select("rel_id", "way_id", "member_pos", "source", "target")
        .groupBy("rel_id")
        .applyInPandas(_reorder_one, schema=RING_SCHEMA)
    )


def ring_node_sequence(ordered: DataFrame, way_refs: DataFrame) -> DataFrame:
    """Expand chained rings to ordered node lists (reference
    _frame.py:152-171): join member ways to their refs, reverse refs where
    direction=-1, drop the duplicated joint node between consecutive ways,
    close the ring if needed.

    Returns ``(rel_id, ring, nodes ARRAY<LONG>)`` — array-native, no
    per-node shuffle: the refs arrays ride along the rel_id shuffle.
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
            ).alias("nodes")
        )
    )
    # close rings (reference G7 _close_rings, _frame.py:217-232)
    return seq.withColumn(
        "nodes",
        F.when(
            F.element_at("nodes", 1) != F.element_at("nodes", -1),
            F.concat(F.col("nodes"), F.array(F.element_at("nodes", 1))),
        ).otherwise(F.col("nodes")),
    )
