"""Topology segmentation (reference G10 ``relation_topology``,
``osmdatapy/_frame.py:267-296``) as a pure window/join pipeline.

Semantics (reference README.md:25): ways are split at *shared* nodes —
nodes appearing more than once across the queried ways' member lists —
producing one row per segment with ``source``/``target`` end-node columns;
shared interior nodes belong to both adjacent segments (the reference
duplicates those rows via ``np.insert``).

Spark-first reformulation — instead of materializing duplicated node rows
then renumbering (reference O4 + W2), observe that a segment is exactly a
pair of *consecutive boundary nodes* within a way, where a boundary is the
way's first node, its last node, or a shared node.  That turns the whole
pipeline into:

    shared-count window (W3) → boundary filter → lead() pairing (W1)

i.e., two shuffles (one by node_id for the shared count, one by way_id for
the pairing) over a dataset already reduced to boundary rows.  At 100 TB
the node_id shuffle is the big one; it is a plain hash partition on a
high-cardinality key, and AQE handles the skew from mega-junction nodes.

Input is the exploded membership form ``(way_id, pos, node_id)`` —
``posexplode(refs)`` away from the array form, no window needed for pos.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def way_endpoints(way_refs: DataFrame, id_col: str = "way_id", pos_col: str = "pos", node_col: str = "node_id") -> DataFrame:
    """Per-way first/last node (reference A1 ``end_values``,
    _frame.py:298-303).  Returns (way_id, source, target, n_nodes).

    Single partial-aggregated shuffle: ``min_by``/``max_by`` on position
    fold map-side, so only one (way_id → 3 longs) row per way crosses the
    exchange.  (The window-first/last + distinct formulation costs TWO
    exchanges carrying full member rows — measured, see PLANS.md.)"""
    return way_refs.groupBy(id_col).agg(
        F.min_by(node_col, pos_col).alias("source"),
        F.max_by(node_col, pos_col).alias("target"),
        F.count("*").alias("n_nodes"),
    )


def topology_segments(
    way_refs: DataFrame,
    id_col: str = "way_id",
    pos_col: str = "pos",
    node_col: str = "node_id",
) -> DataFrame:
    """Split ways at shared nodes → one row per segment.

    Returns ``(way_id, seg, source, target, n_nodes)`` where ``seg`` is the
    0-based segment index within the way and ``n_nodes`` the member-node
    count of the segment (both endpoints inclusive).

    Reference parity: identical to ``relation_topology``'s
    ``(row, ix, source, target)`` output with the row-duplication step
    folded away (_frame.py:277-296).
    """
    # shared = node_id occurs >1 times across the whole membership set
    # (reference `res.ptid.duplicated(keep=False)`, _frame.py:277)
    w_node = Window.partitionBy(node_col)
    w_way = Window.partitionBy(id_col).orderBy(pos_col)

    # STAGED so the plan has exactly two exchanges: the node-count window
    # runs in its own select (exchange by node_id), THEN everything keyed
    # by way comes as one chain — is_first/is_last from the ascending sort
    # (lead-null marks the last row; no second descending sort), boundary
    # filter, and the pairing window, all reusing ONE exchange+sort by
    # (way_id, pos).  Mixing the node window into the way-keyed select
    # makes Catalyst evaluate the way windows first and re-exchange by
    # way_id after the node count — a third shuffle for nothing
    # (observed; tests/test_plans.py pins the 2-exchange shape).
    shared = way_refs.select(
        col(id_col),
        col(pos_col),
        col(node_col),
        (F.count("*").over(w_node) > 1).alias("is_shared"),
    )

    boundaries = shared.select(
        "*",
        (
            col("is_shared")
            | (F.row_number().over(w_way) == 1)
            | F.lead(pos_col).over(w_way).isNull()
        ).alias("is_boundary"),
    ).filter(col("is_boundary"))

    seg = (
        boundaries.select(
            col(id_col),
            (F.row_number().over(w_way) - 1).alias("seg"),
            col(node_col).alias("source"),
            F.lead(node_col).over(w_way).alias("target"),
            (F.lead(pos_col).over(w_way) - col(pos_col) + 1).alias("n_nodes"),
        )
        .filter(col("target").isNotNull())
    )
    return seg


def attach_coords(way_refs: DataFrame, nodes: DataFrame, node_col: str = "node_id") -> DataFrame:
    """Coordinate lookup join (reference J4 ``coords``, osmdata.py:81-84).

    The reference does np.searchsorted on a driver-resident sorted array;
    here it is an equi-join against the nodes table — broadcast when the
    node table fits, sort-merge on bucketed osmid otherwise."""
    return way_refs.join(
        nodes.select(col("osmid").alias(node_col), "lon", "lat"), on=node_col, how="left"
    )
