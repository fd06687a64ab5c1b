"""Physical-plan auditing: make ``.explain`` assertions testable.

The 100 TB discipline is that every operator's plan is *inspected*, not
assumed: filters reached the scan, projections pruned the schema, no
surprise extra exchange, Python only where intended.  This module parses
``df.explain("formatted")`` output into a summary dict so tests (and the
bench) can assert plan shape, the way the reference relies on its
hand-built block pruning (``osmquery.py:242-257``) — except here the
assertions run in CI.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    n_exchanges: int = 0  # shuffle boundaries
    n_roundrobin: int = 0  # round-robin repartitions (tables.spread — local-only)
    n_broadcasts: int = 0  # broadcast exchanges (not counted as shuffles)
    n_scans: int = 0
    n_codegen_stages: int = 0
    n_python_evals: int = 0  # BatchEvalPython / ArrowEvalPython / FlatMap*
    # kernels inside InMemoryRelation build plans (run once to fill the
    # cache, not per read) — kept separate so containment checks can still
    # see that a declared kernel exists somewhere in the lineage
    n_python_evals_cached: int = 0
    n_sorts: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    text: str = ""


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """The string ``df.explain(mode)`` prints, without the print."""
    jvm = df.sparkSession._jvm
    jmode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def _cached_subtree_ids(text: str) -> set[int]:
    """Node ids living INSIDE an ``InMemoryRelation`` — the stored build
    plan of a persisted DataFrame.  ``explain`` prints (and numbers) that
    subtree, but it never re-executes on a warm cache, so shape pins must
    not count its exchanges/scans/kernels as the query's own work."""
    tree = text.split("\n\n", 1)[0]
    excluded: set[int] = set()
    skip_indent: int | None = None
    for line in tree.splitlines():
        nm = re.search(r"([A-Za-z][\w .]*?)\s*\((\d+)\)\s*$", line)
        if not nm:
            continue
        indent = nm.start(1)
        name, nid = nm.group(1), int(nm.group(2))
        if skip_indent is not None:
            if indent > skip_indent:
                excluded.add(nid)
                continue
            skip_indent = None
        if name.startswith("InMemoryRelation"):
            excluded.add(nid)
            skip_indent = indent
    return excluded


def _top_bracket_groups(s: str) -> list[str]:
    """Split ``Arguments: [a], [b, [c]], [d]`` into top-level groups."""
    groups: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def global_ordered_windows(text: str) -> list[str]:
    """Order specs of ``Window`` nodes that have an ORDER BY but no
    PARTITION BY — the shape ``WindowExec`` warns about with ``No
    Partition Defined`` and funnels the whole input through ONE task.

    In formatted-explain output a Window node's ``Arguments:`` line has
    three top-level bracket groups ``[exprs], [partition], [order]``
    when partitioned, but only two ``[exprs], [order]`` when global;
    a partitioned-but-unordered window also prints two groups, so the
    second group must contain ASC/DESC sort directions to count.
    Cached (InMemoryRelation) subtrees are included: the cache fill
    still executes the window once, single-partition."""
    out: list[str] = []
    lines = text.splitlines()
    for i, line in enumerate(lines):
        if not re.match(r"\(\d+\)\s+Window\s*$", line.strip()):
            continue
        for j in range(i + 1, min(i + 8, len(lines))):
            if lines[j].strip().startswith("Arguments:"):
                groups = _top_bracket_groups(lines[j])
                if len(groups) == 2 and re.search(r"\b(ASC|DESC)\b", groups[1]):
                    out.append(groups[1])
                break
    return out


def nested_loop_joins(text: str) -> list[str]:
    """Node names of joins with NO equi-key: ``CartesianProduct`` (both
    sides shuffled-and-looped — the O(n·m) shape that can never survive a
    scale-up) and ``BroadcastNestedLoopJoin`` (one side broadcast — fine
    exactly when that side is a bounded scalar/ledger, e.g. the suite's
    audited 1-row-aggregate ``crossJoin`` sites, and an anti-pattern
    otherwise).  Returned so a lint can forbid the former outright and
    allow-list the latter per query.  Cached (InMemoryRelation) subtrees
    are included: the cache fill still executes the join once."""
    out: list[str] = []
    for line in text.splitlines():
        m = re.match(r"\(\d+\)\s+(CartesianProduct|BroadcastNestedLoopJoin)\b", line.strip())
        if m:
            out.append(m.group(1))
    return out


def plan_summary(df: DataFrame) -> PlanSummary:
    """Parse the formatted physical plan into countable facts."""
    text = explain_text(df)
    s = PlanSummary(text=text)
    cached_ids = _cached_subtree_ids(text)
    cur_id: int | None = None
    for line in text.splitlines():
        name = line.strip()
        # node lines look like "(3) Exchange" or "(12) Scan parquet ..."
        m = re.match(r"\((\d+)\)\s+(\S+.*)", name)
        if m:
            cur_id = int(m.group(1))
            if cur_id in cached_ids and m.group(2).startswith(
                ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
                 "MapInPandas", "FlatMapGroupsInArrow")
            ):
                s.n_python_evals_cached += 1
        if m and cur_id not in cached_ids:
            node = m.group(2)
            if node.startswith("BroadcastExchange"):
                s.n_broadcasts += 1
            elif node.startswith("Exchange"):
                s.n_exchanges += 1
            elif node.startswith(("Scan", "BatchScan")):
                s.n_scans += 1
            elif node.startswith(("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas", "FlatMapGroupsInArrow")):
                s.n_python_evals += 1
            elif node.startswith("Sort"):
                s.n_sorts += 1
        if cur_id in cached_ids:
            continue
        pm = re.search(r"PushedFilters: \[(.*?)\]", line)
        if pm and pm.group(1):
            s.pushed_filters.append(pm.group(1))
        rm = re.search(r"ReadSchema: (.*)", line)
        if rm:
            s.read_schemas.append(rm.group(1).strip())
    # round-robin exchanges come only from deliberate repartition() calls
    # (tables.spread — a small-file parallelism affordance that never fires
    # at real scale, see its docstring); shape pins count DATA shuffles, so
    # these are tracked separately and excluded by assert_plan
    s.n_roundrobin = len(re.findall(r"roundrobinpartitioning", text, re.IGNORECASE))
    s.n_exchanges -= min(s.n_roundrobin, s.n_exchanges)
    # whole-stage codegen spans show as "*(n)" in simple mode only
    simple = explain_text(df, "simple")
    s.n_codegen_stages = len(set(re.findall(r"\*\((\d+)\)", simple)))
    return s


def assert_plan(
    df: DataFrame,
    max_exchanges: int | None = None,
    min_broadcasts: int | None = None,
    require_pushed_filter: str | None = None,
    require_pruned_columns: list[str] | None = None,
    forbid_python: bool = False,
) -> PlanSummary:
    """Assert structural properties of a physical plan; returns the summary
    so callers can make further checks.  Raises AssertionError with the
    offending plan text."""
    s = plan_summary(df)
    if max_exchanges is not None and s.n_exchanges > max_exchanges:
        raise AssertionError(
            f"plan has {s.n_exchanges} shuffles (max {max_exchanges}):\n{s.text}"
        )
    if min_broadcasts is not None and s.n_broadcasts < min_broadcasts:
        raise AssertionError(
            f"plan has {s.n_broadcasts} broadcasts (min {min_broadcasts}):\n{s.text}"
        )
    if require_pushed_filter is not None and not any(
        require_pushed_filter in f for f in s.pushed_filters
    ):
        raise AssertionError(
            f"no pushed filter matching {require_pushed_filter!r} "
            f"(pushed: {s.pushed_filters}):\n{s.text}"
        )
    if require_pruned_columns is not None:
        for schema in s.read_schemas:
            read_cols = set(re.findall(r"(\w+):", schema))
            extra = read_cols - set(require_pruned_columns)
            if extra:
                raise AssertionError(
                    f"scan reads unpruned columns {sorted(extra)} "
                    f"(allowed {require_pruned_columns}):\n{s.text}"
                )
    if forbid_python and s.n_python_evals > 0:
        raise AssertionError(f"plan contains Python evaluation nodes:\n{s.text}")
    return s
