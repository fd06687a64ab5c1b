"""Curate facade: the Query-style composable curation pipeline
(curate.py).  Semantics of the end-to-end default recipe are pinned by
the llm_curation_recipe oracle; these tests pin the facade mechanics —
step composition, keeper determinism, optional steps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from osmdatapy_spark.curate import Curate


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # two exact dups after whitespace normalize (ids 1, 2) + distinct 3
        (1, "the   quick brown fox jumps over one lazy dog while seventeen green "
            "turtles carry twelve purple boxes across nine frozen rivers toward "
            "distant mountains under cloudy autumn skies every single morning", "en", "a"),
        (2, "the quick brown fox jumps over one lazy dog while seventeen green "
            "turtles carry twelve purple boxes across nine frozen rivers toward "
            "distant mountains under cloudy autumn skies every single morning", "en", "a"),
        (3, "a completely different document about spark catalyst plans and shuffles " * 3, "en", "b"),
        # near-dup of 3 (one token changed) -> fuzzy drop (id 4 > 3)
        (4, "a completely different document about spark tungsten plans and shuffles " * 3, "en", "b"),
        # too short -> quality drop
        (5, "tiny doc", "en", "b"),
        # degenerate repetition -> diversity drop
        (6, "spam " * 50, "en", "c"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_default_recipe_end_to_end(corpus):
    cur = Curate.default_recipe(corpus, domain_col="source", cap=10)
    got = sorted(r["doc_id"] for r in cur.df().select("doc_id").collect())
    # 1 survives exact (min id), 3 survives fuzzy (min id), 5/6 fail quality
    assert got == [1, 3], got
    assert cur.steps == [
        "normalize", "exact_dedup", "fuzzy_dedup", "quality_filter", "domain_cap",
    ]


def test_steps_compose_independently(corpus):
    # exact only: normalize collapses 1/2 into one fingerprint
    got = sorted(
        r["doc_id"]
        for r in Curate(corpus).normalize().exact_dedup().df().select("doc_id").collect()
    )
    assert got == [1, 3, 4, 5, 6], got
    # quality only: 5 (short) and 6 (low diversity) drop, dups stay
    got = sorted(
        r["doc_id"] for r in Curate(corpus).quality_filter().df().select("doc_id").collect()
    )
    assert got == [1, 2, 3, 4], got


def test_domain_cap_keeps_smallest_ids(corpus):
    got = sorted(
        r["doc_id"]
        for r in Curate(corpus).domain_cap("source", 1).df().select("doc_id").collect()
    )
    # one per source: a->1, b->3, c->6
    assert got == [1, 3, 6], got


def test_paragraph_step_available(spark):
    # paragraphs are `block`-token word blocks; with block=3 the shared
    # leading block dedups to its first occurrence (doc 1)
    docs = spark.createDataFrame(
        [
            (1, "shared boilerplate header unique body one", "en", "a"),
            (2, "shared boilerplate header unique body two", "en", "a"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in Curate(docs).paragraph_dedup(block=3).df().select("doc_id", "text").collect()
    }
    assert "shared boilerplate header" in out[1]
    assert "shared boilerplate header" not in out[2]
    assert "unique body two" in out[2]


def test_fuzzy_dedup_minhash_method(corpus):
    """The LSH candidate generator must drop the same near-dup as the
    inverted-index one on this corpus (identical docs collide on every
    band, so recall is certain here)."""
    got_j = sorted(
        r["doc_id"]
        for r in Curate(corpus).normalize().exact_dedup()
        .fuzzy_dedup(method="jaccard").df().select("doc_id").collect()
    )
    got_m = sorted(
        r["doc_id"]
        for r in Curate(corpus).normalize().exact_dedup()
        .fuzzy_dedup(method="minhash").df().select("doc_id").collect()
    )
    assert got_j == got_m, (got_j, got_m)


def test_artifacts_save_load_roundtrip(tmp_path):
    from osmdatapy_spark.functions import artifacts

    artifacts.clear()
    key = ("/some/sf", "ivf_centroids", 8, 1)
    cents = [[0.125, -1.5], [2.25, 3.75]]
    artifacts.train_once(key, lambda: cents)
    p = str(tmp_path / "artifacts.json")
    artifacts.save(p)
    artifacts.clear()
    n = artifacts.load(p)
    assert n == 1
    # cache hit now — the trainer must NOT run (it would raise)
    got = artifacts.train_once(key, lambda: (_ for _ in ()).throw(RuntimeError))
    assert got == cents
    artifacts.clear()


def test_fuzzy_dedup_frees_shingle_cache(spark, corpus):
    """Long-session hygiene (round-3 finding, r14 contract): the
    corpus-sized shingle-set cache is a managed persist — it stays live
    through the invocation that built it (the drop-set subtree reads it
    3x inside the final action) and is RELEASED when the next invocation
    registers its own, so repeated recipes never grow the session's
    cached-RDD set."""
    def persistent_ids():
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().keysIterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    before = persistent_ids()
    Curate(corpus).normalize().exact_dedup().fuzzy_dedup().df().count()
    after_first = persistent_ids() - before
    # at most the managed shingle cache remains registered
    assert len(after_first) <= 1, f"orphaned cached RDDs: {after_first}"
    Curate(corpus).normalize().exact_dedup().fuzzy_dedup().df().count()
    after_second = persistent_ids() - before
    # the second invocation REPLACED the first's cache — no growth
    assert len(after_second) <= len(after_first), (
        f"cached-RDD growth across invocations: {after_first} -> {after_second}"
    )


def test_substring_dedup_step_available(spark):
    """ExactSubstr removal as a facade step: the canonical (min doc_id,
    position) copy of a shared >=20-char span survives, the later copy
    is cut from its rewritten text, other columns survive, and the
    facade default (hash_keys=True) matches the raw-gram mode."""
    chunk = "0123456789abcdefghij"  # exactly 20 chars
    docs = spark.createDataFrame(
        [(1, "A" + chunk + "B", "a"), (2, "C" + chunk + "D", "b")],
        "doc_id long, text string, source string",
    )
    for hk in (True, False):
        out = {
            r.doc_id: (r.text, r.source)
            for r in Curate(docs).substring_dedup(hash_keys=hk).df().collect()
        }
        assert out[1] == ("A" + chunk + "B", "a")
        assert out[2] == ("CD", "b")
    cur = Curate(docs).substring_dedup()
    assert cur.steps == ["substring_dedup"]


def test_decontaminate_step_planted_contamination(spark):
    """Facade decontamination (round-12 verdict ask #6): a training doc
    that shares a verbatim 5-gram with the eval set drops; a doc whose
    overlap stays under max_fraction survives; clean docs and docs
    shorter than n pass through.  Eval rows are never in the output
    (the step is asymmetric by construction)."""
    leak = "the quick brown fox jumps"
    train = spark.createDataFrame(
        [
            # contaminated: carries the eval 5-gram verbatim (7 tokens ->
            # 3 distinct 5-grams, 1 hit = 33%)
            (1, "then " + leak + " here", "a"),
            # clean
            (2, "completely unrelated training document with its own words", "a"),
            # shorter than n=5 tokens: zero grams, must survive
            (3, "too short", "b"),
            # one leaked gram out of many: survives a fraction gate,
            # drops under any-hit
            (4, leak + " alpha beta gamma delta epsilon zeta eta theta "
                "iota kappa lambda mu nu xi omicron pi rho sigma tau", "b"),
        ],
        "doc_id long, text string, source string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "question: " + leak + " over what?")], "eval_id long, text string"
    )
    # any-hit drop (default max_fraction=0.0)
    got = sorted(
        r.doc_id
        for r in Curate(train).decontaminate(eval_docs, n=5).df().select("doc_id").collect()
    )
    assert got == [2, 3], got
    # fraction gate at 10%: doc 4 (24 tokens -> 20 grams, 1 hit = 5%)
    # survives; doc 1 (3 grams, 1 hit = 33%) still drops
    got = sorted(
        r.doc_id
        for r in Curate(train)
        .decontaminate(eval_docs, n=5, max_fraction=0.10)
        .df()
        .select("doc_id")
        .collect()
    )
    assert 4 in got and 2 in got and 3 in got
    assert 1 not in got  # 1/3 grams ≈ 33% > 10% ceiling
    # steps ledger records the stage
    cur = Curate(train).decontaminate(eval_docs, n=5)
    assert cur.steps == ["decontaminate"]


def test_jsonl_roundtrip_escaping(spark, tmp_path):
    """write_jsonl/read_jsonl must survive the strings JSON escaping is
    hardest on: newlines (the line-delimited format's own delimiter),
    quotes, backslashes, tabs, non-ASCII, and empty strings."""
    from osmdatapy_spark.sinks import read_jsonl, write_jsonl

    rows = [
        (1, 'line1\nline2\r\nline3'),
        (2, 'quote " backslash \\ slash /'),
        (3, 'tab\there é中文 \U0001f600'),
        (4, ''),
        (5, ' leading and trailing '),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "jsonl")
    write_jsonl(df, p, compression="gzip")
    back = read_jsonl(spark, p, "doc_id long, text string")
    got = {r.doc_id: r.text for r in back.collect()}
    assert got == dict(rows)
    # uncompressed shards read back identically too
    p2 = str(tmp_path / "jsonl_raw")
    write_jsonl(df, p2, compression=None)
    got2 = {r.doc_id: r.text for r in read_jsonl(spark, p2, "doc_id long, text string").collect()}
    assert got2 == dict(rows)
