"""Curation-operator kernels (functions/curation.py) against
hand-computable expectations: edit-distance blocking, substring
containment, boilerplate stripping, fixed-point TF-IDF, mixture
sampling."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from osmdatapy_spark.functions.curation import (
    containment_pairs,
    doc_chunks,
    edit_distance_pairs,
    mixture_sample,
    strip_boilerplate,
    tfidf_pairs,
)
from osmdatapy_spark.functions.text import shingle_sets, tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_edit_distance_pairs_finds_prefix_blocked_near_dups(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base),
        (2, base + " iota"),          # near-dup of 1, shared prefix
        (3, "totally different text here with other words entirely"),
        (4, "ALPHA beta gamma delta epsilon zeta eta theta"),  # case-folds to 1
    ]
    out = edit_distance_pairs(_docs(spark, rows), max_dist=10).collect()
    pairs = {(r.id_a, r.id_b): r.edit_dist for r in out}
    assert pairs[(1, 2)] == 5  # " iota"
    assert pairs[(1, 4)] == 0  # identical after lower()
    assert pairs[(2, 4)] == 5
    assert all(a < b for a, b in pairs)
    assert not any(3 in p for p in pairs)


def test_edit_distance_rel_dist_is_ratio(spark):
    rows = [(1, "aaaa bbbb cccc dddd"), (2, "aaaa bbbb cccc eeee")]
    out = edit_distance_pairs(_docs(spark, rows), prefix_len=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r.edit_dist == 4
    assert r.rel_dist == pytest.approx(4 / 19)


def test_containment_pairs_detects_substring(spark):
    inner = "one two three four five six seven eight nine ten"
    rows = [
        (1, "prefix words here " + inner + " suffix words here"),
        (2, inner),
        (3, "unrelated content that shares no shingles at all okay"),
    ]
    docs = _docs(spark, rows)
    shingled = shingle_sets(docs).select("doc_id", F.explode(col("s")).alias("s"))
    out = containment_pairs(shingled, docs).collect()
    assert [(r.contained_id, r.container_id) for r in out] == [(2, 1)]
    assert out[0].len_contained == len(inner)


def test_containment_equal_texts_tie_breaks_to_smaller_id(spark):
    t = "same exact text in both documents all ten tokens yes"
    docs = _docs(spark, [(7, t), (3, t)])
    shingled = shingle_sets(docs).select("doc_id", F.explode(col("s")).alias("s"))
    out = containment_pairs(shingled, docs).collect()
    assert [(r.contained_id, r.container_id) for r in out] == [(3, 7)]


def test_doc_chunks_partial_tail(spark):
    df = spark.range(1).select(
        doc_chunks(tokens(F.lit("a b c d e f g h i j k l")), 5).alias("c")
    )
    assert df.collect()[0].c == ["a b c d e", "f g h i j", "k l"]


def test_strip_boilerplate_drops_cross_doc_chunks(spark):
    # exactly 10 tokens so chunk 0 is identical across docs
    boiler10 = "shared header line tokens repeated across documents here now ok"
    rows = [(i, boiler10 + f" unique {w} content") for i, w in ((1, "one"), (2, "two"), (3, "three"))]
    out = {r.doc_id: r for r in strip_boilerplate(_docs(spark, rows), min_docs=3).collect()}
    assert all(out[i].n_chunks == 2 for i in (1, 2, 3))
    assert all(out[i].n_dropped == 1 for i in (1, 2, 3))
    exp = hashlib.md5(b"unique one content").hexdigest()
    assert out[1].clean_hash == exp


def test_strip_boilerplate_all_dropped_yields_empty_hash(spark):
    t = "ten token boilerplate chunk which is shared by everyone"
    rows = [(i, t) for i in range(1, 4)]
    out = strip_boilerplate(_docs(spark, rows), min_docs=3).collect()
    empty = hashlib.md5(b"").hexdigest()
    assert all(r.clean_hash == empty and r.n_dropped == 1 for r in out)


def test_tfidf_identical_docs_score_one(spark):
    # two identical docs + one unrelated: identical pair scores exactly 1.0
    t = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [(1, t), (2, t), (3, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10")]
    out = tfidf_pairs(_docs(spark, rows), min_sim=0.0).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    assert out[0].sim == pytest.approx(1.0, abs=1e-9)


def test_tfidf_partial_overlap_scores_below_one(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e zz yy xx"),
        (3, "q r s t u v w x"),
    ]
    out = tfidf_pairs(_docs(spark, rows), min_sim=0.0).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    assert 0.0 < out[0].sim < 1.0


def test_mixture_sample_rates_and_determinism(spark):
    rows = [(i, "lang_a" if i % 2 == 0 else "lang_b") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    targets = {"lang_a": 1000, "lang_b": 10}  # a: take all; b: ~10 of 100
    out1 = mixture_sample(docs, targets).collect()
    out2 = mixture_sample(docs, targets).collect()
    assert sorted(out1) == sorted(out2)  # deterministic
    by_lang = {}
    for r in out1:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert len(by_lang["lang_a"]) == 100  # capped at take-everything
    assert 0 < len(by_lang["lang_b"]) < 30  # ~10 expected, hash-thresholded


def test_mixture_sample_monotone_in_target(spark):
    rows = [(i, "x") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    small = {r.doc_id for r in mixture_sample(docs, {"x": 30}).collect()}
    large = {r.doc_id for r in mixture_sample(docs, {"x": 90}).collect()}
    assert small <= large  # threshold sampling is monotone in the target


# ---------------------------------------------------------------------------
# Paragraph-level dedup
# ---------------------------------------------------------------------------


def test_paragraph_dedup_drops_later_copies_and_reassembles(spark):
    from osmdatapy_spark.functions.curation import paragraph_dedup

    # block=2: doc1 = [ab, cd], doc2 = [cd(dup), ef], doc3 = [ab(dup), cd(dup)]
    rows = [
        (1, "a b c d"),
        (2, "c d e f"),
        (3, "a b c d"),
    ]
    out = {
        r.doc_id: r
        for r in paragraph_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"), block=2
        ).collect()
    }
    assert (out[1].n_paras, out[1].n_kept, out[1].dedup_text) == (2, 2, "a b c d")
    assert (out[2].n_paras, out[2].n_kept, out[2].dedup_text) == (2, 1, "e f")
    assert (out[3].n_paras, out[3].n_kept, out[3].dedup_text) == (2, 0, "")


def test_paragraph_dedup_partial_final_block(spark):
    from osmdatapy_spark.functions.curation import paragraph_dedup

    rows = [(1, "a b c")]  # block=2 -> ["a b", "c"]
    (r,) = paragraph_dedup(
        spark.createDataFrame(rows, "doc_id long, text string"), block=2
    ).collect()
    assert (r.n_paras, r.n_kept, r.dedup_text) == (2, 2, "a b c")


def test_paragraph_dedup_first_occurrence_is_total_order(spark):
    from osmdatapy_spark.functions.curation import paragraph_dedup

    # same paragraph twice INSIDE one doc: position breaks the tie
    rows = [(5, "x y x y")]
    (r,) = paragraph_dedup(
        spark.createDataFrame(rows, "doc_id long, text string"), block=2
    ).collect()
    assert (r.n_paras, r.n_kept, r.dedup_text) == (2, 1, "x y")


# ---------------------------------------------------------------------------
# Bigram LM scoring
# ---------------------------------------------------------------------------


def test_bigram_lm_score_hand_computed(spark):
    import math

    from osmdatapy_spark.functions.curation import bigram_lm_scores

    # corpus: "a b a b" and "a b"; V = {a, b} = 2
    # C(a,b)=3, C(b,a)=1; C(a·)=3, C(b·)=1
    rows = [(1, "a b a b"), (2, "a b")]
    out = {r.doc_id: r for r in bigram_lm_scores(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    p_ab = round(math.log((3 + 1) / (3 + 2)), 6)   # ln(4/5)
    p_ba = round(math.log((1 + 1) / (1 + 2)), 6)   # ln(2/3)
    assert out[1].n_bigrams == 3
    assert out[1].avg_logp == pytest.approx((2 * p_ab + p_ba) / 3, abs=1e-9)
    assert out[2].n_bigrams == 1
    assert out[2].avg_logp == pytest.approx(p_ab, abs=1e-9)
    # repetitive text scores HIGHER than rare transitions — the signal CCNet
    # buckets on
    assert out[1].avg_logp < out[2].avg_logp


def test_bigram_lm_single_token_doc_has_no_row(spark):
    from osmdatapy_spark.functions.curation import bigram_lm_scores

    rows = [(1, "only"), (2, "two words")]
    out = bigram_lm_scores(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()
    assert {r.doc_id for r in out} == {2}


# --- canonical_url / gopher_flags ------------------------------------------


def test_canonical_url_normalization(spark):
    from osmdatapy_spark.functions.curation import canonical_url

    rows = [
        (1, "HTTPS://WWW.Example.COM/A/B/?utm_source=x&id=3&ref=9#frag"),
        (2, "http://example.com/a/b?id=3"),          # same resource as 1
        (3, "example.com/a/b?b=2&a=1"),              # params out of order
        (4, "example.com/a/b?a=1&b=2&fbclid=zzz"),   # same as 3 + tracking
        (5, "https://other.org/"),                   # bare host, trailing slash
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r.id: r.c for r in df.select("id", canonical_url(col("url")).alias("c")).collect()}
    assert got[1] == "example.com/a/b?id=3"
    assert got[2] == got[1]
    assert got[3] == "example.com/a/b?a=1&b=2"
    assert got[4] == got[3]
    assert got[5] == "other.org"


def test_gopher_flags_rules(spark):
    from osmdatapy_spark.functions.curation import gopher_flags
    from osmdatapy_spark.functions.text import tokens

    long_good = " ".join(["the", "and", "word"] * 20)           # 60 toks, 2+ stops
    short = "the and tiny"                                       # < 50 words
    no_stop = " ".join(["alpha", "beta"] * 30)                   # no stopwords
    longwords = " ".join(["x" * 12] * 60) + " the and"           # mean len > 10
    rows = [(1, long_good), (2, short), (3, no_stop), (4, longwords)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fl = gopher_flags(tokens(col("text")))
    out = {r.doc_id: r for r in df.select("doc_id", *[v.alias(k) for k, v in fl.items()]).collect()}
    assert out[1].keep
    assert not out[2].keep and not out[2].f_word_count
    assert not out[3].keep and not out[3].f_stopwords and out[3].f_word_count
    assert not out[4].keep and not out[4].f_mean_word_len


def test_corpus_manifest_roundtrip(spark, tmp_path):
    """Manifest invariants: per-shard row counts sum to the corpus, token
    counts match a direct computation, shard files respect the record
    bound, fingerprints re-derive identically from a re-read (order
    independence of the wrapping hash sum), and the _manifest dir stays
    invisible to read_corpus."""
    from osmdatapy_spark.sinks import read_corpus, write_corpus_with_manifest
    from osmdatapy_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "corpus")
    manifest = write_corpus_with_manifest(
        docs, path, partition_by=["lang"], max_records_per_file=40
    )
    rows = manifest.collect()
    assert sum(r["n_rows"] for r in rows) == docs.count()
    assert all(r["n_rows"] <= 40 for r in rows)
    exp_tokens = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).first()[0]
    assert sum(r["n_tokens"] for r in rows) == exp_tokens
    # read_corpus ignores _manifest and restores partition columns
    back = read_corpus(spark, path)
    assert back.count() == docs.count() and "lang" in back.columns
    # fingerprint re-derivation: same rows, any order → same value
    re_fp = (
        back.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(
            F.sum(F.xxhash64(*[c for c in back.columns]).cast("decimal(30,0)"))
            .cast("string")
            .alias("fp")
        )
    )
    got = {r["__file"]: r["fp"] for r in re_fp.collect()}
    for r in rows:
        assert got[r["file"]] == r["fingerprint"]


# ---------------------------------------------------------------------------
# Exact substring (duplicated-span) removal
# ---------------------------------------------------------------------------


def test_exact_substring_dedup_planted_cross_doc_spans(spark):
    """Planted 37-char boilerplate shared across docs 1/2/4: the canonical
    (min doc_id, position) occurrence survives, every other occurrence is
    cut, and the cut extends to the MAXIMAL shared span (boilerplate plus
    shared surrounding context — doc 2's first cut is the 40-char
    't COPYRIGHT...RESERVED. ' run because doc 1 shares the 't ' prefix
    and trailing space, all hand-verified).  Docs with no >=20-char
    duplicate, including one shorter than the gram length, pass through
    byte-identical."""
    from osmdatapy_spark.functions.curation import exact_substring_dedup

    boiler = "COPYRIGHT NOTICE ALL RIGHTS RESERVED."
    docs = spark.createDataFrame(
        [
            (1, "alpha text " + boiler + " unique tail one"),
            (2, "beta start " + boiler + " other middle " + boiler + " end"),
            (3, "no duplicated content here at all, short and unique"),
            (4, boiler),
            (5, "tiny"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_removed_spans, r.removed_chars, r.text_deduped)
        for r in exact_substring_dedup(docs, span_len=20).collect()
    }
    assert got[1] == (0, 0, "alpha text " + boiler + " unique tail one")
    assert got[2] == (2, 79, "beta starother middleend")
    assert got[3] == (0, 0, "no duplicated content here at all, short and unique")
    assert got[4] == (1, 37, "")  # entire doc is a later copy
    assert got[5] == (0, 0, "tiny")  # < span_len: no grams, untouched


def test_exact_substring_dedup_intra_document_repeat(spark):
    """A >=20-char span repeated WITHIN one document: the first occurrence
    is canonical, the second is cut — the intra-doc case Lee et al.'s
    tool also handles (self-repetition, not just cross-doc)."""
    from osmdatapy_spark.functions.curation import exact_substring_dedup

    chunk = "0123456789abcdefghij"  # exactly 20 chars
    docs = spark.createDataFrame(
        [(7, "X" + chunk + "Y" + chunk + "Z")],
        "doc_id long, text string",
    )
    [r] = exact_substring_dedup(docs, span_len=20).collect()
    assert (r.n_removed_spans, r.removed_chars) == (1, 20)
    assert r.text_deduped == "X" + chunk + "YZ"


def test_exact_substring_dedup_hashed_equals_raw(spark):
    """hash_keys=True (xxhash64 8-byte shuffle keys, the planet-scale
    mode) must produce byte-identical output to the raw-gram oracle face
    on planted cross-doc AND intra-doc spans — the round-12 verdict's
    fixture pin for the hashed election."""
    from osmdatapy_spark.functions.curation import exact_substring_dedup

    boiler = "COPYRIGHT NOTICE ALL RIGHTS RESERVED."
    chunk = "0123456789abcdefghij"
    docs = spark.createDataFrame(
        [
            (1, "alpha text " + boiler + " unique tail one"),
            (2, "beta start " + boiler + " other middle " + boiler + " end"),
            (3, "no duplicated content here at all, short and unique"),
            (4, boiler),
            (5, "tiny"),
            (7, "X" + chunk + "Y" + chunk + "Z"),
        ],
        "doc_id long, text string",
    )
    raw = {
        r.doc_id: (r.n_removed_spans, r.removed_chars, r.text_deduped)
        for r in exact_substring_dedup(docs, span_len=20).collect()
    }
    hashed = {
        r.doc_id: (r.n_removed_spans, r.removed_chars, r.text_deduped)
        for r in exact_substring_dedup(docs, span_len=20, hash_keys=True).collect()
    }
    assert hashed == raw
    assert hashed[2] == (2, 79, "beta starother middleend")  # not trivially empty


def test_exact_substring_dedup_pathological_doc_linear_fold(spark):
    """A 240 KB document with 2000 interleaved duplicated spans — the
    round-12 verdict's straggler fixture for the rebuild fold.  The text
    is a stream of monotonically increasing 8-char counter tokens (every
    20-char window unique by construction) with each 20-char DUP span
    planted TWICE; the second copy of each is cut, so the fold sees 2000
    removal starts and ~2000 kept segments in one document.  The array
    accumulator makes this O(K + |S|) char copies; the old string-concat
    fold re-copied the ~200 KB kept prefix per start (~400M char copies
    in the interpreted fold) and showed up as a single-task straggler.
    The wall bound is a generous regression guard, not a benchmark."""
    import time

    from osmdatapy_spark.functions.curation import exact_substring_dedup

    # Collision-free-by-construction filler: 8-digit counter tokens offset
    # to 10^7 (no shared leading-zero prefixes — floor(value/10) is unique
    # per token, so any 20-window touching >=7 filler chars is unique) and
    # per-occurrence guard chars <>/[] adjacent to each span copy, so any
    # window mixing filler and span chars differs between the two copies
    # at the guard.  The ONLY duplicated 20-gram is each span itself.
    ctr = iter(range(10**7, 10**7 + 10**5))
    parts: list[str] = []
    expect_parts: list[str] = []
    for i in range(2000):
        span = "DUP" + format(i, "05d") + "DUPDUPDUPDUP"  # 20 chars
        f1 = "".join(format(next(ctr), "08d") for _ in range(5))  # 40 chars
        f2 = "".join(format(next(ctr), "08d") for _ in range(5))
        parts += [f1, "<", span, ">", f2, "[", span, "]"]
        expect_parts += [f1, "<", span, ">", f2, "[", "]"]
    text = "".join(parts)
    assert len(text) == 248_000
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    t0 = time.time()
    [r] = exact_substring_dedup(docs, span_len=20, hash_keys=True).collect()
    elapsed = time.time() - t0
    assert r.n_removed_spans == 2000
    assert r.removed_chars == 40_000
    assert r.text_deduped == "".join(expect_parts)
    assert elapsed < 120, f"rebuild took {elapsed:.1f}s — straggler regression"


def test_exact_substring_dedup_astral_chars(spark):
    """The gram chunks and the rebuild segments both come from 512-char
    tiles cut by regexp_extract_all('(?s).{1,512}'), whose '.' must step
    CODE POINTS exactly like Spark's substring/char_length, or tile
    boundaries shift on astral chars and the rebuilt text corrupts (the
    lookbehind split idiom '(?<=\\G.{512})' silently fails to split
    surrogate-pair text at all — this fixture caught it).  A doc of
    1400 DISTINCT non-BMP chars (surrogate PAIRS in UTF-16; no repeats,
    so no accidental duplicate 20-grams) with an ASCII-mixed span
    planted twice — the tile boundary falls inside the astral filler —
    must rebuild byte-exactly."""
    from osmdatapy_spark.functions.curation import exact_substring_dedup

    span = "\U0001F600\U0001F601\U0001F602SPAN-" + "\U0001F680" * 12  # 20 code points
    filler1 = "".join(chr(0x1F300 + i) for i in range(700))
    filler2 = "".join(chr(0x20000 + i) for i in range(700))
    text = filler1 + "<" + span + ">" + filler2 + "[" + span + "]"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    expected = filler1 + "<" + span + ">" + filler2 + "[" + "]"
    for hk in (True, False):
        [r] = exact_substring_dedup(docs, span_len=20, hash_keys=hk).collect()
        assert (r.n_removed_spans, r.removed_chars, r.text_deduped) == (1, 20, expected)


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def test_decontamination_report_planted_overlap(spark):
    """Train doc 1 shares a verbatim 5-gram with the eval set (flagged,
    exact overlap count); doc 2 repeats the leaked gram twice but counts
    it ONCE (set semantics); doc 3 is clean; doc 4 is shorter than n and
    scores 0 grams.  Eval docs are never in the output (asymmetry)."""
    from osmdatapy_spark.functions.curation import decontamination_report

    leak = "the quick brown fox jumps"
    train = spark.createDataFrame(
        [
            (1, "intro words then " + leak + " trailing tail here"),
            (2, leak + " middle filler words " + leak),
            (3, "completely original content with no eval overlap at all"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "eval question begins " + leak + " eval answer ends")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.n_contaminated, r.contaminated)
        for r in decontamination_report(train, ev, n=5).collect()
    }
    assert set(got) == {1, 2, 3, 4}  # eval ids never appear
    assert got[1] == (7, 1, True)
    # doc 2: 13 tokens -> 9 gram positions, 8 DISTINCT grams (the leaked
    # gram occurs at two positions and dedups in-row); exactly ONE of
    # them is contaminated
    assert got[2] == (8, 1, True)
    assert got[3] == (5, 0, False)
    assert got[4] == (0, 0, False)
    # hash_keys=True (xxhash64 probe keys — the small-broadcast planet
    # mode) must report identically on this collision-free fixture
    hashed = {
        r.doc_id: (r.n_grams, r.n_contaminated, r.contaminated)
        for r in decontamination_report(train, ev, n=5, hash_keys=True).collect()
    }
    assert hashed == got
