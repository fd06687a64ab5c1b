"""Corpus-scale smoke: the dedup/fingerprint family at 20x the sf0.1
document count, on a GENERATED corpus (spark.range + Column algebra — no
driver-side data, no testdata dependency).

Not a correctness oracle (check_oracle.py is); this verifies the
pipelines' SHAPES survive a corpus with real duplicate structure at a
scale where a quadratic or per-branch-recompute mistake becomes minutes,
and reports wall times per family.

Run: python tools/corpus_scale_check.py [n_docs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from osmdatapy_spark.session import get_spark


P = 10_000_019  # prime >> n_docs * 43: token ids never collide by accident


def _doc_text(doc: F.Column) -> F.Column:
    """40 deterministic tokens, unique to the doc id (modulo the planted
    structure in synth_corpus)."""
    return F.concat_ws(
        " ",
        *[
            F.concat(lit(f"w{j}_"), ((doc * (j + 3) + j) % P).cast("string"))
            for j in range(40)
        ],
    )


def synth_corpus(spark, n: int):
    """n docs, 40 tokens each; every doc with id % 50 == 1 is an EXACT
    duplicate of its block head (id - 1 mod structure), everything else
    unique.  Deterministic, generated executor-side — no driver data."""
    base = spark.range(n).select(col("id").alias("doc_id"))
    block_head = (col("doc_id") - (col("doc_id") % 50)).cast("long")
    return base.select(
        "doc_id",
        F.when(col("doc_id") % 50 == 1, _doc_text(block_head))
        .otherwise(_doc_text(col("doc_id").cast("long")))
        .alias("text"),
    )


def main() -> None:
    import os

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    # the synthetic corpus is DELIBERATELY adversarial for the word-table
    # families (every token unique → the 'vocab-sized' table is
    # corpus-sized: ~40n distinct words); at 1M docs that is a 40M-row
    # persisted symbol table, beyond the 8g default local JVM.  A real
    # cluster's executors size memory to the data — give the scale
    # harness the same courtesy (overridable via the env var).
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark("corpus-scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_corpus(spark, n).repartition(64).persist()
    print(f"corpus: {docs.count()} docs")

    from osmdatapy_spark.functions.dedup import (
        exact_dedup,
        lsh_band_pairs,
        minhash_signature,
        simhash,
    )
    from osmdatapy_spark.functions.text import (
        fingerprint,
        shingle_sets,
        tokens,
        with_winnow_fingerprints,
    )

    def timed(name, fn):
        # families must not inherit (or pay the memory pressure of) caches
        # a previous family persisted and never released — the leftover
        # MEMORY_AND_DISK blocks squeezed execution memory into an
        # aggregation OOM at 1M docs (bench.py's clearCache discipline)
        spark.catalog.clearCache()
        t0 = time.time()
        out = fn()
        print(f"{name:<28}{time.time() - t0:6.1f}s  {out}")

    # ids congruent to 1 mod 50 that exist in [0, n) — each duplicates its
    # block head (id - 1), which always exists
    planted = len(range(1, n, 50))

    def check_exact():
        got = exact_dedup(docs, "doc_id", fingerprint(col("text"))).filter(col("n_dups") > 1).count()
        assert got == planted, f"expected {planted} dup groups, got {got}"
        return f"{got} dup groups (== planted)"

    timed("exact dedup", check_exact)
    sh = shingle_sets(docs).select("doc_id", F.explode(col("s")).alias("s"))
    sig = minhash_signature(sh, "doc_id", "s", num_perm=8).persist()
    timed("minhash signatures", lambda: f"{sig.count()} signatures")

    def check_lsh():
        pairs = lsh_band_pairs(sig, "doc_id", max_bucket=50).persist()
        got = pairs.count()
        # identical docs agree on every band, so every planted (head,
        # head+1) pair MUST be a candidate — check the pairs themselves,
        # not just the total (collisions could pad a broken count)
        expected = spark.range(0, n, 50).select(
            col("id").alias("id_a"), (col("id") + 1).alias("id_b")
        ).filter(col("id_b") < n)
        missing = expected.join(pairs, ["id_a", "id_b"], "left_anti").count()
        assert missing == 0, f"LSH recall broken: {missing} planted pairs missing"
        return f"{got} candidate pairs (all {planted} planted present)"

    timed("lsh band pairs", check_lsh)
    timed("simhash", lambda: f"{simhash(docs.select('doc_id', F.explode(tokens(col('text'))).alias('tok')), 'doc_id', 'tok').count()} signatures")
    timed("winnow fingerprints", lambda: f"{with_winnow_fingerprints(docs, 'text', 'fp').select(F.sum(F.size('fp'))).first()[0]} fingerprints")

    from osmdatapy_spark.functions.curation import bigram_lm_scores, paragraph_dedup

    def check_paragraph():
        # 40-token docs, block=20 -> 2 paragraphs; a planted duplicate's
        # paragraphs were both seen at its block head, so it keeps 0 —
        # and ONLY duplicates lose anything (all other docs are unique)
        out = paragraph_dedup(docs, block=20).persist()
        fully_gone = out.filter(col("n_kept") == 0).count()
        partial = out.filter((col("n_kept") > 0) & (col("n_kept") < col("n_paras"))).count()
        assert fully_gone == planted, f"expected {planted} fully-deduped docs, got {fully_gone}"
        assert partial == 0, f"{partial} docs lost paragraphs spuriously"
        return f"{fully_gone} docs fully deduped (== planted), 0 spurious"

    timed("paragraph dedup", check_paragraph)

    def check_lm():
        # a duplicate's bigrams occur twice corpus-wide -> its mean
        # log-prob must beat the unique-doc average (the repetition
        # signal CCNet buckets on)
        scores = bigram_lm_scores(docs).persist()
        dup_avg, uniq_avg = (
            scores.select(
                F.avg(F.when(col("doc_id") % 50 == 1, col("avg_logp"))).alias("d"),
                F.avg(F.when(col("doc_id") % 50 != 1, col("avg_logp"))).alias("u"),
            ).first()
        )
        assert dup_avg > uniq_avg, f"dup {dup_avg} !> unique {uniq_avg}"
        return f"dup avg_logp {dup_avg:.3f} > unique {uniq_avg:.3f}"

    timed("bigram LM scores", check_lm)

    from osmdatapy_spark.functions.similarity import semantic_dedup_pairs

    def check_semdedup():
        # 8-dim embeddings from the same planted structure: id%50==1
        # copies its block head's vector exactly -> same k-means cell,
        # adjacent in the sorted id array (consecutive ids), cos = 1.0.
        # Overlapping pair windows always pair adjacent elements, so
        # EVERY planted pair must appear at any max_bucket >= 2.
        src = F.when(col("doc_id") % 50 == 1, col("doc_id") - 1).otherwise(col("doc_id"))
        vecs = docs.select(
            "doc_id",
            F.array(*[((src * (j + 3) + j) % 997 / 997.0) for j in range(8)]).alias("embedding"),
        )
        pairs = semantic_dedup_pairs(
            vecs, "doc_id", "embedding", n_cells=8, iters=1, min_cos=0.999, max_bucket=8
        ).persist()
        got = pairs.count()
        expected = spark.range(0, n, 50).select(
            col("id").alias("id_a"), (col("id") + 1).alias("id_b")
        ).filter(col("id_b") < n)
        missing = expected.join(pairs, ["id_a", "id_b"], "left_anti").count()
        assert missing == 0, f"SemDeDup recall broken: {missing} planted pairs missing"
        return f"{got} pairs at cos>=0.999 (all {planted} planted present)"

    timed("semantic dedup", check_semdedup)

    def check_url_dedup():
        # synthetic fetch URLs over the SAME planted structure: id%50==1
        # shares its block head's path but carries tracking params, a
        # fragment, uppercase scheme — canonicalization must collapse the
        # pair while distinct paths stay distinct
        from osmdatapy_spark.functions.curation import canonical_url

        src = F.when(col("doc_id") % 50 == 1, col("doc_id") - 1).otherwise(col("doc_id"))
        urls = docs.select(
            "doc_id",
            F.concat(
                F.when(col("doc_id") % 50 == 1, lit("HTTPS://WWW.")).otherwise(lit("https://")),
                lit("ex.com/p/"),
                src.cast("string"),
                F.when(col("doc_id") % 50 == 1, lit("/?utm_source=x&ref=9#f")).otherwise(lit("")),
            ).alias("url"),
        )
        groups = (
            urls.select(canonical_url(col("url")).alias("c"), "doc_id")
            .groupBy("c")
            .agg(F.count("*").alias("n"))
        )
        got = groups.filter(col("n") > 1).count()
        total = groups.count()
        assert got == planted, f"expected {planted} dup URL groups, got {got}"
        assert total == n - planted, f"expected {n - planted} canonical urls, got {total}"
        return f"{got} dup groups / {total} canonical urls (== planted)"

    timed("url dedup", check_url_dedup)

    def check_tokenize():
        # the Arrow-kernel path at scale: greedy tokenize every doc, then
        # certify the reconstruction invariant (token lengths x counts sum
        # exactly back to the corpus character count — nothing dropped or
        # double-consumed by the sequential scan)
        from osmdatapy_spark.functions.text import TOKENIZER_VOCAB, vocab_tokenize_counts

        toks = vocab_tokenize_counts(docs, TOKENIZER_VOCAB)
        agg = toks.agg(
            F.sum(F.length("token") * col("n")).alias("chars"),
            F.sum("n").alias("n_tokens"),
        ).first()
        exp = docs.agg(F.sum(F.length("text"))).first()[0]
        assert agg["chars"] == exp, f"reconstruction {agg['chars']} != {exp}"
        return f"{agg['n_tokens']} tokens, char reconstruction exact"

    timed("vocab tokenize", check_tokenize)

    def check_curate_recipe():
        # the Curate facade's default chain at scale: every planted exact
        # duplicate must be gone, every block head must survive the dedup
        # stages (the quality gate is disabled here — synthetic tokens are
        # unique so diversity is 1.0, but keep the stage ON to exercise
        # the full plan)
        from osmdatapy_spark.curate import Curate

        out = (
            Curate(docs.withColumn("source", (col("doc_id") % 7).cast("string")))
            .normalize()
            .exact_dedup()
            .quality_filter(min_tokens=1, max_tokens=1000, min_diversity=0.0)
            .df()
            .persist()
        )
        survived = out.count()
        # planted dups (id % 50 == 1) all collapse into their block heads
        dup_left = out.filter(col("doc_id") % 50 == 1).count()
        assert dup_left == 0, f"{dup_left} planted duplicates survived exact_dedup"
        assert survived == n - planted, (survived, n - planted)
        return f"{survived} docs survive (all {planted} planted dups removed)"

    timed("curate recipe", check_curate_recipe)

    def check_connected_components():
        # union-find contraction at scale, on its adversarial case: path
        # graphs (diameter 100 — the shape that made label propagation
        # pay O(diameter) rounds).  Every block of 100 consecutive ids is
        # a chain; scattered over 64 partitions each chain crosses many
        # partition boundaries, so convergence NEEDS the multi-level
        # contraction (a single local pass cannot see a whole chain).
        # Verified exactly: every node's label must equal its block head.
        from osmdatapy_spark.functions.dedup import connected_components

        chain = spark.range(n).select(col("id").alias("id_a"), (col("id") + 1).alias("id_b"))
        edges = chain.filter((col("id_a") % 100 != 99) & (col("id_b") < n)).repartition(64)
        labels = connected_components(edges).persist()
        n_nodes = labels.count()
        wrong = labels.filter(col("cluster") != (col("id") - col("id") % 100)).count()
        assert wrong == 0, f"{wrong} nodes labeled off their block head"
        n_comp = labels.select("cluster").distinct().count()
        exp_comp = (n + 99) // 100
        assert n_comp == exp_comp, (n_comp, exp_comp)
        return f"{n_nodes} nodes -> {n_comp} chain components, labels exact"

    timed("connected components", check_connected_components)

    def check_bpe_train():
        # the r8 multi-round trainer at corpus scale: the word table is
        # vocabulary-sized however big the corpus, so 3 full merge rounds
        # (pair count -> argmax -> fold-apply) must stay flat vs n.  The
        # invariant: every round's winning pair is distinct (an applied
        # merge consumes its occurrences), counts are corpus-consistent
        # (> 0, and each subsequent round's argmax <= the unconstrained
        # remaining maximum, trivially true if positive and the rows are
        # well-formed).
        from osmdatapy_spark.suite.registry import QUERY_REGISTRY

        import tempfile

        d = tempfile.mkdtemp(prefix="bpe_scale_")
        docs.select("doc_id", "text").write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )
        rows = QUERY_REGISTRY["llm_bpe_train"].fn(spark, d).collect()
        assert [r["merge_round"] for r in rows] == [1, 2, 3]
        pairs = {(r["left_sym"], r["right_sym"]) for r in rows}
        assert len(pairs) == 3 and all(r["cnt"] > 0 for r in rows)
        return f"3 distinct merges, top cnt {rows[0]['cnt']}"

    timed("bpe train (3 rounds)", check_bpe_train)

    def check_substring_dedup(hash_keys):
        # ExactSubstr removal (r12) at corpus scale: the char-20-gram
        # explode is the corpus's heaviest fan-out (~400 gram rows/doc —
        # 40x the paragraph family), so this is where a quadratic or
        # unpartitioned mistake becomes hours.  Planted invariant: every
        # id % 50 == 1 doc is an exact copy of its block head, so ALL its
        # grams are non-canonical and the whole text must cut to '' —
        # count(text_deduped = '') == planted exactly (a unique-text doc
        # fully vanishing, or a planted copy surviving, both fail).
        # Runs TWICE: raw gram keys (the engine-exact oracle face), then
        # hash_keys=True (the r13 planet-scale mode — election +
        # mark-back join on xxhash64(gram) 8-byte keys); the wall delta
        # between the two entries is the exchange-CPU saving the hashed
        # mode exists for, and the invariant must hold identically.
        #
        # Expect 'Failed to compile ... 64 KB' stderr lines here:
        # timed()'s clearCache re-fuses the HARNESS's 40-term synthetic
        # text expression into the fold stage and the combined method
        # overflows janino's limit, so Spark falls back to interpreted
        # eval for that stage (correct, slower).  The engine-side query
        # on real parquet (llm_substring_dedup) compiles clean — verified
        # 0 codegen failures at sf0.1.
        from osmdatapy_spark.functions.curation import exact_substring_dedup

        out = exact_substring_dedup(docs, "doc_id", "text", hash_keys=hash_keys).persist()
        emptied = out.filter((col("text_deduped") == "") & (col("doc_len") > 0)).count()
        assert emptied == planted, f"expected {planted} fully-cut docs, got {emptied}"
        total_removed = out.agg(F.sum("removed_chars")).collect()[0][0]
        out.unpersist()
        return f"{emptied} docs fully cut (== planted), {total_removed} chars removed"

    timed("exact substring dedup", lambda: check_substring_dedup(False))
    timed("exact substring dedup (hashed keys)", lambda: check_substring_dedup(True))
    spark.stop()


if __name__ == "__main__":
    main()
