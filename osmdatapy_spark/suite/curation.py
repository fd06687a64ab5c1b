"""Corpus-curation query suite: fuzzy edit-distance dedup, exact-substring
containment, cross-document boilerplate removal, TF-IDF similarity,
mixture-targeted sampling (``functions/curation.py``).

Every oracle independently re-derives the pipeline in DuckDB SQL,
including the bounded overlapping-window pair expansion (the same
``((pos-1)//(m-1))*(m-1)+m`` window arithmetic as ``dedup._bucket_pairs``)
so candidate sets match exactly above and below the bucket caps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from osmdatapy_spark.functions.curation import (
    containment_pairs,
    edit_distance_pairs,
    mixture_sample,
    strip_boilerplate,
    tfidf_pairs,
)
from osmdatapy_spark.functions.text import shingle_sets
from osmdatapy_spark.suite._util import T, TS
from osmdatapy_spark.suite.registry import register

# ---------------------------------------------------------------------------
# Fuzzy edit-distance dedup
# ---------------------------------------------------------------------------


@register(
    "llm_fuzzy_edit_pairs",
    oracle=r"""
    WITH n AS (
      SELECT doc_id,
             substr(lower(trim(text)), 1, 200) AS t,
             substr(lower(trim(text)), 1, 24) AS blk
      FROM documents
    ),
    pex AS (
      SELECT blk, UNNEST(ids) AS id, UNNEST(generate_series(1, len(ids))) AS pos
      FROM (SELECT blk, list_sort(list(doc_id)) AS ids FROM n GROUP BY blk)
    ),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM pex a JOIN pex b
        ON a.blk = b.blk AND b.pos > a.pos
       AND b.pos <= ((a.pos - 1) // 19) * 19 + 20
    )
    SELECT c.id_a, c.id_b,
           CAST(levenshtein(na.t, nb.t) AS BIGINT) AS edit_dist,
           CAST(levenshtein(na.t, nb.t) AS DOUBLE)
             / greatest(length(na.t), length(nb.t)) AS rel_dist
    FROM cand c
    JOIN n na ON na.doc_id = c.id_a
    JOIN n nb ON nb.doc_id = c.id_b
    WHERE levenshtein(na.t, nb.t) <= 40
    """,
    bench=True,
    doc="Fuzzy near-dup pairs by Levenshtein distance with 24-char prefix "
    "blocking and bounded in-bucket expansion. One shuffle total: the "
    "truncated text rides inside the bucket array, so scoring never joins "
    "back to the corpus. levenshtein is a JVM builtin (codegen); the "
    "corpus is ASCII so char-based Spark and DuckDB distances agree.",
)
def llm_fuzzy_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TS(spark, sf_dir, "documents")
    return edit_distance_pairs(docs)


# ---------------------------------------------------------------------------
# Exact-substring containment dedup
# ---------------------------------------------------------------------------


@register(
    "llm_containment_pairs",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks
    ),
    pex AS (
      SELECT g, UNNEST(ids) AS id, UNNEST(generate_series(1, len(ids))) AS pos
      FROM (
        SELECT g, list_sort(list(doc_id)) AS ids
        FROM (SELECT doc_id, UNNEST(s) AS g FROM sh)
        GROUP BY g
      )
    ),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM pex a JOIN pex b
        ON a.g = b.g AND b.pos > a.pos
       AND b.pos <= ((a.pos - 1) // 19) * 19 + 20
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    tx AS (SELECT doc_id, trim(text) AS t FROM documents),
    sides AS (
      SELECT
        CASE WHEN length(ta.t) < length(tb.t)
               OR (length(ta.t) = length(tb.t) AND c.id_a < c.id_b)
             THEN c.id_a ELSE c.id_b END AS contained_id,
        CASE WHEN length(ta.t) < length(tb.t)
               OR (length(ta.t) = length(tb.t) AND c.id_a < c.id_b)
             THEN c.id_b ELSE c.id_a END AS container_id,
        CASE WHEN length(ta.t) < length(tb.t)
               OR (length(ta.t) = length(tb.t) AND c.id_a < c.id_b)
             THEN ta.t ELSE tb.t END AS it,
        CASE WHEN length(ta.t) < length(tb.t)
               OR (length(ta.t) = length(tb.t) AND c.id_a < c.id_b)
             THEN tb.t ELSE ta.t END AS ot
      FROM cand c
      JOIN tx ta ON ta.doc_id = c.id_a
      JOIN tx tb ON tb.doc_id = c.id_b
    )
    SELECT contained_id, container_id,
           CAST(length(it) AS BIGINT) AS len_contained,
           CAST(length(ot) AS BIGINT) AS len_container
    FROM sides
    WHERE contains(ot, it)
    """,
    doc="Exact-substring containment dedup (Lee et al. 2021 as the "
    "single-node suffix-array analog): candidates from shared rare "
    "shingles (inverted index, bounded expansion), then a plain instr "
    "verify on candidates only — never corpus × corpus.",
)
def llm_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TS(spark, sf_dir, "documents")
    shingled = shingle_sets(docs).select("doc_id", F.explode(col("s")).alias("s"))
    return containment_pairs(shingled, docs)


# ---------------------------------------------------------------------------
# Cross-document boilerplate removal
# ---------------------------------------------------------------------------


@register(
    "llm_boilerplate_strip",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    ch AS (
      SELECT doc_id,
             UNNEST(generate_series(0, CAST(ceil(len(t) / 10.0) AS INT) - 1)) AS pos,
             UNNEST(list_transform(generate_series(0, CAST(ceil(len(t) / 10.0) AS INT) - 1),
                    i -> array_to_string(t[i*10+1 : i*10+10], ' '))) AS chunk
      FROM toks
    ),
    boiler AS (
      SELECT chunk FROM ch GROUP BY chunk HAVING count(DISTINCT doc_id) >= 3
    ),
    marked AS (
      SELECT ch.doc_id, ch.pos, ch.chunk, (b.chunk IS NOT NULL) AS is_b
      FROM ch LEFT JOIN boiler b USING (chunk)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           md5(coalesce(string_agg(CASE WHEN NOT is_b THEN chunk END, ' ' ORDER BY pos), ''))
             AS clean_hash
    FROM marked GROUP BY doc_id
    """,
    doc="CCNet-style cross-document boilerplate removal at 10-token-chunk "
    "granularity (the corpus has no newlines, so fixed token windows stand "
    "in for lines): chunks repeating across >= 3 distinct docs are "
    "dropped; surviving text is re-joined in order and fingerprinted. "
    "Three partial-aggregated shuffles (chunk-freq keyed by xxhash64, "
    "freq join back, per-doc reassembly), no UDFs.",
)
def llm_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TS(spark, sf_dir, "documents")
    return strip_boilerplate(docs)


# ---------------------------------------------------------------------------
# TF-IDF lexical similarity
# ---------------------------------------------------------------------------


@register(
    "llm_tfidf_pairs",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    tfc AS (
      -- tf capped at 3000 (engine contract: keeps tf_a*tf_b*1e12 inside
      -- int64 on degenerate single-shingle repetition)
      SELECT doc_id AS id, tok, CAST(LEAST(count(*), 3000) AS BIGINT) AS tf
      FROM (SELECT doc_id,
                   UNNEST(list_transform(generate_series(1, len(t) - 2),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tok
            FROM toks)
      GROUP BY 1, 2
    ),
    dfreq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df, list_sort(list(id)) AS ids
      FROM tfc GROUP BY tok
    ),
    norms AS (
      SELECT id, CAST(sum((tf * tf * 1000000000000) // (df * df)) AS BIGINT) AS norm_fp
      FROM tfc JOIN dfreq USING (tok) GROUP BY id
    ),
    pex AS (
      SELECT tok, UNNEST(ids) AS id, UNNEST(generate_series(1, len(ids))) AS pos
      FROM dfreq WHERE df BETWEEN 2 AND 20
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM pex a JOIN pex b
        ON a.tok = b.tok AND b.pos > a.pos
       AND b.pos <= ((a.pos - 1) // 19) * 19 + 20
    ),
    num AS (
      SELECT c.id_a, c.id_b,
             CAST(sum((ta.tf * tb.tf * 1000000000000) // (d.df * d.df)) AS BIGINT) AS num_fp
      FROM cand c
      JOIN tfc ta ON ta.id = c.id_a
      JOIN tfc tb ON tb.id = c.id_b AND tb.tok = ta.tok
      JOIN dfreq d ON d.tok = ta.tok
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT n.id_a, n.id_b,
             CAST(n.num_fp AS DOUBLE)
               / (sqrt(CAST(na.norm_fp AS DOUBLE)) * sqrt(CAST(nb.norm_fp AS DOUBLE))) AS sim
      FROM num n
      JOIN norms na ON na.id = n.id_a
      JOIN norms nb ON nb.id = n.id_b
    )
    SELECT id_a, id_b, sim FROM scored WHERE sim >= 0.5
    """,
    doc="TF-IDF cosine pairs over 3-gram shingle terms with rational idf "
    "(1/df): contributions are fixed-point BIGINTs (tf_a*tf_b*1e12 // "
    "df^2) so groupBy sums are order-independent and bit-identical across "
    "engines. Candidates from rare-term postings (df<=20, bounded window "
    "expansion); scoring then covers ALL shared terms of each candidate "
    "pair.",
)
def llm_tfidf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TS(spark, sf_dir, "documents")
    return tfidf_pairs(docs)


# ---------------------------------------------------------------------------
# Mixture-targeted sampling
# ---------------------------------------------------------------------------

MIXTURE_TARGETS = {"en": 100, "de": 40, "es": 200, "fr": 30, "zh": 50}


@register(
    "llm_domain_mixture",
    oracle=r"""
    WITH counts AS (SELECT lang AS k, CAST(count(*) AS BIGINT) AS avail FROM documents GROUP BY 1),
    thr AS (
      SELECT k,
             least(1000000,
                   CAST(CASE k WHEN 'en' THEN 100 WHEN 'de' THEN 40 WHEN 'es' THEN 200
                               WHEN 'fr' THEN 30 WHEN 'zh' THEN 50 END AS BIGINT)
                     * 1000000 // avail) AS thr
      FROM counts
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN thr ON thr.k = d.lang
    WHERE CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 AS INT)
          < thr.thr
    """,
    doc="Mixture-targeted sampling: per-language md5-deterministic accept "
    "thresholds solve toward a target document mixture (targets above "
    "availability cap at keep-everything — exercised by 'es'). Integer "
    "threshold arithmetic, so no float boundary; per-domain counts are a "
    "tiny agg broadcast back onto the scan, accept filter streams.",
)
def llm_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    return mixture_sample(docs, MIXTURE_TARGETS)


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup
# ---------------------------------------------------------------------------


@register(
    "llm_paragraph_dedup",
    oracle=r"""
    WITH base AS (
      SELECT doc_id,
             list_transform(
               generate_series(0, CAST(ceil(len(toks) / 20.0) AS INT) - 1),
               i -> array_to_string(list_slice(toks, i*20 + 1, i*20 + 20), ' ')) AS blocks
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents)
    ),
    paras AS (
      SELECT doc_id, s.ppos, s.para, md5(s.para) AS fp
      FROM (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(blocks)),
                     i -> struct_pack(ppos := i - 1, para := blocks[i]))) AS s
            FROM base)
    ),
    kept AS (
      SELECT doc_id, ppos, para FROM (
        SELECT doc_id, ppos, para,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id, ppos) AS rn
        FROM paras) WHERE rn = 1
    ),
    rebuilt AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             array_to_string(list(para ORDER BY ppos), ' ') AS dedup_text
      FROM kept GROUP BY doc_id
    )
    SELECT b.doc_id, CAST(len(b.blocks) AS BIGINT) AS n_paras,
           coalesce(r.n_kept, 0) AS n_kept,
           coalesce(r.dedup_text, '') AS dedup_text
    FROM base b LEFT JOIN rebuilt r USING (doc_id)
    """,
    bench=True,
    doc="Paragraph-level exact dedup (RefinedWeb/Dolma line dedup): each "
    "20-token paragraph survives only at its first corpus-wide occurrence "
    "(total order by doc_id, position); docs are reassembled from the "
    "survivors. First-occurrence election is a PARTIAL-aggregated "
    "min(struct) groupBy — a 10^9-copy boilerplate paragraph collapses "
    "map-side instead of hot-keying one reducer.",
)
def llm_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmdatapy_spark.functions.curation import paragraph_dedup

    return paragraph_dedup(TS(spark, sf_dir, "documents"), block=20)


# ---------------------------------------------------------------------------
# Bigram LM quality scoring
# ---------------------------------------------------------------------------


@register(
    "llm_lm_score",
    oracle=r"""
    WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
    stream AS (
      SELECT doc_id, s.w1, s.w2
      FROM (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(toks) - 1),
                     i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS s
            FROM tok)
    ),
    c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM stream GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
    vocab AS (SELECT count(DISTINCT w) AS v
              FROM (SELECT unnest(toks) AS w FROM tok))
    SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CAST(round(ln((c12.c12 + 1) / CAST(c1.c1 + vocab.v AS DOUBLE)), 6)
                         AS DECIMAL(27,6))) AS DOUBLE) / count(*) AS avg_logp
    FROM stream s JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab
    GROUP BY s.doc_id
    """,
    bench=True,
    doc="Self-trained add-one-smoothed bigram LM, mean token log-prob per "
    "doc (CCNet's quality signal, hermetic — no external model). Count "
    "tables are corpus-sized so the scoring joins are deliberately "
    "shuffle joins, NOT broadcast; context totals derive from the bigram "
    "count table (no second corpus pass); vocabulary is a one-row "
    "broadcast. ln() round-6 guard + DECIMAL sum + one exactly-rounded "
    "double division = bit-identical cross-engine.",
)
def llm_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmdatapy_spark.functions.curation import bigram_lm_scores

    return bigram_lm_scores(TS(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Per-domain document cap
# ---------------------------------------------------------------------------


@register(
    "llm_domain_cap",
    oracle=r"""
    SELECT doc_id, source, rk FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
    WHERE rk <= 15
    """,
    doc="Per-domain hard cap (Gopher/FineWeb curation rule): keep at most "
    "N docs per source domain, chosen by deterministic md5-hash rank (a "
    "reproducible uniform sample of each domain, not a prefix of crawl "
    "order). rank<=k right after row_number lets Spark's WindowGroupLimit "
    "rewrite keep a per-map-partition top-k BEFORE the shuffle — a giant "
    "domain ships k rows per task, not its whole row set.",
)
def llm_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(col("rk") <= 15)
        .select("doc_id", "source", col("rk").cast("bigint").alias("rk"))
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture sampling
# ---------------------------------------------------------------------------


@register(
    "llm_temperature_mixture",
    oracle="""
    WITH counts AS (
      SELECT lang AS k, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
    ),
    alpha AS (
      SELECT k, n, round(pow(CAST(n AS DOUBLE), 0.3), 9) AS na FROM counts
    ),
    thr AS (
      SELECT k, n,
             CAST(least(1000000.0,
                  floor(round(200.0 * na / (SELECT sum(na) FROM alpha) / n, 9)
                        * 1000000)) AS BIGINT) AS thr
      FROM alpha
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN thr ON thr.k = d.lang
    WHERE CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 1000000 AS INT) < thr.thr
    """,
    doc="Temperature-scaled mixture (mT5/XLM-R alpha-sampling, alpha=0.3): "
    "per-language keep rates derive from n^alpha instead of hand-set "
    "targets, UP-weighting tail languages automatically (the standard "
    "multilingual balance). Same reproducible-sampling machinery as "
    "mixture_sample — tiny per-lang agg broadcast back, md5-bucket "
    "accept, integer thresholds after a round-9 guard on the 1-ulp "
    "pow() — so the subset is identical on any engine or cluster size.",
)
def llm_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast, lit

    from osmdatapy_spark.functions.text import hash_bucket

    docs = T(spark, sf_dir, "documents")
    counts = docs.groupBy(col("lang").alias("k")).agg(F.count("*").alias("n"))
    alpha = counts.select(
        "k", "n", F.round(F.pow(col("n").cast("double"), lit(0.3)), 9).alias("na")
    )
    total = alpha.agg(F.sum("na").alias("tot"))
    thr = (
        alpha.crossJoin(broadcast(total))
        .select(
            "k",
            F.least(
                lit(1000000.0),
                F.floor(F.round(lit(200.0) * col("na") / col("tot") / col("n"), 9) * 1000000),
            )
            .cast("bigint")
            .alias("thr"),
        )
    )
    return (
        docs.join(broadcast(thr), docs["lang"] == thr["k"])
        .filter(hash_bucket(col("doc_id"), 1_000_000) < col("thr"))
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# URL-keyed crawl dedup + Gopher quality rules
# ---------------------------------------------------------------------------

# deterministic per-doc fetch URL (both engines derive it identically):
# uppercase scheme/host exercise lowercasing; even doc_ids carry tracking
# params + a content param + a trailing slash; odd doc_ids carry out-of-
# order params + a fragment.  Collisions happen whenever two docs share
# (source, lang, doc_id%211, parity[, doc_id%7]) — real dedup work.
_URL_SQL = """
  'HTTPS://WWW.example.com/page-' || CAST(doc_id % 37 AS VARCHAR)
   || CASE WHEN doc_id % 2 = 0
        THEN '/?utm_source=feed&id=' || CAST(doc_id % 3 AS VARCHAR)
              || '&ref=' || CAST(doc_id AS VARCHAR)
        ELSE '?b=2&a=1#frag-' || CAST(doc_id AS VARCHAR) END
"""


def _synth_url() -> F.Column:
    d = col("doc_id")
    return F.concat(
        F.lit("HTTPS://WWW.example.com/page-"), (d % 37).cast("string"),
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit("/?utm_source=feed&id="), (d % 3).cast("string"),
                F.lit("&ref="), d.cast("string"),
            ),
        ).otherwise(F.concat(F.lit("?b=2&a=1#frag-"), d.cast("string"))),
    )


@register(
    "llm_url_dedup",
    oracle=rf"""
    WITH raw AS (
      SELECT doc_id, n_chars,
             regexp_replace(regexp_replace(regexp_replace(
               lower({_URL_SQL}),
               '^https?://', ''), '^www\.', ''), '#.*$', '') AS u
      FROM documents
    ),
    parts AS (
      SELECT doc_id, n_chars,
             regexp_replace(split_part(u, '?', 1), '/$', '') AS path,
             CASE WHEN contains(u, '?') THEN substr(u, strpos(u, '?') + 1)
                  ELSE '' END AS q
      FROM raw
    ),
    canon AS (
      SELECT doc_id, n_chars,
             path || CASE WHEN len(kept) > 0
                          THEN '?' || array_to_string(kept, '&')
                          ELSE '' END AS canon_url
      FROM (
        SELECT doc_id, n_chars, path,
               list_sort(list_filter(string_split(q, '&'),
                 p -> p <> '' AND NOT regexp_matches(p,
                        '^(utm_[a-z]+|fbclid|gclid|ref)='))) AS kept
        FROM parts
      )
    )
    SELECT canon_url,
           arg_max(doc_id, n_chars * 1000000000000 - doc_id) AS doc_id,
           COUNT(*) AS n_dups
    FROM canon GROUP BY canon_url
    """,
    doc="URL-keyed crawl dedup — the CommonCrawl-pipeline FIRST pass, before "
    "any content dedup: canonicalize the fetch URL (lowercase, strip "
    "scheme/www/fragment/trailing-slash, drop tracking params, sort the "
    "rest) and keep the best fetch per canonical URL (longest text, "
    "doc_id tiebreak). Canonicalization is pure JVM Column algebra; the "
    "keep-best election is ONE partial-aggregated shuffle on the "
    "canonical-url key via max(struct) — no window, no second pass. At "
    "100 TB the canonical key is far lower-cardinality than doc_id, and "
    "partial aggregation collapses duplicate fetches map-side.",
)
def llm_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmdatapy_spark.functions.curation import canonical_url

    docs = T(spark, sf_dir, "documents")
    # the (n_chars DESC, doc_id ASC) election packs into ONE BIGINT —
    # exactly the oracle's own arg_max key (n_chars·10¹² − doc_id; the
    # per-n ranges are disjoint since doc_id < 10¹², so the packed max is
    # the struct max; boundary-pinned by tests/test_packed_elections.py)
    # — because max(struct) is not hash-aggregable and
    # planned as SortAggregate: a map-side sort of the full doc table.
    # max(long) hash-aggregates; doc_id unpacks as (T − m mod T) mod T.
    T12 = 1_000_000_000_000
    return (
        docs.select(
            canonical_url(_synth_url()).alias("canon_url"),
            "doc_id",
            "n_chars",
        )
        .groupBy("canon_url")
        .agg(
            F.max(col("n_chars").cast("long") * T12 - col("doc_id")).alias("m"),
            F.count("*").alias("n_dups"),
        )
        .select(
            "canon_url",
            ((F.lit(T12) - col("m") % T12) % T12).cast("bigint").alias("doc_id"),
            "n_dups",
        )
    )


@register(
    "llm_gopher_rules",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
    )
    SELECT doc_id,
      (len(t) BETWEEN 50 AND 100000) AS f_word_count,
      (list_sum(list_transform(t, w -> length(w)))
         BETWEEN 3 * len(t) AND 10 * len(t)) AS f_mean_word_len,
      (5 * len(list_filter(t, w -> regexp_matches(w, '[a-z]')))
         >= 4 * len(t)) AS f_alpha_ratio,
      (len(list_filter(t, w -> w IN
         ('the','be','to','of','and','that','have','with'))) >= 2) AS f_stopwords,
      (len(t) BETWEEN 50 AND 100000)
        AND (list_sum(list_transform(t, w -> length(w)))
               BETWEEN 3 * len(t) AND 10 * len(t))
        AND (5 * len(list_filter(t, w -> regexp_matches(w, '[a-z]')))
               >= 4 * len(t))
        AND (len(list_filter(t, w -> w IN
               ('the','be','to','of','and','that','have','with'))) >= 2) AS keep
    FROM toks
    """,
    doc="Gopher quality-rule battery (Rae et al. 2021 appendix A): "
    "word-count band, mean-word-length band, alpha-word ratio, stopword "
    "floor — each surfaced as its own flag plus the conjunction, the way "
    "a curation pipeline audits WHY a document was dropped. All rules are "
    "integer comparisons (length sums vs n-scaled thresholds) — zero "
    "float thresholds, bit-identical on any engine, zero shuffles.",
)
def llm_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmdatapy_spark.functions.curation import gopher_flags
    from osmdatapy_spark.functions.text import tokens

    docs = T(spark, sf_dir, "documents")
    fl = gopher_flags(tokens(col("text")))
    return docs.select("doc_id", *[v.alias(k) for k, v in fl.items()])
