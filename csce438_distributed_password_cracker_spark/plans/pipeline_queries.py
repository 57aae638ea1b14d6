"""North-star training-data-pipeline queries (SURVEY.md §2.12) over the
driver ``documents`` / ``embeddings`` tables — the operators a 100 TB
LLM-data pipeline runs: dedup, text analysis, multimodal/binary columns,
similarity search.

Deeper variants (MinHash-LSH, SimHash, ANN with bucketing) live in
``operators/`` — those that SQL can't express are declared without an
oracle (driver records rows-only) and are brute-force-checked in tests.

Per-doc text analyses are fused into ONE query (``q_text_profile``) and
the three hash-sketch families into another (``q_dedup_sketch``) so the
driver correctness gate covers every semantic compactly: the fusions
are single-scan column unions / labeled unions, not new semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out_scan, load_table, table_path
from ..functions import vectors
from ..operators import decontam, dedup, multimodal, similarity, textnorm, textops
from ..operators.split import (
    md5_bucket_sql,
    md5_sample_sql,
    md5_uniform_sql,
)
from .registry import register
from .relational import _sql_query


def warehouse_root_tag(sf_dir: str) -> tuple["Path", str]:
    """(repo-local spark-warehouse dir, sf tag) for gate queries that
    persist on-disk artifacts (indexes, merge targets) — one derivation,
    shared by every such query here and in plans/streaming_queries."""
    from pathlib import Path

    root = Path(__file__).resolve().parents[2] / "spark-warehouse"
    tag = os.path.basename(os.path.normpath(sf_dir))
    return root, tag


def _source_tag(spark: SparkSession, sf_dir: str, table: str) -> int:
    """Freshness fingerprint for build-once gate indexes: the table's
    FILE-LISTING tag (fsutil.listing_tag — names, sizes, mtimes; zero
    data scan, zero Spark jobs).  A regenerated table re-tags, so the
    index rebuilds instead of serving stale data.  Round 9 replaced the
    former per-call full-corpus xxhash aggregation here: a probe-path
    freshness check that scans the corpus costs O(table) per probe —
    at sf10 it DOMINATED the ANN probe (the very cost the build/probe
    split exists to avoid), and at 100 TB it would be absurd.

    Residual staleness hole (documented in listing_tag's docstring): a
    same-names/same-sizes/same-mtime-ms in-place rewrite keeps the tag.
    Escape hatch: set ``SPARK_GRAFT_FORCE_REBUILD=<any new value>`` —
    it salts the tag, so every tag-keyed index path changes and the
    next access rebuilds from the current data."""
    from ..fsutil import listing_tag

    return listing_tag(
        spark,
        table_path(sf_dir, table),
        salt=os.environ.get("SPARK_GRAFT_FORCE_REBUILD", ""),
    )

from ..functions.porthash import md5_int_duckdb as _md5_duck

_SUBSTR_H = _md5_duck("array_to_string(t[i:i+7], ' ')", 42, 15)

@register(
    "q_dedup_exact",
    oracle=f"""
    WITH exact AS (
      SELECT 'exact' AS branch, md5(text) AS k,
             CAST(min(doc_id) AS DOUBLE) AS val_a,
             CAST(count(*) AS DOUBLE) AS val_b
      FROM documents
      GROUP BY md5(text)
    ),
    mrg AS (
      -- closed-form twin of the copy-on-write MERGE the Spark side
      -- actually executes on disk: target = orders with key%5<>4,
      -- delta = updates (%5=0: +1000), inserts (%5=4), tombstones
      -- (%5=1) -> merged table below
      SELECT 'merge' AS branch, CAST(o_orderkey AS VARCHAR) AS k,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000
                  ELSE o_totalprice END AS val_a,
             CAST(o_custkey % 4 AS DOUBLE) AS val_b
      FROM orders
      WHERE o_orderkey % 5 <> 1
    ),
    -- paragraph-dedup twin: 8-token chunks as pseudo-paragraphs, first
    -- occurrence = min (doc_id, pos) over the exact text (Spark elects
    -- over xxhash64 fingerprints; verdicts agree absent a 64-bit
    -- collision)
    ptoks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS nt
      FROM documents
    ),
    pexp AS (
      SELECT doc_id,
             unnest(generate_series(0, greatest(nt - 1, 0), 8)) AS s, t
      FROM ptoks
    ),
    p AS (
      SELECT doc_id, s AS pos,
             array_to_string(t[s + 1 : s + 8], ' ') AS para
      FROM pexp
    ),
    w AS (
      SELECT doc_id, pos, para,
             row_number() OVER (
               PARTITION BY para ORDER BY doc_id, pos) AS rn
      FROM p
    ),
    ptot AS (SELECT doc_id, count(*) AS n_par FROM p GROUP BY 1),
    pagg AS (
      SELECT doc_id, string_agg(para, '|' ORDER BY pos) AS txt,
             count(*) AS n_kept
      FROM w WHERE rn = 1 GROUP BY doc_id
    ),
    para AS (
      SELECT 'para' AS branch,
             concat(CAST(t.doc_id AS VARCHAR), ':',
                    md5(coalesce(a.txt, ''))) AS k,
             CAST(t.n_par AS DOUBLE) AS val_a,
             CAST(coalesce(a.n_kept, 0) AS DOUBLE) AS val_b
      FROM ptot t LEFT JOIN pagg a USING (doc_id)
    ),
    -- exact-substring twin (round 5): arbitrary-position 8-token
    -- windows, portable md5-60 fingerprints, first occurrence =
    -- min (doc_id, pos), overlapping duplicate spans merged
    -- (gaps-and-islands) and excised from every later occurrence
    stoks AS (
      -- coalesce mirrors the operator: NULL text tokenizes as [''],
      -- so val_a/val_b stay (1, 0) instead of NULL if a NULL-text row
      -- ever lands in the table
      SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t,
             len(string_split(coalesce(text, ''), ' ')) AS nt
      FROM documents
    ),
    swin AS (
      SELECT doc_id, unnest(generate_series(1, nt - 7)) AS i, t
      FROM stoks WHERE nt >= 8
    ),
    socc AS (
      SELECT doc_id, i - 1 AS ps, {_SUBSTR_H} AS h
      FROM swin
    ),
    sdup AS (
      SELECT doc_id, ps AS s, ps + 8 AS e
      FROM (
        SELECT doc_id, ps,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, ps)
                 AS rn,
               count(*) OVER (PARTITION BY h) AS n
        FROM socc
      ) WHERE n >= 2 AND rn > 1
    ),
    sprev AS (
      SELECT doc_id, s, e,
             max(e) OVER (
               PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
      FROM sdup
    ),
    sisl AS (
      SELECT doc_id, s, e,
             sum(CASE WHEN s > coalesce(pe, -1) THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s, e) AS isl
      FROM sprev
    ),
    smerged AS (
      SELECT doc_id, min(s) AS s, max(e) AS e
      FROM sisl GROUP BY doc_id, isl
    ),
    spos AS (
      SELECT doc_id, unnest(generate_series(0, nt - 1)) AS p, t
      FROM stoks
    ),
    skept AS (
      SELECT sp.doc_id,
             string_agg(sp.t[sp.p + 1], ' ' ORDER BY sp.p) AS txt,
             count(*) AS n_kept
      FROM spos sp
      WHERE NOT EXISTS (
        SELECT 1 FROM smerged m
        WHERE m.doc_id = sp.doc_id AND sp.p >= m.s AND sp.p < m.e)
      GROUP BY sp.doc_id
    ),
    substr_b AS (
      SELECT 'substr' AS branch,
             concat(CAST(st.doc_id AS VARCHAR), ':',
                    md5(coalesce(kk.txt, ''))) AS k,
             CAST(st.nt AS DOUBLE) AS val_a,
             CAST(st.nt - coalesce(kk.n_kept, 0) AS DOUBLE) AS val_b
      FROM stoks st LEFT JOIN skept kk USING (doc_id)
    )
    SELECT * FROM exact UNION ALL SELECT * FROM mrg
    UNION ALL SELECT * FROM para
    UNION ALL SELECT * FROM substr_b
    """,
    doc="E1 + table maintenance, one labeled union (round-4 fusion — the "
    "gate cap is full, so the MERGE operator gets its hard CORRECTNESS "
    "row by riding an existing entry, the decontam-fusion pattern): "
    "exact — dedup via hash-groupBy on a content fingerprint (one "
    "shuffle on a 128-bit key at 100 TB; map-side partials collapse "
    "most duplicates pre-exchange).  merge — operators/merge.py's "
    "copy-on-write MERGE INTO run FOR REAL on disk: a hive-partitioned "
    "orders snapshot is written, a derived delta (updates + inserts + "
    "tombstones) is merged through the partition-pruned directory-swap "
    "kernel, and the branch returns the POST-MERGE table contents read "
    "back from parquet — any lost partition, missed tombstone, or "
    "duplicated key diverges from the oracle's closed-form expected "
    "state.  para (late round-4 fusion) — operators/paradedup.py's "
    "cross-document paragraph dedup (the MassiveText/Gopher exact "
    "paragraph sweep) with 8-token chunks as the unit (the synthetic "
    "docs lack sentence separators): the branch emits each doc's md5 "
    "of the REASSEMBLED surviving text plus kept/total counts, and the "
    "oracle re-runs the whole election in SQL — explode, "
    "min-(doc_id,pos) first-occurrence, ordered string_agg reassembly.  "
    "substr (round-5 fusion) — operators/substring.py's EXACT SUBSTRING "
    "dedup (Lee et al. 2022 span-level sweep, windowed-hash "
    "formulation): arbitrary-position 8-token windows elect a "
    "corpus-wide first occurrence, later occurrences' spans merge "
    "(gaps-and-islands) and are excised map-side from the doc's own "
    "tokens — text never crosses the wire; the oracle recomputes "
    "windows, election, interval merge, and excision end-to-end with "
    "the portable md5-60 window hash.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import merge_upsert

    docs = load_table(spark, sf_dir, "documents")
    exact = docs.groupBy(F.md5("text").alias("k")).agg(
        F.min("doc_id").cast("double").alias("val_a"),
        F.count("*").cast("double").alias("val_b"),
    ).select(F.lit("exact").alias("branch"), "k", "val_a", "val_b")

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k_id"),
        F.col("o_totalprice").alias("price"),
        F.pmod(F.col("o_custkey"), F.lit(4)).cast("int").alias("part"),
    )
    root, tag = warehouse_root_tag(sf_dir)
    target_path = str(root / f"merge_gate_{tag}")
    # rebuild the pre-merge snapshot fresh each run: the merge MUTATES
    # it, so starting from a stale (already-merged) state would test
    # idempotence instead of the merge itself
    mod5 = F.pmod(F.col("k_id"), F.lit(5))
    base.filter(mod5 != 4).repartition(2, "part").write.mode(
        "overwrite"
    ).partitionBy("part").parquet(target_path)
    delta = (
        base.filter(mod5 == 0)
        .withColumn("price", F.col("price") + 1000)
        .withColumn("deleted", F.lit(False))
        .unionByName(
            base.filter(mod5 == 4).withColumn("deleted", F.lit(False))
        )
        .unionByName(
            base.filter(mod5 == 1).withColumn("deleted", F.lit(True))
        )
    )
    merge_upsert(
        spark,
        target_path,
        delta,
        key_cols=["k_id"],
        partition_col="part",
        delete_col="deleted",
    )
    merged = spark.read.parquet(target_path).select(
        F.lit("merge").alias("branch"),
        F.col("k_id").cast("string").alias("k"),
        F.col("price").alias("val_a"),
        F.col("part").cast("double").alias("val_b"),
    )

    from ..operators.paradedup import carve_pseudo_paragraphs, paragraph_dedup

    # the synthetic docs have no sentence separators, so carve 8-token
    # chunks as pseudo-paragraphs ('|'-joined; tokens are [a-z]+) and run
    # the REAL cross-doc paragraph-dedup operator over them
    docs_p = carve_pseudo_paragraphs(docs, "doc_id", "text", n=8, sep="|")
    para = paragraph_dedup(docs_p, "doc_id", "text", sep="|").select(
        F.lit("para").alias("branch"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.md5("text_deduped")
        ).alias("k"),
        F.col("n_paragraphs").cast("double").alias("val_a"),
        F.col("n_kept").cast("double").alias("val_b"),
    )

    from ..operators.substring import excise_duplicate_spans

    # exact-substring sweep (round 5): ARBITRARY-POSITION k=8 token
    # windows — catches the shifted duplication the aligned paragraph
    # carve misses; portable window hashes so the oracle re-runs the
    # whole election + interval merge + excision in SQL
    sub = excise_duplicate_spans(
        docs, "doc_id", "text", k=8, portable=True
    ).select(
        F.lit("substr").alias("branch"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.md5("text_deduped")
        ).alias("k"),
        F.col("n_tokens").cast("double").alias("val_a"),
        F.col("n_removed").cast("double").alias("val_b"),
    )
    return exact.unionAll(merged).unionAll(para).unionAll(sub)


def _langid_score_cols_duckdb() -> list[str]:
    toks = "string_split(text, ' ')"
    cols = []
    for lang in sorted(textops.DEFAULT_PROFILES):
        markers = ", ".join(f"'{m}'" for m in textops.DEFAULT_PROFILES[lang])
        cols.append(
            f"CAST(len(list_intersect({toks}, [{markers}])) AS INTEGER) AS score_{lang}"
        )
    return cols


def _langid_case_duckdb() -> str:
    # argmax with array_max-over-struct semantics: max score, tie -> the
    # lexicographically LAST language; a CASE chain in descending language
    # order with >= replicates that exactly.
    langs_desc = sorted(textops.DEFAULT_PROFILES, reverse=True)
    cases = []
    for lang in langs_desc:
        others = [o for o in langs_desc if o != lang]
        cond = " AND ".join(f"score_{lang} >= score_{o}" for o in others)
        cases.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(cases) + " END"


_SCORES = [f"score_{lang}" for lang in sorted(textops.DEFAULT_PROFILES)]

# redaction branch inputs: synthesize PII into every third doc so the
# redaction chain sees both hit and miss rows.  Only the email + ipv4
# patterns are gate-checked — the phone pattern uses lookbehind, which
# DuckDB's RE2 engine lacks (it stays unit-test covered).
_BPE_RX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # textops.token_counts default
_EMAIL_RX = textops.PII_PATTERNS[0][1]
_IPV4_RX = textops.PII_PATTERNS[1][1]
_SYNTH_SQL = (
    # STRING (not VARCHAR): the one cast spelling both parsers accept
    "CASE WHEN doc_id % 3 = 0 THEN text || ' u' || "
    "CAST(doc_id AS STRING) || '@ex.com at 10.0.0.' || "
    "CAST(doc_id % 256 AS STRING) ELSE text END"
)

# normalization-branch input (round-7 fusion, operators/textnorm.py):
# ASCII mixed-case + tab + padding derivation shared verbatim by both
# dialects — ASCII-only so lower() is engine-identical (non-ASCII case
# tables may differ JVM vs utf8proc; the operator documents that)
_NORM_INPUT = (
    "('  ' || upper(substring(text, 1, 40)) || chr(9) || ' End  ')"
)


# the structured-text derivation shared by the Gopher + repetition
# batteries (Spark dialect; the twin states it with chr(10))
_GOPHER_TEXT = (
    "CASE WHEN doc_id % 4 = 0 THEN "
    "concat('- ', text, '\\n', 'item...', '\\n', '- b') "
    "ELSE text END"
)

# LM/classifier twin constants (round-5 fusion): the portable md5-60
# feature/weight hashes and the dyadic weight grid, restated closed-form
_CLF_D = 4096  # gate feature space (tiny; production default is 2^18)
_CLF_FEAT_H = _md5_duck("'clf:' || g", 42, 15)
_CLF_W_H = _md5_duck("'w:' || CAST(feature AS VARCHAR)", 42, 15)


@register(
    "q_text_profile",
    oracle=f"""
    WITH base AS (
    SELECT doc_id, lang, n_chars, n_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_RX}')) AS BIGINT)
             AS n_bpe_tokens,
           n_distinct_tokens,
           stopword_ratio, avg_token_len, q_punct_ratio, q_stopword_ratio,
           n_distinct_trigrams, dup_trigram_frac,
           {", ".join(_SCORES)},
           {_langid_case_duckdb()} AS lang_pred,
           regexp_replace(regexp_replace(__synth, '{_EMAIL_RX}', '<EMAIL>', 'g'),
                          '{_IPV4_RX}', '<IP>', 'g') AS text_redacted,
           CAST(len(regexp_extract_all(__synth, '{_EMAIL_RX}'))
              + len(regexp_extract_all(
                    regexp_replace(__synth, '{_EMAIL_RX}', '<EMAIL>', 'g'),
                    '{_IPV4_RX}')) AS BIGINT) AS n_redactions,
           {textnorm.normalize_sql(_NORM_INPUT)} AS norm_text,
           CAST(length(norm_text) AS BIGINT) AS norm_len
    FROM (
      SELECT doc_id, lang, text,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_distinct_tokens,
             CASE WHEN len(string_split(text, ' ')) >= 3 THEN
               CAST(len(list_distinct(list_transform(
                 generate_series(1, len(string_split(text, ' ')) - 2),
                 i -> concat_ws(' ', string_split(text, ' ')[i],
                                     string_split(text, ' ')[i+1],
                                     string_split(text, ' ')[i+2]))))
                 AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS n_distinct_trigrams,
             CASE WHEN len(string_split(text, ' ')) >= 3 THEN
               round(1.0 - CAST(len(list_distinct(list_transform(
                 generate_series(1, len(string_split(text, ' ')) - 2),
                 i -> concat_ws(' ', string_split(text, ' ')[i],
                                     string_split(text, ' ')[i+1],
                                     string_split(text, ' ')[i+2]))))
                 AS DOUBLE) / (len(string_split(text, ' ')) - 2), 6)
             ELSE 0.0 END AS dup_trigram_frac,
             round(CAST(len(list_filter(string_split(text, ' '),
                   x -> x = 'the' OR x = 'a' OR x = 'data' OR x = 'row')) AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS stopword_ratio,
             round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS avg_token_len,
             CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS q_punct_ratio,
             CAST(len(list_intersect(string_split(text, ' '),
                  ['the', 'a', 'of', 'and', 'row', 'data'])) AS DOUBLE)
               / greatest(len(list_distinct(string_split(text, ' '))), 1)
               AS q_stopword_ratio,
             {", ".join(_langid_score_cols_duckdb())},
             {_SYNTH_SQL} AS __synth
      FROM documents
    )
    ),
    -- bigram-LM quality twin (round 5, operators/lmscore.py): the
    -- model is the documents table's own bigram counts; the gate
    -- consumes only the order-independent integer aggregates
    tk AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS nt
      FROM documents
    ),
    bg AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (
        SELECT doc_id, unnest(generate_series(1, nt - 1)) AS i, t
        FROM tk WHERE nt >= 2
      )
    ),
    lmm AS (
      SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY w1, w2
    ),
    lms AS (
      SELECT b.doc_id,
             CAST(count(*) AS BIGINT) AS lm_n_bigrams,
             CAST(sum(CASE WHEN m.cnt IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS lm_n_oov,
             CAST(sum(coalesce(m.cnt, 0)) AS BIGINT) AS lm_sum_cnt
      FROM bg b LEFT JOIN lmm m USING (w1, w2)
      GROUP BY b.doc_id
    ),
    -- hashed linear-classifier twin (round 5, operators/classifier.py):
    -- unigram + bigram bag, portable md5-60 feature hash mod {_CLF_D},
    -- pseudo-weights on the 2^-10 dyadic grid (exact float64 sums)
    gr AS (
      SELECT doc_id, unnest(t) AS g FROM tk
      UNION ALL
      SELECT doc_id, w1 || ' ' || w2 AS g FROM bg
    ),
    ft AS (
      SELECT doc_id, ({_CLF_FEAT_H}) % {_CLF_D} AS feature FROM gr
    ),
    clf AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS clf_n_feats,
             sum((CAST(({_CLF_W_H}) % 2048 AS DOUBLE) - 1024)
                 / 1024.0) AS clf_logit
      FROM ft GROUP BY doc_id
    ),
    -- Gopher rule-battery twin (round 5, textops.gopher_rules): every
    -- 4th doc gets synthetic line structure so the bullet/ellipsis
    -- line rules run on real multi-line input
    gop0 AS (
      SELECT doc_id, gt,
             list_filter(string_split(gt, ' '), w -> w != '') AS gw,
             list_filter(string_split(gt, chr(10)), l -> l != '') AS gl
      FROM (
        SELECT doc_id,
               CASE WHEN doc_id % 4 = 0 THEN
                 '- ' || text || chr(10) || 'item...' || chr(10) || '- b'
               ELSE text END AS gt
        FROM documents
      )
    ),
    gop AS (
      SELECT doc_id,
             CAST(len(gw) AS BIGINT) AS g_n_words,
             round(CAST(coalesce(list_sum(list_transform(gw,
                     w -> length(w))), 0) AS DOUBLE)
                   / greatest(len(gw), 1), 6) AS g_mean_word_len,
             round(CAST((length(gt) - length(replace(gt, '#', '')))
                   + (length(gt) - length(replace(gt, '...', ''))) / 3
                   AS DOUBLE) / greatest(len(gw), 1), 6) AS g_symbol_ratio,
             round(CAST(len(list_filter(gl, l ->
                     starts_with(ltrim(l), '- ')
                     OR starts_with(ltrim(l), '* ')
                     OR starts_with(ltrim(l), '•'))) AS DOUBLE)
                   / greatest(len(gl), 1), 6) AS g_bullet_frac,
             round(CAST(len(list_filter(gl, l ->
                     ends_with(rtrim(l), '...')
                     OR ends_with(rtrim(l), '…'))) AS DOUBLE)
                   / greatest(len(gl), 1), 6) AS g_ellipsis_frac,
             round(CAST(len(list_filter(gw,
                     w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE)
                   / greatest(len(gw), 1), 6) AS g_alpha_frac,
             CAST(len(list_intersect(gw, ['the','be','to','of','and',
                  'that','have','with'])) AS BIGINT) AS g_stop_hits
      FROM gop0
    ),
    -- repetition-battery twin (round 5, textops.repetition_battery):
    -- Rae 2021 A.1.2 duplicate-line + top-n-gram-char signals over the
    -- same structured text
    rep0 AS (
      SELECT doc_id, gw, gl,
             list_transform(generate_series(1, len(gw) - 1),
               i -> gw[i] || ' ' || gw[i + 1]) AS tg2,
             list_transform(generate_series(1, len(gw) - 2),
               i -> gw[i] || ' ' || gw[i + 1] || ' ' || gw[i + 2]) AS tg3,
             coalesce(list_sum(list_transform(gw, w -> length(w))), 0)
               AS wchars,
             coalesce(list_sum(list_transform(gl, l -> length(l))), 0)
               AS lchars
      FROM gop0
    ),
    rep AS (
      SELECT doc_id,
             CASE WHEN len(gl) > 0 THEN round(1.0 -
               CAST(len(list_distinct(gl)) AS DOUBLE) / len(gl), 6)
             ELSE 0.0 END AS r_dup_line_frac,
             CASE WHEN len(gl) > 0 THEN round(
               CAST(coalesce(list_sum(list_transform(gl, l ->
                 CASE WHEN len(list_filter(gl, y -> y = l)) >= 2
                      THEN length(l) ELSE 0 END)), 0) AS DOUBLE)
               / greatest(lchars, 1), 6)
             ELSE 0.0 END AS r_dup_line_char_frac,
             -- most-frequent gram: count*1e9 + coverage packs the
             -- (count, coverage) order into one BIGINT; coverage is
             -- recovered with %, fraction capped at 1.0
             CASE WHEN len(gw) >= 2 THEN round(least(1.0,
               CAST(list_max(list_transform(list_distinct(tg2),
                 g -> CAST(len(list_filter(tg2, x -> x = g)) AS BIGINT)
                      * 1000000000
                      + CAST(len(list_filter(tg2, x -> x = g)) AS BIGINT)
                      * (length(g) - 1))) % 1000000000 AS DOUBLE)
               / greatest(wchars, 1)), 6)
             ELSE 0.0 END AS r_top2gram_char_frac,
             CASE WHEN len(gw) >= 3 THEN round(least(1.0,
               CAST(list_max(list_transform(list_distinct(tg3),
                 g -> CAST(len(list_filter(tg3, x -> x = g)) AS BIGINT)
                      * 1000000000
                      + CAST(len(list_filter(tg3, x -> x = g)) AS BIGINT)
                      * (length(g) - 2))) % 1000000000 AS DOUBLE)
               / greatest(wchars, 1)), 6)
             ELSE 0.0 END AS r_top3gram_char_frac
      FROM rep0
    )
    SELECT b.*,
           coalesce(l.lm_n_bigrams, 0) AS lm_n_bigrams,
           coalesce(l.lm_n_oov, 0) AS lm_n_oov,
           coalesce(l.lm_sum_cnt, 0) AS lm_sum_cnt,
           coalesce(c.clf_n_feats, 0) AS clf_n_feats,
           coalesce(c.clf_logit, 0.0) AS clf_logit,
           coalesce(c.clf_logit, 0.0) > 0 AS clf_label,
           g.g_n_words, g.g_mean_word_len, g.g_symbol_ratio,
           g.g_bullet_frac, g.g_ellipsis_frac, g.g_alpha_frac,
           g.g_stop_hits,
           (g.g_n_words BETWEEN 50 AND 100000)
             AND (g.g_mean_word_len BETWEEN 3.0 AND 10.0)
             AND (g.g_symbol_ratio < 0.1)
             AND (g.g_bullet_frac <= 0.9)
             AND (g.g_ellipsis_frac <= 0.3)
             AND (g.g_alpha_frac >= 0.8)
             AND (g.g_stop_hits >= 1) AS gopher_keep,
           r.r_dup_line_frac, r.r_dup_line_char_frac,
           r.r_top2gram_char_frac, r.r_top3gram_char_frac,
           (r.r_dup_line_frac <= 0.3)
             AND (r.r_dup_line_char_frac <= 0.2)
             AND (r.r_top2gram_char_frac <= 0.2)
             AND (r.r_top3gram_char_frac <= 0.18) AS repetition_keep
    FROM base b
    LEFT JOIN lms l USING (doc_id)
    LEFT JOIN clf c USING (doc_id)
    JOIN gop g USING (doc_id)
    JOIN rep r USING (doc_id)
    """,
    doc="E3 text-analysis profile, one scan, zero shuffles: whitespace "
    "token counting (split/array ops fully JVM-side), quality features "
    "(stopword ratio, mean token length, punctuation ratio — codegen'd "
    "higher-order filter lambdas, no UDF; the filter stage of a "
    "pretraining pipeline), Gopher-style repetition metrics (distinct "
    "trigram count + duplicate-trigram fraction, "
    "textops.repetition_metrics — the repetition-removal signal), and "
    "marker-overlap language ID (per-language "
    "array_intersect scores + argmax over (score, lang) structs with "
    "deterministic tie-break).  The composite `quality` product is "
    "excluded from the gated output: its dyadic-fraction factors land "
    "composite values exactly on round-half ties where Spark (half-up on "
    "the exact double) and DuckDB (half-even) disagree in the 6th "
    "decimal — covered by unit tests instead.  Round-4 fusion: PII "
    "redaction (textops.redact_pii) rides the same single scan — PII is "
    "synthesized into every third doc, the ordered email+ipv4 "
    "regexp_replace chain runs for real, and the oracle recomputes the "
    "redacted TEXT and match counts with RE2 (phone's lookbehind "
    "pattern stays unit-test covered).  Round-5 fusion: the two "
    "model-based quality filters join the profile on the doc key — "
    "bigram-LM scoring (operators/lmscore.py, CCNet-shaped: the lm_* "
    "columns are the order-independent INTEGER aggregates; the float "
    "perplexity stays unit-tested) and the hashed linear classifier "
    "(operators/classifier.py, fastText-shaped: portable md5-60 "
    "features mod 4096, pseudo-weights on the 2^-10 dyadic grid so "
    "clf_logit is EXACT under any addition order and hashes "
    "bit-identically in both engines; the sigmoid stays unit-tested). "
    "The profile scan itself remains one pass; the fused rollups add "
    "the model join (broadcast-able) and one doc-key aggregation each.",
)
def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = "split(text, ' ')"
    # the profile battery is the query's heavy map-side work (measured
    # serial on the row-group-bound scan: 2.6 s wall ≈ its CPU) — fan
    # ONLY its input out (guide §2.5); the lm/clf sub-DAGs are cheap and
    # shuffle on their own keys anyway
    profiled = textops.quality_score(
        textops.language_id(
            # source_path: the floor guard counts ROW GROUPS from the
            # parquet footers (the unit a scan task actually reads),
            # not planned byte-range splits — see fan_out_scan
            fan_out_scan(
                docs,
                "doc_id",
                source_path=table_path(sf_dir, "documents"),
            )
        )
    )
    profiled = profiled.withColumn("__synth", F.expr(_SYNTH_SQL))
    # round-12: pre-project the split arrays / counts the two rule
    # batteries and the repetition metrics share.  Higher-order-function
    # lambdas run interpreted (no codegen, no subexpression elimination),
    # so inlined they re-derive filter(split(…)) once PER OUTPUT COLUMN;
    # CollapseProject keeps this stage separate from the battery select
    # because the aliases are non-cheap and multiply referenced.
    # Measured: the two batteries 2.07 → 1.44 CPU-s at sf0.1, identical
    # values.  The temps never leave this function (the select below
    # projects the declared schema only).
    _tris = (
        f"zip_with("
        f"  zip_with(slice({toks}, 1, size({toks}) - 2),"
        f"           slice({toks}, 2, size({toks}) - 2),"
        f"           (x, y) -> concat(x, ' ', y)),"
        f"  slice({toks}, 3, size({toks}) - 2),"
        f"  (x, y) -> concat(x, ' ', y))"
    )
    profiled = profiled.withColumns(
        {
            "__gw": F.expr(
                f"filter(split({_GOPHER_TEXT}, ' '), w -> w != '')"
            ),
            "__gl": F.expr(
                f"filter(split({_GOPHER_TEXT}, '\\n'), l -> l != '')"
            ),
            "__ntok": F.expr(f"size({toks})"),
            "__ndt": F.expr(
                f"CASE WHEN size({toks}) >= 3 THEN "
                f"CAST(size(array_distinct({_tris})) AS BIGINT) "
                f"ELSE CAST(0 AS BIGINT) END"
            ),
        }
    )
    prof = profiled.select(
        "doc_id",
        "lang",
        F.expr("CAST(length(text) AS BIGINT)").alias("n_chars"),
        F.expr("CAST(__ntok AS BIGINT)").alias("n_tokens"),
        # the BPE-ish count (letters / digit-runs / punctuation as
        # separate tokens — textops.token_counts), fused onto the same
        # scan; lookaround-free so RE2 recomputes it identically
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(_BPE_RX), F.lit(0))
        ).cast("long").alias("n_bpe_tokens"),
        F.expr(f"CAST(size(array_distinct({toks})) AS BIGINT)").alias(
            "n_distinct_tokens"
        ),
        F.expr(
            f"round(CAST(size(filter({toks}, "
            "x -> x = 'the' OR x = 'a' OR x = 'data' OR x = 'row')) AS DOUBLE)"
            " / CAST(__ntok AS DOUBLE), 6)"
        ).alias("stopword_ratio"),
        F.expr(
            "round(CAST(length(replace(text, ' ', '')) AS DOUBLE)"
            " / CAST(__ntok AS DOUBLE), 6)"
        ).alias("avg_token_len"),
        "q_punct_ratio",
        "q_stopword_ratio",
        *textops.repetition_metrics(
            "text", ntoks_expr="__ntok", ndt_expr="__ndt"
        ),
        *_SCORES,
        "lang_pred",
        *textops.redact_pii(
            "__synth", patterns=textops.PII_PATTERNS[:2]
        ),
        # round-5 fusion: the Gopher rule battery (Rae 2021 A.1.1) and
        # the repetition battery (A.1.2) on the same scan — every 4th
        # doc gets synthetic line structure so the line rules exercise
        # multi-line input; min_stop_hits tuned to 1 for the synthetic
        # vocabulary (the thresholds are keyword args)
        *textops.gopher_rules(
            _GOPHER_TEXT, words_expr="__gw", lines_expr="__gl"
        ),
        *textops.repetition_battery(
            _GOPHER_TEXT, words_expr="__gw", lines_expr="__gl"
        ),
        # round-7 fusion: text normalization (operators/textnorm.py) on
        # the same scan — ASCII mixed-case + tab + padding derivation,
        # full normalized STRING hash-checked plus its length
        textnorm.normalize_expr(F.expr(_NORM_INPUT)).alias("norm_text"),
    ).withColumn(
        "norm_len", F.length("norm_text").cast("long")
    ).withColumn(
        "gopher_keep", textops.gopher_keep(min_stop_hits=1)
    ).withColumn("repetition_keep", textops.repetition_keep())

    from ..operators import classifier, lmscore

    # round-5 fusion: self-trained bigram LM (integer aggregates only —
    # the float perplexity is order-dependent and stays unit-tested) +
    # hashed linear classifier (dyadic weights -> exact logit)
    lm = lmscore.score_documents(
        docs, lmscore.train_bigram_lm(docs), vocab_size=64
    ).select("doc_id", "lm_n_bigrams", "lm_n_oov", "lm_sum_cnt")
    clf = classifier.score_linear(
        docs,
        classifier.pseudo_weights(spark, _CLF_D, portable=True),
        n_features=_CLF_D,
        portable=True,
    ).select("doc_id", "clf_n_feats", "clf_logit", "clf_label")
    return prof.join(lm, "doc_id").join(clf, "doc_id")


@register(
    "q_binary_roundtrip",
    oracle=f"""
    SELECT 'binary' AS branch, doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           decode(encode(text)) = text AS roundtrip_ok
    FROM documents
    UNION ALL
    SELECT 'ingest_csv' AS branch, doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           true AS roundtrip_ok
    FROM documents
    UNION ALL
    SELECT 'export' AS branch,
           CAST(shard AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_bytes,
           true AS roundtrip_ok
    FROM (
      SELECT ({md5_bucket_sql("CAST(doc_id AS STRING)", 8)}) AS shard
      FROM documents
    ) GROUP BY shard
    UNION ALL
    SELECT 'ingest_bin' AS branch, doc_id,
           CASE WHEN doc_id % 2 = 1
                THEN CAST(44 + 2 * (64 + n_chars % 128) AS BIGINT)
           END AS n_bytes,
           true AS roundtrip_ok
    FROM documents WHERE doc_id < 32
    """,
    doc="E4 + ingestion front door, one labeled union.  binary: opaque "
    "binary columns — string⇄binary round trip; the multimodal decode "
    "path (operators/multimodal.py) rides the same BinaryType plumbing.  "
    "ingest_csv (round-4 fusion): sources/ingest.py run FOR REAL — the "
    "documents slice is written out as CSV, read back through the "
    "schema-DECLARED (never inferred) PERMISSIVE reader, split from its "
    "quarantine column, and joined against the parquet truth; "
    "roundtrip_ok asserts byte-exact text + lang survival through CSV "
    "quoting and n_bytes re-measures the reread text, so any "
    "quoting/escaping/schema bug in the front door hash-diverges.  "
    "export (round-5 fusion): operators/export.py run FOR REAL — the "
    "documents slice is sharded on the engine-portable md5 bucket "
    "(8 shards), written hive-style with pre-write count+bit_xor "
    "checksums, integrity-verified against the written bytes, manifest "
    "published LAST, then read back through read_shards(validate=True); "
    "the branch emits per-shard row counts (n_bytes column) compared "
    "against BOTH the manifest and the oracle's closed-form bucket "
    "counts, so a lost task, truncated file or mis-sharded row "
    "hash-diverges.  ingest_bin (round-7 fusion): the raw binary-file "
    "front door run FOR REAL — 32 deterministic media payloads "
    "(synthesize_media) land as FILES, come back through Spark's "
    "binaryFile source via sources/ingest.ingest_binary (JVM magic-byte "
    "sniff, listing-time glob), and roundtrip_ok asserts byte-exact "
    "payload + sniffed-kind + length against the in-plan synthesis "
    "twin; n_bytes re-measures the reread WAV payloads against the "
    "oracle's closed-form 44 + 2*(64 + n_chars % 128) (PNG sizes are "
    "zlib-dependent, deliberately NULL).",
)
def q_binary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..sources.ingest import ingest, split_valid

    docs = load_table(spark, sf_dir, "documents")
    binary = docs.select(
        F.lit("binary").alias("branch"),
        "doc_id",
        F.length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
        (F.col("text").cast("binary").cast("string") == F.col("text")).alias(
            "roundtrip_ok"
        ),
    )

    root, tag = warehouse_root_tag(sf_dir)
    csv_dir = str(root / f"ingest_gate_{tag}")
    shutil.rmtree(csv_dir, ignore_errors=True)
    docs.select("doc_id", "text", "lang").repartition(2).write.option(
        "header", True
    ).csv(csv_dir)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    reread = ingest(
        spark, csv_dir, "csv", schema, options={"header": "true"}
    )
    valid, _quarantine = split_valid(reread)
    orig = docs.select(
        F.col("doc_id").alias("__oid"),
        F.col("text").alias("__otext"),
        F.col("lang").alias("__olang"),
    )
    ingested = valid.join(orig, F.col("doc_id") == F.col("__oid")).select(
        F.lit("ingest_csv").alias("branch"),
        "doc_id",
        F.length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
        (
            F.col("text").eqNullSafe(F.col("__otext"))
            & F.col("lang").eqNullSafe(F.col("__olang"))
        ).alias("roundtrip_ok"),
    )

    # export branch (round-5 fusion): sharded export run FOR REAL —
    # write + integrity verify + manifest publish + validated read-back
    from ..operators import export as export_ops

    exp_dir = str(root / f"export_gate_{tag}")
    shutil.rmtree(exp_dir, ignore_errors=True)
    sharded = docs.select(
        "doc_id",
        "text",
        "lang",
        F.expr(md5_bucket_sql("CAST(doc_id AS STRING)", 8))
        .cast("int")
        .alias("shard"),
    )
    manifest = export_ops.export_shards(
        sharded, exp_dir, num_shards=8, shard_col="shard"
    )
    # JVM-side VALUES (LocalTableScan) — a createDataFrame(python rows)
    # literal here plans as `Scan ExistingRDD` and forks pyspark workers
    # to evaluate 8 rows (round-10 verdict, Scan-ExistingRDD audit)
    _mvals = ", ".join(
        f"({int(s['shard'])}, {int(s['rows'])})" for s in manifest["shards"]
    )
    mrows = spark.sql(
        "SELECT CAST(shard AS INT) AS shard, CAST(mrows AS BIGINT) AS mrows "
        f"FROM VALUES {_mvals} AS t(shard, mrows)"
    )
    exported = (
        export_ops.read_shards(spark, exp_dir)
        .groupBy("shard")
        .agg(F.count("*").alias("__n"))
        .join(F.broadcast(mrows), "shard")
        .select(
            F.lit("export").alias("branch"),
            F.col("shard").cast("long").alias("doc_id"),
            F.col("__n").cast("long").alias("n_bytes"),
            (F.col("__n") == F.col("mrows")).alias("roundtrip_ok"),
        )
    )
    # ingest_bin branch (round-7 fusion): the binaryFile front door run
    # FOR REAL.  32 deterministic payloads (synthesize_media — the
    # q_multimodal_features generator) land as one file each, then come
    # back through ingest_binary; the verdict compares the reread bytes
    # / sniffed kind / length against a SECOND in-plan synthesis of the
    # same rows, so any corruption in write-out, listing, glob, read or
    # sniff hash-diverges.  Driver-side file write is 32 tiny blobs —
    # gate-scale only, rebuilt fresh each run (the files ARE the input
    # under test, not a cache).
    from ..operators.multimodal import synthesize_media
    from ..sources.ingest import ingest_binary

    bin_dir = root / f"binary_gate_{tag}"
    shutil.rmtree(bin_dir, ignore_errors=True)
    bin_dir.mkdir(parents=True)
    slice32 = docs.where(F.col("doc_id") < 32)
    for r in synthesize_media(slice32).collect():
        (bin_dir / f"blob_{int(r['doc_id'])}.bin").write_bytes(
            bytes(r["payload"])
        )
    reread_bin = ingest_binary(spark, str(bin_dir), glob="*.bin").select(
        F.regexp_extract(
            F.element_at(F.split("path", "/"), -1), r"blob_(\d+)\.bin", 1
        )
        .cast("long")
        .alias("doc_id"),
        F.col("media_type").alias("__kind"),
        F.col("payload").alias("__payload"),
        F.col("length").alias("__len"),
    )
    expected = synthesize_media(slice32).select(
        F.col("doc_id").alias("__eid"),
        F.col("media_type").alias("__ekind"),
        F.col("payload").alias("__epayload"),
    )
    ingested_bin = reread_bin.join(
        expected, F.col("doc_id") == F.col("__eid")
    ).select(
        F.lit("ingest_bin").alias("branch"),
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 1, F.col("__len").cast("long")
        ).alias("n_bytes"),
        (
            (F.col("__payload") == F.col("__epayload"))
            & (F.col("__kind") == F.col("__ekind"))
            & (F.col("__len") == F.length("__epayload"))
        ).alias("roundtrip_ok"),
    )
    return (
        binary.unionAll(ingested).unionAll(exported).unionAll(ingested_bin)
    )


_BM25_GATE_QUERY = "dup merge vector"  # one rare + two common terms
_BM25_QUERY2 = "customer stream window"  # second list for the RRF branch

# mmr branch (round 8): greedy diversity re-rank over the knn shortlist.
# lam spelled as a string so the oracle can inline the IDENTICAL float64
# literal (DuckDB bare decimals parse as DECIMAL and lose ulps — r7 note)
_MMR_SHORTLIST, _MMR_K, _MMR_LAM_STR = 10, 6, "0.7"
_MMR_LAM = float(_MMR_LAM_STR)

# DuckDB twin of hybrid.mmr_rerank's greedy loop: a recursive CTE whose
# working row carries the picked-id list; each step argmaxes
# lam*rel − (1−lam)*max(0, max cosine to picked) over the remaining
# shortlist, tie-broken (raw desc, rel desc, id asc) exactly like the
# numpy kernel (rows pre-sorted rel desc/id asc + first-max argmax).
# The penalty max runs over UNROUNDED pairwise cosines, mirroring the
# float64 normalize-then-dot; the output mirrors Python round(·, 8).
_MMR_ORACLE_CTES = f"""
    mmr_cand AS (
      SELECT e.vec_id AS id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.embedding AS DOUBLE[])), 6)
               AS rel,
             CAST(e.embedding AS DOUBLE[]) AS v
      FROM embeddings e,
           (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE e.vec_id <> 0
      ORDER BY rel DESC, e.vec_id
      LIMIT {_MMR_SHORTLIST}
    ),
    mmr_sims AS (
      SELECT a.id AS id_a, b.id AS id_b,
             list_cosine_similarity(a.v, b.v) AS sim
      FROM mmr_cand a JOIN mmr_cand b ON a.id <> b.id
    ),
    mmr_g(rank, picked, id, score) AS (
      (SELECT 1, [id], id,
              round(CAST('{_MMR_LAM_STR}' AS DOUBLE) * rel, 8)
       FROM mmr_cand ORDER BY rel DESC, id LIMIT 1)
      UNION ALL
      (SELECT rank, picked, id, score FROM (
         SELECT g.rank + 1 AS rank,
                list_append(g.picked, m.id) AS picked,
                m.id AS id,
                round(CAST('{_MMR_LAM_STR}' AS DOUBLE) * m.rel
                  - (1 - CAST('{_MMR_LAM_STR}' AS DOUBLE))
                    * greatest(CAST(0 AS DOUBLE),
                        (SELECT max(s.sim) FROM mmr_sims s
                         WHERE s.id_a = m.id
                           AND list_contains(g.picked, s.id_b))), 8)
                  AS score,
                CAST('{_MMR_LAM_STR}' AS DOUBLE) * m.rel
                  - (1 - CAST('{_MMR_LAM_STR}' AS DOUBLE))
                    * greatest(CAST(0 AS DOUBLE),
                        (SELECT max(s.sim) FROM mmr_sims s
                         WHERE s.id_a = m.id
                           AND list_contains(g.picked, s.id_b)))
                  AS raw,
                m.rel AS rel
         FROM mmr_g g, mmr_cand m
         WHERE NOT list_contains(g.picked, m.id) AND g.rank < {_MMR_K}
         ORDER BY raw DESC, rel DESC, id
         LIMIT 1
      ))
    ),
    mmr AS (
      SELECT concat('mmr:', CAST(rank AS VARCHAR)) AS method, id, score
      FROM mmr_g
    )"""


def _terms_sql(query: str) -> str:
    return "', '".join(sorted(set(query.split(" "))))


def _bm25_list_cte(prefix: str, query: str) -> str:
    """DuckDB CTE fragment computing the top-10 BM25 list for ``query``
    as ``{prefix}_list(id, score)`` — the closed-form twin of one
    bm25_search probe (shares bm_toks/bm_stats)."""
    return f"""
    {prefix}_post AS (
      SELECT id, q.term,
             CAST(len(list_filter(t, x -> x = q.term)) AS DOUBLE) AS tf,
             CAST(len(t) AS DOUBLE) AS dl
      FROM bm_toks, (SELECT unnest(['{_terms_sql(query)}']) AS term) q
    ),
    {prefix}_df AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS df_t
      FROM {prefix}_post WHERE tf > 0 GROUP BY term
    ),
    {prefix}_list AS (
      SELECT id, score FROM (
        SELECT id,
               round(sum(ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
                   * (tf * 2.2)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6)
                 AS score
        FROM {prefix}_post JOIN {prefix}_df USING (term), bm_stats
        WHERE tf > 0
        GROUP BY id
      )
      ORDER BY score DESC, id
      LIMIT 10
    )"""


@register(
    "q_similarity_knn",
    oracle=f"""
    WITH RECURSIVE knn AS (
      SELECT 'knn' AS method, e.vec_id AS id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.embedding AS DOUBLE[])), 6)
               AS score
      FROM embeddings e,
           (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE e.vec_id <> 0
      ORDER BY score DESC, e.vec_id
      LIMIT 10
    ),
    bm_toks AS (
      SELECT doc_id AS id, string_split(text, ' ') AS t FROM documents
    ),
    bm_stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(len(t)) AS DOUBLE) / count(*) AS avgdl
      FROM bm_toks
    ),{_MMR_ORACLE_CTES},{_bm25_list_cte("bm1", _BM25_GATE_QUERY)},{_bm25_list_cte("bm2", _BM25_QUERY2)},
    bm AS (SELECT 'bm25' AS method, id, score FROM bm1_list),
    r1 AS (
      SELECT id, 1.0 / (60 + row_number()
               OVER (ORDER BY score DESC, id)) AS rr
      FROM bm1_list
    ),
    r2 AS (
      SELECT id, 1.0 / (60 + row_number()
               OVER (ORDER BY score DESC, id)) AS rr
      FROM bm2_list
    ),
    rrf AS (
      SELECT 'rrf' AS method, id,
             round(COALESCE(r1.rr, 0) + COALESCE(r2.rr, 0), 8) AS score
      FROM r1 FULL JOIN r2 USING (id)
      ORDER BY score DESC, id
      LIMIT 10
    )
    SELECT * FROM knn
    UNION ALL SELECT * FROM bm
    UNION ALL SELECT * FROM rrf
    UNION ALL SELECT * FROM mmr
    """,
    doc="E2 retrieval baselines, one labeled union (round-4 fusion — the "
    "BM25 index gets its hard CORRECTNESS row by riding this entry): "
    "knn — brute-force cosine top-k against a query vector: broadcast "
    "the 1-row query, zip_with/aggregate dot product in codegen, "
    "TakeOrderedAndProject (no full sort); the LSH-bucketed scale path "
    "is operators/similarity.py.  bm25 — operators/search.py's "
    "build-then-probe lexical retrieval run FOR REAL: postings built "
    "once per corpus into a term-bucket-partitioned parquet index, the "
    "probe prunes to the query terms' bucket dirs (buckets stored in "
    "termstats at build — no per-probe hash job), IDF folds driver-side "
    "into a literal map, score+top-k in one codegen'd pass.  The oracle "
    "recomputes the smooth-IDF saturation formula closed-form from the "
    "raw documents table, so any index/probe bug (wrong df, stale "
    "stats, dropped bucket) diverges.  rrf (round-4 fusion) — "
    "operators/hybrid.py's reciprocal rank fusion run over two real "
    "probe lists (multi-query fusion: the gate query and a second "
    "fixed query against the same index); the oracle re-derives both "
    "lists and the 1/(60+rank) algebra closed-form, pinning the rank "
    "windows, the full-outer null-rank handling, and the fused "
    "ordering.  mmr (round-8 fusion) — hybrid.mmr_rerank's greedy "
    "diversity re-rank over the knn shortlist gets its hard "
    "CORRECTNESS row here: the oracle replays the greedy loop as a "
    "recursive CTE (working row carries the picked-id list; each step "
    "argmaxes lam*rel − (1−lam)*max(0, max cosine to picked) with the "
    "kernel's exact tie order), so every pick, its rank (encoded in "
    "the method label), and its round-8 selection score must match "
    "the numpy kernel bit-for-bit.",
)
def q_similarity_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathlib import Path

    from ..operators import search

    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    knn = similarity.brute_force_topk(
        emb.filter(F.col("vec_id") != 0), query
    ).select(
        F.lit("knn").alias("method"),
        F.col("vec_id").alias("id"),
        F.col("cos_sim").cast("double").alias("score"),
    )

    docs = load_table(spark, sf_dir, "documents")
    root, tag = warehouse_root_tag(sf_dir)
    # build once per corpus VERSION (the whole point of build/probe —
    # probes must not pay the build); the tag carries the layout params
    # AND a content fingerprint, so a driver-regenerated documents
    # table (or an index schema change) invalidates by path instead of
    # probing a stale index
    idx = str(root / f"bm25_{tag}_b16tb_{_source_tag(spark, sf_dir, 'documents')}")
    if not (Path(idx) / "stats").exists():
        search.bm25_build(docs, "doc_id", "text", idx, n_buckets=16)
    from ..operators.hybrid import mmr_rerank, rrf_fuse

    # mmr (round-8 fusion): hybrid.mmr_rerank's greedy diversity pass
    # run over the SAME knn shortlist (cosine rel is already
    # [0,1]-comparable), picks labeled by rank so the oracle's
    # recursive-CTE greedy trace must match pick-for-pick
    shortlist = similarity.brute_force_topk(
        emb.filter(F.col("vec_id") != 0), query, k=_MMR_SHORTLIST
    ).join(
        emb.select("vec_id", F.col("embedding").alias("vec")), "vec_id"
    ).select(
        F.col("vec_id").alias("id"),
        F.col("cos_sim").cast("double").alias("score"),
        "vec",
    )
    # the two bm25 searches (driver-side bucket pruning + stats reads)
    # and the MMR greedy (driver-side shortlist collect + fold) are
    # independent blocking chains — overlap their construction
    # (opt guide §2.6; same pattern as q_ann_probe); the index build
    # above stays sequential, it must exist before either search
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        l1_f = pool.submit(
            search.bm25_search, spark, idx, _BM25_GATE_QUERY, top_n=10
        )
        l2_f = pool.submit(
            search.bm25_search, spark, idx, _BM25_QUERY2, top_n=10
        )
        mmr_f = pool.submit(mmr_rerank, shortlist, k=_MMR_K, lam=_MMR_LAM)
    list1, list2 = l1_f.result(), l2_f.result()
    bm = list1.select(F.lit("bm25").alias("method"), "id", "score")
    rrf = rrf_fuse(list1, list2, top_n=10).select(
        F.lit("rrf").alias("method"),
        "id",
        F.col("rrf_score").alias("score"),
    )
    mmr = mmr_f.result().select(
        F.concat(F.lit("mmr:"), F.col("mmr_rank").cast("string")).alias(
            "method"
        ),
        "id",
        F.col("mmr_score").alias("score"),
    )
    return knn.unionAll(bm).unionAll(rrf).unionAll(mmr)


@register(
    "q_dedup_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
               i -> concat_ws(' ', string_split(text, ' ')[i],
                                   string_split(text, ' ')[i+1],
                                   string_split(text, ' ')[i+2])) AS s
      FROM documents
    ),
    jac AS (
      SELECT 'jaccard' AS method, id_a, id_b, jaccard AS score FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
      ) WHERE jaccard >= 0.8
    ),
    sh5 AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 4, 1)),
               i -> concat_ws(' ', string_split(text, ' ')[i],
                                   string_split(text, ' ')[i+1],
                                   string_split(text, ' ')[i+2],
                                   string_split(text, ' ')[i+3],
                                   string_split(text, ' ')[i+4]))) AS s
      FROM documents
    ),
    trg AS (SELECT doc_id, unnest(s) AS g FROM sh5 WHERE doc_id % 7 <> 0),
    evg AS (SELECT doc_id, unnest(s) AS g FROM sh5 WHERE doc_id % 7 = 0),
    dec AS (
      SELECT 'decontam' AS method, train_id AS id_a, eval_id AS id_b,
             CAST(n_shared AS DOUBLE) AS score
      FROM (
        SELECT trg.doc_id AS train_id, evg.doc_id AS eval_id,
               count(*) AS n_shared
        FROM trg JOIN evg USING (g)
        GROUP BY 1, 2
      ) WHERE n_shared >= 2
    ),
    -- fuzzy-key twin (round 5, operators/fuzzy.py): brute-force
    -- Levenshtein over the DISTINCT part names where Spark joins on
    -- FastSS deletion variants — agreement checks the neighborhood
    -- algebra against the distance semantics it implements
    fkeys AS (
      SELECT p_name AS _k, CAST(min(p_partkey) AS BIGINT) AS _id
      FROM part GROUP BY 1
    ),
    fz AS (
      SELECT 'fuzzy' AS method, id_a, id_b, CAST(dist AS DOUBLE) AS score
      FROM (
        SELECT a._id AS id_a, b._id AS id_b,
               levenshtein(a._k, b._k) AS dist
        FROM fkeys a, fkeys b WHERE a._id < b._id
      ) WHERE dist = 1
    )
    SELECT * FROM jac UNION ALL SELECT * FROM dec
    UNION ALL SELECT * FROM fz
    """,
    doc="E1/near-dup + corpus hygiene, one labeled union: jaccard — EXACT "
    "3-gram-shingle Jaccard ≥ 0.8 pairs via prefix-filtered set-similarity "
    "join (no cross join on the Spark side; the oracle brute-forces all "
    "pairs).  3-gram shingles, not unigrams: the synthetic docs draw from "
    "a ~31-token vocabulary, so unigram SETS are degenerate — shingling "
    "restores discriminative sets, exactly why real pipelines shingle.  "
    "decontam — benchmark decontamination (operators/decontam.py): "
    "distinct 5-gram overlap counts between the training partition "
    "(doc_id % 7 <> 0) and the eval partition (doc_id % 7 = 0), pairs "
    "with ≥ 2 shared grams; eval gram set broadcast, so the corpus side "
    "is flagged in one map-side pass (the GPT-3/PaLM-style dirty-doc "
    "sweep, Spark-first).  fuzzy (round-5 fusion) — edit-distance key "
    "matching (operators/fuzzy.py, FastSS/SymSpell deletion "
    "neighborhoods): distinct part-name pairs within Levenshtein 1 via "
    "ONE variant self-join + the JVM levenshtein verifier; the oracle "
    "brute-forces all name pairs, so agreement proves the neighborhood "
    "join finds EXACTLY the true pairs.",
)
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    jac = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8
    ).select(
        F.lit("jaccard").alias("method"),
        "id_a",
        "id_b",
        F.col("jaccard").cast("double").alias("score"),
    )
    dec = decontam.ngram_overlap(
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0),
        "doc_id",
        "text",
        n=5,
        min_hits=2,
    ).select(
        F.lit("decontam").alias("method"),
        F.col("train_id").alias("id_a"),
        F.col("eval_id").alias("id_b"),
        F.col("n_shared").cast("double").alias("score"),
    )

    from ..operators import fuzzy

    parts = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("pid"), "p_name"
    )
    fz = fuzzy.fuzzy_key_pairs(parts, "pid", "p_name", max_edits=1).select(
        F.lit("fuzzy").alias("method"),
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("dist").cast("double").alias("score"),
    )
    return jac.unionAll(dec).unionAll(fz)


def _sketch_oracle_sql(
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    threshold: float = 0.8,
    max_hamming: int = 3,
    sh_bits: int = 60,
    fp_k: int = 8,
    fp_keep: int = 16,
) -> str:
    """Full DuckDB twin of the three hash-sketch pipelines (portable-hash
    mode — functions/porthash.py): recomputes the MinHash signatures,
    band keys, candidate join and exact-Jaccard verification; the SimHash
    bit sign-sums, fingerprint assembly and brute-force hamming pairs; and
    the winnowing gram hashes — end to end in SQL.  The oracle brute-forces
    where Spark buckets (all-pairs hamming, all-pairs Jaccard on
    candidates), so agreement checks the *bucketing* algebra against the
    semantics it implements, not one implementation against itself.  The
    skew guard (max_bucket_size) is deliberately absent here: at oracle SF
    no bucket approaches the cap, so it is a no-op on the Spark side too.
    """
    from ..functions.porthash import (
        BAND_A,
        P31,
        md5_60_duckdb,
        md5_int_duckdb,
        minhash_coeffs,
    )

    r = num_hashes // bands
    coeffs = minhash_coeffs(num_hashes, seed)
    sig_cols = ",\n             ".join(
        f"min((h * {a} + {b}) % {P31}) AS m{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    def _band_fold(j: int) -> str:
        # same polynomial fold as the Spark side (operators/dedup.py
        # minhash_lsh_pairs portable branch): acc = (acc·BAND_A + m) % P31
        acc = "CAST(0 AS BIGINT)"
        for i in range(r):
            acc = f"(({acc}) * {BAND_A} + m{j * r + i}) % {P31}"
        return acc

    band_cases = "\n          ".join(
        f"WHEN {j} THEN {_band_fold(j)}" for j in range(bands)
    )
    bit_sums = ",\n             ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(sh_bits)
    )
    bit_assembly = "\n           + ".join(
        f"(CASE WHEN b{i} > 0 THEN 1::BIGINT << {i} ELSE 0 END)"
        for i in range(sh_bits)
    )
    jacc = (
        "round(CAST(len(list_intersect(x.ss, y.ss)) AS DOUBLE)"
        " / len(list_distinct(list_concat(x.ss, y.ss))), 6)"
    )
    return f"""
    WITH sh AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - {n - 1}, 1)),
               i -> concat_ws(' ', {", ".join(f"string_split(text, ' ')[i+{d}]" for d in range(n))})) AS ss
      FROM documents
    ),
    shingle_rows AS (
      SELECT doc_id, unnest(ss) AS s FROM sh
    ),
    shingle_h AS (
      SELECT doc_id, {md5_60_duckdb('s', seed)} % {P31} AS h FROM shingle_rows
    ),
    sig AS (
      SELECT doc_id,
             {sig_cols}
      FROM shingle_h GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, band_idx,
        CASE band_idx
          {band_cases}
        END AS band_key
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {bands - 1})) AS band_idx)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id
    ),
    mh AS (
      SELECT 'minhash' AS method, id_a, id_b,
             CAST(NULL AS BIGINT) AS hash_val, jaccard AS score
      FROM (
        SELECT id_a, id_b, {jacc} AS jaccard
        FROM cand
        JOIN sh x ON x.doc_id = cand.id_a
        JOIN sh y ON y.doc_id = cand.id_b
      ) WHERE jaccard >= {threshold}
    ),
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    tok_h AS (
      SELECT doc_id, {md5_60_duckdb('t', seed)} AS h FROM tok
    ),
    bit_sum AS (
      SELECT doc_id,
             {bit_sums}
      FROM tok_h GROUP BY doc_id
    ),
    shash AS (
      SELECT doc_id,
             {bit_assembly} AS simhash
      FROM bit_sum
    ),
    sim AS (
      SELECT 'simhash' AS method, a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(NULL AS BIGINT) AS hash_val,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS DOUBLE) AS score
      FROM shash a JOIN shash b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    ),
    gram AS (
      -- 52-bit (13-hex-char) hash: fingerprint values reach the output in
      -- a null-bearing BIGINT column, which pandas widens to float64 on
      -- both engines' result paths — only <=2^53 ints survive exactly
      SELECT doc_id, {md5_int_duckdb(f"substr(text, i, {fp_k})", seed, 13)} AS h
      FROM (
        SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - {fp_k - 1}, 1))) AS i
        FROM documents
      )
    ),
    fpl AS (
      SELECT doc_id, list_sort(list(h))[1:{fp_keep}] AS fp
      FROM gram GROUP BY doc_id
    ),
    fp AS (
      SELECT 'fingerprint' AS method, doc_id AS id_a,
             CAST(NULL AS BIGINT) AS id_b, unnest(fp) AS hash_val,
             CAST(NULL AS DOUBLE) AS score
      FROM fpl
    )
    SELECT * FROM mh
    UNION ALL SELECT * FROM sim
    UNION ALL SELECT * FROM fp
    """


@register(
    "q_dedup_sketch",
    oracle=_sketch_oracle_sql(),
    doc="E2 hash-sketch battery, one labeled union (merged so the driver "
    "gate covers each): minhash — MinHash(64)+LSH(16 bands) candidate "
    "pairs verified by exact Jaccard ≥ 0.8, equality-join on band buckets "
    "replacing the O(n²) cross join (the 100 TB dedup path; 3-gram "
    "shingles, see q_dedup_jaccard on vocabulary degeneracy); simhash — "
    "SimHash near-dup pairs (hamming ≤ 3) via pigeonhole block "
    "join, explode + columnar sign-sums, shuffle O(docs×bits); "
    "fingerprint — winnowing-style 16 smallest char-8-gram hashes per "
    "doc, exploded for audit.  Each branch keeps its own plan; the union "
    "only harmonizes schemas (typed NULLs).  Runs in PORTABLE-HASH mode "
    "(md5-60, functions/porthash.py) so the whole pipeline — signatures, "
    "banding, candidate join, verification — has the exact DuckDB twin in "
    "_sketch_oracle_sql; the operators' production default stays on "
    "xxhash64 (cheaper; covered by tests/test_dedup.py), and that mode "
    "is what bench.py times (q_dedup_sketch_production below).",
)
def q_dedup_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sketch_battery(spark, sf_dir, portable=True)


def q_dedup_sketch_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only twin of q_dedup_sketch in PRODUCTION hash mode
    (xxhash64 family, the operators' default) — what a deployment runs;
    the md5-60 portable family exists only to give the gate a DuckDB
    twin and costs ~2× more.  Identical plan shape (signatures, banding,
    candidate equality-join, verification); only the hash kernel
    differs, so the bench number tracks the configuration users pay for
    while the gate keeps the portable query.  Not registered: pair
    scores differ across hash families by construction, so there is no
    portable oracle for this mode (its correctness is covered by
    tests/test_dedup.py's exact-Jaccard and hamming assertions)."""
    return _sketch_battery(spark, sf_dir, portable=False)


def _sketch_battery(spark: SparkSession, sf_dir: str, portable: bool) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mh = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.8,
        portable=portable,
    ).select(
        F.lit("minhash").alias("method"),
        "id_a",
        "id_b",
        F.lit(None).cast("long").alias("hash_val"),
        F.col("jaccard").cast("double").alias("score"),
    )
    sh = dedup.simhash_near_pairs(
        docs, "doc_id", "text", max_hamming=3, portable=portable
    ).select(
        F.lit("simhash").alias("method"),
        "id_a",
        "id_b",
        F.lit(None).cast("long").alias("hash_val"),
        F.col("hamming").cast("double").alias("score"),
    )
    fp = textops.fingerprint(docs, "doc_id", "text", portable=portable).select(
        F.lit("fingerprint").alias("method"),
        F.col("doc_id").alias("id_a"),
        F.lit(None).cast(docs.schema["doc_id"].dataType).alias("id_b"),
        F.explode("fingerprint").alias("hash_val"),
        F.lit(None).cast("double").alias("score"),
    )
    return mh.unionAll(sh).unionAll(fp)


# ── pinned PCA projection (round-7: the gate row for embedproj) ──────────
# The model is a pure function of (d, k, seed) — real eigh output of a
# seeded synthetic corpus (operators/embedproj.py:pinned_model), so both
# engines inline the SAME float64 mean/components.  The dot product is
# spelled in IDENTICAL left-associated op order on both sides: Spark's
# aggregate(zip_with(...)) fold ≡ an unrolled `t1 + t2 + ...` chain
# (0+t1 == t1 in IEEE).  Literals go through CAST('<repr>' AS DOUBLE) in
# DuckDB — a bare decimal literal parses as DECIMAL and loses ulps.
_PCA_GATE_D, _PCA_GATE_K, _PCA_GATE_SEED = 64, 4, 7
# moments branch: statistic width — the fold algebra is dimension-
# independent, so gate over a slice that keeps the SQL-aggregate oracle
# at 1 + d + d² = 73 hashed values instead of 4k
_MOM_D = 8


def _pca_gate_model():
    from ..operators.embedproj import pinned_model

    return pinned_model(_PCA_GATE_D, _PCA_GATE_K, seed=_PCA_GATE_SEED)


def _pca_proj_oracle_ctes() -> str:
    """`proj` CTE: per (vec_id, axis) rows of round((x·wᵢ) - mean·wᵢ, 6)
    — the centered projection with the mean term folded to a scalar
    constant ((x-m)·w = x·w - m·w; m·w is computed ONCE in float64 and
    inlined identically on both sides, keeping the per-row op order a
    plain dot product)."""
    m = _pca_gate_model()
    selects = []
    for i in range(m.k):
        c = float(m.mean @ m.components[i])
        terms = " + ".join(
            f"(CAST(embedding[{j + 1}] AS DOUBLE) * "
            f"CAST('{float(m.components[i][j])!r}' AS DOUBLE))"
            for j in range(_PCA_GATE_D)
        )
        selects.append(
            f"SELECT 'proj' AS branch, vec_id AS id_a, "
            f"CAST({i} AS BIGINT) AS id_b, "
            f"round(({terms}) - CAST('{c!r}' AS DOUBLE), 6) AS cos_sim "
            f"FROM embeddings"
        )
    return "proj AS (\n" + "\n      UNION ALL ".join(selects) + "\n    )"


def _dedup_embedding_moments(spark: SparkSession, sf_dir: str, emb: DataFrame) -> DataFrame:
    """The moments branch of q_dedup_embedding, extracted so its chain
    of blocking driver jobs can run in a worker thread overlapped with
    the other branches' construction (opt guide §2.6).  Body unchanged
    from the inline round-8 form."""

    # (round-8 fusion): incremental-PCA moment folding
    # (embedproj.update_moments) is pure addition over (n, Σx, Gram) —
    # fold the corpus in TWO halves through the persisted one-row
    # moments table, then emit the folded statistics (over the first
    # _MOM_D dims, which exercises the machinery at 1/16 the agg width)
    # with the proj-branch penalty discipline: the hashed value is the
    # round-2 statistic the oracle recomputes as plain SQL aggregates,
    # +1e6 if the fold deviates from the ONE-SHOT reduction beyond
    # reordering noise — so both the aggregates and the fold=one-shot
    # identity get hard rows.  The driver-side eigh stays out by design.
    import shutil

    import numpy as np

    from pathlib import Path

    from ..operators.embedproj import _reduced_moments, update_moments

    root, tag = warehouse_root_tag(sf_dir)
    mpath = Path(root) / f"moments_gate_{tag}"
    shutil.rmtree(mpath, ignore_errors=True)
    vecs = emb.select(
        "vec_id", F.slice(F.col("embedding"), 1, _MOM_D).alias("__v")
    )
    for half in (0, 1):
        update_moments(
            vecs.filter(F.col("vec_id") % 2 == half), "__v", str(mpath)
        )
    r = spark.read.parquet(str(mpath)).first()
    n_fold = int(r["n"])
    s_fold = np.asarray(r["s"], dtype=np.float64)
    g_fold = np.asarray(r["g"], dtype=np.float64).reshape(_MOM_D, _MOM_D)
    n_full, s_full, g_full = _reduced_moments(vecs, "__v", _MOM_D)
    g_full = g_full.reshape(_MOM_D, _MOM_D)

    def _pen(a: float, b: float) -> float:
        return 0.0 if abs(a - b) <= 1e-9 * max(1.0, abs(b)) else 1e6

    # `+ 0.0` canonicalizes IEEE −0.0 (a round-2 of −0.004 lands there)
    # to +0.0 — the oracle does the same, else the hash sees -0.0 ≠ 0.0
    rows = [("moments", -1, -1, float(n_fold) + _pen(n_fold, n_full))]
    rows += [
        (
            "moments",
            -2,
            j,
            round(float(s_fold[j]), 2) + _pen(s_fold[j], s_full[j]) + 0.0,
        )
        for j in range(_MOM_D)
    ]
    rows += [
        (
            "moments",
            i,
            j,
            round(float(g_fold[i, j]), 2)
            + _pen(g_fold[i, j], g_full[i, j])
            + 0.0,
        )
        for i in range(_MOM_D)
        for j in range(_MOM_D)
    ]
    # JVM-side VALUES (LocalTableScan), not createDataFrame(python rows)
    # — see round-10 verdict's Scan-ExistingRDD finding.  Doubles are
    # interpolated via repr(): Python's shortest round-trip repr parsed
    # by Spark's correctly-rounded double cast is bit-exact, so the hash
    # the oracle compares is unchanged.
    _mom_vals = ", ".join(
        f"('{b}', {ia}, {ib}, CAST('{v!r}' AS DOUBLE))"
        for (b, ia, ib, v) in rows
    )
    mom = spark.sql(
        "SELECT branch, CAST(id_a AS BIGINT) AS id_a, "
        "CAST(id_b AS BIGINT) AS id_b, cos_sim "
        f"FROM VALUES {_mom_vals} AS t(branch, id_a, id_b, cos_sim)"
    )
    return mom


@register(
    "q_dedup_embedding",
    oracle=f"""
    WITH {_pca_proj_oracle_ctes()},
    exact AS (
      SELECT 'exact' AS branch, id_a, id_b, cos_sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
      ) WHERE cos_sim >= 0.4
    ),
    -- SemDeDup twin: the seeded-sample centroids and the argmax
    -- assignment are re-derived exactly as in the q_ann_topk oracle
    -- (portable md5 ordering; cosine DESC with lowest-cluster
    -- tie-break), then near-pairs are mined WITHIN clusters only
    cent AS (
      SELECT * FROM (
        SELECT row_number() OVER (
                 ORDER BY md5(concat('42', ':', CAST(vec_id AS VARCHAR))),
                          vec_id
               ) - 1 AS cluster,
               CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings
      ) WHERE cluster < 4
    ),
    base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    assign AS (
      SELECT vec_id, v, cluster FROM (
        SELECT b.vec_id, b.v, c.cluster,
               row_number() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY list_cosine_similarity(b.v, c.cv) DESC, c.cluster
               ) AS rn
        FROM base b CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    sem AS (
      SELECT * FROM (
        SELECT 'semantic' AS branch, a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        FROM assign a JOIN assign b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      ) WHERE cos_sim >= 0.4
    ),
    momv AS (
      SELECT vec_id,
             list_transform(embedding[1:{_MOM_D}],
                            x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    momu AS (
      SELECT vec_id, ii.i - 1 AS i, v[ii.i] AS x
      FROM momv, (SELECT unnest(generate_series(1, {_MOM_D})) AS i) ii
    ),
    mom AS (
      SELECT 'moments' AS branch, CAST(-1 AS BIGINT) AS id_a,
             CAST(-1 AS BIGINT) AS id_b, CAST(count(*) AS DOUBLE) AS cos_sim
      FROM momv
      UNION ALL
      SELECT 'moments', CAST(-2 AS BIGINT), CAST(i AS BIGINT),
             round(sum(x), 2) + CAST(0 AS DOUBLE)
      FROM momu GROUP BY i
      UNION ALL
      SELECT 'moments', CAST(a.i AS BIGINT), CAST(b.i AS BIGINT),
             round(sum(a.x * b.x), 2) + CAST(0 AS DOUBLE)
      FROM momu a JOIN momu b USING (vec_id) GROUP BY a.i, b.i
    )
    SELECT * FROM exact UNION ALL SELECT * FROM sem
    UNION ALL SELECT * FROM proj
    UNION ALL SELECT * FROM mom
    """,
    doc="E2, one labeled union: exact — embedding-cosine near-dup pairs "
    "(cosine ≥ 0.4), EXACT via blocked GEMM candidate generation "
    "(mapInPandas + broadcast row-blocks) re-verified by the JVM cosine "
    "expression; no cross join.  semantic (late round-4 fusion) — "
    "operators/semdedup.py's SemDeDup pair mining run for real "
    "(seeded-sample clustering via ivf_assign, one shuffle on the "
    "cluster id, cluster-local blocked GEMM in applyInPandas), with the "
    "oracle re-deriving centroids, argmax assignment, and the "
    "within-cluster pair set end-to-end in SQL — the cross-cluster "
    "misses (semantic ⊂ exact) are part of the checked contract.  "
    "proj branch (round-7 fusion — the PCA projection's hard "
    "CORRECTNESS row): operators/embedproj.py's projection kernel "
    "against the PINNED model (pure function of seed; real eigh "
    "output of a seeded synthetic corpus — the fit over real data "
    "stays tests-only, eigh is not SQL-expressible).  One row per "
    "(vec_id, axis): id_b is the axis, cos_sim the centered "
    "projection rounded to 6, spelled in identical IEEE op order on "
    "both sides.  The hashed value ALSO gate-couples the production "
    "Arrow kernel: a +1e6 penalty lands on any axis where the "
    "float32 pandas_udf projection deviates from the float64 JVM "
    "twin by more than 1e-3, so a broken kernel (wrong sign, missing "
    "mean subtraction) hash-mismatches even though the exact hashed "
    "doubles come from the JVM expression.  moments branch (round-8 "
    "fusion): embedproj.update_moments' incremental statistic folding "
    "— two corpus halves folded through the persisted one-row moments "
    "table, hashed as round-2 (n, Σx, Gram) values the oracle "
    "recomputes with plain SQL aggregates, with the proj-style +1e6 "
    "penalty on any entry where the fold deviates from the one-shot "
    "reduction beyond float-reorder noise; the refit itself "
    "(fit_pca_from_moments → eigh) stays tests-only by design.",
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import embedproj
    from ..operators.semdedup import semantic_pairs

    emb = load_table(spark, sf_dir, "embeddings")

    # moments branch (round-8 fusion): incremental-PCA moment folding —
    # a chain of blocking driver jobs (fresh table, two update_moments
    # merges, a read-back, a treeReduce one-shot twin).  It shares
    # nothing with the exact/semantic/proj branches below, so run the
    # chain in a worker thread and overlap it with their construction
    # (opt guide §2.6) — measured 2.0 s of sequential construction
    # otherwise.  The emitted frame is a JVM-side VALUES literal, so
    # thread timing can't reach the hashed values.
    from concurrent.futures import ThreadPoolExecutor

    # try/finally (ADVICE r11): if the exact/sem/proj construction below
    # raises, the moments worker must not keep running Spark jobs (and
    # rmtree/parquet writes) in the background — shutdown() on the error
    # path waits for the in-flight future so the executor never leaks.
    _mom_pool = ThreadPoolExecutor(max_workers=1)
    try:
        mom_f = _mom_pool.submit(
            _dedup_embedding_moments, spark, sf_dir, emb
        )
    except BaseException:
        _mom_pool.shutdown(wait=False)
        raise

    try:
        exact = similarity.cosine_pairs_blocked(emb, threshold=0.4).select(
            F.lit("exact").alias("branch"), "id_a", "id_b", "cos_sim"
        )
        # candidates from the real operator (margin-widened, seed pinned to
        # the oracle's literal 42), then membership + value re-verified by
        # the JVM cosine expression — bit-identical to the SQL twin, exactly
        # as cosine_pairs_blocked does; numpy's GEMM accumulation order
        # never reaches the hash compare
        cand = semantic_pairs(
            emb, threshold=0.4 - 1e-6, n_centroids=4, refine_iters=0, seed=42
        ).select("id_a", "id_b")
        ea = emb.select(
            F.col("vec_id").cast("long").alias("id_a"),
            F.col("embedding").alias("__va"),
        )
        eb = emb.select(
            F.col("vec_id").cast("long").alias("id_b"),
            F.col("embedding").alias("__vb"),
        )
        sem = (
            cand.join(ea, "id_a")
            .join(eb, "id_b")
            .select(
                F.lit("semantic").alias("branch"),
                "id_a",
                "id_b",
                F.round(vectors.cosine("__va", "__vb"), 6).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= 0.4)
        )
        model = _pca_gate_model()
        # production kernel (Arrow GEMM, float32) on every row …
        proj_src = embedproj.project(emb, model, "embedding", "__kvec")
        # … and the JVM twin in DuckDB's exact op order: the left-to-right
        # aggregate/zip_with fold, minus the precomputed mean·wᵢ scalar
        jvm_axes = F.array(
            *[
                F.expr(
                    vectors.dot_sql(
                        "embedding",
                        "array("
                        + ", ".join(
                            f"{float(model.components[i][j])!r}D"
                            for j in range(_PCA_GATE_D)
                        )
                        + ")",
                    )
                )
                - F.lit(float(model.mean @ model.components[i]))
                for i in range(model.k)
            ]
        )
        proj = (
            proj_src.select(
                F.col("vec_id").alias("id_a"),
                F.posexplode(
                    F.arrays_zip(
                        jvm_axes.alias("j"),
                        F.col("__kvec").cast("array<double>").alias("p"),
                    )
                ).alias("id_b", "z"),
            )
            .select(
                F.lit("proj").alias("branch"),
                "id_a",
                F.col("id_b").cast("long").alias("id_b"),
                (
                    F.round(F.col("z.j"), 6)
                    # NULL-safe penalty: arrays_zip pads a SHORT production
                    # array with NULLs, and a NULL comparison would fall
                    # through otherwise(0.0) — a truncated/NULL-emitting
                    # kernel must hash-MISMATCH, not silently pass
                    + F.when(
                        F.col("z.p").isNull()
                        | (F.abs(F.col("z.j") - F.col("z.p")) > 1e-3),
                        F.lit(1e6),
                    ).otherwise(F.lit(0.0))
                ).alias("cos_sim"),
            )
        )
        mom = mom_f.result()
    finally:
        # success path: the future is already resolved, shutdown is
        # instantaneous; error path: wait for the in-flight moments
        # chain so its table writes cannot race a caller's retry
        _mom_pool.shutdown(wait=True)
    return exact.unionAll(sem).unionAll(proj).unionAll(mom)


# ── BPE gate twin (round 9, VERDICT r8 next #5) ──────────────────────────
# The oracle replays operators/bpe._encode_word's greedy merge loop as a
# recursive CTE over DISTINCT corpus words (the operator's per-batch word
# cache, spelled relationally).  Symbol-sequence representation: each
# symbol individually wrapped in U+241F separators ("␟a␟␟b␟" = [a, b]) so
# a merge (a,b) is ONE boundary-safe string replace — '␟a␟␟b␟' → '␟ab␟'
# replaces every non-overlapping occurrence left-to-right, exactly
# _merge_word's scan, and a symbol whose text ENDS with `a` can never
# false-match (the wrap means the pattern only matches whole symbols).
# Per recursion step the word's lowest-ranked applicable merge is applied;
# the fixed point (no applicable merge) is each word's final encoding.
# Token ids/boundaries are strings joined with '|' — hash-exact.
from ..operators.bpe import EOW as _EOW
from ..operators.bpe import GATE_MERGES as _GATE_MERGES

_BPE_SEP = "␟"  # not in any driver vocabulary (lowercase + digits)
_BPE_MERGE_VALUES = ",\n      ".join(
    f"('{a}', '{b}', {r})" for r, (a, b) in enumerate(_GATE_MERGES)
)
# pattern/replacement fragments for a merge row m: '␟' || a || '␟␟' || b
# || '␟'  →  '␟' || a || b || '␟'
_BPE_PAT = f"'{_BPE_SEP}' || m.a || '{_BPE_SEP}{_BPE_SEP}' || m.b || '{_BPE_SEP}'"
_BPE_PAT2 = _BPE_PAT.replace("m.a", "m2.a").replace("m.b", "m2.b")
_BPE_REPL = f"'{_BPE_SEP}' || m.a || m.b || '{_BPE_SEP}'"

# initial symbol-wrap of a word ('␟a␟␟b␟...␟</w>␟') and the fixed-point
# '|'-join — shared by the recursive CTE and the iterative twin below
_BPE_INIT_SEQ = (
    f"regexp_replace(word, '(.)', '{_BPE_SEP}\\1{_BPE_SEP}', 'g')"
    f" || '{_BPE_SEP}{_EOW}{_BPE_SEP}'"
)
_BPE_TOKS_EXPR = (
    f"trim(replace(seq, '{_BPE_SEP}{_BPE_SEP}', '|'), '{_BPE_SEP}')"
)
_BPE_WORDS_SQL = """
      SELECT DISTINCT word FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> ''
"""
# one merge step: each still-active word advances by its lowest-ranked
# applicable merge (replace() rewrites every non-overlapping occurrence)
_BPE_STEP_SQL = f"""
      SELECT e.word, replace(e.seq, {_BPE_PAT}, {_BPE_REPL}) AS seq
      FROM __ACTIVE__ e
      JOIN bpe_merges m
        ON strpos(e.seq, {_BPE_PAT}) > 0
       AND m.rank = (SELECT min(m2.rank) FROM bpe_merges m2
                     WHERE strpos(e.seq, {_BPE_PAT2}) > 0)
"""
_BPE_DONE_PRED = (
    f"NOT EXISTS (SELECT 1 FROM bpe_merges m"
    f" WHERE strpos(e.seq, {_BPE_PAT}) > 0)"
)

_BPE_ORACLE_CTES = f"""
    bpe_merges(a, b, rank) AS (
      VALUES {_BPE_MERGE_VALUES}
    ),
    bpe_words AS ({_BPE_WORDS_SQL}),
    bpe_enc AS (
      SELECT word, {_BPE_INIT_SEQ} AS seq
      FROM bpe_words
      UNION ALL
{_BPE_STEP_SQL.replace("__ACTIVE__", "bpe_enc")}
    ),
    bpe_final AS (
      SELECT word, {_BPE_TOKS_EXPR} AS toks
      FROM bpe_enc e
      WHERE {_BPE_DONE_PRED}
    )
"""

# doc-level reassembly from the per-word fixed point (bpe_final) — shared
# verbatim by the recursive oracle and the iterative capacity twin
_BPE_POST_CTES = """
    bpe_docw AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS ord
      FROM documents
    ),
    bpe_doc AS (
      SELECT dw.doc_id,
             string_agg(w.toks, '|' ORDER BY dw.ord) AS s,
             CAST(sum(len(string_split(w.toks, '|'))) AS BIGINT) AS ntok,
             CAST(len(list_distinct(flatten(
               list(string_split(w.toks, '|') ORDER BY dw.ord)
             ))) AS BIGINT) AS ndist
      FROM bpe_docw dw JOIN bpe_final w USING (word)
      WHERE dw.word <> ''
      GROUP BY dw.doc_id
    ),
    bpe AS (
      SELECT 'bpe' AS branch, d.doc_id,
             coalesce(db.ntok, 0) AS idx,
             coalesce(db.s, '') AS s,
             coalesce(db.ntok, 0) > 0 AS flag,
             coalesce(db.ndist, 0) AS n
      FROM documents d LEFT JOIN bpe_doc db USING (doc_id)
    )
"""


# arrays + chunking branches and the final union — shared by both oracle
# spellings (the bpe CTE they reference comes from _BPE_POST_CTES)
_ARRAY_OPS_TAIL = """
    arrays AS (
      SELECT 'arrays' AS branch, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS idx,
             array_to_string(
               list_sort(list_distinct(string_split(text, ' ')))[1:3],
               ',') AS s,
             list_contains(string_split(text, ' '), 'the') AS flag,
             CAST(len(list_filter(string_split(text, ' '),
                  x -> length(x) > 4)) AS BIGINT) AS n
      FROM documents
    ),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS nt
      FROM documents
    ),
    starts AS (
      SELECT doc_id, t, nt,
             unnest(generate_series(0, greatest(nt - 5, 0), 8)) AS st
      FROM toks
    ),
    chunks AS (
      SELECT 'chunks' AS branch, doc_id,
             CAST(st / 8 AS BIGINT) AS idx,
             array_to_string(t[st + 1 : st + 12], ' ') AS s,
             least(nt - st, 12) = 12 AS flag,
             CAST(least(nt - st, 12) AS BIGINT) AS n
      FROM starts
    )
    SELECT * FROM arrays UNION ALL SELECT * FROM chunks
    UNION ALL SELECT * FROM bpe
"""


def _array_ops_oracle_exec(con):
    """Capacity-mode q_array_ops oracle: the BPE fixed point as an
    ITERATIVE temp-table loop instead of one recursive CTE.

    The recursive CTE accumulates every intermediate (word, seq) row of
    every merge round in an unspillable working set — at sf10 (500k
    docs) DuckDB OOMs there (SCALE_CORRECTNESS_sf10.json, round 10).
    The loop below holds only the ACTIVE words of the current round
    (words at their fixed point move to bpe_done and leave the working
    set), each round is one ordinary spillable statement, and the
    per-round table shrinks monotonically.  Semantics are identical:
    one lowest-ranked applicable merge per word per round, fixed point
    = no applicable merge (the CTE's bpe_final predicate — a chain's
    intermediate rows always have an applicable merge, so filtering
    terminal rows from the union equals collecting loop exits)."""
    con.execute(
        "CREATE TEMP TABLE bpe_merges(a VARCHAR, b VARCHAR, rank INT)"
    )
    con.execute(f"INSERT INTO bpe_merges VALUES {_BPE_MERGE_VALUES}")
    con.execute(
        f"""CREATE TEMP TABLE bpe_active AS
        SELECT word, {_BPE_INIT_SEQ} AS seq
        FROM ({_BPE_WORDS_SQL}) bpe_words"""
    )
    con.execute("CREATE TEMP TABLE bpe_done(word VARCHAR, seq VARCHAR)")
    # bound: each round applies ≥1 merge to every active word, and a
    # word of L symbols supports at most L-1 merges, so rounds ≤ max
    # word length + 1; the explicit cap turns a logic bug into a loud
    # error instead of an infinite loop
    for _ in range(10_000):
        con.execute(
            f"""INSERT INTO bpe_done
            SELECT e.word, e.seq FROM bpe_active e
            WHERE {_BPE_DONE_PRED}"""
        )
        con.execute(
            "CREATE TEMP TABLE bpe_next AS "
            + _BPE_STEP_SQL.replace("__ACTIVE__", "bpe_active")
        )
        con.execute("DROP TABLE bpe_active")
        con.execute("ALTER TABLE bpe_next RENAME TO bpe_active")
        if con.execute("SELECT count(*) FROM bpe_active").fetchone()[0] == 0:
            break
    else:
        raise RuntimeError("BPE merge loop did not converge in 10k rounds")
    out = con.execute(
        f"""
        WITH bpe_final AS (
          SELECT word, {_BPE_TOKS_EXPR} AS toks FROM bpe_done
        ),
        {_BPE_POST_CTES},
        {_ARRAY_OPS_TAIL}
        """
    ).fetchdf()
    con.execute("DROP TABLE bpe_active")
    con.execute("DROP TABLE bpe_done")
    con.execute("DROP TABLE bpe_merges")
    return out


@register(
    "q_array_ops",
    oracle=f"""
    WITH RECURSIVE {_BPE_ORACLE_CTES},
    {_BPE_POST_CTES},
    {_ARRAY_OPS_TAIL}
    """,
    oracle_exec=_array_ops_oracle_exec,
    doc="Array/collection functions + document chunking + BPE encode, "
    "one labeled union.  arrays: sort/distinct/slice/join/contains/"
    "filter-lambda over token arrays — Spark array_* vs DuckDB list_* "
    "spellings, same semantics (SURVEY §2.8 'absent' row, dispositioned "
    "for corpus breadth).  chunks (round-4 fusion): operators/"
    "chunking.py's overlapping token windows (chunk_tokens=12, "
    "overlap=4) run through the real sequence+posexplode+slice operator "
    "— map-only, no shuffle, no UDF — with the window starts, exact "
    "chunk TEXT, and per-chunk token counts all recomputed closed-form "
    "by the oracle (generate_series + list slicing).  bpe (round-9 "
    "fusion, VERDICT r8 #5): operators/bpe.encode over every document "
    "with the pinned GATE_MERGES table — the real mapInPandas greedy "
    "tokenizer, map-only — vs a recursive-CTE oracle that replays the "
    "rank-ordered merge loop per distinct word on separator-wrapped "
    "symbol strings; per-doc token stream ('|'-joined), token count and "
    "distinct-token count are all hash-exact.",
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    arrays = docs.select(
        F.lit("arrays").alias("branch"),
        "doc_id",
        F.size(toks).cast("long").alias("idx"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ","
        ).alias("s"),
        F.array_contains(toks, "the").alias("flag"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4))
        .cast("long")
        .alias("n"),
    )
    chunks = chunk_documents(
        docs, "doc_id", "text", chunk_tokens=12, overlap=4
    ).select(
        F.lit("chunks").alias("branch"),
        "doc_id",
        F.col("chunk_idx").cast("long").alias("idx"),
        F.col("chunk_text").alias("s"),
        (F.col("n_tokens") == 12).alias("flag"),
        F.col("n_tokens").cast("long").alias("n"),
    )
    from ..operators import bpe as bpe_op

    bpe_rows = bpe_op.encode(docs, bpe_op.GATE_MERGES).select(
        F.lit("bpe").alias("branch"),
        "doc_id",
        F.col("n_bpe_tokens").alias("idx"),
        F.array_join("tokens", "|").alias("s"),
        (F.col("n_bpe_tokens") > 0).alias("flag"),
        F.size(F.array_distinct("tokens")).cast("long").alias("n"),
    )
    return arrays.unionAll(chunks).unionAll(bpe_rows)


_BUCKET = md5_bucket_sql("CAST(doc_id AS STRING)", 256)
_SAMP = md5_sample_sql("CAST(doc_id AS STRING)", "s", 256)
_MIXB = md5_sample_sql("CAST(doc_id AS STRING)", "m", 256)
_NTOKS_SQL = (
    "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"
)
# token-budget mixing branch, SATURATION regime (round-5 upgrade): weights
# en 0.2 / fr 0.2 / de 0.6 under a budget of 50% of the weighted corpus's
# tokens.  de's first-pass want (0.6 · 0.5 · wtot = 0.30 · wtot) exceeds
# its corpus (~0.13-0.21 · wtot at every driver SF), so de SATURATES at
# rate 1.0 and its unabsorbed budget redistributes over en/fr by weight:
# rate = (0.2/0.4) · (0.5·wtot − de_toks) / lang_toks — the two-pass
# water-filling closed form (operators/mixing.mixing_rates), still one
# SQL expression both engines evaluate identically (same BIGINT window
# sums, same double arithmetic; en/fr rates stay < 1 at every SF —
# margin pinned in tests/test_mixing.py against the actual tables).
_MIX_RATE = (
    "CASE WHEN lang = 'de' THEN CAST(1.0 AS DOUBLE) "
    "WHEN lang IN ('en', 'fr') THEN "
    "0.5 * (0.5 * CAST(wtot_toks AS DOUBLE) - CAST(de_toks AS DOUBLE)) "
    "/ CAST(lang_toks AS DOUBLE) END"
)
# UPSAMPLING scenario (round-5 addition, mixing max_epochs=2): weights
# de 0.6 / en 0.4 under budget = 1.1 × (de+en tokens).  de's want
# (0.66 · deen) is ≥ 2 × its corpus at every driver SF (de is 23-29%
# of deen; margin pinned in tests/test_mixing.py), so de CAPS at 2.0
# epochs — every de row appears exactly twice — and the unabsorbed
# budget flows to en: rate = (1.1·deen − 2·de)/en ≈ 0.74-0.83 < 1,
# exercising the fractional-epoch hash on a fresh 'u'-salted bucket.
_UP_RATE = (
    "CASE WHEN lang = 'de' THEN CAST(2.0 AS DOUBLE) "
    "WHEN lang = 'en' THEN "
    "(1.1 * CAST(deen_toks AS DOUBLE) - 2.0 * CAST(de_toks AS DOUBLE)) "
    "/ CAST(en_toks AS DOUBLE) END"
)
_MIXU = md5_sample_sql("CAST(doc_id AS STRING)", "u", 256)

# The per-doc 'assign' branch select-list — one template rendered twice:
# the ORACLE computes stage from the quantile CTE (thr cross join); the
# Spark side reads the stage column the REAL curriculum_order operator
# already appended to the staged view (same md5/window text otherwise).
_ASSIGN_TMPL = f"""
    SELECT 'assign' AS branch, doc_id,
           CAST({_BUCKET} AS BIGINT) AS bucket,
           CASE WHEN {_BUCKET} < 204 THEN 'train'
                WHEN {_BUCKET} < 230 THEN 'val'
                ELSE 'test' END AS split,
           {_SAMP} < 26 AS in_sample10,
           CAST(strat_rank AS BIGINT) AS strat_rank,
           strat_rank <= 40 AS in_quota,
           CAST(coalesce(floor(({_MIX_RATE}) * 256), 0) AS BIGINT)
             AS mix_thr,
           coalesce({_MIXB} < floor(({_MIX_RATE}) * 256), FALSE) AS in_mix,
           CAST(coalesce(
             floor({_UP_RATE})
             + CASE WHEN {_MIXU} <
                      floor((({_UP_RATE}) - floor({_UP_RATE})) * 256)
                    THEN 1 ELSE 0 END,
             0) AS BIGINT) AS mix_epochs,
           n_chars,
           {{stage_expr}} AS stage,
           CAST(NULL AS STRING) AS grp,
           CAST(NULL AS BIGINT) AS w,
           CAST(NULL AS DOUBLE) AS samp_key,
           CAST(NULL AS BIGINT) AS samp_rank
    FROM (
      SELECT doc_id, lang, n_chars{{inner_extra}},
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(concat('q:', CAST(doc_id AS STRING))), doc_id
             ) AS strat_rank,
             sum(n_toks) OVER (PARTITION BY lang) AS lang_toks
      FROM (
        SELECT doc_id, lang, n_chars{{inner_extra}},
               {_NTOKS_SQL} AS n_toks
        FROM {{src_table}}
      )
    )
    CROSS JOIN (
      -- corpus-wide token totals as ONE single-row aggregate joined
      -- back broadcast: an OVER () window here would move the whole
      -- table to a single partition (the 100 TB cliff); the extra
      -- column-pruned scan is the cheap side of that trade
      SELECT sum(CASE WHEN lang IN ('en','fr','de') THEN n_toks END)
               AS wtot_toks,
             sum(CASE WHEN lang = 'de' THEN n_toks END) AS de_toks,
             sum(CASE WHEN lang = 'en' THEN n_toks END) AS en_toks,
             sum(CASE WHEN lang IN ('de','en') THEN n_toks END)
               AS deen_toks
      FROM (
        SELECT lang, {_NTOKS_SQL} AS n_toks FROM {{src_table}}
      )
    ){{thr_join}}
"""

_WS_NULL_ASSIGN_SQL = """
             CAST(NULL AS BIGINT) AS bucket,
             CAST(NULL AS STRING) AS split,
             CAST(NULL AS BOOLEAN) AS in_sample10,
             CAST(NULL AS BIGINT) AS strat_rank,
             CAST(NULL AS BOOLEAN) AS in_quota,
             CAST(NULL AS BIGINT) AS mix_thr,
             CAST(NULL AS BOOLEAN) AS in_mix,
             CAST(NULL AS BIGINT) AS mix_epochs,
             CAST(NULL AS BIGINT) AS n_chars,
             CAST(NULL AS INT) AS stage
"""

_STAGE_ORACLE_EXPR = """
           CASE WHEN n_chars IS NULL THEN CAST(NULL AS INT)
                ELSE CAST((CASE WHEN n_chars > t1 THEN 1 ELSE 0 END)
                   + (CASE WHEN n_chars > t2 THEN 1 ELSE 0 END)
                   + (CASE WHEN n_chars > t3 THEN 1 ELSE 0 END) AS INT)
           END
"""

# leak branch weights + the exact int() thresholds hash_split derives
# from them over the injected 256-wide md5 bucket (accumulation order =
# sorted split names: test, train, val)
_LEAK_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_LEAK_T_TEST = int(_LEAK_WEIGHTS["test"] * 256)
_LEAK_T_TRAIN = int((_LEAK_WEIGHTS["test"] + _LEAK_WEIGHTS["train"]) * 256)

_SPLIT_ASSIGN_ORACLE = f"""
    WITH RECURSIVE thr AS (
      SELECT quantile_cont(n_chars, 0.25) AS t1,
             quantile_cont(n_chars, 0.5)  AS t2,
             quantile_cont(n_chars, 0.75) AS t3
      FROM documents
    ),
    assign AS (
      {_ASSIGN_TMPL.format(stage_expr=_STAGE_ORACLE_EXPR, inner_extra="",
                           src_table="documents",
                           thr_join=" CROSS JOIN thr")}
    ),
    src AS (
      SELECT doc_id, lang,
             {_NTOKS_SQL} AS w,
             {md5_uniform_sql("CAST(doc_id AS STRING)", "ws")} AS u,
             {md5_uniform_sql("CAST(doc_id AS STRING)", "wg")} AS ug
      FROM documents
    ),
    globaltop AS (
      SELECT 'ws_global' AS branch, doc_id,
             {_WS_NULL_ASSIGN_SQL},
             CAST(NULL AS STRING) AS grp,
             w, round(ln(u) / w, 6) + 0.0 AS samp_key,
             CAST(NULL AS BIGINT) AS samp_rank
      FROM src
      WHERE w > 0
      ORDER BY ln(u) / w DESC, doc_id
      LIMIT 100
    ),
    ranked AS (
      SELECT doc_id, lang, w, ug,
             row_number() OVER (
               PARTITION BY lang ORDER BY ln(ug) / w DESC, doc_id
             ) AS rk
      FROM src WHERE w > 0
    ),
    pergroup AS (
      SELECT 'ws_group' AS branch, doc_id,
             {_WS_NULL_ASSIGN_SQL},
             lang AS grp, w, round(ln(ug) / w, 6) + 0.0 AS samp_key,
             CAST(rk AS BIGINT) AS samp_rank
      FROM ranked WHERE rk <= 20
    ),
    leak_e AS (
      SELECT a.doc_id AS ea, a.doc_id + 1 AS eb
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 10 < 3
    ),
    leak_sym AS (
      SELECT ea, eb FROM leak_e
      UNION ALL SELECT eb AS ea, ea AS eb FROM leak_e
    ),
    leak_reach AS (
      SELECT doc_id AS id, doc_id AS r FROM documents
      UNION
      SELECT e.eb AS id, leak_reach.r
      FROM leak_reach JOIN leak_sym e ON leak_reach.id = e.ea
    ),
    leak_comp AS (
      SELECT id AS doc_id, min(r) AS component_id FROM leak_reach GROUP BY id
    ),
    leak AS (
      SELECT 'leak' AS branch, doc_id,
             CAST(component_id AS BIGINT) AS bucket,
             CASE WHEN mb < {_LEAK_T_TEST} THEN 'test'
                  WHEN mb < {_LEAK_T_TRAIN} THEN 'train'
                  ELSE 'val' END AS split,
             CAST(NULL AS BOOLEAN) AS in_sample10,
             CAST(NULL AS BIGINT) AS strat_rank,
             CAST(NULL AS BOOLEAN) AS in_quota,
             CAST(NULL AS BIGINT) AS mix_thr,
             CAST(NULL AS BOOLEAN) AS in_mix,
             CAST(NULL AS BIGINT) AS mix_epochs,
             CAST(NULL AS BIGINT) AS n_chars,
             CAST(NULL AS INT) AS stage,
             CAST(NULL AS STRING) AS grp,
             CAST(NULL AS BIGINT) AS w,
             CAST(NULL AS DOUBLE) AS samp_key,
             CAST(NULL AS BIGINT) AS samp_rank
      FROM (
        SELECT doc_id, component_id,
               {md5_bucket_sql("CAST(component_id AS STRING)", 256)} AS mb
        FROM leak_comp
      )
    )
    SELECT * FROM assign
    UNION ALL SELECT * FROM globaltop
    UNION ALL SELECT * FROM pergroup
    UNION ALL SELECT * FROM leak
    """


@register(
    "q_split_assign",
    oracle=_SPLIT_ASSIGN_ORACLE,
    doc="Dataset carving, fused (split + sampling + mixing + curriculum + "
    "weighted sampling, SURVEY "
    "§2.12 sampling surface): (1) train/val/test assignment as a pure hash "
    "of the key (~80/10/10) — reproducible across runs/engines/"
    "partitionings, unlike sample(); (2) in_sample10 — an INDEPENDENT "
    "deterministic ~10% sample from a tag-salted hash of the same key "
    "(different tag ⇒ fresh hash ⇒ uncorrelated with the split), the "
    "shuffle-free Bernoulli sample of a 100 TB pipeline; (3) strat_rank/"
    "in_quota — per-lang quota capping (≤ 40 docs per stratum) by "
    "hash-order row_number, the per-domain/per-source cap step of corpus "
    "curation (deterministic, engine-portable); (4) mix_thr/in_mix — "
    "token-budget corpus MIXING (operators/mixing.py) in the SATURATION "
    "regime: lang weights en 0.2 / fr 0.2 / de 0.6 under a budget of 50% "
    "of the weighted corpus's tokens.  de's share exceeds its corpus, so "
    "it saturates at rate 1.0 (single-epoch — the operator never "
    "upsamples) and its unabsorbed budget redistributes over en/fr by "
    "weight — the genuinely tricky two-pass water-filling path "
    "(mixing.mixing_rates saturation + redistribution), stated closed-"
    "form so both engines evaluate it identically; verdict by the "
    "tag-salted md5 bucket.  (5) mix_epochs — the UPSAMPLING regime "
    "(mixing max_epochs=2, round 5): weights de 0.6 / en 0.4, budget "
    "1.1 × (de+en tokens); de CAPS at exactly 2 epochs per row and the "
    "unabsorbed budget water-fills en at a fractional rate, decided on "
    "a fresh 'u'-salted bucket — the LLaMA/Gopher repeat-scarce-domains "
    "mixture shape, per-row repeat counts exact in both engines "
    "(explode_epochs materializes them map-only).  (6, round-6 fusion "
    "of the former q_curriculum) n_chars/stage — curriculum staging "
    "(split.curriculum_order; Bengio 2009 / length-staged pretraining): "
    "4 ascending-length stages by QUANTILE thresholds — ONE quantile "
    "aggregation reduced to 3 plan literals (exact sort-based "
    "percentile here, the oracle path; approxQuantile one-pass "
    "mergeable in production), then stage assignment MAP-ONLY on the "
    "same scan as the other verdicts; Spark percentile ≡ DuckDB "
    "quantile_cont up to interpolation op order, stage comparisons "
    "integer-exact (within-stage order: repartitionByRange(stage, "
    "curr_key) at write time — no global sort).  (7, round-6 fusion of "
    "the former q_weighted_sample) ws_global/ws_group branches — "
    "weighted sampling WITHOUT replacement (operators/split), both "
    "scopes as a labeled union: ws_global = the 100 documents drawn "
    "proportional to token count by the Efraimidis-Spirakis (2006) "
    "exponential-key scheme — rank by ln(u)/w descending via "
    "weighted_sample_topk (TakeOrdered plan: per-partition top-k + "
    "driver merge, no global sort); ws_group = weighted_sample_per_"
    "group draws <= 20 docs per lang on an independent 'wg'-salted "
    "coordinate — ONE shuffle on the group key + per-group sort, the "
    "per-domain curation cap where bigger documents win "
    "proportionally.  The per-row uniform is the engine-portable "
    "tag-salted md5 coordinate (md5_uniform_sql), injected into the "
    "production operators via u_col so DuckDB replays the identical "
    "draws; adjacent-key gaps are ~1/n^2 relative while cross-engine "
    "libm-ln divergence is <= 1 ulp, so selections are engine-stable "
    "by an ~10^8 margin; emitted keys round to 6 dp on both sides.  "
    "The md5-hex arithmetic makes all per-row verdicts oracle-checked. "
    "Production path: operators/split.hash_split / hash_sample / "
    "stratified_sample / group_quota / curriculum_order / "
    "weighted_sample_* and operators/mixing.mix_corpora "
    "(xxhash64, tiny-agg + map-only verdict, driver-side water-filling "
    "incl. saturation redistribution and the max_epochs upsampling cap "
    "— pinned in tests/test_mixing.py).  (8, round-8 fusion) leak "
    "branch — the leakage-safe split COMPOSITION "
    "(split.leakage_safe_split): connected components over a "
    "closed-form chain edge set (consecutive-id runs, diameter 3, so "
    "the label propagation genuinely iterates), then hash_split keyed "
    "by the COMPONENT through the injected engine-portable md5 bucket "
    "(bucket_expr — the split twin of the samplers' u_col hook); "
    "bucket carries the component label, so the oracle's recursive CTE "
    "re-derives the labeling AND verifies every component lands whole "
    "in one split — the property row-keyed splitting cannot give.",
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.split import (
        curriculum_order,
        weighted_sample_per_group,
        weighted_sample_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    staged = curriculum_order(
        docs, "doc_id", "n_chars", n_stages=4, exact=True
    ).drop("curr_key")
    staged.createOrReplaceTempView("documents_staged")
    assign = spark.sql(
        _ASSIGN_TMPL.format(
            stage_expr="stage",
            inner_extra=", stage",
            src_table="documents_staged",
            thr_join="",
        )
    )

    src = docs.select(
        "doc_id",
        "lang",
        F.expr(_NTOKS_SQL).alias("w"),
        F.expr(md5_uniform_sql("CAST(doc_id AS STRING)", "ws")).alias("__u"),
        F.expr(md5_uniform_sql("CAST(doc_id AS STRING)", "wg")).alias(
            "__ug"
        ),
    )
    null_assign = [
        F.lit(None).cast("long").alias("bucket"),
        F.lit(None).cast("string").alias("split"),
        F.lit(None).cast("boolean").alias("in_sample10"),
        F.lit(None).cast("long").alias("strat_rank"),
        F.lit(None).cast("boolean").alias("in_quota"),
        F.lit(None).cast("long").alias("mix_thr"),
        F.lit(None).cast("boolean").alias("in_mix"),
        F.lit(None).cast("long").alias("mix_epochs"),
        F.lit(None).cast("long").alias("n_chars"),
        F.lit(None).cast("int").alias("stage"),
    ]
    glob = weighted_sample_topk(
        src, "doc_id", "w", k=100, key_col="samp_key", u_col="__u"
    ).select(
        F.lit("ws_global").alias("branch"),
        "doc_id",
        *null_assign,
        F.lit(None).cast("string").alias("grp"),
        "w",
        # + 0.0 canonicalizes IEEE -0.0 (a key within 0.5e-6 of zero
        # rounds to a SIGNED zero whose sign the engines render
        # differently — first seen at the 10x corpus, .scale/sf1)
        (F.round("samp_key", 6) + F.lit(0.0)).alias("samp_key"),
        F.lit(None).cast("long").alias("samp_rank"),
    )
    per = weighted_sample_per_group(
        src,
        ["lang"],
        "doc_id",
        "w",
        k=20,
        key_col="samp_key",
        rank_col="samp_rank",
        u_col="__ug",
    ).select(
        F.lit("ws_group").alias("branch"),
        "doc_id",
        *null_assign,
        F.col("lang").alias("grp"),
        "w",
        (F.round("samp_key", 6) + F.lit(0.0)).alias("samp_key"),
        F.col("samp_rank").cast("long").alias("samp_rank"),
    )
    # leak (round-8 fusion): the leakage-safe split COMPOSITION —
    # connected components over a closed-form chain edge set (runs of 4
    # consecutive doc_ids; diameter 3 forces real CC iterations), then
    # hash_split keyed by the COMPONENT via the injected md5 bucket
    # (bucket_expr — the same oracle hook as u_col).  bucket carries the
    # component label, so the oracle checks both the labeling and that
    # every member of a component lands in the SAME split.  The jaccard
    # edge generator is gated separately in q_dedup_components; this
    # branch pins the CC→split plumbing.
    from ..operators.split import leakage_safe_split

    ids = docs.select("doc_id")
    chain_edges = (
        docs.select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + F.lit(1)).alias("id_b"),
        )
        .filter((F.col("doc_id") % 10) < 3)
        .join(docs.select(F.col("doc_id").alias("id_b")), "id_b", "semi")
    )
    leak = leakage_safe_split(
        ids,
        "doc_id",
        chain_edges,
        _LEAK_WEIGHTS,
        bucket_expr=F.expr(
            md5_bucket_sql("CAST(component_id AS STRING)", 256)
        ),
        bucket_space=256,
    ).select(
        F.lit("leak").alias("branch"),
        "doc_id",
        F.col("component_id").cast("long").alias("bucket"),
        "split",
        *null_assign[2:],
        F.lit(None).cast("string").alias("grp"),
        F.lit(None).cast(src.schema["w"].dataType).alias("w"),
        F.lit(None).cast("double").alias("samp_key"),
        F.lit(None).cast("long").alias("samp_rank"),
    )
    return assign.unionAll(glob).unionAll(per).unionAll(leak)


@register(
    "q_multimodal_features",
    oracle="""
    SELECT doc_id, 'png' AS media_type,
           CAST(4 + n_chars % 13 AS INT) AS width,
           CAST(3 + doc_id % 7 AS INT) AS height,
           CAST(NULL AS INT) AS sample_rate,
           CAST(NULL AS INT) AS n_frames,
           CAST(NULL AS BIGINT) AS duration_us,
           CAST(list_sum(list_transform(
             range((4 + n_chars % 13) * (3 + doc_id % 7)),
             i -> (doc_id*31 + i) % 256)) AS BIGINT) AS sum_val,
           CAST(list_min(list_transform(
             range((4 + n_chars % 13) * (3 + doc_id % 7)),
             i -> (doc_id*31 + i) % 256)) AS BIGINT) AS min_val,
           CAST(list_max(list_transform(
             range((4 + n_chars % 13) * (3 + doc_id % 7)),
             i -> (doc_id*31 + i) % 256)) AS BIGINT) AS max_val
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, 'wav' AS media_type,
           CAST(NULL AS INT) AS width,
           CAST(NULL AS INT) AS height,
           CAST(8000 AS INT) AS sample_rate,
           CAST(64 + n_chars % 128 AS INT) AS n_frames,
           CAST((64 + n_chars % 128) * 125 AS BIGINT) AS duration_us,
           CAST(list_sum(list_transform(
             range(64 + n_chars % 128),
             i -> (doc_id*7 + i*13) % 2048 - 1024)) AS BIGINT) AS sum_val,
           CAST(list_min(list_transform(
             range(64 + n_chars % 128),
             i -> (doc_id*7 + i*13) % 2048 - 1024)) AS BIGINT) AS min_val,
           CAST(list_max(list_transform(
             range(64 + n_chars % 128),
             i -> (doc_id*7 + i*13) % 2048 - 1024)) AS BIGINT) AS max_val
    FROM documents WHERE doc_id % 2 = 1
    """,
    doc="E4: REAL multimodal decode, closed-loop against an independent "
    "oracle.  Spark synthesizes genuine binaries from documents — even "
    "doc_ids an 8-bit grayscale PNG (zlib IDAT, CRC-framed chunks), odd "
    "doc_ids a 16-bit mono PCM WAV — then decodes them with the "
    "pure-stdlib codecs in operators/multimodal.py (chunk walk + CRC "
    "check + defilter; wave/struct) and reports decoded geometry, timing "
    "and pixel/sample statistics.  The synthesis parameters are "
    "closed-form in (doc_id, n_chars), so DuckDB recomputes every "
    "expected feature WITHOUT touching the bytes: any corruption in "
    "encoder, decoder, or the Arrow binary path breaks the hash match.  "
    "Both encode and decode run distributed in Arrow-batched mapInPandas "
    "with pre-Python column pruning — payload bytes never concentrate on "
    "the driver (the 100 TB shape).",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synthesize_media(docs)
    return multimodal.decode_media(media)


def _ann_oracle_sql(
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    include_sq8: bool = False,
    rerank_n: int = 50,
) -> str:
    """Full DuckDB twin of the LSH + IVF probe pipelines.

    Both index structures are pure functions of (seed, params): the
    hyperplanes are re-generated here and inlined as DOUBLE[] literals
    (``repr(float)`` round-trips exactly, so DuckDB parses the identical
    doubles Spark broadcasts), and the IVF centroid sample is re-derived
    by the same portable md5 ordering ``ivf_assign`` uses.  So the oracle
    recomputes bucket membership, centroid assignment, probe selection and
    the exact cosine re-rank end-to-end — approximate ANN becomes fully
    hash-checkable because every 'random' choice is a deterministic plan
    constant.  Tie-breaks (argmax → lowest cluster; top-k → lowest id)
    are spelled explicitly on both sides.

    ``include_sq8`` adds the IVF-SQ8 quantized probe's twin (the
    q_ann_probe sq8 branch): re-derive the per-vector symmetric int8
    quantization EXACTLY as ``similarity._with_sq8`` spells it —
    scale = greatest(max|x| / 127, 1e-30), q_i = round(x_i / scale),
    both engines rounding ties away from zero — shortlist ``rerank_n``
    ids by the QUANTIZED cosine over the probed clusters, then exact
    cosine top-k over the shortlist.  Quantization, shortlist and
    re-rank are all closed-form, so the compressed path is
    hash-checked end-to-end, not just recall-tested.
    """
    from ..operators.similarity import _hyperplanes

    planes = _hyperplanes(n_planes, dim, seed)

    def vec_lit(vs: list[float]) -> str:
        return "[" + ", ".join(repr(float(x)) for x in vs) + "]::DOUBLE[]"

    def bucket_expr(vcol: str) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({vcol}, {vec_lit(p)}) > 0 "
            f"THEN {1 << i}::BIGINT ELSE 0 END)"
            for i, p in enumerate(planes)
        )

    sq8_ctes = (
        f""",
    sq AS (
      SELECT a.vec_id, a.v,
             list_transform(a.v, x -> round(x / greatest(
               list_aggregate(list_transform(a.v, y -> abs(y)), 'max')
                 / 127.0, 1e-30))) AS qv8
      FROM assign a JOIN probe USING (cluster)
    ),
    sq_short AS (
      SELECT vec_id, v
      FROM sq CROSS JOIN q
      ORDER BY list_cosine_similarity(qv8, qv) DESC, vec_id
      LIMIT {rerank_n}
    ),
    sq8 AS (
      SELECT 'sq8' AS method, vec_id,
             round(list_cosine_similarity(v, qv), 6) AS cos_sim
      FROM sq_short CROSS JOIN q
      ORDER BY cos_sim DESC, vec_id
      LIMIT {k}
    )"""
        if include_sq8
        else ""
    )
    sq8_union = " UNION ALL SELECT * FROM sq8" if include_sq8 else ""

    return f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ),
    base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id <> 0
    ),
    lsh_base AS (
      SELECT vec_id, v, {bucket_expr("v")} AS bucket FROM base
    ),
    lsh_q AS (
      SELECT qv, {bucket_expr("qv")} AS bucket FROM q
    ),
    lsh AS (
      SELECT 'lsh' AS method, vec_id,
             round(list_cosine_similarity(v, qv), 6) AS cos_sim
      FROM lsh_base JOIN lsh_q USING (bucket)
      ORDER BY cos_sim DESC, vec_id
      LIMIT {k}
    ),
    cent AS (
      SELECT * FROM (
        SELECT row_number() OVER (
                 ORDER BY md5(concat('{seed}', ':', CAST(vec_id AS VARCHAR))),
                          vec_id
               ) - 1 AS cluster,
               CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id <> 0
      ) WHERE cluster < {n_centroids}
    ),
    assign AS (
      SELECT vec_id, v, cluster FROM (
        SELECT b.vec_id, b.v, c.cluster,
               row_number() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY list_cosine_similarity(b.v, c.cv) DESC, c.cluster
               ) AS rn
        FROM base b CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT cluster FROM cent CROSS JOIN q
      ORDER BY list_cosine_similarity(cv, qv) DESC, cluster
      LIMIT {n_probe}
    ),
    ivf AS (
      SELECT 'ivf' AS method, a.vec_id,
             round(list_cosine_similarity(a.v, q.qv), 6) AS cos_sim
      FROM assign a JOIN probe USING (cluster) CROSS JOIN q
      ORDER BY cos_sim DESC, a.vec_id
      LIMIT {k}
    ){sq8_ctes}
    SELECT * FROM lsh UNION ALL SELECT * FROM ivf{sq8_union}
    """


_ANN_ORACLE = _ann_oracle_sql()
_ANN_ORACLE_SQ8 = _ann_oracle_sql(include_sq8=True)


@register(
    "q_ann_topk",
    oracle=_ANN_ORACLE,
    doc="E2 scale paths, one labeled union: lsh — random-hyperplane LSH "
    "bucket probe + exact cosine re-rank, touches one bucket instead of "
    "the full table; ivf — coarse-quantize vectors to seeded centroids "
    "(one broadcast-GEMM mapInPandas pass), probe the query's 2 nearest "
    "inverted lists, exact cosine re-rank.  The build-then-probe variant "
    "over a persisted bucket-partitioned table is q_ann_probe.",
)
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    base = emb.filter(F.col("vec_id") != 0)
    lsh = similarity.lsh_topk(base, query, dim=64, k=10, n_planes=8).select(
        F.lit("lsh").alias("method"), "vec_id", "cos_sim"
    )
    ivf = similarity.ivf_topk(
        base, query, k=10, n_centroids=16, n_probe=2
    ).select(F.lit("ivf").alias("method"), "vec_id", "cos_sim")
    return lsh.unionAll(ivf)


@register(
    "q_ann_probe",
    oracle=_ANN_ORACLE_SQ8,  # probe ≡ the in-memory variant (same params,
    # same deterministic index structures), so it shares q_ann_topk's full
    # DuckDB twin, EXTENDED with the IVF-SQ8 quantized branch's closed-form
    # twin; PartitionFilters pruning asserted in tests/test_similarity.py
    doc="E2 build-then-probe: the production shape of q_ann_topk.  BUILD "
    "writes the LSH-bucketed table parquet-partitioned by bucket and the "
    "IVF inverted lists partitioned by cluster (once per corpus version "
    "at 100 TB); PROBE computes the query's bucket / centroid ranks "
    "driver-side (a handful of dot products) and reads ONLY the matching "
    "partitions — planning-time partition pruning (PartitionFilters in "
    "the scan), so probe I/O is O(bucket) instead of the O(table) rescan "
    "the in-memory variant pays per query.  sq8 branch (round-5 fusion): "
    "the IVF-SQ8 QUANTIZED index (operators/similarity.py "
    "build_ivf_sq_index/ivf_sq_probe) — int8 inverted lists (~8× less "
    "probe I/O), int8-cosine shortlist of 50, exact re-rank against the "
    "bucket-pruned full-precision store — hash-checked end-to-end: the "
    "oracle re-derives the symmetric int8 quantization (round-half-up "
    "matches in both engines), the quantized shortlist, and the exact "
    "top-k in SQL.",
)
def q_ann_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathlib import Path

    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    base = emb.filter(F.col("vec_id") != 0)
    wh, tag = warehouse_root_tag(sf_dir)
    root = wh / "ann_index"
    # params are baked into the path: an existing index IS the index for
    # these (source, params) — build once per corpus version, probe many
    # (the whole point of the build/probe split; rebuilding per query
    # would be the O(table)-per-probe shape this operator exists to avoid)
    # content fingerprint in the tag: a driver-regenerated embeddings
    # table invalidates by path instead of probing stale bucketed data
    # (same discipline as the bm25 gate index)
    fp = _source_tag(spark, sf_dir, "embeddings")
    lsh_path = str(root / f"lsh_{tag}_d64p8s42_{fp}")
    # tag encodes the centroid-seeding scheme (md5 ordering) — an index
    # built under the old xxhash64 ordering has different clusters and
    # must not be reused
    ivf_path = str(root / f"ivf_{tag}_c16md5s42_{fp}")
    sq8_path = str(root / f"sq8_{tag}_c16md5s42_{fp}")
    if not (Path(lsh_path) / "_SUCCESS").exists():
        similarity.build_lsh_index(base, lsh_path, dim=64, n_planes=8)
    if not (Path(ivf_path) / "vectors" / "_SUCCESS").exists():
        similarity.build_ivf_index(base, ivf_path, n_centroids=16)
    if not (Path(sq8_path) / "meta" / "_SUCCESS").exists():
        similarity.build_ivf_sq_index(base, sq8_path, n_centroids=16)
    # The three probes are independent, and each one's CONSTRUCTION runs
    # several sequential driver-side jobs (query-vector first(),
    # centroids collect, meta read, sq8 shortlist) — measured 2.3 s of
    # this query's 2.7 s wall, vs 0.3 s of execution.  Overlap them with
    # a small thread pool (opt guide §2.6: actions are only sequential
    # because driver code calls them sequentially); the union order
    # below stays deterministic.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        lsh_f = pool.submit(
            similarity.lsh_probe,
            spark, lsh_path, query, dim=64, k=10, n_planes=8,
        )
        ivf_f = pool.submit(
            similarity.ivf_probe, spark, ivf_path, query, k=10, n_probe=2
        )
        sq8_f = pool.submit(
            similarity.ivf_sq_probe,
            spark, sq8_path, query, k=10, n_probe=2, rerank_n=50,
        )
    lsh = lsh_f.result().select(
        F.lit("lsh").alias("method"), "vec_id", "cos_sim"
    )
    ivf = ivf_f.result().select(
        F.lit("ivf").alias("method"), "vec_id", "cos_sim"
    )
    sq8 = sq8_f.result().select(
        F.lit("sq8").alias("method"), "vec_id", "cos_sim"
    )
    return lsh.unionAll(ivf).unionAll(sq8)


# ── corpus token statistics (round-5 continuation, round-6 fusion) ───────



# MG summaries persisted by the heavy-hitter branches of the PREVIOUS
# q_collocations invocation — released generationally at the next call:
# a registry query has no post-materialization hook to unpersist at, and
# by the time the plan is rebuilt the prior result has been consumed.
# Without this, every bench pass leaked two persisted frames into the
# block-manager cache for the session's lifetime.
_HH_GATE_HANDLES: list = []


@register(
    "q_collocations",
    oracle="""
    WITH toks AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    big AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2)
    ),
    cab AS (SELECT w1, w2, count(*) AS c_ab FROM big GROUP BY 1, 2),
    ca AS (SELECT w1, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY 1),
    cb AS (SELECT w2, CAST(sum(c_ab) AS BIGINT) AS c_b FROM cab GROUP BY 1),
    tot AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n FROM cab),
    colloc AS (
      SELECT 'colloc' AS branch, w1, w2, c_ab, c_a, c_b,
             (CAST(c_ab AS DOUBLE) * CAST(n AS DOUBLE))
               / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE)) AS lift
      FROM cab JOIN ca USING (w1) JOIN cb USING (w2), tot
      WHERE c_ab >= 10
    ),
    words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    w AS (SELECT word FROM words WHERE word <> ''),
    wtot AS (SELECT count(*) AS n FROM w),
    hh AS (
      SELECT 'hh' AS branch, word AS w1, CAST(NULL AS VARCHAR) AS w2,
             CAST(count(*) AS BIGINT) AS c_ab,
             CAST(NULL AS BIGINT) AS c_a, CAST(NULL AS BIGINT) AS c_b,
             CAST(NULL AS DOUBLE) AS lift
      FROM w, wtot
      GROUP BY word, n
      HAVING count(*) * 30 > n
    ),
    sw AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    sw2 AS (SELECT source, word FROM sw WHERE word <> ''),
    stot AS (SELECT source, count(*) AS n FROM sw2 GROUP BY 1),
    ghh AS (
      SELECT 'ghh' AS branch, word AS w1, sw2.source AS w2,
             CAST(count(*) AS BIGINT) AS c_ab,
             CAST(n AS BIGINT) AS c_a,
             CAST(NULL AS BIGINT) AS c_b,
             CAST(NULL AS DOUBLE) AS lift
      -- null-safe join: the Spark side (grouped_heavy_hitters) keeps a
      -- NULL-source stratum; a plain equality join would drop it here
      FROM sw2 JOIN stot ON sw2.source IS NOT DISTINCT FROM stot.source
      GROUP BY sw2.source, word, n
      HAVING count(*) * 30 > n
    )
    SELECT * FROM colloc UNION ALL SELECT * FROM hh
    UNION ALL SELECT * FROM ghh
    """,
    doc="Corpus token statistics, one labeled union (round-6 fusion so "
    "the 50-entry driver gate covers both semantics).  colloc branch — "
    "collocation mining (operators/collocations.py; Manning-Schutze "
    "ch.5 / word2vec phrase pass): adjacent word bigrams with "
    "c_ab >= 10, their exact position-based unigram counts, and the "
    "independence LIFT = N*c_ab/(c_a*c_b) (= 2^PMI).  ONE corpus pass "
    "builds the bigram count table (map-only zip-shift explode -> one "
    "shuffle with map-side partials); unigram counts, N and survivors "
    "all derive from that vocab^2-bounded table (persisted so its "
    "consumers share one materialization).  Lift is one IEEE division "
    "of exact integers — spelled in the identical op order in both "
    "engines, hash-exact with no transcendental (log2-free by design; "
    "PMI = log2(lift) driver-side).  hh branch — heavy hitters over "
    "the same token stream (operators/freq.py): every word with "
    "frequency > 1/30 of all tokens, with EXACT counts.  The Spark "
    "side runs the real two-pass Misra-Gries sieve — per-partition "
    "mergeable MG summaries (k=64 counters) in one Arrow-batched "
    "mapInPandas scan, a partial-merge shuffle + a DISTRIBUTED "
    "integer-exact pre-sieve, then an exact recount of only the "
    "candidate items (broadcast semi-join against the sieved "
    "candidate frame — fully lazy since round 7, nothing reaches the "
    "driver) — while DuckDB states the semantics as the plain "
    "GROUP BY ... HAVING count*den > total.  "
    "The MG guarantee (k+1=65 >= den=30 => no item above threshold "
    "can be missed) makes the sieve EXACT, not approximate.  At 100 "
    "TB this is the shape that replaces a full-vocabulary groupBy: "
    "the corpus never shuffles keyed by token — only candidate-"
    "matching rows do.  ghh branch (round-7 fusion — the round-6 "
    "grouped operator's hard CORRECTNESS row): per-SOURCE heavy "
    "hitters via operators/freq.py:grouped_heavy_hitters — every "
    "(source, word) whose count strictly exceeds 1/30 of ITS OWN "
    "source's token total, with exact counts AND the per-group total "
    "(w2 carries the source, c_a the group total).  The per-domain "
    "sweep where a global threshold would drown small domains; the "
    "Spark side runs the per-(partition, group) MG sieve with the "
    "candidate set a DataFrame end-to-end (null-safe semi-join exact "
    "pass — no O(groups*k) driver collect), while DuckDB states it "
    "as the per-group GROUP BY ... HAVING count*den > group_total.",
)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.collocations import collocations
    from ..operators.freq import grouped_heavy_hitters, heavy_hitters

    for _h in _HH_GATE_HANDLES:
        try:
            _h.unpersist()
        except Exception:
            # best-effort release: the handle may belong to a stopped/
            # replaced SparkContext (multi-session harness) — a dead
            # handle must not break the query in the new session
            pass
    _HH_GATE_HANDLES.clear()

    docs = load_table(spark, sf_dir, "documents")
    # ONE tokenize pass (round 8): colloc/hh/ghh previously each
    # re-scanned and re-split the corpus; the shared (source, tokens)
    # frame is persisted — same count-table discipline as
    # collocations.py's c_ab — and released generationally through
    # _HH_GATE_HANDLES like the MG sketch handles
    from pyspark import StorageLevel

    tok = docs.select(
        "source",
        F.filter(
            F.split(F.col("text"), " "), lambda x: x != ""
        ).alias("toks"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _HH_GATE_HANDLES.append(tok)
    colloc = collocations(tok, "toks", min_count=10).select(
        F.lit("colloc").alias("branch"),
        "w1",
        "w2",
        "c_ab",
        "c_a",
        "c_b",
        "lift",
    )
    words = tok.select(F.explode("toks").alias("word"))
    hh = heavy_hitters(
        words, "word", den=30, k=64, count_col="cnt",
        handle=_HH_GATE_HANDLES,
    ).select(
        F.lit("hh").alias("branch"),
        F.col("word").alias("w1"),
        F.lit(None).cast("string").alias("w2"),
        F.col("cnt").alias("c_ab"),
        F.lit(None).cast("long").alias("c_a"),
        F.lit(None).cast("long").alias("c_b"),
        F.lit(None).cast("double").alias("lift"),
    )
    src_words = tok.select("source", F.explode("toks").alias("word"))
    ghh = grouped_heavy_hitters(
        src_words, "source", "word", den=30, handle=_HH_GATE_HANDLES
    ).select(
        F.lit("ghh").alias("branch"),
        F.col("word").alias("w1"),
        F.col("source").alias("w2"),
        F.col("cnt").alias("c_ab"),
        F.col("grp_total").alias("c_a"),
        F.lit(None).cast("long").alias("c_b"),
        F.lit(None).cast("double").alias("lift"),
    )
    return colloc.unionAll(hh).unionAll(ghh)


