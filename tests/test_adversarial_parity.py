"""Adversarial Spark-vs-DuckDB parity: run query/oracle twins on data shapes
the standard fixtures do not contain — vertical tabs, CRLF, double spaces,
tabs, empty/whitespace-only strings — and require the SAME driver-style
value hash from both engines. This is the executable form of the round-4
cross-engine audit (explicit whitespace classes, normalized levenshtein,
concat_ws NULL semantics): any regression back to \\s / raw-string oracles
fails here even though the clean fixtures keep passing."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

_TEXTS = [
    (1, "plain text with the words and more of that for is"),
    (2, "double  space and\ttab    runs"),
    (3, "vertical\x0btab inside the line"),
    (4, "crlf line\r\nnext line\rbare cr"),
    (5, ""),
    (6, "   "),
    (7, "MiXeD Case. Two sentences! third?  What topic?! x9 12ab"),
    (8, "the the the und und der der le la de"),
    # ids = 0 mod 31 land in doc_decontaminate's eval slice; they share
    # word 4-grams with docs 1 and 4 (the latter only after whitespace
    # normalization) so the gram-match path actually executes
    (31, "plain text with the words but a different tail"),
    (62, "crlf line \t next line\x0bbare cr"),
]
# Full testdata documents schema: doc_id, text, lang, source, n_chars.
ADVERSARIAL_DOCS = [
    (i, t, ["en", "de", "fr"][i % 3], ["web", "wiki"][i % 2], len(t))
    for i, t in _TEXTS
]

QUERIES_ON_DOCUMENTS = [
    "doc_token_stats",
    "doc_quality",
    "doc_lang_id",
    "doc_fingerprint_dedup",
    "doc_minhash_bands",
    "doc_bpe_tokens",
    "doc_winnow_fingerprints",
    "doc_winnow_excerpt_dups",
    "doc_repetition_filters",
    "doc_tfidf_top_terms",
    "doc_domain_sample",
    "doc_decontaminate",
    "doc_curation_pipeline",
    "doc_chunk_windows",
    "doc_vocab_coverage",
    "doc_pack_sequences",
]


@pytest.mark.parametrize("qname", QUERIES_ON_DOCUMENTS)
def test_adversarial_text_parity(spark, tmp_path_factory, qname):
    from check_oracle import value_hash

    import __spark_entry__ as entry

    sf = str(tmp_path_factory.getbasetemp() / "sf_adversarial")
    pq = os.path.join(sf, "documents.parquet")
    if not os.path.exists(pq):
        os.makedirs(sf, exist_ok=True)
        spark.createDataFrame(
            ADVERSARIAL_DOCS,
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).coalesce(1).write.mode("overwrite").parquet(pq)

    sdf = entry.queries()[qname](spark, sf)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    rel = con.sql(entry.oracle_sql()[qname])
    o_cols = rel.columns
    o_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(o_cols), (s_cols, o_cols)
    assert len(s_rows) == len(o_rows), (qname, len(s_rows), len(o_rows))
    assert value_hash(s_rows, s_cols) == value_hash(o_rows, o_cols), qname
