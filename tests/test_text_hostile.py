"""Text-hostile (Unicode) corpus pins — the FIFTH hostile axis (round 10).

The four round-9 corpora attacked keys, clocks, measures, and
identities; none attacked the TEXT surface the §2.G family and its
Java-regex/RE2-oracle pairs process.  ``make_adversarial_corpus.py
--text-hostile`` rewrites documents.text with 15 deterministic Unicode
classes (astral emoji/ZWJ, NFD vs NFC, length-changing case foldings,
CJK, RTL, zero-width chars inside tokens, U+2028/U+2029, \\s-invisible
whitespace, regex metacharacters, non-ASCII-context PII, an unbroken
10k-char token, mixed scripts, full-width ASCII, quote/backslash
storms).  The round-10 full-registry sweep over it found:

1. **A driver OOM in Catalyst** (g02d and, transitively, the wedged
   session's remainder): the bitmap-dedup expansion joined on one
   equality PER WORD COLUMN, and constraint propagation is exponential
   in conjunct equalities across a join — the hostile corpus's
   710-gram vocabulary (12 words, vs the fixture's ~400/7) tipped
   analysis over an 8 GB driver heap.  Fixed by packing the join key
   into ONE struct (operators/llmops.py::_g02_bitmask); a plan-ANALYSIS
   cost that scales with data vocabulary is a 100 TB killer, since
   vocabulary is data-dependent and unbounded.
2. **A real cross-engine Unicode divergence** (g01): the JVM's
   lower() applies full Unicode case mapping — one-to-MANY foldings
   included, so U+0130 ('İ') lowers to 'i' + U+0307 (combining dot) —
   while DuckDB's lower() applies the simple one-to-one mapping
   ('İ' -> 'i').  Spark is self-consistent (dedup is correct); only
   the cross-engine digest parity breaks, on exactly the one palette
   class carrying 'İ'.  Same class as the pinned concat-NULL
   divergence: document, pin both engines' behavior, exclude the
   class from the digest-parity check.

After the struct-key fix the full 159-query sweep reads 158 ok +
g01's pinned divergence (BASELINE.md round-10 section).  This module
rebuilds the corpus (deterministic, ~1 s) and pins the at-risk subset
so neither finding can regress silently.
"""

from __future__ import annotations

import os

import duckdb
import pytest
# Slow tier (pytest.ini): hostile-text full parity sweep.
pytestmark = pytest.mark.slow


from pyspark.sql import functions as F

from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.testing import TESTDATA_TABLES, compare
from scripts.make_adversarial_corpus import TEXT_PALETTE, build

_REG = registry()


@pytest.fixture(scope="module")
def text_sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("text_hostile"))
    build(d, "/root/testdata/sf0.001", text_hostile=True)
    return d


@pytest.fixture(scope="module")
def text_duck(text_sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{text_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


# The at-risk hash-tier subset: every class of text processing the
# palette attacks — digest dedup (g02 token-Jaccard; g01 is pinned
# separately for its casefold divergence), the bitmap/shingle path that
# OOMed (g02, g02d), tokenizers (g05 g05b g06 g17 g20 g25), regex
# processors (g14 g24 g29 d13), quality/stats (g08 g08b g08c g23),
# cross-doc composition (g12 g21 g26 g30 g31), line-oriented ingest
# (a27), struct/UDTF/multimodal text consumers (d08 f06 f08).
H_PINNED = [
    "a27_scan_text",
    "d08_fn_struct",
    "d13_fn_url",
    "f06_udtf",
    "f08_multimodal_decode",
    "g02_dedup_near",
    "g02d_dedup_ngram",
    "g05_text_tokenize",
    "g05b_token_bpe",
    "g06_text_wordcount",
    "g08_text_stats",
    "g08b_text_quality",
    "g08c_text_langid",
    "g08d_text_fingerprint",
    "g12_contamination",
    "g14_text_clean",
    "g17_text_bigrams",
    "g20_unigram_logprob",
    "g21_dedup_agreement",
    "g23_text_repetition",
    "g24_pii_scrub",
    "g25_sequence_pack",
    "g26_dedup_clusters",
    "g29_quality_gate",
    "g30_dedup_incremental",
    "g31_dedup_segments",
]


@pytest.mark.parametrize("name", H_PINNED)
def test_text_hostile_parity(name, spark, text_sf_dir, text_duck):
    rq = _REG[name]
    res = compare(name, rq.fn(spark, text_sf_dir), text_duck, rq.oracle)
    assert res.ok, f"{name} on text-hostile corpus: {res.detail}"


def test_bitmask_expansion_survives_wide_vocab(spark, text_sf_dir):
    """Regression pin for finding 1: g02d on this corpus selects the
    bitmap strategy at vocab 710 => 12 word columns; before the
    struct-key fix, Catalyst's constraint propagation OOMed an 8 GB
    driver during ANALYSIS of the per-column expansion joins.  The
    fixture never exercises >7 words, so this corpus is the only
    in-suite reproduction.  Completing at all IS the assertion; the
    pair count pins the output."""
    out = _REG["g02d_dedup_ngram"].fn(spark, text_sf_dir)
    assert out.count() == 7099


def test_lower_one_to_many_casefold_divergence_pin(spark, text_duck):
    """Finding 2, pinned on BOTH engines: the JVM's lower() applies
    full Unicode case mapping (U+0130 -> 'i' + U+0307, TWO code
    points), DuckDB's the simple mapping (U+0130 -> 'i', one).  If
    either engine changes behavior, this fails and the g01 exclusion
    below must be revisited."""
    spark_low = spark.range(1).select(
        F.lower(F.lit("İstanbul İı")).alias("s")
    ).collect()[0].s
    duck_low = text_duck.execute(
        "SELECT lower('İstanbul İı')"
    ).fetchone()[0]
    assert spark_low == "i̇stanbul i̇ı"
    assert duck_low == "istanbul iı"
    assert spark_low != duck_low  # the divergence is REAL on both ends

    # upper() diverges even harder: the JVM applies full mappings
    # (ß -> SS, the ﬁ ligature -> FI) where DuckDB maps one-to-one
    # (ß -> the capital sharp-s U+1E9E, ligature untouched).  The two
    # upper() query pairs (b35's type_label, d01's p_name) are safe
    # only because their fixture domains are ASCII — any non-ASCII
    # corpus under them needs the same treatment as g01.
    spark_up = spark.range(1).select(
        F.upper(F.lit("straße ﬁle")).alias("s")
    ).collect()[0].s
    duck_up = text_duck.execute("SELECT upper('straße ﬁle')").fetchone()[0]
    assert spark_up == "STRASSE FILE"
    assert duck_up == "STRAẞE ﬁLE"


def test_g01_digest_parity_outside_casefold_class(spark, text_sf_dir, text_duck):
    """g01's md5(lower(trim(text))) digests agree on every palette
    class EXCEPT the one carrying 'İ' (class 3 — the pinned casefold
    divergence).  Compare the full digest multiset with that class
    excluded on both engines."""
    n = len(TEXT_PALETTE) + 1
    d = spark.read.parquet(os.path.join(text_sf_dir, "documents.parquet"))
    sp = sorted(
        r.dig
        for r in d.filter((F.col("doc_id") % n) != 3)
        .select(F.md5(F.lower(F.trim("text"))).alias("dig"))
        .collect()
    )
    du = sorted(
        row[0]
        for row in text_duck.execute(
            f"SELECT md5(lower(trim(text))) FROM documents WHERE doc_id % {n} != 3"
        ).fetchall()
    )
    assert sp == du


def test_portable_digest_parity_including_casefold_class(
    spark, text_sf_dir, text_duck
):
    """The opt-in remediation for the pinned divergence (VERDICT r10
    #4): ``exact_dedup(..., portable=True)`` digests over an
    ASCII-only case fold (``translate``, a strict 1:1 codepoint map on
    every engine), so the FULL text-hostile corpus — INCLUDING class 3,
    the 'İ' carrier that breaks lower()-based parity — hash-matches
    DuckDB computing the mirrored expression.  A user who must match
    digests from a non-JVM system switches this on and loses only
    non-ASCII case-insensitivity."""
    from data_lake_staging_engine_spark.operators.llmops import (
        PORTABLE_CASEFOLD_SQL,
        exact_dedup,
    )

    d = spark.read.parquet(os.path.join(text_sf_dir, "documents.parquet"))
    out = exact_dedup(d, portable=True)
    fold = PORTABLE_CASEFOLD_SQL.format(col="trim(text)")
    oracle = f"""
    SELECT doc_id, md5({fold}) AS digest
    FROM documents
    QUALIFY row_number() OVER (PARTITION BY md5({fold})
                               ORDER BY doc_id) = 1
    """
    res = compare("g01_portable_digest", out, text_duck, oracle)
    assert res.ok, f"portable digest parity: {res.detail}"
    # And it really is exercised on the divergence class: class-3 docs
    # (the 'İ' carriers) are present in the compared corpus.
    n = len(TEXT_PALETTE) + 1
    assert d.filter((F.col("doc_id") % n) == 3).count() > 0


def test_tokenizer_glues_exotic_whitespace(spark, text_sf_dir):
    """The exotic-whitespace class (NBSP, ideographic space, thin
    space) must GLUE tokens, not split them: the engine tokenizes on
    the ASCII space (and the oracle mirrors it), so
    'a\\u00a0b\\u3000c\\u2009d nbsp ideographic thin data' is exactly
    5 tokens with the glued compound intact.  Cross-engine agreement
    is covered by the g05 parity pin above; this pins the absolute
    count so a future 'smarter' regex tokenizer that silently changes
    token boundaries on Unicode whitespace fails loudly."""
    n = len(TEXT_PALETTE) + 1
    out = _REG["g05_text_tokenize"].fn(spark, text_sf_dir)
    counts = {
        r.n_tokens
        for r in out.filter((F.col("doc_id") % n) == 8).collect()
    }
    assert counts == {5}
