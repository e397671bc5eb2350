"""Cross-strategy equivalence: operators that pick a physical strategy
at runtime must produce identical results from every strategy."""

from pyspark.sql import functions as F

from data_lake_staging_engine_spark.operators.llmops import (
    _g02_bitmask,
    _g02_token_join,
    _tokens,
)
from data_lake_staging_engine_spark.sources import load


def test_g02_bitmask_equals_token_join(spark, sf_dir):
    """The small-universe bitmap path and the prefix-filtered token-join
    path are the same operator — bit-identical pairs and jaccard."""
    toks = _tokens(load(spark, sf_dir, "documents"))
    vocab_n = toks.select("tok").distinct().count()
    fast = {tuple(r) for r in _g02_bitmask(toks, vocab_n, 0.8).collect()}
    slow = {tuple(r) for r in _g02_token_join(toks, 0.8).collect()}
    assert fast == slow
    assert len(fast) > 0


def test_g02_multiword_bitmap_equals_token_join(spark, sf_dir):
    """Force the multi-word path (3-gram shingles, vocab ~400 => 7
    words) and check it against the prefix-filtered join."""
    d = load(spark, sf_dir, "documents")
    positions = F.when(
        F.length("text") >= 3, F.sequence(F.lit(1), F.length("text") - 2)
    ).otherwise(F.array().cast("array<int>"))
    shingles = (
        d.select("doc_id", "text", F.explode(positions).alias("i"))
        .select("doc_id", F.col("text").substr(F.col("i"), F.lit(3)).alias("tok"))
        .distinct()
    )
    vocab_n = shingles.select("tok").distinct().count()
    assert vocab_n > 64  # genuinely multi-word
    fast = {tuple(r) for r in _g02_bitmask(shingles, vocab_n, 0.8).collect()}
    slow = {tuple(r) for r in _g02_token_join(shingles, 0.8).collect()}
    assert fast == slow
