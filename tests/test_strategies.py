"""Cross-strategy equivalence: operators that pick a physical strategy
at runtime must produce identical results from every strategy."""

from data_lake_staging_engine_spark.operators.llmops import (
    _g02_bitmask,
    _g02_token_join,
    _tokens,
)
from data_lake_staging_engine_spark.sources import load


def test_g02_bitmask_equals_token_join(spark, sf_dir):
    """The small-universe bitmask path and the general token-join path
    are the same operator — bit-identical pairs and jaccard values."""
    toks = _tokens(load(spark, sf_dir, "documents"))
    fast = {tuple(r) for r in _g02_bitmask(toks).collect()}
    slow = {tuple(r) for r in _g02_token_join(toks).collect()}
    assert fast == slow
    assert len(fast) > 0
