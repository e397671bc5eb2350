"""Schema-evolution family under every hostile corpus mode (round 13,
VERDICT r12 #3 checklist item 6b).

a21 (additive evolution via mergeSchema), a23 (non-additive widening:
int32->int64, float->double, added column), and a28 (multi-format
landing union: parquet+csv+json) each stage the fixture EVENTS/ORDERS
tables into multi-batch landings and read them back through a schema
policy.  Every prior hostile axis swept them inside the full-registry
runs of its own round, but never as a family across ALL modes in one
matrix — a hostile value that round-trips parquet fine can still break
the CSV/JSON legs of a28 (text serialization) or the narrow-type leg
of a23 (wrap/overflow on cast).

The matrix: 7 corpus modes x {a21, a23, a28}, oracle-compared.  The
first sweep (round 13) caught ONE real divergence: a23's narrow
float32 leg — Spark's non-ANSI double->float cast SATURATES the
numeric-hostile corpus's -1e300 value to -Infinity (silent feed
corruption) where DuckDB refuses the cast.  Fixed with an in-pass
assert_true mirroring the existing int32 guard; that cell now pins
the loud failure, every other cell pins oracle parity.
"""

import duckdb
import pytest
# Slow tier (pytest.ini): hostile schema-evolution drive.
pytestmark = pytest.mark.slow


from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.testing import TESTDATA_TABLES, compare
from scripts.make_adversarial_corpus import build

_REG = registry()

_MODES = [
    "default",
    "time_hostile",
    "null_keys",
    "text_hostile",
    "numeric_hostile",
    "skew_hostile",
    "binary_hostile",
]

_FAMILY = ["a21_schema_evolution", "a23_schema_widening", "a28_multi_format_union"]


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    dirs = {}
    for mode in _MODES:
        d = str(tmp_path_factory.mktemp(f"sev_{mode}"))
        kwargs = {} if mode == "default" else {mode: True}
        build(d, "/root/testdata/sf0.001", **kwargs)
        dirs[mode] = d
    return dirs


@pytest.fixture(scope="module")
def ducks(corpora):
    cons = {}
    for mode, d in corpora.items():
        con = duckdb.connect()
        con.execute("SET TimeZone='UTC'")
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{d}/{t}.parquet')"
            )
        cons[mode] = con
    yield cons
    for con in cons.values():
        con.close()


@pytest.mark.parametrize("mode", _MODES)
@pytest.mark.parametrize("name", _FAMILY)
def test_schema_evolution_under_hostile_mode(spark, corpora, ducks, mode, name):
    if (name, mode) == ("a23_schema_widening", "numeric_hostile"):
        # The one red cell of the first sweep, now a loud failure: the
        # corpus's -1e300 value class cannot be staged narrow without
        # saturating to -Infinity, so the guard must refuse the write.
        with pytest.raises(Exception, match="float32 range"):
            _REG[name].fn(spark, corpora[mode]).collect()
        return
    rq = _REG[name]
    assert rq.oracle is not None
    res = compare(name, rq.fn(spark, corpora[mode]), ducks[mode], rq.oracle)
    assert res.ok, f"{name} over {mode}: {res.detail}"
