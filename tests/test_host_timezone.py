"""Host-timezone invariance (round 7).

``spark.sql.session.timeZone=UTC`` pins SQL semantics, but pyspark's
non-Arrow ``collect()`` renders TimestampType instants through the C
library's LOCAL time — so on a non-UTC host every collected timestamp
shifts by the host offset while the DuckDB oracle keeps UTC. A
TZ=Pacific/Kiritimati (UTC+14) registry sweep failed exactly the 13
timestamp-emitting queries before ``session._pin_process_utc`` existed;
these tests pin the fix.

The subprocess is unavoidable: the parent test process has already
called ``tzset`` under the repo's UTC environment, and the JVM is
already up — only a fresh interpreter started with a displaced TZ
reproduces the driver-on-a-non-UTC-VM shape.
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import sys
sys.path.insert(0, {repo!r})
import time
assert time.tzname[0] != "UTC", "test requires a non-UTC starting TZ"
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[4]").getOrCreate()
import __spark_entry__ as E
qs, osql = E.queries(), E.oracle_sql()
from data_lake_staging_engine_spark.testing import compare, duck_connection

import pytest
# Slow tier (pytest.ini): displaced-TZ subprocess sweep.
pytestmark = pytest.mark.slow

con = duck_connection("/root/testdata/sf0.001")
for name in ("d02_fn_date", "c06_win_first_last", "a01_scan_parquet"):
    res = compare(name, qs[name](spark, "/root/testdata/sf0.001"), con, osql[name])
    assert res.ok, f"{{name}} under displaced host TZ: {{res.detail}}"
print("TZ-INVARIANT-OK")
"""


def test_displaced_host_tz_still_hash_matches():
    """Three timestamp-emitting queries (date pack, window first/last,
    raw scan) must hash-match the UTC oracle from a process started
    under TZ=Pacific/Kiritimati — the maximally displaced zone."""
    env = dict(os.environ, TZ="Pacific/Kiritimati")
    out = subprocess.run(
        [sys.executable, "-c", _PROBE.format(repo=_REPO)],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "TZ-INVARIANT-OK" in out.stdout
