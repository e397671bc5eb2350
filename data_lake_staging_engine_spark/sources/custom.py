"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference genre treats "a new feed appears" as a configuration
change; the Spark-4-native equivalent of writing a connector for a feed
Spark has no built-in reader for is a Python DataSource: schema +
partition planning on the driver, per-partition generators on
executors, Arrow-batched back to the JVM. This one synthesizes a
deterministic ledger feed (seeded integer arithmetic, no RNG state), so
it doubles as an oracle-checkable fixture: DuckDB reproduces the same
rows from ``generate_series``.

The classes are defined inside a factory on purpose: Spark ships a
DataSource to executors via cloudpickle, which serializes module-level
classes BY REFERENCE — executor Python workers would then need this
package importable (PYTHONPATH), which a driver that merely
``sys.path``-hacked its own process does not provide. Function-scoped
classes are pickled BY VALUE and run on any executor. (Verified
failure mode: ModuleNotFoundError from executor unpickling.)

Scale: ``partitions()`` returns one split per requested partition;
each executor materializes only its own id range — the same contract a
real connector (Kafka ranges, REST pagination, object listings) plans
with.
"""

from __future__ import annotations


def build_synthetic_ledger_datasource():
    """Return a self-contained (pickle-by-value) DataSource class for
    the deterministic synthetic ledger feed."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class LedgerRange(InputPartition):
        def __init__(self, lo: int, hi: int):
            self.lo = lo
            self.hi = hi

    class SyntheticLedgerReader(DataSourceReader):
        def __init__(self, options: dict):
            self.rows = int(options.get("rows", "1000"))
            self.n_parts = int(options.get("partitions", "8"))

        def partitions(self):
            step = self.rows / self.n_parts
            return [
                LedgerRange(round(i * step), round((i + 1) * step))
                for i in range(self.n_parts)
            ]

        def read(self, partition: LedgerRange):
            for i in range(partition.lo, partition.hi):
                # deterministic pseudo-amounts: exact 2-decimal doubles
                yield (i, i % 10, (i * 7919 % 10000) / 100.0)

    class SyntheticLedgerDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_ledger"

        def schema(self) -> str:
            return "txn_id bigint, bucket int, amount double"

        def reader(self, schema) -> SyntheticLedgerReader:
            return SyntheticLedgerReader(self.options)

    return SyntheticLedgerDataSource
