"""data_lake_staging_engine_spark — a PySpark-native staging + analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference project ``andresmaopal/data-lake-staging-engine`` (an S3
event-driven micro-batch ETL-to-Parquet pipeline with Glue catalog sync;
see SURVEY.md §0-§1 — the reference checkout is empty, so the contract is
SURVEY.md §2, not file:line parity).

Three layers (SURVEY.md §0 "Engine identity"):

1. **Staging surface** (``operators.staging``, ``streaming``): ingest
   CSV/JSON/Parquet micro-batches, normalize, cast, derive partitions,
   dedup, write partitioned Parquet, sync a catalog — the reference's own
   pipeline re-expressed as Structured Streaming + DataFrame transforms.
2. **Relational/analytics surface** (``operators.relational``,
   ``operators.windows``, ``functions``): the full query surface the
   staged Parquet is meant to be consumed with.
3. **LLM-data-pipeline operators** (``operators.llmops``): dedup
   (exact/MinHash-LSH), similarity search, text analysis, multimodal
   columns — designed for 100 TB scale.

Every query is registered in ``registry`` with a DuckDB oracle SQL string
so correctness is machine-checkable (driver contract in
``__spark_entry__.py``).

Scale posture: every operator is partition-parallel (no driver-side row
loops, no mid-query collect), declarative DataFrame/SQL so Catalyst gets
pushdown/pruning/AQE for free, broadcast hints on dimension joins, and
decimal-cast aggregation for cross-engine determinism.
"""

from data_lake_staging_engine_spark.session import get_spark  # noqa: F401
from data_lake_staging_engine_spark.registry import (  # noqa: F401
    all_queries,
    all_oracles,
)
from data_lake_staging_engine_spark.pipeline import (  # noqa: F401
    Engine,
    StagingPipeline,
)

__version__ = "0.1.0"
