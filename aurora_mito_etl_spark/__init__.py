"""aurora_mito_etl_spark — a PySpark-native analytics engine.

Re-expresses every operation of the reference ETL pipeline
(ndaniel/aurora-mito-etl, read-only snapshot at /root/reference) as
composable Spark DataFrame operators, generalized into a reusable
engine: text-corpus ingestion, regex/dictionary filtering, semi/anti
joins, grouped aggregation with dedup-normalization, LLM-batch
classification, similarity search / near-duplicate detection, and
provenance-tracked sinks.

Design rules (see SURVEY.md §4, §7):
- DataFrame/SQL only; no RDDs. Catalyst plans everything.
- Small dimension tables are broadcast; big joins shuffle on keys.
- Python only via Arrow-batched pandas UDFs, never row-at-a-time.
- Explicit schemas everywhere; no inferSchema in the engine.
"""

from aurora_mito_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
