"""data_and_analytics_etl_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of
dimagi/data-and-analytics-etl (see SURVEY.md), re-expressed Spark-first:
declarative DataFrame/SQL plans optimized by Catalyst, incremental
checkpointed ingestion, Structured Streaming for streams, and
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) designed for 100 TB scale.

Layout:
- ``session``    — SparkSession factory with the scale-tuned conf profile
- ``catalog``    — table registry over the parquet test corpus
- ``queries``    — the declared query surface (SURVEY §2.2) + DuckDB oracles
- ``operators``  — library operators Spark lacks natively (as-of join,
                   sessionization, dedup family, similarity search, text
                   analysis, multimodal columns, skew helpers)
- ``etl``        — Tier-A replacement: incremental checkpointed reader,
                   normalization, partitioned size-capped sink, REST
                   connector (SURVEY §2.1)
- ``streaming``  — Structured Streaming formulations (windows, dedup,
                   stateful ops) with batch-equivalence contracts
"""

__version__ = "0.1.0"
