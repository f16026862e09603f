"""etl_pipelines_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ELT platform
(ravi9data/etl_pipelines): a layered warehouse (staging -> core
entities -> marts -> reporting) programmed against a columnar MPP
store, plus ingestion, reverse-ETL and ML-scoring dataflows.

Everything here is DataFrame / Spark-SQL first: logical plans are
declared with the DataFrame API and Catalyst + AQE pick the physical
strategy. Python UDFs appear only where built-in operators genuinely
cannot express the semantics (Arrow-batched Pandas UDFs, never
row-at-a-time in a hot path).

Subpackages
-----------
- ``session``    SparkSession factory with pinned, deterministic conf.
- ``functions``  Redshift-dialect compat layer (SURVEY.md §2.9).
- ``operators``  Relational + window operator library (SURVEY.md §2.3-2.8).
- ``sources``    Readers/writers, catalog, write/refresh modes (§2.1-2.2).
- ``plans``      Model/Pipeline runner (the reference's DAG topology, §3).
- ``streaming``  Structured Streaming slice (§2.10).
- ``quality``    Declarative data-quality checks (§5).
- ``textops``    Text analysis + dedup + similarity (LLM-data ops).
- ``multimodal`` Opaque-binary column plumbing (decode stubbed).
"""

__version__ = "0.1.0"
