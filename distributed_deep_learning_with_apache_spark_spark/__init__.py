"""PySpark-native analytics/ML-pipeline engine.

A brand-new engine with the data-processing capabilities of
PacktPublishing/Distributed-Deep-Learning-with-Apache-Spark (the reference
at /root/reference), re-expressed Spark-first: DataFrame/SQL plans that
Catalyst optimizes, MLlib pipelines for the ML capabilities, and
LLM-data-pipeline extensions (dedup, similarity search, multimodal columns,
text analysis) designed for 100 TB scale.

Layout:
    sources/    — table catalog with explicit schemas; text/binary corpus scans
    operators/  — relational core, grouped top-k, dedup, similarity search
    functions/  — text + array/tensor expression builders (JVM-side F.* only)
    streaming/  — event-time windowed aggs (batch-equivalent + Structured Streaming)
    ml/         — MLlib pipelines mirroring the reference's four chapters
    plans/      — plan-inspection helpers (pushdown / broadcast assertions)
    registry.py — the query registry consumed by __spark_entry__.py
"""

__version__ = "0.1.0"
