"""PySpark-native analytics engine re-expressing the capabilities of the
reference pipeline ``CarlosDwain/Real-Time-Weather-Data-Pipeline-for-Philippine-Cities``
(read-only at ``/root/reference``), built Spark-first per SURVEY.md.

Layout:
    session     SparkSession builders + runtime tuning
    sources/    testdata registry, landed-JSON / injected-HTTP sources
    functions/  scalar expression layer (normalization, hashing, text, time)
    operators/  relational + dedup + similarity + multimodal operators
    plans/      query catalog (Spark callable + DuckDB oracle SQL twins)
    streaming/  Structured Streaming shell (foreachBatch reuse of batch plans)
"""

__version__ = "0.1.0"
