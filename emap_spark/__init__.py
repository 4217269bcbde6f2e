"""emap_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of SAFEHR-data/emap (see SURVEY.md).

Layout:
    session     SparkSession factory tuned for local[N] and cluster use
    sources/    table loaders, synthetic event/waveform generators
    functions/  scalar helpers (tri-state HL7 values, text analysis, vectors)
    operators/  bitemporal merge engine, as-of, interval joins, dedup, ANN
    plans/      the query library exposed through __spark_entry__.py
    streaming/  Structured Streaming wrappers (foreachBatch pipeline, collation)
"""

__version__ = "0.1.0"

from emap_spark.session import get_spark  # noqa: F401
