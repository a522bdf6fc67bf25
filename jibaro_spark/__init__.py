"""jibaro_spark — a PySpark-native lakehouse/pipeline engine.

A clean-room, Spark-first re-design of the capability surface of the
reference library ``ignitz/jibaro`` (a lakehouse layer/path manager +
CDC pipeline on PySpark + Delta), extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
columns) designed for a 100 TB / 1000-executor deployment.

Design stance (vs. the reference):

* **Composition over inheritance** — the reference subclasses
  ``SparkSession`` / ``DataFrameReader`` / ``DataFrame`` and class-swaps
  instances (reference ``jibaro/spark/session.py:39-134``,
  ``jibaro/spark/dataframe.py:7-17``), which pins it to exact PySpark
  versions.  We expose a ``Catalog`` + free functions instead; no
  private Spark APIs anywhere, works on any Spark >= 3.5 / 4.x.
* **Everything is DataFrame-in / DataFrame-out** so Catalyst optimizes
  across operator boundaries (predicate pushdown, column pruning,
  broadcast selection, AQE).
* **No Python UDFs on the hot path** — native column expressions for
  wire-format slicing and schema-id decode (the reference used a
  row-at-a-time Python UDF, ``jibaro/utils.py:182-184``); Arrow-batched
  pandas UDFs only where built-ins genuinely can't express semantics.
* **Optional heavy deps are gated** — Delta Lake, Kafka, Avro and
  Protobuf jars are used when present on the classpath and emulated
  with parquet/JSON equivalents when absent, so the whole pipeline is
  testable in a bare pyspark environment.
"""

from jibaro_spark.catalog import Catalog, Layer, TableRef
from jibaro_spark.config import Settings

__version__ = "0.1.0"

__all__ = ["Catalog", "Layer", "TableRef", "Settings", "__version__"]
