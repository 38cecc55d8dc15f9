"""mqtt_streamr_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ``streamr-dev/mqtt-streamr``
(MQTT → parse → JSONata transform → route → publish, with windowed stats),
re-expressed Spark-first, plus a batch relational layer and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Reference semantics are cited as ``/root/reference/<file>:<line>`` in the
docstrings of each module; nothing here is a code port — the execution engine
is Spark (Catalyst + Tungsten + Structured Streaming).
"""

from mqtt_streamr_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
