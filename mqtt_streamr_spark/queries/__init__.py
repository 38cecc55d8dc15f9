"""Import all query modules so their ``@query`` registrations populate the
registry. ``__spark_entry__`` re-exports QUERIES/ORACLES from here."""

from mqtt_streamr_spark.queries import (  # noqa: F401
    events,
    jsonata_queries,
    llm_pipeline,
    relational,
    streaming_queries,
)
from mqtt_streamr_spark.queries.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
