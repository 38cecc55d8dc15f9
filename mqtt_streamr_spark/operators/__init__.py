from mqtt_streamr_spark.operators.routing import (
    mqtt_wildcard_to_regex,
    stream_id_from_template,
    truncate_topic,
)

__all__ = [
    "mqtt_wildcard_to_regex",
    "stream_id_from_template",
    "truncate_topic",
]
