from mqtt_streamr_spark.streaming.pipeline import PipelineSpec, StreamingBridge
from mqtt_streamr_spark.streaming.stats import IntervalLogger

__all__ = ["PipelineSpec", "StreamingBridge", "IntervalLogger"]
