from mqtt_streamr_spark.sources.mqtt import MqttDataSource, register_mqtt_source

__all__ = ["MqttDataSource", "register_mqtt_source"]
