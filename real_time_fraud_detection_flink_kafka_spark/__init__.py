"""PySpark-native analytics engine with the capabilities of the
reference Flink/Kafka real-time fraud detection system
(Osama-285/real-time-fraud-detection-flink-kafka), re-expressed
Spark-first: DataFrame/SQL batch analogs, Structured Streaming for
the streaming path, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing).
"""

from real_time_fraud_detection_flink_kafka_spark.config import RuleConfig
from real_time_fraud_detection_flink_kafka_spark.session import get_spark
from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table, load_tables

__all__ = ["RuleConfig", "get_spark", "load_table", "load_tables"]
