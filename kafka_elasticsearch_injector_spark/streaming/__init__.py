from .es_sink import ElasticBulkWriter, FileTransport, HttpTransport
from .pipeline import build_elastic_records, read_kafka_stream, start_pipeline

__all__ = [
    "ElasticBulkWriter", "FileTransport", "HttpTransport",
    "build_elastic_records", "read_kafka_stream", "start_pipeline",
]
