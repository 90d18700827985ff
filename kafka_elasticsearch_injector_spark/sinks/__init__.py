"""Batch dataset sinks (training-shard export). Streaming sinks live in
streaming/es_sink.py."""
