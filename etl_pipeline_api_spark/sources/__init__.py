from . import http_source, json_source, parquet_source

__all__ = ["http_source", "json_source", "parquet_source"]
