"""Scalar function library: the decode codecs (base64 cleaning JVM-side,
decompress/shape kernel Python-side). Text and vector scalar helpers
live with their operators (operators/textstats.py, operators/similarity.py)."""

from iotgp_func_raw_data_ingest_spark.functions.codecs import (
    clean_base64,
    decode_payload_json,
    decode_payload_rows,
)

__all__ = ["clean_base64", "decode_payload_json", "decode_payload_rows"]
