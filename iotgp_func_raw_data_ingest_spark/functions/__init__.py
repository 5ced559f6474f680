"""Scalar function library: codecs (base64/decompress), text, vectors."""

from iotgp_func_raw_data_ingest_spark.functions.codecs import (
    clean_base64,
    decode_payload_rows,
)

__all__ = ["clean_base64", "decode_payload_rows"]
