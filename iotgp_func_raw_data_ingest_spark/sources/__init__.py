"""Sources & sinks: envelope readers (batch/stream) and the parquet lake."""
