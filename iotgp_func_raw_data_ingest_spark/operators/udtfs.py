"""Python user-defined table functions (Spark 4 UDTF API).

The reference engine exposes no table-function extension point — its
per-message fan-out is a hard-coded Python loop
(``/root/reference/src/function_app.py:150-210``, one envelope → many
rows).  This module is the Spark-native generalization: a registered
UDTF is a *lateral* row-expander any SQL query can call, planned by
Catalyst like a built-in generator and (here) Arrow-batched so the
Python boundary is paid per batch, not per row.

``chunk_text`` is the training-data staple: split a document into
fixed-size chunks with an optional overlap stride — the unit-of-work
transform feeding tokenizer/packing stages downstream.

Scale notes (100 TB):

- The UDTF runs inside the scan stage — no shuffle is introduced; each
  task expands its own partition's rows.  Output size is input size ×
  (size/stride) — the only scale knob that matters is the stride.
- ``useArrow=True`` moves rows JVM→Python→JVM in Arrow record batches.
  For pure fixed-size chunking with no overlap the all-JVM equivalent
  (``sequence`` + ``explode`` + ``substring``) is still faster — the
  UDTF earns its keep when the splitting logic outgrows SQL (sentence
  boundaries, token-aware packing), which is exactly the case the API
  exists for.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(
    returnType="chunk_id int, chunk_text string, chunk_len int",
    useArrow=True,
)
class ChunkText:
    """Expand one document into fixed-size chunks.

    ``eval(text, size, stride)`` yields ``(chunk_id, chunk_text,
    chunk_len)`` for windows starting at 0, stride, 2*stride, …  With
    ``stride == size`` the chunks tile the document exactly; with
    ``stride < size`` they overlap (training-window style).  Iteration
    stops once a window reaches the end of the document, so no emitted
    chunk is a proper suffix of the previous one.
    """

    def eval(self, text, size, stride):  # noqa: ANN001 - UDTF signature
        if text is None or size is None or size <= 0:
            return
        step = stride if stride is not None and stride > 0 else size
        n = len(text)
        for i, start in enumerate(range(0, n, step)):
            piece = text[start : start + size]
            if not piece:
                break
            yield (i, piece, len(piece))
            if start + size >= n:
                break


def register_udtfs(spark: SparkSession) -> None:
    """Register every UDTF under its SQL name (idempotent per session)."""
    spark.udtf.register("chunk_text", ChunkText)
