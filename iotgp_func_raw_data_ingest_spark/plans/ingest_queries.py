"""Ingest-surface query plans (decode/route parity, SQL-checkable subset).

Populated by task 3 — the decode kernel lives in ``functions/codecs.py``
and ``operators/ingest.py``; this module exposes the SQL-expressible parts
(base64 clean/decode, routing sanitization) as registry entries.
"""
