"""LLM-data-pipeline query plans (dedup, similarity, text analysis).

Populated by task 4 — operators live in ``operators/``; this module wires
them into the QUERIES/ORACLES registry.
"""
