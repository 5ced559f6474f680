"""Semantic invariants for the q155–q170 tranche — properties the
oracle hash-match cannot express (it proves Spark == DuckDB, not that
both compute a sensible quantity)."""

from __future__ import annotations

import math

from iotgp_func_raw_data_ingest_spark.plans import QUERIES
from tests.conftest import SF_SMOKE


def test_transition_probs_rows_normalize(spark):
    rows = QUERIES["q156_transition_probs"](spark, SF_SMOKE).collect()
    by_cur: dict[str, float] = {}
    for r in rows:
        by_cur[r["cur"]] = by_cur.get(r["cur"], 0.0) + r["prob"]
    # each row of the transition matrix sums to 1 (± rounding of 4dp cells)
    assert by_cur and all(abs(s - 1.0) < 0.01 for s in by_cur.values())


def test_heavy_hitter_shares_are_a_distribution(spark):
    rows = QUERIES["q155_heavy_hitter_keys"](spark, SF_SMOKE).collect()
    assert rows and sum(r["share"] for r in rows) <= 1.0 + 1e-6
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    counts = [r["n_rows"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert counts == sorted(counts, reverse=True)


def test_vocab_growth_is_cumulative_and_complete(spark):
    rows = sorted(
        QUERIES["q165_vocab_growth"](spark, SF_SMOKE).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == list(range(10))
    assert rows[-1]["cum_tokens"] == sum(r["n_tokens"] for r in rows)
    assert rows[-1]["cum_vocab"] == sum(r["new_types"] for r in rows)
    cums = [r["cum_vocab"] for r in rows]
    assert cums == sorted(cums)  # never shrinks


def test_curation_funnel_stages_are_monotone(spark):
    for r in QUERIES["q169_curation_funnel"](spark, SF_SMOKE).collect():
        assert r["n_raw"] >= r["n_len"] >= r["n_quality"] >= r["n_dedup"] >= 0
        assert abs(r["retention"] - round(r["n_dedup"] / r["n_raw"], 4)) < 1e-9


def test_centroid_similarity_is_a_valid_cosine(spark):
    rows = QUERIES["q163_centroid_similarity"](spark, SF_SMOKE).collect()
    n_labels = 10
    assert len(rows) == n_labels * (n_labels - 1) // 2
    assert all(-1.0 - 1e-6 <= r["cos_sim"] <= 1.0 + 1e-6 for r in rows)


def test_char_class_ratios_partition_unity(spark):
    for r in QUERIES["q166_char_class_profile"](spark, SF_SMOKE).collect():
        total = (
            r["alpha_ratio"] + r["digit_ratio"] + r["space_ratio"] + r["punct_ratio"]
        )
        assert math.isclose(total, 1.0, abs_tol=0.001)


def test_lsh_precision_consistent_with_recall_eval(spark):
    p = QUERIES["q167_lsh_precision_eval"](spark, SF_SMOKE).collect()[0]
    assert p["n_candidates"] >= p["n_true"] >= 0
    r = QUERIES["q147_lsh_recall_eval"](spark, SF_SMOKE).collect()
    # found pairs in the recall eval are candidate∩truth — the same set
    # the precision eval counts as true positives
    assert sum(b["n_found"] for b in r) == p["n_true"]


def test_triangle_census_bounds(spark):
    t = QUERIES["q168_simgraph_triangles"](spark, SF_SMOKE).collect()[0]
    assert t["n_wedges"] >= 3 * t["n_triangles"]
    assert 0.0 <= t["clustering_coef"] <= 1.0
    # every edge contributes 2 degree entries
    assert t["n_edges"] >= 0 and t["n_nodes"] <= 2 * t["n_edges"] or t["n_edges"] == 0
