"""Defensive schema-drift gate.

The driver regenerates /root/testdata between rounds and has already changed
encodings once (events.ts went TIMESTAMP(NANOS) → TIMESTAMP(MICROS,NTZ)
between rounds 1 and 2, silently breaking four queries). This test asserts
the ENGINE-NORMALIZED dtype of every column of every table, so the next
silent re-encoding fails loudly here — in the builder's own suite — instead
of in the driver's correctness gate.

These are post-``tables.load_table`` types: whatever parquet encoding the
driver picks, the loader must deliver these to the 125 query plans.
"""

from __future__ import annotations

import pytest

from iotgp_func_raw_data_ingest_spark.tables import TABLE_NAMES, load_table
from tests.conftest import SF_SMOKE

# Engine contract: column name -> simpleString dtype, in column order.
EXPECTED = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int"),
        ("n_name", "string"),
        ("n_regionkey", "int"),
    ],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        # NTZ is acceptable here: every plan uses date arithmetic on it,
        # which is timezone-free. Listed explicitly so a re-encoding to
        # string/long/int96 still trips the gate.
        ("o_orderdate", {"timestamp", "timestamp_ntz", "date"}),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", {"timestamp", "timestamp_ntz", "date"}),
    ],
    "events": [
        ("event_id", "bigint"),
        # Strict: plans call unix_micros(ts) / range frames, which REQUIRE
        # TIMESTAMP (not NTZ, not long). load_table owns the normalization.
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


def test_expected_covers_all_tables():
    assert set(EXPECTED) == set(TABLE_NAMES)


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_normalized_schema(spark, name):
    df = load_table(spark, SF_SMOKE, name)
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    exp = EXPECTED[name]
    assert [c for c, _ in got] == [c for c, _ in exp], (
        f"{name}: column set/order drifted: {got}"
    )
    for (col, got_t), (_, exp_t) in zip(got, exp):
        ok = got_t in exp_t if isinstance(exp_t, set) else got_t == exp_t
        assert ok, (
            f"{name}.{col}: dtype {got_t!r} violates engine contract "
            f"{exp_t!r} — the driver re-encoded the parquet; extend "
            f"tables.load_table to normalize it."
        )
