"""Golden tests for the ingest surface — every behavior in FIXTURES.md §B
(mirroring the reference src/function_app.py semantics)."""

from __future__ import annotations

import base64
import glob
import gzip
import json
import zlib

import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.operators.ingest import (
    ingest_pipeline,
    parse_envelopes,
    resolve_route,
)
from iotgp_func_raw_data_ingest_spark.sources.envelopes import envelopes_from_list
from iotgp_func_raw_data_ingest_spark.sources.lake import (
    read_lake_table,
    write_lake_typed,
)


def b64(payload, codec: str = "plain") -> str:
    raw = json.dumps(payload).encode() if not isinstance(payload, bytes) else payload
    if codec == "gzip":
        raw = gzip.compress(raw)
    elif codec == "zlib":
        raw = zlib.compress(raw)
    elif codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        raw = co.compress(raw) + co.flush()
    return base64.b64encode(raw).decode()


def envelope(payload=None, source="db.tbl", dest="landing", codec="plain", **extra) -> str:
    msg = {"MessageType": "Raw", **extra}
    if source is not None:
        msg["Source"] = source
    if dest is not None:
        msg["Destination"] = dest
    if payload is not None:
        msg["Data"] = b64(payload, codec)
    return json.dumps(msg)


def run(spark, bodies: list[str]):
    df = ingest_pipeline(envelopes_from_list(spark, bodies))
    return [(r.folder, r.source_db, r.table, dict(r.row)) for r in df.collect()]


# ---------------------------------------------------------------------------
# B.2 payload shapes
# ---------------------------------------------------------------------------


def test_rows_shape_ragged_keys(spark):
    rows = run(spark, [envelope([{"a": 1, "b": "x"}, {"a": 2, "c": True}])])
    assert len(rows) == 2
    maps = [r[3] for r in rows]
    assert {"a": "1", "b": "x"} in maps
    assert {"a": "2", "c": "True"} in maps  # bool → str(v) = 'True'


def test_columnar_shape(spark):
    rows = run(spark, [envelope({"a": [1, 2], "b": ["x", None]})])
    maps = sorted((r[3] for r in rows), key=lambda m: m["a"])
    assert maps == [{"a": "1", "b": "x"}, {"a": "2", "b": None}]


def test_single_dict_one_row(spark):
    rows = run(spark, [envelope({"a": 1})])
    assert [r[3] for r in rows] == [{"a": "1"}]


def test_mixed_batch_union_columns(spark):
    """Rows-shape + columnar-shape messages on the same route merge with
    null padding (reference _merge_columnars)."""
    bodies = [
        envelope([{"a": 1, "b": "x"}]),
        envelope({"a": [9], "c": ["z"]}),
    ]
    rows = run(spark, bodies)
    assert len(rows) == 2
    assert all(r[:3] == ("landing", "db", "tbl") for r in rows)
    union_keys = set().union(*(r[3].keys() for r in rows))
    assert union_keys == {"a", "b", "c"}


def test_nested_values_json_encoded(spark):
    rows = run(spark, [envelope({"a": [{"x": 1}], "t": ["2024-01-01T00:00:00"]})])
    (m,) = [r[3] for r in rows]
    assert m["a"] == '{"x": 1}'
    assert m["t"] == "2024-01-01T00:00:00"


def test_non_dict_rows_dropped(spark):
    rows = run(spark, [envelope([{"a": 1}, 42, "junk", {"a": 2}])])
    assert sorted(r[3]["a"] for r in rows) == ["1", "2"]


def test_zero_length_columns_tolerated(spark):
    """{"a": [], "b": [1]} passes the reference's columnar check (0-length
    carve-out); row-per-record output pads the short column with null."""
    rows = run(spark, [envelope({"a": [], "b": [1]})])
    assert [r[3] for r in rows] == [{"a": None, "b": "1"}]


def test_json_scalar_payload_zero_rows(spark):
    rows = run(spark, [envelope(42)])
    assert rows == []


# ---------------------------------------------------------------------------
# B.3 encoding variants
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("codec", ["plain", "gzip", "zlib", "deflate"])
def test_codecs(spark, codec):
    rows = run(spark, [envelope([{"v": 7}], codec=codec)])
    assert [r[3] for r in rows] == [{"v": "7"}]


def test_dirty_base64(spark):
    clean = b64([{"v": 1}])
    dirty = clean[:4] + "\n " + clean[4:8] + "%%" + clean[8:].rstrip("=")
    body = json.dumps({"Source": "db.tbl", "Destination": "landing", "Data": dirty})
    rows = run(spark, [body])
    assert [r[3] for r in rows] == [{"v": "1"}]


def test_not_json_payload_kept_no_rows(spark):
    """b64('hello') decodes but isn't JSON → payload null, zero rows."""
    rows = run(spark, [envelope(b"hello")])
    assert rows == []


def test_no_data_key(spark):
    rows = run(spark, [envelope(None)])
    assert rows == []


def test_non_json_body_fallback(spark):
    """Non-JSON body → {"Data": body}; body isn't valid base64-JSON so it
    yields no rows but doesn't error."""
    rows = run(spark, ["plainstring"])
    assert rows == []


def test_json_scalar_body_dropped(spark):
    for body in ["42", '"quoted"', "true", "null"]:
        assert run(spark, [body]) == []


def test_array_body_multiple_messages(spark):
    body = "[" + envelope([{"a": 1}], source="s1.t1") + "," + envelope([{"b": 2}], source="s2.t2") + "]"
    rows = run(spark, [body])
    assert {(r[1], r[2]) for r in rows} == {("s1", "t1"), ("s2", "t2")}


# ---------------------------------------------------------------------------
# B.4 routing variants
# ---------------------------------------------------------------------------


def route_of(spark, source, dest):
    body = json.dumps(
        {k: v for k, v in [("Source", source), ("Destination", dest)] if v is not None}
    )
    df = resolve_route(parse_envelopes(envelopes_from_list(spark, [body])))
    r = df.select("folder", "source_db", "table").collect()[0]
    return (r.folder, r.source_db, r.table)


def test_routing_table(spark):
    assert route_of(spark, "Sales.Orders", "landing") == ("landing", "sales", "orders")
    assert route_of(spark, "telemetry", None) == ("assorted", "telemetry", "telemetry")
    assert route_of(spark, "telemetry", "") == ("assorted", "telemetry", "telemetry")
    # dirty: keep [a-zA-Z0-9._-] from Source → "MyDB!.Ta ble" → "MyDB.Table"
    # wait: space removed too → "MyDB.Table"; then lowercased
    assert route_of(spark, "My DB!.Ta ble", "A/B c") == ("a_b_c", "mydb", "table")
    assert route_of(spark, None, None) == ("assorted", "unknown_db", "unknown_table")
    # multi-dot: split on FIRST dot only
    assert route_of(spark, "a.b.c", "x") == ("x", "a", "b_c")


# ---------------------------------------------------------------------------
# B.5 volume / sink chunking
# ---------------------------------------------------------------------------


def test_chunking_max_batch_size(spark, tmp_path):
    n = 2001
    body = envelope({"i": list(range(n))})
    routed = ingest_pipeline(envelopes_from_list(spark, [body]))
    cfg = EngineConfig(output_path=str(tmp_path / "lake"), max_batch_size=2000)
    dirs = write_lake_typed(routed.repartition(1), cfg)
    assert len(dirs) == 1
    files = glob.glob(f"{dirs[0]}/*.parquet")
    assert len(files) == 2  # 2000 + 1 rows
    back = read_lake_table(spark, cfg.output_path, "landing", "db", "tbl")
    assert back.count() == n
    assert back.columns == ["i"]
    assert back.agg(F.min(F.col("i").cast("long")), F.max(F.col("i").cast("long"))).collect()[0][
        :
    ] == (0, n - 1)


def test_typed_lake_union_schema_roundtrip(spark, tmp_path):
    bodies = [
        envelope([{"a": 1, "b": "x"}]),
        envelope({"a": [9], "c": ["z"]}),
        envelope([{"q": 5}], source="other.table2"),
    ]
    routed = ingest_pipeline(envelopes_from_list(spark, bodies))
    cfg = EngineConfig(output_path=str(tmp_path / "lake"))
    dirs = sorted(write_lake_typed(routed, cfg))
    assert len(dirs) == 2
    t1 = read_lake_table(spark, cfg.output_path, "landing", "db", "tbl")
    assert sorted(t1.columns) == ["a", "b", "c"]
    assert t1.count() == 2
    t2 = read_lake_table(spark, cfg.output_path, "landing", "other", "table2")
    assert t2.columns == ["q"]
    assert [r.q for r in t2.collect()] == ["5"]


# ---------------------------------------------------------------------------
# Unicode / edge-case goldens
# ---------------------------------------------------------------------------


def test_unicode_payload_roundtrip(spark):
    """Non-ASCII text must survive decode + normalization un-escaped
    (reference json.dumps(ensure_ascii=False), src/function_app.py:167)."""
    payload = [{"name": "café ☕", "nested": {"k": "日本語"}}]
    rows = run(spark, [envelope(payload)])
    (m,) = [r[3] for r in rows]
    assert m["name"] == "café ☕"
    assert m["nested"] == '{"k": "日本語"}'  # nested JSON keeps raw unicode


def test_unicode_route_sanitized(spark):
    """Non-[a-zA-Z0-9._-] chars (incl. unicode) are stripped from Source
    and collapsed in folder names."""
    body = json.dumps({"Source": "Dätenbänk.Tàble", "Destination": "Ordner Ü"})
    from iotgp_func_raw_data_ingest_spark.operators.ingest import (
        parse_envelopes,
        resolve_route,
    )
    from iotgp_func_raw_data_ingest_spark.sources.envelopes import envelopes_from_list

    df = resolve_route(parse_envelopes(envelopes_from_list(spark, [body])))
    r = df.select("folder", "source_db", "table").collect()[0]
    # 'Dätenbänk' → 'Dtenbnk' (umlauts stripped), lowercased
    assert (r.folder, r.source_db, r.table) == ("ordner_", "dtenbnk", "tble")


def test_double_compression_not_recursed(spark):
    """gzip(gzip(json)) decompresses ONE layer (reference cascade returns
    the first success) → inner bytes aren't JSON → zero rows, kept."""
    import gzip as _gz

    inner = _gz.compress(json.dumps([{"a": 1}]).encode())
    body = json.dumps(
        {"Source": "db.tbl", "Destination": "landing",
         "Data": base64.b64encode(_gz.compress(inner)).decode()}
    )
    assert run(spark, [body]) == []


def test_empty_payload_array(spark):
    """Data decoding to [] → zero rows, no error."""
    assert run(spark, [envelope([])]) == []


def test_columnar_all_empty_columns(spark):
    """{"a": [], "b": []} is a valid columnar dict with zero rows."""
    assert run(spark, [envelope({"a": [], "b": []})]) == []


def test_clean_base64_trailing_newline(spark):
    """A Data value ending in '\\n' with length % 4 == 0 must NOT pass the
    already-clean fast path (Java's $ matches before a final newline; the
    guard uses \\z). The rebuild strips the newline and re-pads."""
    clean = b64([{"v": 7}])
    # craft total length % 4 == 0 including the trailing newline
    dirty = clean.rstrip("=") + "\n"
    dirty += "=" * ((4 - len(dirty) % 4) % 4)
    while len(dirty) % 4 != 0:
        dirty += "="
    body = json.dumps({"Source": "db.tbl", "Destination": "landing", "Data": clean[:0] + dirty})
    rows = run(spark, [body])
    assert [r[3] for r in rows] == [{"v": "7"}]


def test_poison_route_isolated(spark, tmp_path):
    """Reference E2 parity: one bad route (case-duplicate keys → parquet
    COLUMN_ALREADY_EXISTS) must not abort the remaining routes."""
    bodies = [
        envelope([{"a": 1, "A": 2}], source="bad.tbl"),  # poison: dup column
        envelope([{"ok": 5}], source="good.tbl"),
    ]
    routed = ingest_pipeline(envelopes_from_list(spark, bodies))
    cfg = EngineConfig(output_path=str(tmp_path / "lake"))
    failures: list = []
    with pytest.warns(UserWarning, match="failed, continuing"):
        dirs = write_lake_typed(routed, cfg, failed_routes=failures)
    assert [d.rsplit("/", 2)[-2:] for d in dirs] == [["good", "tbl"]]
    assert len(failures) == 1 and failures[0][0] == ("landing", "bad", "tbl")
    good = read_lake_table(spark, cfg.output_path, "landing", "good", "tbl")
    assert [r.ok for r in good.collect()] == ["5"]


def test_failed_route_leaves_no_partial_output(spark, tmp_path, monkeypatch):
    """A route that fails AFTER its data files are written (sidecar
    write throws) must leave dest untouched — the append-mode writer has
    no overwrite semantics, so any surviving files would duplicate rows
    when the batch is retried. The staged write (data + sidecar land in
    a dot-prefixed dir, renamed in only on success) is the mechanism."""
    import os

    from iotgp_func_raw_data_ingest_spark.sources import lake

    bodies = [envelope([{"ok": 5}, {"ok": 6}], source="good.tbl")]
    routed = ingest_pipeline(envelopes_from_list(spark, bodies))
    cfg = EngineConfig(output_path=str(tmp_path / "lake"))

    real_meta = lake.write_route_meta

    def boom(spark_, dest, meta):
        raise IOError("sidecar write failed")

    monkeypatch.setattr(lake, "write_route_meta", boom)
    failures: list = []
    with pytest.warns(UserWarning, match="failed, continuing"):
        dirs = write_lake_typed(routed, cfg, failed_routes=failures)
    assert dirs == [] and len(failures) == 1
    route_dir = tmp_path / "lake" / "landing" / "good" / "tbl"
    leftovers = (
        [p for p in os.listdir(route_dir) if not p.startswith(".")]
        if route_dir.exists()
        else []
    )
    assert leftovers == []  # no data files, no sidecar, no stage residue
    assert not any(
        p.startswith(".stage-") for p in os.listdir(route_dir)
    ) if route_dir.exists() else True

    # the retry (sidecar healthy again) lands exactly one copy
    monkeypatch.setattr(lake, "write_route_meta", real_meta)
    dirs = write_lake_typed(routed, cfg)
    assert len(dirs) == 1
    back = read_lake_table(spark, cfg.output_path, "landing", "good", "tbl")
    assert sorted(r.ok for r in back.collect()) == ["5", "6"]


def test_clean_base64_mime_chunked_fast_path(spark):
    """MIME/chunked encoders insert CRLF every 76 chars; the whitespace
    fast path (translate) must produce exactly what the regex rebuild
    would — decode succeeds and roundtrips."""
    clean = b64([{"v": i} for i in range(40)])  # long enough to chunk
    chunked = "\r\n".join(clean[i : i + 76] for i in range(0, len(clean), 76))
    body = json.dumps({"Source": "db.tbl", "Destination": "landing", "Data": chunked})
    rows = run(spark, [body])
    assert [r[3]["v"] for r in rows] == [str(i) for i in range(40)]


def test_route_writes_submitted_concurrently(spark, tmp_path, monkeypatch):
    """write_lake_typed submits independent per-route jobs from a thread
    pool (Spark's scheduler is thread-safe) — at thousands of routes the
    driver must not serialize one job after another. Observed overlap of
    the save() calls proves concurrent submission; per-route isolation
    and real output are covered by the e2e tests above."""
    import threading
    import time as _time

    from iotgp_func_raw_data_ingest_spark.sources import lake

    n_routes = 6
    bodies = [
        envelope([{"v": i}], source=f"db{i}.tbl") for i in range(n_routes)
    ]
    routed = ingest_pipeline(envelopes_from_list(spark, bodies))
    cfg = EngineConfig(output_path=str(tmp_path / "lake"))

    lock = threading.Lock()
    active = {"now": 0, "peak": 0}
    real_writer = lake._writer

    class _SlowWriter:
        def __init__(self, inner):
            self._inner = inner

        def save(self, dest):
            with lock:
                active["now"] += 1
                active["peak"] = max(active["peak"], active["now"])
            try:
                _time.sleep(0.3)  # hold the slot so overlap is observable
                self._inner.save(dest)
            finally:
                with lock:
                    active["now"] -= 1

    monkeypatch.setattr(
        lake, "_writer", lambda df, c, fmt: _SlowWriter(real_writer(df, c, fmt))
    )
    dirs = write_lake_typed(routed, cfg)
    assert len(dirs) == n_routes
    assert active["peak"] >= 2, f"route writes ran serially (peak={active['peak']})"
    # a serial pool still honors the contract when capped at 1
    cfg2 = EngineConfig(output_path=str(tmp_path / "lake2"))
    dirs2 = write_lake_typed(routed, cfg2, max_concurrent_routes=1)
    assert sorted(d.rsplit("/", 3)[-3:] for d in dirs2) == sorted(
        d.rsplit("/", 3)[-3:] for d in dirs
    )
