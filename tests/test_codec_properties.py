"""Property-based tests (hypothesis) for the decode kernel's pure-Python
core — the one custom stage with real input variety (SURVEY §5.4). These
run without Spark jobs, so hypothesis can afford hundreds of examples.

Note the cascade ambiguity property: `_try_decompress` tries
gzip → raw-deflate → zlib → passthrough, same order as the reference, so
the only guaranteed roundtrip is over *explicitly compressed* payloads —
a random plain byte string can legitimately BE a valid raw-deflate
stream (no header/checksum), and both engines then decompress it. Tests
for the plain path therefore `assume` the payload is a fixpoint.
"""

from __future__ import annotations

import gzip
import json
import zlib

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from iotgp_func_raw_data_ingest_spark.functions.codecs import (
    _is_columnar_dict,
    _try_decompress,
    decode_one,
)

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.text(max_size=20),
)


@given(st.binary(max_size=2048), st.sampled_from(["gzip", "zlib", "deflate"]))
@settings(max_examples=200, deadline=None)
def test_decompress_roundtrip_each_codec(payload, codec):
    enc = {
        "gzip": gzip.compress,
        "zlib": zlib.compress,
        "deflate": lambda b: zlib.compress(b)[2:-4],  # strip header+adler
    }[codec]
    assert _try_decompress(enc(payload)) == payload


@given(st.binary(max_size=512))
@settings(max_examples=200, deadline=None)
def test_decompress_total_function(data):
    # never raises, always returns bytes — malformed input passes through
    out = _try_decompress(data)
    assert isinstance(out, bytes)


@given(
    st.dictionaries(st.text(min_size=1, max_size=8), json_scalars, max_size=6),
)
@settings(max_examples=200, deadline=None)
def test_single_dict_payload_one_row(obj):
    body = json.dumps(obj).encode()
    assume(_try_decompress(body) == body)  # see module docstring
    rows = decode_one(body)
    assert rows is not None and len(rows) == 1
    assert set(rows[0].keys()) == set(obj.keys())
    for k, v in obj.items():
        if v is None:
            assert rows[0][k] is None
        else:
            assert rows[0][k] == str(v)  # stringly normalization


@given(
    st.dictionaries(
        st.text(min_size=1, max_size=8),
        st.lists(json_scalars, min_size=3, max_size=3),
        min_size=1,
        max_size=5,
    ),
)
@settings(max_examples=200, deadline=None)
def test_columnar_payload_explodes_to_rows(cols):
    assert _is_columnar_dict(cols)
    body = json.dumps(cols).encode()
    assume(_try_decompress(body) == body)  # see module docstring
    rows = decode_one(body)
    assert rows is not None and len(rows) == 3
    assert all(set(r.keys()) == set(cols.keys()) for r in rows)


@given(
    st.lists(
        st.dictionaries(st.text(min_size=1, max_size=8), json_scalars, max_size=4),
        max_size=6,
    ),
)
@settings(max_examples=200, deadline=None)
def test_row_list_payload_preserves_count_and_compression_invariance(rows_in):
    body = json.dumps(rows_in).encode()
    assume(_try_decompress(body) == body)  # see module docstring
    plain = decode_one(body)
    assert plain is not None and len(plain) == len(rows_in)
    # compressing the same payload must not change the decoded result
    assert decode_one(gzip.compress(body)) == plain
    assert decode_one(zlib.compress(body)) == plain


@given(st.binary(max_size=256))
@settings(max_examples=200, deadline=None)
def test_non_json_payload_returns_none_not_crash(data):
    try:
        json.loads(_try_decompress(data).decode("utf-8"))
        is_json = True
    except Exception:
        is_json = False
    assume(not is_json)
    assert decode_one(data) is None
