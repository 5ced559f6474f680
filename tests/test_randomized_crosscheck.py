"""Randomized cross-checks: dedup operators vs independent pure-Python
reference implementations on seeded random corpora.

The oracle harness proves Spark == DuckDB on the driver's tables; these
tests prove the OPERATOR == the textbook definition on corpora with
controlled duplication, using a reference implementation that shares no
code with the operator (different tokenizer code path, different pair
enumeration). Seeded, so failures reproduce.
"""

from __future__ import annotations

import itertools
import random

from iotgp_func_raw_data_ingest_spark.operators import dedup as D

WORDS = ["spark", "scan", "row", "key", "agg", "join", "shuffle", "sort",
         "hash", "table", "value", "batch", "merge", "plan", "task"]


def _corpus(seed: int, n_docs: int = 30):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        if docs and rng.random() < 0.3:
            # near-duplicate of an earlier doc: copy + small edit
            base = rng.choice(docs)[1].split()
            j = rng.randrange(len(base))
            base[j] = rng.choice(WORDS)
            docs.append((i, " ".join(base)))
        else:
            docs.append((i, " ".join(rng.choice(WORDS) for _ in range(rng.randint(8, 20)))))
    return docs


def _py_shingles(text: str, k: int) -> set[str]:
    toks = text.split()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _py_jaccard_pairs(docs, k: int, threshold: float):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        sa, sb = _py_shingles(ta, k), _py_shingles(tb, k)
        if not sa or not sb:
            continue
        j = round(len(sa & sb) / len(sa | sb), 4)
        if j >= threshold:
            out[(ia, ib)] = j
    return out


def test_jaccard_pairs_matches_bruteforce(spark):
    for seed in (1, 7, 42):
        docs = _corpus(seed)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.3).collect()
        }
        want = _py_jaccard_pairs(docs, 3, 0.3)
        assert got == want, f"seed {seed}: {got} != {want}"


def _py_simhash(text: str) -> int:
    import hashlib

    votes = [0] * D.SIMHASH_BITS
    for tok in text.split():
        h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        for p in range(D.SIMHASH_BITS):
            votes[p] += 1 if (h >> p) & 1 else -1
    return sum(1 << p for p in range(D.SIMHASH_BITS) if votes[p] >= 0)


def test_simhash_pairs_matches_bruteforce(spark):
    for seed in (3, 11):
        docs = _corpus(seed)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in D.simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()
        }
        fp = {i: _py_simhash(t) for i, t in docs}
        want = {}
        for (ia, _), (ib, _) in itertools.combinations(docs, 2):
            d = bin(fp[ia] ^ fp[ib]).count("1")
            if d <= 3:
                want[(ia, ib)] = d
        assert got == want, f"seed {seed}: {got} != {want}"


def test_minhash_candidates_are_subset_of_sharing_pairs(spark):
    # LSH is probabilistic in RECALL, but candidates it verifies must all
    # be true pairs at the threshold (precision of the verified output
    # is exact by construction)
    for seed in (5,):
        docs = _corpus(seed)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.minhash_lsh_pairs(
                df, "doc_id", "text", k=3, num_hashes=16, bands=8, threshold=0.3
            ).collect()
        }
        want = _py_jaccard_pairs(docs, 3, 0.3)
        for pair, j in got.items():
            assert pair in want and want[pair] == j


def _py_simhash64(text: str) -> tuple[int, int]:
    import hashlib

    votes = [0] * 64
    for tok in text.split():
        hx = hashlib.md5(tok.encode()).hexdigest()
        h1, h2 = int(hx[:8], 16), int(hx[8:16], 16)
        for p in range(32):
            votes[p] += 1 if (h1 >> p) & 1 else -1
            votes[32 + p] += 1 if (h2 >> p) & 1 else -1
    lo = sum(1 << p for p in range(32) if votes[p] >= 0)
    hi = sum(1 << p for p in range(32) if votes[32 + p] >= 0)
    return hi, lo


def test_simhash64_pairs_matches_bruteforce(spark):
    from iotgp_func_raw_data_ingest_spark.operators.dedup import simhash64_pairs

    for seed in (9, 21):
        docs = _corpus(seed)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash64_pairs(df, "doc_id", "text", max_hamming=3).collect()
        }
        fp = {i: _py_simhash64(t) for i, t in docs}
        want = {}
        for (ia, _), (ib, _) in itertools.combinations(docs, 2):
            hi_a, lo_a = fp[ia]
            hi_b, lo_b = fp[ib]
            d = bin(hi_a ^ hi_b).count("1") + bin(lo_a ^ lo_b).count("1")
            if d <= 3:
                want[(ia, ib)] = d
        assert got == want, f"seed {seed}: {got} != {want}"
