"""Similarity search over embedding columns (`array<float>`).

Two paths, both pure DataFrame built-ins (higher-order functions compile
to JVM codegen — no Python UDF in the hot path):

- **brute-force cosine top-k** — the exact baseline: query set × corpus
  with `zip_with`/`aggregate` dot products, per-query top-k via window
  group-limit. Right answer, O(|Q|·n); fine when |Q| is small or n is
  bucketed.
- **hyperplane LSH (ANN)** — the 100 TB path: sign-bit signatures from
  fixed random hyperplanes bucket the corpus; candidates share a bucket;
  cosine is computed for candidates only. Planes are generated from a
  seeded PRNG and inlined as literals, so the bucketing is deterministic
  and replayable by the DuckDB oracle.

At real scale the corpus side would also be pre-partitioned by bucket
(bucketBy on write), turning ANN lookups into partition-pruned scans.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision via zip_with + aggregate (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    The query side is broadcast (small by contract); rank ties break on
    corpus id so results are deterministic. ``exclude_self`` drops
    corpus rows whose id equals the query id BEFORE ranking (the usual
    semantics when queries are drawn from the corpus).
    """
    joined = corpus.crossJoin(F.broadcast(queries))
    if exclude_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id_col))
    sim = F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6)
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        joined.select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            sim.alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def random_hyperplanes(n_planes: int, dim: int, seed: int = 20260813) -> list[list[float]]:
    """Deterministic unit-free hyperplanes in [-1, 1); same literals are
    inlined into the Spark plan and the oracle SQL."""
    rng = random.Random(seed)
    return [[round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature string, one char per plane ('1' if v·p > 0)."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(x) for x in p])) > 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors in the query's
    hyperplane bucket; exact cosine + top-k within candidates only."""
    c = corpus.withColumn("bucket", hyperplane_bucket(F.col(vec_col), planes))
    q = queries.withColumn("qbucket", hyperplane_bucket(F.col(query_vec_col), planes))
    joined = c.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
    if exclude_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id_col))
    sim = F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6)
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        joined.select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            sim.alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    planes: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ τ)
    within hyperplane buckets. Approximate across bucket boundaries —
    near-identical vectors (τ ≈ 1) almost always share all sign bits."""
    # repartition on the join key: both self-join sides then reuse ONE
    # exchange, so the bucket+embedding subplan computes once (matches
    # dedup.py's inverted-index joins; without it the join degrades to
    # SMJ with two exchanges at scale)
    b = df.withColumn("bucket", hyperplane_bucket(F.col(vec_col), planes)).repartition(
        "bucket"
    )
    lhs = b.alias("a")
    rhs = b.alias("b")
    sim = F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6)
    return (
        lhs.join(
            rhs,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (IVF coarse
    quantization): cell = argmax cosine(v, centroid), ties → min centroid
    id. Centroids are broadcast (n_cells is small by construction), so
    assignment is map-side compute + ONE shuffle for the per-vector
    argmax — `max_by` over a (sim, -cid) struct gives the argmax with
    partial aggregation, no window over the crossed set.

    Output: (id, vec, cell).
    """
    scored = df.crossJoin(F.broadcast(centroids))
    sim = F.round(cosine(F.col(vec_col), F.col("centroid_vec")), 6)
    # unique ordering key: (sim asc, -cid asc) → max = best sim, min cid
    ordkey = F.struct(sim.alias("s"), (-F.col("centroid_id")).alias("nc"))
    return (
        scored.groupBy(F.col(id_col).alias("id"))
        .agg(
            F.first(F.col(vec_col)).alias("vec"),
            F.max_by(F.col("centroid_id"), ordkey).alias("cell"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are inverted-file-indexed by
    nearest centroid (`ivf_assign`); each query probes its ``nprobe``
    nearest cells and brute-forces only those lists. Scored pairs drop
    from |Q|·n to ~|Q|·n·nprobe/n_cells.

    At 100 TB the assignment is computed once at ingest and the lake is
    partitioned/bucketed by cell, so a query reads only its probed
    partitions (partition pruning, no full scan); centroids come from a
    sampled KMeans fit (pyspark.ml) refreshed offline — here they are
    caller-supplied so the operator stays deterministic and
    oracle-checkable.

    ``centroids`` schema: (centroid_id, centroid_vec).
    """
    cells = ivf_assign(corpus, centroids, id_col, vec_col)
    qscored = queries.crossJoin(F.broadcast(centroids))
    qsim = F.round(cosine(F.col(query_vec_col), F.col("centroid_vec")), 6)
    wprobe = W.partitionBy(query_id_col).orderBy(qsim.desc(), F.col("centroid_id"))
    probes = (
        qscored.withColumn("rn", F.row_number().over(wprobe))
        .filter(F.col("rn") <= nprobe)
        .select(F.col(query_id_col), F.col(query_vec_col), F.col("centroid_id").alias("cell"))
    )
    joined = cells.join(F.broadcast(probes), "cell")
    if exclude_self:
        joined = joined.filter(F.col("id") != F.col(query_id_col))
    sim = F.round(cosine(F.col("vec"), F.col(query_vec_col)), 6)
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        joined.select(
            F.col(query_id_col),
            F.col("id").alias("neighbor_id"),
            sim.alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def kmeans_refine(
    df: DataFrame,
    centroids: DataFrame,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's KMeans refinement, ``iters`` fixed iterations: assign every
    vector to its nearest (max-cosine) centroid, then recompute each
    centroid as the mean of its members. Fixed iteration count keeps the
    plan static and the result deterministic — the convergence-test loop
    of a production fit belongs in an offline driver program (pyspark.ml
    KMeans); this operator is the deterministic, oracle-checkable core.

    Arithmetic is fixed-point so both the plan and its SQL replay agree
    bit-for-bit: per-dimension member sums use exact int64 1e-6 units
    (order-free — float summation order differs between engines AND
    between runs of the same engine under AQE), and the refreshed
    component is the e6-rounded mean divided back to double. Empty cells
    drop (standard Lloyd behavior).

    Scale shape per iteration: centroids broadcast onto the corpus
    (map-side argmax via ``ivf_assign``), one shuffle keyed
    (cell, dim) whose cardinality is k·dim regardless of corpus size,
    and a k-row rebuild. Corpus size only affects the map side.

    ``centroids`` schema: (centroid_id, centroid_vec) → same out.
    """
    cents = centroids
    for _ in range(iters):
        assigned = ivf_assign(df, cents, id_col, vec_col)  # (id, vec, cell)
        comps = (
            assigned.select("cell", F.posexplode("vec").alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(
                F.sum(F.round(F.col("val").cast("double") * 1e6).cast("long")).alias(
                    "s_e6"
                ),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "cell",
                "dim",
                # e6-rounded mean: exact int both engines, /1e6 back to double
                (
                    F.round(F.col("s_e6") / F.col("n").cast("double")).cast("long")
                    / 1e6
                ).alias("comp"),
            )
        )
        cents = (
            comps.groupBy(F.col("cell").alias("centroid_id"))
            .agg(F.array_sort(F.collect_list(F.struct("dim", "comp"))).alias("dc"))
            .select(
                "centroid_id",
                F.transform("dc", lambda x: x["comp"]).alias("centroid_vec"),
            )
        )
    return cents


# --------------------------------------------------------------------------
# Product quantization (PQ): the vector-COMPRESSION half of billion-scale
# ANN. IVF (above) prunes which vectors to score; PQ shrinks each stored
# vector to n_sub one-byte codes so the scored set fits in memory, with
# distances computed against a per-query lookup table (ADC) instead of the
# raw floats. All arithmetic is exact int64 in e6 fixed-point units, so the
# codes, distance tables, and rankings are bit-replayable by the SQL oracle
# (the kmeans_refine convention).


# Packed-argmin code-word domain for pq_encode: codes live in the low
# 17 bits of the min() key, distances in the high 46 (see pq_encode's
# docstring for the measured hash-vs-sort-aggregate rationale).
_PQ_CODE_SHIFT = 1 << 17


def _e6_subvec(vec_col: str, m: int, sub_dim: int) -> Column:
    """Subspace m of a vector, e6-quantized to array<long> (exact ints —
    cross-engine-safe arithmetic, see kmeans_refine)."""
    return F.transform(
        F.slice(F.col(vec_col), m * sub_dim + 1, sub_dim),
        lambda x: F.round(x.cast("double") * 1e6).cast("long"),
    )


def _sq_l2_e6(a: Column | str, b: Column | str) -> Column:
    """Exact squared-L2 between two e6 int subvectors (int64 — safe up to
    |x| ≈ 4e8 per component at sub_dim 16)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _explode_subspaces(
    df: DataFrame, id_alias: str, n_sub: int, sub_dim: int,
    id_col: str, vec_col: str, out_vec: str,
) -> DataFrame:
    subs = F.array(
        *[
            F.struct(
                F.lit(m).alias("sub"), _e6_subvec(vec_col, m, sub_dim).alias(out_vec)
            )
            for m in range(n_sub)
        ]
    )
    return df.select(F.col(id_col).alias(id_alias), F.explode(subs).alias("s")).select(
        id_alias, F.col("s.sub").alias("sub"), F.col(f"s.{out_vec}").alias(out_vec)
    )


def pq_codebooks(
    seeds: DataFrame,
    n_sub: int = 4,
    sub_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace codebooks from ``seeds`` rows: (code, sub, cvec) with
    code = the seed's id, used as the code word directly. Caller
    contract: ids in [0, 2¹⁷) — sparse/large ids up to 131071 are fine
    (pq_encode validates and RAISES on violation rather than corrupting,
    per the r6 ADVICE). Seed-sampled codebooks keep the operator
    deterministic and oracle-replayable; a production fit would Lloyd-
    refine each subspace with :func:`kmeans_refine` offline — the ADC
    machinery below is identical either way."""
    return _explode_subspaces(seeds, "code", n_sub, sub_dim, id_col, vec_col, "cvec")


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    n_sub: int = 4,
    sub_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every corpus vector as ``n_sub`` nearest-codeword codes
    (squared-L2 per subspace, ties → smallest code via the exact packed
    argmin key ``d2·2¹⁷ + code``). Output (id, sub, code): the
    compressed representation — n_sub small ints replacing
    sub_dim·n_sub floats, the ~32× footprint cut that lets a
    billion-vector index live in RAM.

    The packed-long argmin is a deliberate plan choice, measured: a
    domain-free struct-min (``min(struct(d2, code))``) is not
    hash-aggregable (no fixed-width mutable buffer), so Spark planned
    SortAggregate over the id×sub×codes exploded relation — 43.7 GB
    spilled at the 2M-vector stress tier vs ZERO for the packed
    ``min(long)`` hash aggregate. Code words are therefore bounded to
    [0, 2¹⁷) and VALIDATED — an out-of-range codebook id raises at
    execution instead of silently corrupting encodings (the r6 ADVICE
    fix); the guard rides the tiny broadcast side, not the exploded
    relation. Headroom: at e6 fixed point with unit-scale components,
    d2 ≤ sub_dim·4e12, so d2·2¹⁷ fits int64 through sub_dim 17 —
    enforced with a ValueError (sub_dim ≥ 18 would silently wrap the
    argmin); components are assumed |x| ≲ 1.0.

    Shape: codebooks broadcast (≤ n_codes·n_sub tiny rows), corpus
    exploded to n_sub rows/vector map-side, one groupBy on (id, sub)
    whose width is bounded by the code count. No shuffle scales
    super-linearly in the corpus."""
    shift = _PQ_CODE_SHIFT
    # Packed-key headroom is a hard contract, validated (r7 ADVICE):
    # with the documented |x| ≲ 1.0 component assumption, d2 ≤
    # sub_dim·(2e6)² e6-units, so d2·2¹⁷ + code stays inside int64 only
    # for sub_dim ≤ 17 — beyond that the argmin key silently wraps.
    # Larger-magnitude components shrink that ceiling further; callers
    # with wide subspaces must normalize or re-block first.
    if sub_dim > 17:
        raise ValueError(
            "pq_encode: sub_dim > 17 overflows the packed argmin key "
            "(d2*2^17 + code must fit int64 at unit-scale components) — "
            "use more, narrower subspaces (raise n_sub, lower sub_dim)"
        )
    guarded = codebooks.select(
        "sub",
        F.when(
            (F.col("code") >= 0) & (F.col("code") < shift),
            F.col("code").cast("long"),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "pq_encode: codebook code word outside [0, 131072) "
                    "would corrupt the packed argmin key — re-id the "
                    "codebooks (pq_codebooks contract)"
                )
            )
        )
        .alias("code"),
        "cvec",
    )
    subs = _explode_subspaces(corpus, id_col, n_sub, sub_dim, id_col, vec_col, "qv")
    j = subs.join(F.broadcast(guarded), "sub")
    key = _sq_l2_e6("qv", "cvec") * F.lit(shift) + F.col("code")
    return j.groupBy(id_col, "sub").agg((F.min(key) % shift).alias("code"))


def gram_blocked(
    df: DataFrame,
    vec_col: str,
    d: int,
    block: int = 32,
) -> DataFrame:
    """Σ x·xᵀ (upper triangle) via block-partitioned BLAS over
    ``mapInArrow`` — the q217 escape hatch promoted to an operator
    (plans/analytics.py q217_embedding_gram documents when to switch).

    The expression plan q217 gates expands every vector into its d²/2
    component products as Catalyst array ops — ideal at d=64, but the
    per-row expansion (and codegen'd expression tree) grows O(d²): at
    d in the thousands each row would explode into millions of structs.
    Here each Arrow batch instead lands in numpy as an (n, d) int64
    matrix and the partial gram is accumulated PER PARTITION as block
    outer products Xᵀ_a·X_b (``block``-column tiles keep the working
    set cache-resident; only upper-triangle tiles are computed), so the
    shuffle is one d²/2-cell partial per partition — the identical
    sum-of-partial-grams contract as the expression plan, with the
    per-row O(d²) expansion gone.

    Arithmetic is the exact q194/q217 fixed-point convention — floats
    cast to double, floored to int64 micro-units BEFORE multiplying,
    products and sums in int64 (exact up to ~9e18: unit components give
    1e12/cell products, overflow needs ≳9M rows per partition × cell —
    repartition the input before that) — so the result is bit-identical
    to q217's gated plan, asserted by test_gram_blocked equivalence.

    Output: (i int, j int, gram_e12 long) for 0 ≤ i ≤ j < d, matching
    q217's schema.
    """
    if d <= 0 or block <= 0:
        raise ValueError("d and block must be positive")

    def _partials(batches):
        import numpy as np
        import pyarrow as pa

        acc = np.zeros((d, d), dtype=np.int64)
        seen = False
        for batch in batches:
            col = batch.column(0)
            flat = col.flatten().to_numpy(zero_copy_only=False)
            flat = flat.astype(np.float64)
            # NULL/NaN elements flatten to NaN, and np.floor(NaN)
            # .astype(int64) is silent garbage — diverging from q217's
            # null-PROPAGATING expression plan this operator is
            # contracted bit-identical with (r7 ADVICE). Non-finite
            # input is a hard error here: a partial-gram cell poisoned
            # by one row is unrecoverable downstream.
            if not np.isfinite(flat).all():
                raise ValueError(
                    "gram_blocked: NULL/NaN/Inf embedding element — "
                    "gram_blocked requires non-null finite vectors "
                    "(filter or impute first; q217's expression plan "
                    "null-propagates instead)"
                )
            x = np.floor(flat * 1e6).astype(np.int64)
            x = x.reshape(-1, d)
            seen = True
            for a in range(0, d, block):
                b = min(a + block, d)
                for c in range(a, d, block):
                    e = min(c + block, d)
                    acc[a:b, c:e] += x[:, a:b].T @ x[:, c:e]
        if not seen:
            return  # empty partition: no partial, no shuffle rows
        iu = np.triu_indices(d)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(iu[0].astype(np.int32)),
                pa.array(iu[1].astype(np.int32)),
                pa.array(acc[iu]),
            ],
            names=["i", "j", "v"],
        )

    partials = df.select(vec_col).mapInArrow(_partials, "i int, j int, v long")
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("v").cast("long").alias("gram_e12"))
        .select(F.col("i").cast("int"), F.col("j").cast("int"), "gram_e12")
    )


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_sub: int = 4,
    sub_dim: int = 16,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query, build
    the n_sub × n_codes table of exact subspace distances query→codeword
    (broadcast — a few hundred fixed-width rows), then score every
    encoded vector by summing its codes' table entries and keep the k
    best per query (ties → smallest neighbor id).

    This is the PQ serving path: the corpus side touches ONLY the code
    relation (never the raw vectors), so the scan is n_sub ints per
    vector and the per-row work is n_sub lookups — at 100 TB, pair with
    the IVF cell index (ivf_topk) to prune candidates first, then ADC
    re-ranks inside the probed cells. Output: (query_id, neighbor_id,
    adc_dist, rank) with adc_dist in exact e6² integer units."""
    qsubs = _explode_subspaces(
        queries, query_id_col, n_sub, sub_dim, query_id_col, query_vec_col, "qv"
    )
    dt = qsubs.join(F.broadcast(codebooks), "sub").select(
        query_id_col, "sub", "code", _sq_l2_e6("qv", "cvec").alias("d2")
    )
    j = encoded.join(F.broadcast(dt), ["sub", "code"])
    if exclude_self:
        j = j.filter(F.col(id_col) != F.col(query_id_col))
    adc = j.groupBy(query_id_col, id_col).agg(F.sum("d2").alias("adc_dist"))
    w = W.partitionBy(query_id_col).orderBy("adc_dist", id_col)
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            "adc_dist",
            "rank",
        )
    )
