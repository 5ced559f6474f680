"""Round-6 tranche 3a: probabilistic filter/counter structures as
first-class relational operators, both replayable bit-for-bit by the
DuckDB oracle because their hash positions derive from md5 (the q93
cross-engine hash convention).

- q192: COUNT-MIN SKETCH heavy-hitter audit (operators/sketches.py
  cms_table / cms_lookup). The CMS is built as a bounded relation
  (depth × width cells, sums → re-mergeable partials) and point-queried
  for the exact top keys; the gate carries exact counts, sketch
  estimates, and the two CM guarantees as booleans.
- q193: BLOOM-FILTER semi-join prefilter (bloom_bits / bloom_probe) —
  the runtime-filter / semi-join-reduction pattern: compress the build
  side's key set to ≤ n_bits rows, broadcast, and test every probe key
  with zero false negatives. The gate carries per-key bloom verdicts
  AND exact membership, so a single flipped bit, wrong hash count, or
  false negative changes the hash.

Both sketches complete the mergeable-summary battery (HLL q180, KLL
q184/q191, Theta q185): membership and point-frequency were the two
questions the existing sketches could not answer.

Reference parity: the reference engine (src/function_app.py, 423 lines)
has no sketch or filter machinery; this is beyond-reference analytics
surface per the training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators import sketches as SK
from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register

# e in the CM overestimate bound P(est − true > e·N/width) ≤ e^−depth,
# inlined identically in the Spark plan and the SQL oracle.
_E = 2.718281828459045


@register(
    "q192_cms_heavy_hitters",
    oracle=f"""
    WITH h AS (SELECT d FROM range(4) t(d)),
    cms AS (
        SELECT d,
               ('0x' || substr(md5(CAST(d AS VARCHAR) || ':' ||
                               CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT
                   % 1024 AS pos,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders, h
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt
        FROM orders GROUP BY 1
    ),
    top AS (SELECT * FROM exact ORDER BY exact_cnt DESC, o_custkey LIMIT 20),
    probe AS (
        SELECT t.o_custkey, h.d,
               ('0x' || substr(md5(CAST(h.d AS VARCHAR) || ':' ||
                               CAST(t.o_custkey AS VARCHAR)), 1, 12))::BIGINT
                   % 1024 AS pos
        FROM top t, h
    ),
    est AS (
        SELECT p.o_custkey, MIN(COALESCE(cms.cnt, 0)) AS cms_est
        FROM probe p LEFT JOIN cms ON cms.d = p.d AND cms.pos = p.pos
        GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM orders)
    SELECT t.o_custkey, t.exact_cnt, e.cms_est,
           e.cms_est >= t.exact_cnt AS never_under,
           e.cms_est - t.exact_cnt
               <= CAST(ceil({_E} * n.total / 1024) AS BIGINT) AS within_bound
    FROM top t JOIN est e USING (o_custkey), n
    """,
)
def q192_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch audited against exact counts: build a
    (4 × 1024)-cell CMS over every order's customer key, point-query it
    for the exact top-20 customers, and gate (a) the estimates
    themselves, (b) ``never_under`` — a CMS cell holds the true count
    plus non-negative collision mass, so an estimate below the exact
    count means the sketch is broken — and (c) ``within_bound``, the
    e·N/width overestimate guarantee. Both engines compute the same
    md5-position arithmetic, so even the collision noise is replayed
    exactly.

    100 TB shape: the sketch build is ONE groupBy whose shuffle is
    capped at depth × width fixed-width rows (map-side partials absorb
    the volume), the probe joins broadcast a few-KB relation, and two
    sketches over disjoint data merge by union + re-sum — the same
    carry-forever contract as the HLL/KLL rollup partials. The exact
    top-20 side exists only because this is an accuracy AUDIT; a
    production pipeline keeps just the sketch."""
    t = prep(spark, sf_dir)
    orders = t["orders"]
    cms = SK.cms_table(orders, "o_custkey", depth=4, width=1024)
    exact = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.col("exact_cnt").desc(), "o_custkey").limit(20)
    est = SK.cms_lookup(cms, top.select("o_custkey"), "o_custkey", depth=4, width=1024)
    total = orders.agg(F.count(F.lit(1)).alias("total"))
    bound = F.ceil(F.lit(_E) * F.col("total") / F.lit(1024)).cast("long")
    return (
        top.join(est, "o_custkey")
        .crossJoin(F.broadcast(total))
        .select(
            "o_custkey",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("never_under"),
            ((F.col("cms_est") - F.col("exact_cnt")) <= bound).alias("within_bound"),
        )
    )


@register(
    "q193_bloom_semi_join",
    oracle="""
    WITH hh AS (SELECT j FROM range(2) t(j)),
    build AS (
        SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    bits AS (
        SELECT DISTINCT
               ('0x' || substr(md5(CAST(j AS VARCHAR) || '#' ||
                               CAST(c_custkey AS VARCHAR)), 1, 12))::BIGINT
                   % 1024 AS pos
        FROM build, hh
    ),
    probes AS (SELECT DISTINCT o_custkey FROM orders),
    ppos AS (
        SELECT o_custkey,
               ('0x' || substr(md5(CAST(j AS VARCHAR) || '#' ||
                               CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT
                   % 1024 AS pos
        FROM probes, hh
    ),
    hits AS (
        SELECT o_custkey,
               SUM(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END) = 2
                   AS bloom_hit
        FROM ppos LEFT JOIN bits USING (pos)
        GROUP BY o_custkey
    )
    SELECT h.o_custkey,
           h.bloom_hit,
           b.c_custkey IS NOT NULL AS is_member,
           h.bloom_hit OR b.c_custkey IS NULL AS no_false_neg
    FROM hits h LEFT JOIN build b ON b.c_custkey = h.o_custkey
    """,
)
def q193_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction, fully audited: compress the
    BUILDING-segment customer keys into a 1024-bit / 2-hash Bloom
    filter (≈44% fill at sf0.01 — deliberately small so false positives
    actually occur and are gate-checked), probe every distinct ordering
    customer against it, and emit per key the bloom verdict, the exact
    membership, and ``no_false_neg`` (the Bloom guarantee: a member is
    NEVER rejected — any FALSE here is a broken filter). The ~20% of
    non-members that pass are the documented false-positive cost the
    downstream exact join absorbs; both engines replay the identical
    md5 bit positions, so the exact same keys false-positive on both
    sides.

    100 TB shape: this is the semi-join-reduction / runtime-filter
    pattern — the build side collapses to ≤ n_bits rows (map-side
    distinct, bounded output), broadcasts for free, and prunes the
    probe side BEFORE the expensive join shuffles it; sized for real
    use (n_bits ≈ 10·|build keys|) the filter drops ~99% of
    non-matching probe rows at scan time. Spark's engine-internal
    runtime row-level filtering does this implicitly; here it is
    first-class, persistable, and mergeable (bit-OR = union)."""
    t = prep(spark, sf_dir)
    build = (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
        .distinct()
    )
    bits = SK.bloom_bits(build, "key", n_hashes=2, n_bits=1024)
    probes = t["orders"].select(F.col("o_custkey").alias("key")).distinct()
    hits = SK.bloom_probe(bits, probes, "key", n_hashes=2, n_bits=1024)
    member = build.withColumn("_m", F.lit(1))
    return (
        hits.join(F.broadcast(member), "key", "left")
        .select(
            F.col("key").alias("o_custkey"),
            "bloom_hit",
            F.col("_m").isNotNull().alias("is_member"),
            (F.col("bloom_hit") | F.col("_m").isNull()).alias("no_false_neg"),
        )
    )
