"""Stress smoke: run the heavy dedup/text operators on a synthetic
corpus ~10× the largest driver SF and record wall time + MEASURED
shuffle/spill — the empirical answer to "does the inverted-index design
hold when the data outgrows the test fixtures?".

Run: python tools/stress_smoke.py [n_docs]   (default 500_000)

The corpus is generated IN SPARK (seeded hash arithmetic, JVM-only — no
driver-side data) with a controlled 2% near-duplicate rate so the pair
operators have real work. Writes STRESS.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.operators import dedup as D
from iotgp_func_raw_data_ingest_spark.operators.textstats import text_profile
from iotgp_func_raw_data_ingest_spark.session import get_spark
from tools.shuffle_audit import audit_plan

WORDS = ["spark", "scan", "row", "key", "agg", "join", "shuffle", "sort",
         "hash", "table", "value", "batch", "merge", "plan", "task",
         "codec", "lake", "route", "bucket", "frame"]


def synth_docs(spark, n_docs: int):
    """Deterministic word-salad corpus, generated executor-side.

    A 2% slice are near-duplicates: doc i (i % 50 == 1) reuses doc i-1's
    word sequence with one position perturbed, giving the pair operators
    a realistic candidate density."""
    # vocabulary = base word × 5000 numeric suffixes (~100k distinct
    # tokens): shingle overlap between unrelated docs is then rare, like
    # a real corpus — a tiny closed vocabulary would make EVERY pair
    # share shingles and turn the inverted-index self-join into a
    # cartesian blowup no real corpus exhibits
    words_lit = F.array(*[F.lit(w) for w in WORDS])
    base_id = F.when(F.col("id") % 50 == 1, F.col("id") - 1).otherwise(F.col("id"))
    n_words = (F.abs(F.hash(base_id)) % 13 + 8).cast("int")
    toks = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.concat(
            F.element_at(
                words_lit,
                (F.pmod(F.hash(base_id, i), F.lit(len(WORDS))) + 1).cast("int"),
            ),
            F.lit("_"),
            F.pmod(F.hash(base_id, i, F.lit(7)), F.lit(5000)).cast("string"),
        ),
    )
    # perturb ONE position for the near-dup slice so it's near, not exact
    perturbed = F.when(
        F.col("id") % 50 == 1,
        F.concat(
            F.slice(toks, 1, 1),
            F.array(F.lit("perturb")),
            F.slice(toks, 3, 10_000),
        ),
    ).otherwise(toks)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(perturbed, " ").alias("text"),
    )


def synth_keys(spark, n_keys: int):
    """Short record-linkage keys (names/SKUs, 10-20 chars) with a
    blocking column — the corpus shape blocked_levenshtein_pairs exists
    for. 2% are radius-1 perturbations of their predecessor and 1% are
    radius-2, so the FastSS index has real matches at both depths."""
    words_lit = F.array(*[F.lit(w) for w in WORDS])
    base_id = F.when(F.col("id") % 50 == 1, F.col("id") - 1).otherwise(F.col("id"))
    key = F.concat(
        F.element_at(
            words_lit, (F.pmod(F.hash(base_id), F.lit(len(WORDS))) + 1).cast("int")
        ),
        F.lit("_"),
        F.pmod(F.hash(base_id, F.lit(3)), F.lit(100_000)).cast("string"),
        F.lit("_"),
        F.element_at(
            words_lit,
            (F.pmod(F.hash(base_id, F.lit(5)), F.lit(len(WORDS))) + 1).cast("int"),
        ),
    )
    key = F.when(F.col("id") % 100 == 1, F.concat(key, F.lit("xy"))).when(
        F.col("id") % 50 == 1, F.concat(key, F.lit("x"))
    ).otherwise(key)
    return spark.range(n_keys).select(
        F.col("id").alias("rec_id"),
        key.alias("name"),
        F.pmod(F.hash(base_id, F.lit(9)), F.lit(500)).cast("int").alias("blk"),
        # per-RECORD (not per-base) balance so duplicate pairs have real
        # survivorship ties to break (max bal, ties → min rec_id)
        F.pmod(F.hash(F.col("id"), F.lit(11)), F.lit(100_000))
        .cast("double")
        .alias("bal"),
    )


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    # optional substring filter for iterating on ONE tier; a filtered run
    # prints measurements but never overwrites STRESS.md (partial tables
    # would masquerade as the full audit)
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark(
        "stress", config=EngineConfig(shuffle_partitions=32), master="local[32]"
    )
    docs = synth_docs(spark, n_docs)
    docs = docs.localCheckpoint(eager=True)  # generation cost out of op timings
    keys = synth_keys(spark, n_docs).localCheckpoint(eager=True)
    # events-shaped frame for the sketch/expectations tiers: 720 hourly
    # buckets over 30 days, 5 dims, value + uid from seeded arithmetic
    evts = (
        spark.range(n_docs)
        .select(
            F.timestamp_seconds(1704067200 + (F.col("id") % 720) * 3600).alias("ts"),
            (F.col("id") % 5).cast("string").alias("dim"),
            (F.col("id") % 9973).cast("double").alias("value"),
            F.col("id").alias("uid"),
        )
        .localCheckpoint(eager=True)
    )

    from iotgp_func_raw_data_ingest_spark.operators import expectations as EX
    from iotgp_func_raw_data_ingest_spark.operators import similarity as SIM
    from iotgp_func_raw_data_ingest_spark.operators import sketches as SK
    from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
        aggregate_increment,
        merge_rollup_frames,
        rollup_quantile_estimate,
    )

    # synthetic 64-dim embeddings for the PQ tier (seeded hash components
    # in [-1, 1), executor-side like the doc corpus)
    vecs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (
                    (F.pmod(F.hash(F.col("id"), i), F.lit(2000)) - 1000) / 1000.0
                ).cast("float"),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    pq_cb = SIM.pq_codebooks(vecs.filter(F.col("vec_id") < 16))
    pq_queries = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def _kll_rollup():
        aggs = ("count", "approx_quantile")
        half = [
            aggregate_increment(
                evts.filter(F.col("uid") % 2 == p),
                "ts", "day", ["dim"], "value", aggs=aggs,
            )
            for p in (0, 1)
        ]
        return rollup_quantile_estimate(
            merge_rollup_frames(half[0], half[1], ["dim"], aggs),
            {"p50": 0.5, "p95": 0.95},
        )

    def _pagerank():
        from iotgp_func_raw_data_ingest_spark.operators.graph import (
            pagerank_from_pairs,
        )

        pairs = D.simhash64_pairs(docs, "doc_id", "text", max_hamming=3).select(
            "id_a", "id_b"
        )
        return pagerank_from_pairs(pairs, iterations=3, damping=0.85)

    def _entity_resolution(driver_path_max_edges: int):
        from pyspark.sql import Window

        pairs = D.blocked_levenshtein_pairs(
            keys, "rec_id", "name", "blk", max_dist=2
        ).select("id_a", "id_b")
        labels = D.cluster_neardups(
            pairs, driver_path_max_edges=driver_path_max_edges
        ).withColumnRenamed("id", "rec_id")
        members = keys.join(labels, "rec_id", "left").withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col("rec_id"))
        )
        w = Window.partitionBy("cluster_id").orderBy(
            F.col("bal").desc(), F.col("rec_id")
        )
        ranked = members.withColumn("rk", F.row_number().over(w))
        return ranked.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(F.when(F.col("rk") == 1, F.col("rec_id"))).alias("survivor"),
            F.sum("bal").alias("sum_bal"),
        )

    ops = {
        "text_profile": lambda: text_profile(docs, "doc_id", "text"),
        "exact_dedup": lambda: D.exact_dedup_groups(docs, "doc_id", "text"),
        "simhash_pairs(32-bit)": lambda: D.simhash_pairs(
            docs, "doc_id", "text", max_hamming=3
        ),
        "simhash64_pairs(64-bit)": lambda: D.simhash64_pairs(
            docs, "doc_id", "text", max_hamming=3
        ),
        "minhash_lsh_pairs": lambda: D.minhash_lsh_pairs(
            docs, "doc_id", "text", k=3, num_hashes=16, bands=8, threshold=0.3
        ),
        "jaccard_pairs(exact)": lambda: D.jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.3
        ),
        "fastss_d2(blocked_levenshtein)": lambda: D.blocked_levenshtein_pairs(
            keys, "rec_id", "name", "blk", max_dist=2
        ),
        # incremental dedup: 5% of the corpus plays the daily increment,
        # the other 95% the persisted history ledger — the measurement
        # that the candidate join is increment × collision-rate, never
        # ledger × ledger (ids ≡ 1 mod 100 near-dup a ledger doc, so the
        # verify step has real cross-increment matches)
        "dedup_against_ledger(5% incr)": lambda: D.dedup_against_ledger(
            D.minhash_signatures(
                docs.filter(F.col("doc_id") % 20 == 1), "doc_id", "text"
            ).drop("shingles"),
            D.minhash_signatures(
                docs.filter(F.col("doc_id") % 20 != 1), "doc_id", "text"
            ).drop("shingles"),
        ),
        "kll_quantile_rollup(2-batch merge)": _kll_rollup,
        "theta_overlap(5 groups, 2 snapshots)": lambda: SK.theta_overlap(
            SK.theta_distinct(evts.filter(F.col("uid") % 2 == 0), ["dim"], "uid"),
            SK.theta_distinct(evts.filter(F.col("uid") % 2 == 1), ["dim"], "uid"),
            ["dim"],
        ),
        "expectations_battery(7 checks)": lambda: EX.validate_expectations(
            evts,
            [
                EX.expect_not_null("ts_nn", "ts"),
                EX.expect_between("v_rng", "value", 0, 9000),
                EX.expect_in_set("dim_dom", "dim", ["0", "1", "2", "3", "4"]),
                EX.expect_matches("dim_fmt", "dim", "^[0-4]$"),
                EX.expect_predicate("v_int", F.col("value") == F.floor("value")),
                EX.expect_unique("uid_unique", ["uid"]),
                EX.expect_foreign_key(
                    "dim_fk", ["dim"],
                    evts.select("dim").distinct(), ["dim"],
                ),
            ],
        ),
        "pagerank(3 iters, simhash64 graph)": _pagerank,
        # q192/q193 structures: the CMS cell relation is FIXED at
        # depth x width rows however many input rows stream through it,
        # and the bloom bit relation at <= n_bits — both prove their
        # bounded-shuffle contract here. Keys are uid % 9973 so cells
        # carry real multi-hundred counts at this tier.
        "cms_build+lookup(4x1024)": lambda: SK.cms_lookup(
            SK.cms_table(
                evts.select((F.col("uid") % 9973).alias("key")), "key"
            ),
            evts.select((F.col("uid") % 20).alias("key")).distinct(),
            "key",
        ),
        "bloom_bits+probe(2-hash, 8n bits)": lambda: SK.bloom_probe(
            SK.bloom_bits(
                evts.filter(F.col("uid") % 5 == 0).select(
                    F.col("uid").alias("key")
                ),
                "key",
                n_bits=8 * n_docs,
            ),
            evts.select(F.col("uid").alias("key")),
            "key",
            n_bits=8 * n_docs,
        ),
        # q194 PQ: encode the full synthetic corpus to 4 codes/vector
        # and serve 5 queries from codes only — the scored relation is
        # n_sub rows/vector of small ints, never the raw floats
        "pq_encode+adc_topk(4x16, 64d)": lambda: SIM.pq_adc_topk(
            SIM.pq_encode(vecs, pq_cb),
            pq_cb,
            pq_queries,
            k=10,
        ),
        # q225 composed end-to-end: FastSS pairs → connected components
        # → survivorship. STRESS measured the stages only in isolation
        # before (r7 VERDICT task 3); the composition feeds the FastSS
        # output into the clusterer (edges cached once, never re-deriving
        # the inverted-index join) and joins labels back to the entity
        # slice for the per-cluster window + rollup. Two variants: the
        # default driver union-find (edge sets here ~300k ≤ the 1M
        # driver-path bound) and the forced distributed min-label
        # fallback — the shape that must hold when edges outgrow the
        # driver at 100 TB.
        "entity_resolution(q225 composition)": lambda: _entity_resolution(
            driver_path_max_edges=1_000_000
        ),
        "entity_resolution(distributed min-label)": lambda: _entity_resolution(
            driver_path_max_edges=0
        ),
    }
    # --- round-6 tranche-4 surfaces: UDTF, recursive CTE, python source ---
    from iotgp_func_raw_data_ingest_spark.operators.udtfs import register_udtfs
    from iotgp_func_raw_data_ingest_spark.sources.pydatasource import (
        register_python_datasources,
    )

    register_udtfs(spark)
    register_python_datasources(spark)
    docs.createOrReplaceTempView("stress_docs")

    # same 40-char tiling through the Arrow UDTF and through pure JVM
    # sequence+explode — the measured basis for udtfs.py's "the all-JVM
    # equivalent is still faster for plain tiling" steering note
    def _chunk_udtf():
        return spark.sql(
            "SELECT d.doc_id, c.chunk_id, c.chunk_len "
            "FROM stress_docs d, LATERAL chunk_text(d.text, 40, 40) c"
        )

    def _chunk_jvm():
        return spark.sql(
            "SELECT doc_id, "
            "explode(transform(sequence(0, int(ceil(length(text)/40)) - 1), "
            "        i -> substr(text, i*40 + 1, 40))) AS chunk "
            "FROM stress_docs"
        )

    def _recursive_walk():
        # the walk emits one row per key: lift the 1e6-row recursion
        # guard (RECURSION_ROW_LIMIT_EXCEEDED at this tier otherwise)
        spark.conf.set("spark.sql.cteRecursionRowLimit", str(4 * n_docs))
        spark.range(n_docs).createOrReplaceTempView("stress_keys")
        return spark.sql(
            """
            WITH RECURSIVE walk AS (
                SELECT id AS k, 0 AS depth FROM stress_keys WHERE id < 10
                UNION ALL
                SELECT s.id, w.depth + 1
                FROM stress_keys s JOIN walk w ON w.k = s.id DIV 10
                WHERE s.id >= 10
            )
            SELECT * FROM walk
            """
        )

    pyds_dir = os.path.join("/tmp", f"stress_pyds_{n_docs}")
    docs.coalesce(1).write.mode("overwrite").parquet(pyds_dir)
    pyds_file = next(
        os.path.join(pyds_dir, f)
        for f in os.listdir(pyds_dir)
        if f.endswith(".parquet")
    )

    ops.update(
        {
            "chunk_text_udtf(40-char tiles)": _chunk_udtf,
            "chunk_jvm_explode(40-char tiles)": _chunk_jvm,
            "recursive_cte_walk(depth~log10 n)": _recursive_walk,
            "pyds_rowgroup_scan(arrow batches)": lambda: (
                spark.read.format("parquet_rowgroups")
                .option("path", pyds_file)
                .option("columns", "doc_id,text")
                .load()
            ),
        }
    )

    # --- round-9: file-pruned MERGE vs full-rewrite MERGE ---
    # Two identical n-row targets, RANGE-clustered on the key into 64
    # files (the production CDC shape: recent keys live together), then
    # the same ~1% tail-of-keyspace CDC batch (updates + deletes +
    # inserts) merged through each variant. The comparison the tier
    # exists for: the pruned wall is bounded by the TOUCHED files (the
    # range pre-filter + manifest semi-join land on 1–2 of 64), the full
    # rewrite's by the whole route. Builders are eager maintenance
    # actions — wall covers the whole merge; the shuffle column audits
    # only the trivial 1-row report plan (the merges' own shuffles are
    # the point of the wall number, printed per-run below).
    import shutil as _shutil

    from iotgp_func_raw_data_ingest_spark.sources.lake import (
        merge_lake_table,
        merge_lake_table_pruned,
    )

    merge_work = os.path.join("/tmp", f"stress_merge_{n_docs}")
    # setup gate must mirror the run loop's `name_filter in name` test —
    # a filter like "pruned" runs a merge tier, so it must also seed the
    # targets ("merge" in name_filter would skip them and crash the tier)
    _merge_tier_names = (
        "merge_full_rewrite(1% CDC batch)",
        "merge_pruned(1% CDC batch)",
        "cdc_apply_stream(3 micro-batches)",
        "snapshot_feed(1% CDC delta)",
        "cdc_tombstones(3 batches + expiry)",
    )
    if not name_filter or any(name_filter in n for n in _merge_tier_names):
        _shutil.rmtree(merge_work, ignore_errors=True)
        # Rows carry a ~384-char high-entropy payload (six salted sha2
        # hex digests, ~800 MB logical at 2M rows): merge cost is per
        # BYTE COPIED, and narrow 3-column rows at 2M are
        # fixed-overhead-bound on 32 cores — both variants would clock
        # ~4s and the comparison would show nothing. The
        # poorly-compressible payload makes the carried-copy economics
        # visible: the full rewrite must read, join and rewrite all of
        # it; the pruned variant only the 1–2 affected files.
        payload = F.concat(
            *[
                F.sha2(F.concat(F.col("id").cast("string"), F.lit(str(i))), 256)
                for i in range(6)
            ]
        )
        merge_target = spark.range(n_docs).select(
            F.col("id").alias("k"),
            (F.col("id") % 64).cast("string").alias("seg"),
            (F.col("id") % 9973).cast("double").alias("bal"),
            payload.alias("payload"),
        )
        for variant in ("full", "pruned", "cdc", "feed", "tomb"):
            merge_target.repartitionByRange(64, "k").write.parquet(
                f"{merge_work}/{variant}/curated/crm/accounts"
            )

    merge_reports: dict[str, dict] = {}

    def _merge_stress(variant: str):
        lake = f"{merge_work}/{variant}"
        route = f"{lake}/curated/crm/accounts"
        # snapshot the route's physical files: bytes present AFTER the
        # merge in files that did not exist BEFORE it = bytes the merge
        # actually wrote into the route — the direct "cost ∝ touched
        # data" witness (wall time carries multi-job overhead for both)
        before_files = {
            f: os.path.getsize(os.path.join(route, f))
            for f in os.listdir(route)
            if f.startswith("part-")
        }
        upd = spark.range(int(n_docs * 0.99), n_docs).select(
            F.col("id").alias("k"),
            F.lit("cdc").alias("seg"),
            (F.col("id") % 9973).cast("double").alias("bal"),
        )
        ins = spark.range(n_docs, n_docs + n_docs // 200).select(
            F.col("id").alias("k"),
            F.lit("ins").alias("seg"),
            F.lit(2.0).alias("bal"),
        )
        src = upd.unionByName(ins)
        mcfg = EngineConfig(output_path=lake, max_batch_size=500_000)
        kwargs = dict(
            matched_update={"bal": "ROUND(s.bal + 1.0, 2)"},
            matched_delete_condition="t.bal > 9000",
        )
        if variant in ("pruned", "feed"):
            rep = merge_lake_table_pruned(
                spark, lake, "curated", "crm", "accounts",
                src, ["k"], mcfg, **kwargs,
            )
        else:
            b, a = merge_lake_table(
                spark, lake, "curated", "crm", "accounts",
                src, ["k"], mcfg, **kwargs,
            )
            rep = {"rows_before": b, "rows_after": a}
        rewritten = sum(
            os.path.getsize(os.path.join(route, f))
            for f in os.listdir(route)
            if f.startswith("part-") and f not in before_files
        )
        rep["mb_rewritten"] = round(rewritten / 1e6)
        merge_reports[variant] = dict(rep)
        print(f"  merge[{variant}]: {rep}", flush=True)
        return spark.createDataFrame([{k2: int(v) for k2, v in rep.items()}])

    def _cdc_stream_stress():
        """The CONTINUOUS form of the pruned-merge tier: three
        temporally-clustered CDC micro-batches (each a contiguous ~0.33%
        key slice of the tail, plus inserts and absent-key tombstones)
        applied through streaming.pipeline.start_cdc_merge_stream. The
        witness is the same as merge_pruned's — total bytes physically
        rewritten across all batches stays a small multiple of the
        touched slice, never of the route — plus the per-batch overhead
        being flat (each batch pays one PLAN scan + staged replace).
        Runs with persist_seq=True (the recommended production mode,
        r10): the route-persisted _seq guard adds one comparison per
        matched row inside the merge projection and 8 bytes/row to the
        rewritten slice — the witness shows that staying touched-slice
        sized."""
        from iotgp_func_raw_data_ingest_spark.plans.streaming_queries2 import (
            _write_ordered_tranches,
        )
        from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
            start_cdc_merge_stream,
        )

        lake = f"{merge_work}/cdc"
        route = f"{lake}/curated/crm/accounts"
        before_files = {
            f for f in os.listdir(route) if f.startswith("part-")
        }
        slice_w = n_docs // 300  # ~0.33% of keyspace per batch
        tranches = []
        for i in range(3):
            lo = n_docs - (3 - i) * slice_w
            upd = spark.range(lo, lo + slice_w).select(
                F.col("id").alias("k"),
                F.lit("cdc").alias("seg"),
                (F.col("id") % 9973).cast("double").alias("bal"),
                F.when(F.col("id") % 9973 > 9000, "d").otherwise("u").alias("op"),
                (F.col("id") * 10 + i).alias("seq"),
            )
            ins = spark.range(
                n_docs + i * (n_docs // 600), n_docs + (i + 1) * (n_docs // 600)
            ).select(
                F.col("id").alias("k"),
                F.lit("ins").alias("seg"),
                F.lit(2.0).alias("bal"),
                F.lit("c").alias("op"),
                (F.col("id") * 10 + i).alias("seq"),
            )
            tomb = spark.range(
                3 * n_docs + i * 100, 3 * n_docs + i * 100 + 100
            ).select(  # absent keys: must no-op, not insert tombstones
                F.col("id").alias("k"),
                F.lit(None).cast("string").alias("seg"),
                F.lit(None).cast("double").alias("bal"),
                F.lit("d").alias("op"),
                (F.col("id") * 10 + i).alias("seq"),
            )
            tranches.append(upd.unionByName(ins).unionByName(tomb))
        in_dir = f"{merge_work}/cdc_in"
        _write_ordered_tranches(tranches, in_dir)
        schema = tranches[0].schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        mcfg = EngineConfig(output_path=lake, max_batch_size=500_000)
        q = start_cdc_merge_stream(
            stream, lake, "curated", "crm", "accounts",
            ["k"], "seq", mcfg, f"{merge_work}/cdc_ckpt",
            persist_seq=True,
        )
        q.awaitTermination()
        rewritten = sum(
            os.path.getsize(os.path.join(route, f))
            for f in os.listdir(route)
            if f.startswith("part-") and f not in before_files
        )
        rep = {
            "batches": 3,
            "mb_rewritten": round(rewritten / 1e6),
            "rows_after": spark.read.parquet(route).count(),
        }
        merge_reports["cdc_stream"] = dict(rep)
        print(f"  cdc_stream: {rep}", flush=True)
        return spark.createDataFrame([{k2: int(v) for k2, v in rep.items()}])

    def _feed_stress():
        """Change-data-feed economics over the generation ledger: the
        pruned merge's EXACT batch runs against a fourth identical
        payload route that was snapshot-ENABLED first, so the merge
        publishes generation 2 and retires the replaced originals. The
        feed (read_changes_between 1→2) then pays for the DELTA only:
        diff_generations resolves two JSONs (no listing, no scan) and
        the multiset diff reads just the added+removed files. Witness:
        bytes OPENED by the feed vs the route's live bytes — the
        incremental consumer's cost model at 100 TB — plus feed-only
        wall; the harness row's shuffle column audits the exceptAll
        plan itself (delta-sized, never route-sized)."""
        from iotgp_func_raw_data_ingest_spark.sources import snapshots as snap

        lake = f"{merge_work}/feed"
        route = f"{lake}/curated/crm/accounts"
        snap.enable_snapshots(spark, route)
        _merge_stress("feed")  # publishes gen 2, retires originals

        d = snap.diff_generations(spark, route, 1, 2)

        def _size(name: str) -> int:
            for p in (
                os.path.join(route, name),
                os.path.join(route, "_retired", name),
            ):
                if os.path.exists(p):
                    return os.path.getsize(p)
            raise FileNotFoundError(name)

        opened = sum(_size(n) for n in d["added"] + d["removed"])
        live = sum(
            os.path.getsize(os.path.join(route, f))
            for f in os.listdir(route)
            if f.startswith("part-")
        )
        t0 = time.perf_counter()
        feed = snap.read_changes_between(spark, route, 1, 2, key_cols=["k"])
        n_changes = feed.count()
        feed_wall = time.perf_counter() - t0
        rep = {
            "feed_rows": n_changes,
            "files_opened": len(d["added"]) + len(d["removed"]),
            "files_shared_never_opened": len(d["shared"]),
            "mb_opened": round(opened / 1e6),
            "mb_route_live": round(live / 1e6),
            "feed_wall_s": round(feed_wall, 1),
        }
        merge_reports["snapshot_feed"] = dict(rep)
        print(f"  snapshot_feed: {rep}", flush=True)
        # return the feed plan itself so the harness audits ITS shuffle
        return snap.read_changes_between(spark, route, 1, 2, key_cols=["k"])

    def _tombstone_stress():
        """Tombstone-retention economics (retain_tombstones=True): the
        cdc_apply_stream tier's exact batch shapes — tail-slice
        updates+deletes, inserts, absent-key tombstones — applied with
        soft deletes, then an expire_tombstones pass at a horizon
        covering every tombstone. Witnesses: (a) the stream's total
        physical rewrite stays touched-slice sized with the _deleted
        marker added (vs cdc_stream's — the mode costs one boolean
        column, not new physics); (b) the expiry's staged replace
        rewrites ONLY tombstone-bearing files (files_rewritten vs
        files_total, MB), the retention job's 100 TB cost model."""
        from iotgp_func_raw_data_ingest_spark.plans.streaming_queries2 import (
            _write_ordered_tranches,
        )
        from iotgp_func_raw_data_ingest_spark.sources.maintenance import (
            expire_tombstones,
        )
        from iotgp_func_raw_data_ingest_spark.streaming.pipeline import (
            start_cdc_merge_stream,
        )

        lake = f"{merge_work}/tomb"
        route = f"{lake}/curated/crm/accounts"
        before_files = {
            f for f in os.listdir(route) if f.startswith("part-")
        }
        slice_w = n_docs // 300
        tranches = []
        for i in range(3):
            lo = n_docs - (3 - i) * slice_w
            upd = spark.range(lo, lo + slice_w).select(
                F.col("id").alias("k"),
                F.lit("cdc").alias("seg"),
                (F.col("id") % 9973).cast("double").alias("bal"),
                F.when(F.col("id") % 9973 > 9000, "d").otherwise("u").alias("op"),
                (F.col("id") * 10 + i).alias("seq"),
            )
            tomb = spark.range(
                3 * n_docs + i * 100, 3 * n_docs + i * 100 + 100
            ).select(  # absent keys: now INSERT tombstone marker rows
                F.col("id").alias("k"),
                F.lit(None).cast("string").alias("seg"),
                F.lit(None).cast("double").alias("bal"),
                F.lit("d").alias("op"),
                (F.col("id") * 10 + i).alias("seq"),
            )
            tranches.append(upd.unionByName(tomb))
        in_dir = f"{merge_work}/tomb_in"
        _write_ordered_tranches(tranches, in_dir)
        stream = (
            spark.readStream.schema(tranches[0].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        mcfg = EngineConfig(output_path=lake, max_batch_size=500_000)
        q = start_cdc_merge_stream(
            stream, lake, "curated", "crm", "accounts",
            ["k"], "seq", mcfg, f"{merge_work}/tomb_ckpt",
            persist_seq=True, retain_tombstones=True,
        )
        q.awaitTermination()
        stream_rewritten = sum(
            os.path.getsize(os.path.join(route, f))
            for f in os.listdir(route)
            if f.startswith("part-") and f not in before_files
        )
        pre_expire_files = {
            f for f in os.listdir(route) if f.startswith("part-")
        }
        t0 = time.perf_counter()
        exp = expire_tombstones(spark, route, horizon_seq=10 * 10 * n_docs)
        expire_wall = time.perf_counter() - t0
        expire_rewritten = sum(
            os.path.getsize(os.path.join(route, f))
            for f in os.listdir(route)
            if f.startswith("part-") and f not in pre_expire_files
        )
        rep = {
            "mb_rewritten_stream": round(stream_rewritten / 1e6),
            "tombstones_removed": exp["tombstones_removed"],
            "expire_files_rewritten": exp["files_rewritten"],
            "expire_files_total": exp["files_total"],
            "mb_rewritten_expire": round(expire_rewritten / 1e6),
            "expire_wall_s": round(expire_wall, 1),
            "rows_after": spark.read.option("mergeSchema", "true")
            .parquet(route).count(),
        }
        merge_reports["cdc_tombstones"] = dict(rep)
        print(f"  cdc_tombstones: {rep}", flush=True)
        return spark.createDataFrame([{k2: int(v) for k2, v in rep.items()}])

    ops.update(
        {
            "merge_full_rewrite(1% CDC batch)": lambda: _merge_stress("full"),
            "merge_pruned(1% CDC batch)": lambda: _merge_stress("pruned"),
            "cdc_apply_stream(3 micro-batches)": _cdc_stream_stress,
            "snapshot_feed(1% CDC delta)": _feed_stress,
            "cdc_tombstones(3 batches + expiry)": _tombstone_stress,
        }
    )

    rows = []
    for name, build in ops.items():
        if name_filter and name_filter not in name:
            continue
        # audit the COUNTING plan itself: .count() runs a separate query
        # execution, so metrics must be read off the plan that actually
        # executed (same upstream shuffle stages, final projection pruned).
        # build() runs INSIDE the timed span: most builders are lazy
        # (plan-only, ~ms), but the ER composition's clusterer probes its
        # edge relation eagerly — timing collect() alone would silently
        # exclude the FastSS join it composes over.
        t0 = time.perf_counter()
        counted = build().agg(F.count(F.lit(1)).alias("n"))
        n_out = counted.collect()[0]["n"]
        wall = time.perf_counter() - t0
        t = audit_plan(counted._jdf.queryExecution().executedPlan())
        rows.append((name, n_out, wall, t))
        print(f"{name}: {n_out} rows, {wall:.1f}s, "
              f"{t['bytes_written']/1e6:.1f}MB shuffled, "
              f"{t['spill']/1e6:.1f}MB spilled", flush=True)

    mult = n_docs / 50_000  # sf0.1 documents table ≈ 50k docs
    lines = [
        f"# STRESS — heavy operators at ~{mult:.0f}× the largest driver SF",
        "",
        f"Generated by `tools/stress_smoke.py` with n_docs={n_docs} "
        "(synthetic seeded corpus, 2% near-duplicates, generated "
        "executor-side), local[32], shuffle_partitions=32.",
        "",
        "| operator | output rows | wall s | shuffle stages | MB written | MB read | spill MB |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, n_out, wall, t in rows:
        lines.append(
            f"| {name} | {n_out} | {wall:.1f} | {t['stages']} | "
            f"{t['bytes_written']/1e6:.1f} | {t['bytes_read']/1e6:.1f} | "
            f"{t['spill']/1e6:.1f} |"
        )
    lines += [
        "",
        "Interpretation: pair operators' shuffle volume is set by the",
        "shingle/banded inverted index (fixed-width hashed keys), not by",
        "pairwise combinations — the design that keeps them viable at",
        "100 TB. Spill > 0 would mean a partition outgrew memory and the",
        "partitioning needs work. The 32-bit vs 64-bit SimHash rows show",
        "band cardinality at work: identical shuffle volume, but the",
        "32-bit variant's 1024 buckets stream O(n²/1024) candidate rows",
        "through the join (pure compute, no memory risk) while the",
        "64-bit variant's 262k buckets cut that ~64× — the documented",
        "crossover for choosing simhash64_pairs at scale.",
        "",
        "fastss_d2's depth-2 deletion index is ~170 variants/key (≈340M",
        "narrow hashed rows at 2M keys); earlier rounds sorted it through",
        "the session's fixed partition count and measured 16.6 GB of",
        "bounded sort spill. The operator now sizes its own sort: a",
        "single-row agg prices the index exactly (1 + L + L(L-1)/2 per",
        "key) and hash-repartitions the (id, hash) relation on the join",
        "key at ~2M rows per partition, which the pinned sort-merge",
        "self-join reuses on both sides (one exchange) — per-partition",
        "sorts fit in memory at any corpus size. Measured effect of the",
        "fix at this tier: 167.1s / 16,643 MB spilled (r5) → 62.2s /",
        "0.0 MB spilled, identical 147,616 output rows.",
        "",
        "dedup_against_ledger runs a 5% increment against the other 95%",
        "as the history ledger: its shuffle is the increment's banded",
        "buckets + the ledger's (both fixed-width hashed rows) and the",
        "verify join moves only signature rows for surviving candidates —",
        "compare its wall/shuffle to minhash_lsh_pairs over the same",
        "corpus to see the increment-sized (not history-sized) cost the",
        "daily-dedup workload needs.",
        "",
        "entity_resolution composes the q225 pipeline end-to-end: the",
        "FastSS candidate join feeds connected components, whose labels",
        "join back to the entity slice for the survivorship window +",
        "rollup. The edge relation is cached once (the inverted-index",
        "join never re-executes for the clusterer's probe or rounds), so",
        "the composition's cost over fastss_d2 alone is the components",
        "pass plus one labels join + one cluster-partitioned window —",
        "no new shuffle class. Both variants are measured: the driver",
        "union-find (edge sets are derived metadata, ~orders smaller",
        "than the corpus) and the forced distributed min-label fallback,",
        "the shape that must hold when edges outgrow the 1M driver bound",
        "at 100 TB — its per-round shuffle is sized by edges, never by",
        "the corpus. Wall time covers the whole composition (the edge",
        "probe executes the FastSS join eagerly, inside the timed span);",
        "the shuffle/spill columns audit the final counted plan — the",
        "FastSS join's own shuffle/spill is the fastss_d2 row (same",
        "corpus, same operator, measured zero).",
        "",
        "The sketch tiers run in APPROXIMATE mode here (every group far",
        "exceeds the sketches' exact thresholds — KLL k=2048 items,",
        "Theta 4096 nominal entries), so they price the compaction path:",
        "shuffle is groups × fixed sketch width regardless of row count.",
        "expectations_battery fuses its five row-level checks into one",
        "scan (conditional counters); only uniqueness (groupBy uid) and",
        "the FK anti-join pay shuffles. pagerank's per-iteration cost is",
        "one |E|-sized join + groupBy on the banded simhash64 edge",
        "relation — three iterations declared as one Catalyst plan.",
        "",
        "The probabilistic-filter tiers (q192/q193/q194 operators) prove",
        "their bounded-relation contracts at volume: the CMS build's only",
        "shuffle is capped at depth × width cells however many rows feed",
        "it (map-side partials absorb the stream), the bloom filter at",
        "n_bits distinct positions, and the PQ path scores the whole",
        "corpus from (id, sub, code) rows — n_sub small ints per vector —",
        "with codebooks and per-query distance tables broadcast.",
        "",
        "The extension-surface tiers price the Python boundary against",
        "the JVM fast path. chunk_text_udtf vs chunk_jvm_explode run the",
        "IDENTICAL 40-char tiling: both are shuffle-free scan-stage",
        "expansions, and the wall-clock gap is purely the Arrow",
        "round-trip — the measured basis for operators/udtfs.py's rule",
        "(plain tiling belongs in sequence+explode; the UDTF earns its",
        "keep when splitting logic outgrows SQL). recursive_cte_walk's",
        "union-loop pays one frontier join per digit of the key space —",
        "depth stages of shuffle sized by the frontier, never the",
        "closure; note spark.sql.cteRecursionRowLimit (default 1e6)",
        "FAILS the query once the accumulated output passes it — size it",
        "to the traversed relation (measured: the 2M walk trips the",
        "default). pyds_rowgroup_scan reads the corpus back through the",
        "Python DataSource (pyarrow, RecordBatch yields): columnar",
        "batches make the custom source's overhead a near-constant",
        "factor over the native scan, not a per-row tax.",
        "",
        "The merge tiers (r9) run the SAME ~1% tail-of-keyspace CDC batch",
        "(updates + conditional deletes + inserts) against two identical",
        "range-clustered 64-file targets whose rows carry a ~384-char",
        "high-entropy payload (~800 MB at 2M rows — merge cost is per",
        "byte COPIED; narrow rows would leave both variants",
        "fixed-overhead-bound and show nothing). merge_full_rewrite pays",
        "the carried-copy economics: every byte of the route flows",
        "through the full-outer join and is rewritten. merge_pruned's",
        "PLAN step (min/max range pre-filter pushed to parquet footers +",
        "broadcast semi-join on input_file_name) confines the join and",
        "the rewrite to the 1–2 files actually holding CDC keys, plus",
        "inserts — its wall is bounded by touched data, the property that",
        "keeps a small CDC merge a bounded maintenance action on a 100 TB",
        "route. Both builders are eager lake lifecycles, so their wall",
        "times are the measurement and the shuffle column (auditing only",
        "the 1-row report plan) reads ~0 by construction. The decisive",
        "witness is bytes PHYSICALLY WRITTEN into the route (new part",
        "files' sizes, measured off the filesystem):",
        "",
    ] + [
        f"- merge[{v}]: {merge_reports[v]}"
        for v in ("full", "pruned")
        if v in merge_reports
    ] + [
        "",
        "cdc_apply_stream is the CONTINUOUS form of merge_pruned: three",
        "temporally-clustered micro-batches (each a contiguous ~0.33% key",
        "slice of the tail, plus inserts and 100 absent-key tombstones",
        "that must no-op) applied through",
        "streaming.pipeline.start_cdc_merge_stream over the same",
        "range-clustered 64-file payload route. Its bytes-rewritten total",
        "is the sum of three touched-slice replacements — bounded by CDC",
        "locality per batch, never by route size — and the committed-batch",
        "ledger plus per-batch PLAN/STAGE/COMMIT overhead is the flat",
        "per-batch cost a steady trickle pays. Runs with persist_seq=True",
        "(r10): the route-persisted _seq out-of-order guard adds one",
        "comparison per matched row and 8 bytes/row to the rewritten",
        "slice — the totals below show the pruning economics unchanged:",
        "",
    ] + [
        f"- {k}: {merge_reports[k]}"
        for k in ("cdc_stream",)
        if k in merge_reports
    ] + [
        "",
        "snapshot_feed (r10) runs merge_pruned's exact batch against a",
        "fourth identical route that was snapshot-ENABLED first, so the",
        "merge publishes generation 2 and retires replaced originals.",
        "read_changes_between(1, 2) then computes the net row-level",
        "change feed: diff_generations opens two JSON manifests (no",
        "listing, no scan) and names the added+removed files; the",
        "multiset diff (exceptAll) reads ONLY those, cancelling the",
        "carried rewrite ballast. The witness is bytes OPENED by the",
        "feed vs the route's live bytes — the incremental consumer",
        "pays ∝ delta, never a table re-scan (its harness row's",
        "shuffle column audits the exceptAll plan itself):",
        "",
    ] + [
        f"- {k}: {merge_reports[k]}"
        for k in ("snapshot_feed",)
        if k in merge_reports
    ] + [
        "",
        "cdc_tombstones (r11) re-runs the cdc_apply_stream shapes with",
        "retain_tombstones=True (soft deletes: winning deletes become",
        "marker rows, absent-key deletes INSERT tombstones) and then an",
        "expire_tombstones pass at a horizon covering every tombstone.",
        "Two witnesses: the stream's physical rewrite equals the plain",
        "cdc_stream tier's (the mode costs one boolean column, not new",
        "physics), and the expiry's staged replace rewrites ONLY the",
        "tombstone-bearing files — the retention job's cost model at",
        "100 TB (its PLAN predicate pushes EqualTo(_deleted,true) +",
        "the _seq range into the parquet scan, so all-live files are",
        "skipped on footer stats):",
        "",
    ] + [
        f"- {k}: {merge_reports[k]}"
        for k in ("cdc_tombstones",)
        if k in merge_reports
    ] + [
        "",
    ]
    if name_filter:
        print("name filter active — not writing STRESS.md")
        return 0
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "STRESS.md"
    )
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
