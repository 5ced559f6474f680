"""Round-6 tranche 4: the Spark-4-native SQL surfaces the registry did
not yet exercise, each under the full driver hash gate.

- q198: **recursive CTE** (``WITH RECURSIVE``, new in Spark 4.x) —
  hierarchy traversal as a declarative fixpoint, the SQL-standard twin
  of the engine's iterative label-propagation (q69) and PageRank
  (q188) loops.
- q199: **VariantType JSON** (``parse_json`` / ``variant_get`` /
  ``try_variant_get``) — the binary semi-structured encoding that
  replaces schema-on-read ``get_json_object`` string re-parsing.
- q200: **Python UDTF** (``operators/udtfs.ChunkText``) — lateral
  row-expansion through the Arrow-batched table-function API.
- q201: **Python DataSource API, batch**
  (``sources/pydatasource.ParquetRowGroupDataSource``) — a custom
  batch source with row-group partition planning and Arrow-batch
  reads, verified row-exact against DuckDB reading the same file.
- q202: **Python DataSource API, streaming**
  (``sources/pydatasource.ParquetReplayStreamSource``) — a custom
  micro-batch stream source (driver-planned row-range offsets,
  executor-side partition reads) drained twice against one checkpoint
  and verified row-exact against the batch read.

- q203: **statestore reader**, q204: **SQL pipe syntax** (below).
- q207: **Observation API** — exact job-accounting metrics collected
  ON the write pass itself, no second scan.
- q208: **native XML codec** (``to_xml`` / ``from_xml``, Spark 4) —
  the envelope-codec surface extended beyond JSON.

Reference parity: the reference has none of these extension points —
its JSON handling is eager ``json.loads``
(``/root/reference/src/function_app.py:120-160``) and its input layer
a driver-side pyarrow loop (ibid.:230-260).  These queries are the
Spark-idiomatic generalizations of both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.plans.registry import prep, register


@register(
    "q198_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE chain AS (
        SELECT c_custkey AS custkey, c_custkey AS root, 0 AS depth,
               c_acctbal AS acctbal
        FROM customer WHERE c_custkey < 10
        UNION ALL
        SELECT c.c_custkey, ch.root, ch.depth + 1, c.c_acctbal
        FROM customer c JOIN chain ch ON ch.custkey = c.c_custkey // 10
        WHERE c.c_custkey >= 10
    )
    SELECT root, depth,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(SUM(acctbal), 2) AS sum_acctbal
    FROM chain GROUP BY root, depth
    """,
)
def q198_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE hierarchy rollup (WITH RECURSIVE, Spark 4.x).

    The customer table is given a synthetic but deterministic forest
    structure — parent(k) = k div 10, roots are custkey < 10 — and a
    recursive CTE walks every chain to its root, tagging each customer
    with (root, depth); the outer query rolls up member count and
    account balance per (root, depth) stratum.  This is the org-chart /
    BOM-explosion query shape, expressed as the SQL-standard fixpoint
    instead of a hand-written driver loop.

    Gate: both engines implement SQL-standard recursion (the working
    table is the PREVIOUS iteration only), so each customer must appear
    exactly once at its unique depth; a re-visited row, a lost
    iteration, or off-by-one depth all flip counts or sums.

    100 TB shape: each recursion level is one hash join of the frontier
    against the (pruned) child relation — Spark plans it as an
    iterative union-loop with the same join machinery as q05; depth is
    log_10(|customers|), so the plan is O(depth) stages, each
    shuffle-bounded by the frontier size, never materializing the
    closure beyond the running union. For unbounded-depth graphs the
    iterative min-label operator (operators/graph.py) with its
    localCheckpoint-per-iteration remains the scale path; the CTE is
    the declarative option for bounded hierarchies (categories,
    orgs, threads).

    Foot-gun guard, measured at the 2M stress tier: Spark caps the
    accumulated recursion output at spark.sql.cteRecursionRowLimit
    (default 1e6 rows) and FAILS the query past it
    (RECURSION_ROW_LIMIT_EXCEEDED) — a forest walk emits one row per
    key, so the limit must cover |customer| + slack (one footer-only
    count). The conf is read at ACTION time, not plan-build time
    (probed: building under a large limit then collecting under a small
    one fails), so a build-scoped try/finally restore would break the
    later execution — instead the limit is RATCHETED: raised to the
    relation size only when the current value is too small, never
    lowered. Small-SF runs therefore leave the session conf untouched
    (the 1e6 default already covers them — zero session mutation), and
    a big-walk run can never strand a too-small bound for a later
    query; the only residue is a guard that is larger than a later
    tiny query strictly needs, which still trips on any runaway
    recursion of real magnitude (r6 ADVICE cross-talk closed)."""
    t = prep(spark, sf_dir)
    n_customers = t["customer"].count()
    needed = n_customers + 1024
    current = int(spark.conf.get("spark.sql.cteRecursionRowLimit", "1000000"))
    if needed > current:
        spark.conf.set("spark.sql.cteRecursionRowLimit", str(needed))
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
            SELECT c_custkey AS custkey, c_custkey AS root, 0 AS depth,
                   c_acctbal AS acctbal
            FROM customer WHERE c_custkey < 10
            UNION ALL
            SELECT c.c_custkey, ch.root, ch.depth + 1, c.c_acctbal
            FROM customer c JOIN chain ch ON ch.custkey = c.c_custkey DIV 10
            WHERE c.c_custkey >= 10
        )
        SELECT root, depth,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               ROUND(SUM(acctbal), 2) AS sum_acctbal
        FROM chain GROUP BY root, depth
        """
    )


@register(
    "q199_variant_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.missing')
                         IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events GROUP BY event_type
    """,
)
def q199_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via VariantType (Spark 4.x).

    ``parse_json`` decodes the events' JSON props column once into the
    binary Variant encoding; ``variant_get`` extracts typed paths
    without string re-parsing, and ``try_variant_get`` exercises the
    null-on-absent-path contract (counted per group as ``n_missing``).
    Versus the legacy ``get_json_object`` (q91 territory) the Variant
    path is a typed, shreddable encoding — the 100 TB reason to use it:
    Variant columns persist in parquet with shredded sub-columns, so a
    ``$.k`` read back from the lake prunes to one physical column
    instead of re-parsing every JSON string on every query.

    Gate: typed extraction (`'$.k'` as bigint) must agree exactly with
    DuckDB's JSON path extraction; sum/max are integer-exact, no float
    rounding involved."""
    t = prep(spark, sf_dir)
    t["events"]
    return spark.sql(
        """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(variant_get(parse_json(props), '$.k', 'bigint'))
                    AS BIGINT) AS sum_k,
               CAST(MAX(variant_get(parse_json(props), '$.k', 'bigint'))
                    AS BIGINT) AS max_k,
               CAST(SUM(CASE WHEN try_variant_get(parse_json(props),
                                                  '$.missing', 'bigint')
                             IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_missing
        FROM events GROUP BY event_type
        """
    )


@register(
    "q200_udtf_chunking",
    oracle="""
    WITH starts AS (
        SELECT doc_id, text,
               unnest(generate_series(1, length(text), 200)) AS start
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST((start - 1) // 200 AS INT) AS chunk_id,
           md5(substr(text, start, 200)) AS chunk_md5,
           CAST(length(substr(text, start, 200)) AS INT) AS chunk_len
    FROM starts
    """,
)
def q200_udtf_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking through a lateral Python UDTF.

    ``chunk_text(text, 200, 200)`` (operators/udtfs.py, Arrow-batched)
    expands each document into contiguous 200-char training chunks via
    the Spark 4 table-function API; the outer projection fingerprints
    each chunk JVM-side (md5) so the gate verifies chunk CONTENT, not
    just counts — any off-by-one in the window arithmetic or a
    truncated tail chunk flips a hash.

    Oracle: DuckDB tiles the same windows with generate_series +
    substr; both engines hash UTF-8 bytes, and the corpus is ASCII, so
    Python slicing and SQL substr agree character-for-character.

    100 TB shape: the UDTF runs inside the scan stage (no shuffle,
    PyRow stays 0 JVM-side — the Python stage is the Arrow-batched
    expander itself); output volume = corpus × size/stride. The plan
    docstring in operators/udtfs.py records when to prefer the all-JVM
    sequence+explode equivalent."""
    from iotgp_func_raw_data_ingest_spark.operators.udtfs import register_udtfs

    t = prep(spark, sf_dir)
    register_udtfs(spark)
    t["documents"]
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id,
               md5(c.chunk_text) AS chunk_md5,
               c.chunk_len
        FROM documents d,
             LATERAL chunk_text(d.text, 200, 200) c
        WHERE d.text IS NOT NULL
        """
    )


@register(
    "q201_python_datasource",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q201_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a custom Python DataSource scan.

    events.parquet is read through ``parquet_rowgroups``
    (sources/pydatasource.py) — the Spark 4 Python DataSource API with
    one InputPartition per parquet row group, Arrow RecordBatch reads,
    and `columns` pruning pushed into the pyarrow scan — then grouped
    per event_type.  The oracle reads the SAME file natively, so every
    lost/duplicated batch, mis-planned partition, or schema drift in
    the custom reader flips the row hash.

    The timestamp column is deliberately excluded: the reader's job
    here is the numeric/string payload, and the ts encoding drift the
    driver has shipped twice (see tables.load_table) stays the JVM
    reader's problem.

    100 TB shape: documented in sources/pydatasource.py — row-group
    granularity parallelism, columnar boundary crossing, and an
    explicit "use the JVM reader when one exists" steering note."""
    import pyspark.sql.functions as F

    from iotgp_func_raw_data_ingest_spark.sources.pydatasource import (
        register_python_datasources,
    )

    prep(spark, sf_dir)
    register_python_datasources(spark)
    df = (
        spark.read.format("parquet_rowgroups")
        .option("path", f"{sf_dir}/events.parquet")
        .option("columns", "event_id,user_id,event_type,value")
        .load()
    )
    return df.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("event_id").cast("bigint").alias("sum_event_id"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "q202_python_stream_source",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(event_id) AS BIGINT) AS min_event_id,
           CAST(MAX(event_id) AS BIGINT) AS max_event_id
    FROM events GROUP BY event_type
    """,
)
def q202_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end custom STREAMING source via the Python DataSource API.

    events.parquet is replayed through ``parquet_replay_stream``
    (sources/pydatasource.py): the driver plans row-range offsets, each
    micro-batch partition is read executor-side from only the parquet
    row groups it overlaps, and the stream is drained to a parquet sink
    with ``availableNow`` TWICE against one checkpoint — the second run
    must re-emit nothing (the offset log proves which ranges were
    consumed).  The sink is then aggregated per event_type; the oracle
    computes the same aggregate from the batch table, so a lost or
    re-emitted row range, a mis-sliced partition, or a restart replay
    flips counts or the min/max ids.

    rows_per_batch is sized to the corpus (~4 partitions at test SF) so
    the run exercises multi-partition planning, not a degenerate single
    split.

    100 TB shape: this is the pattern for ingesting a custom feed
    format Spark has no connector for — offsets are source-native
    positions (here row index; in production a ledger/sequence number),
    reads happen on executors with per-partition locality, and
    exactly-once rides the engine's offset log + idempotent sink, the
    same contract as streaming/pipeline.py's Kafka path."""
    import shutil
    import tempfile

    from iotgp_func_raw_data_ingest_spark.plans.streaming_queries3 import (
        _drain_twice,
    )
    from iotgp_func_raw_data_ingest_spark.sources.pydatasource import (
        register_python_datasources,
    )

    prep(spark, sf_dir)
    register_python_datasources(spark)
    path = f"{sf_dir}/events.parquet"
    import pyarrow.parquet as pq

    n = pq.ParquetFile(path).metadata.num_rows
    rows_per_batch = max(1, n // 4 + 1)

    work = tempfile.mkdtemp(prefix="q202_")
    try:

        def build():
            return (
                spark.readStream.format("parquet_replay_stream")
                .option("path", path)
                .option("columns", "event_id,user_id,event_type")
                .option("rows_per_batch", str(rows_per_batch))
                .load()
            )

        _drain_twice(build, f"{work}/out", f"{work}/ckpt")
        import pyspark.sql.functions as F

        out = (
            spark.read.parquet(f"{work}/out")
            .groupBy("event_type")
            .agg(
                F.count("*").cast("bigint").alias("n_events"),
                F.countDistinct("user_id").cast("bigint").alias("n_users"),
                F.min("event_id").cast("bigint").alias("min_event_id"),
                F.max("event_id").cast("bigint").alias("max_event_id"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q203_statestore_introspection",
    oracle="""
    SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id FROM events
    """,
)
def q203_statestore_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read a streaming checkpoint's STATE STORE back as a DataFrame.

    A streaming ``dropDuplicates(user_id)`` drains the events table into
    a sink, then the checkpoint's state store is opened with the
    ``statestore`` reader (Spark 4's ops-debugging data source) and the
    keyed state is returned as rows.  The dedup operator's state is by
    definition the set of distinct keys seen, so the state contents must
    hash-equal ``SELECT DISTINCT user_id`` over the batch table — a
    state row lost to eviction, a key double-inserted under a different
    grouping, or a partition of the store unreadable after the run all
    flip the gate.

    100 TB shape: this is the incident-response tool for stateful
    streams — state size investigations, skewed-key hunts (group the
    read by ``partition_id``), and offline state audits run as plain
    batch queries against the checkpoint, never touching the live
    stream. The read is partition-parallel over the store's shards."""
    import os
    import shutil
    import tempfile

    prep(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="q203_")
    try:
        # the file source wants a directory; serve the table via symlink
        os.makedirs(f"{work}/in")
        os.symlink(f"{sf_dir}/events.parquet", f"{work}/in/events.parquet")
        stream = (
            spark.readStream.schema("event_id bigint, user_id bigint")
            .parquet(f"{work}/in")
            .dropDuplicates(["user_id"])
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", f"{work}/out")
            .option("checkpointLocation", f"{work}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        state = spark.read.format("statestore").load(f"{work}/ckpt")
        out = state.select(F.col("key.user_id").cast("bigint").alias("user_id"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q204_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(AVG(l_quantity), 4) AS avg_qty
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q204_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0 ``|>`` operators): the q01-family
    pricing rollup expressed as a linear pipeline — FROM … |> WHERE …
    |> EXTEND … |> AGGREGATE … GROUP BY.  The pipe form compiles to
    the IDENTICAL physical operator set as the ANSI form — pushed
    parquet filter, partial/final HashAggregate, one exchange (asserted
    by tests/test_advanced_sql.py::test_pipe_syntax_same_physical_shape;
    the logical canonicalization differs only by the EXTEND alias, so
    ``sameSemantics`` is false while the executed plans match); the
    gate proves the new parser path computes exactly what the ANSI
    oracle does."""
    t = prep(spark, sf_dir)
    t["lineitem"]
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= DATE '1996-01-01'
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_rows,
                     ROUND(SUM(disc_price), 2) AS revenue,
                     ROUND(AVG(l_quantity), 4) AS avg_qty
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_rows, revenue, avg_qty
        """
    )


@register(
    "q207_observed_write_accounting",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           ROUND(SUM(value), 2) AS sum_value,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicks
    FROM events
    """,
)
def q207_observed_write_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ingest accounting via the Observation API — metrics
    collected ON the write job itself, zero extra scans.

    The events table is written to a parquet sink with ``df.observe``
    attaching count/sum/conditional-count accumulators to the plan; the
    observed values (collected from the SAME job that produced the
    files) are returned as the result row and gated against the oracle
    recomputing them from the table.  A partition lost by the writer, a
    task double-counted on retry (observations are exactly-once per
    successful job), or a metric computed on a different plan fragment
    all flip the row.

    100 TB shape: THE row-count/byte accounting pattern for ingest
    pipelines — the alternative (write, then re-aggregate the sink)
    costs a full second scan per batch; ``observe`` rides the write's
    own task metrics through the AccumulatorV2 channel and is free.
    The result is one row per job, driver-side by construction."""
    import shutil
    import tempfile

    from pyspark.sql import Observation

    t = prep(spark, sf_dir)
    events = t["events"]
    obs = Observation("ingest_acct")
    observed = events.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("sum_event_id"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "n_clicks"
        ),
    )
    work = tempfile.mkdtemp(prefix="q207_")
    try:
        observed.write.mode("overwrite").parquet(f"{work}/sink")
        m = obs.get
        return spark.createDataFrame(
            [
                (
                    int(m["n_rows"]),
                    int(m["sum_event_id"]),
                    float(m["sum_value"]),
                    int(m["n_clicks"]),
                )
            ],
            "n_rows bigint, sum_event_id bigint, sum_value double, n_clicks bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q208_xml_codec_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(event_id) AS BIGINT) AS sum_id,
           ROUND(SUM(ROUND(value, 2)), 2) AS sum_v2
    FROM events GROUP BY event_type
    """,
)
def q208_xml_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML envelope codec (Spark 4 ``to_xml``/``from_xml``):
    every event is serialized to an XML document and parsed back with a
    typed schema, and the parsed stream must aggregate exactly like the
    original table — a dropped element, a type coerced through text
    badly (the double rides as its shortest round-trippable repr), or
    an escaping bug all flip the sums.

    The reference's codec surface is JSON-only
    (src/function_app.py:120-160); industrial telemetry feeds are
    frequently XML, and this is that envelope path with the same
    JVM-only, no-UDF property as functions/codecs.py: both directions
    are Catalyst expressions inside the scan stage — no shuffle, no
    Python.  The pre-round to 2dp before embedding follows the registry
    float convention so the re-summed parse matches the oracle's
    arithmetic bit-for-bit."""
    t = prep(spark, sf_dir)
    events = t["events"]
    xml = events.select(
        F.to_xml(
            F.struct(
                F.col("event_id"),
                F.col("event_type"),
                F.round("value", 2).alias("v2"),
            )
        ).alias("doc")
    )
    parsed = xml.select(
        F.from_xml(
            "doc", "event_id BIGINT, event_type STRING, v2 DOUBLE"
        ).alias("p")
    ).select("p.*")
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("event_id").cast("bigint").alias("sum_id"),
        F.round(F.sum("v2"), 2).alias("sum_v2"),
    )


@register(
    "q209_collated_grouping",
    oracle="""
    SELECT lower(CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END)
               AS lang_ci,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY 1
    """,
)
def q209_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via COLLATIONS (Spark 4.0 collated
    string types), not expression rewrites.

    A deterministically mixed-case key (every even doc_id upper-cases
    its language tag) is grouped under ``COLLATE UTF8_LCASE`` — the
    engine's collation-aware hash/equality does the case folding, and
    the per-class counts must equal the oracle's ``lower()`` grouping.
    The emitted representative is normalized with lower() because a
    collated group's display value is whichever variant a partition saw
    first (engine-arbitrary by spec).

    100 TB shape: collation rides the column TYPE, so every downstream
    join/group on the column is case-insensitive without wrapping
    expressions (which would defeat column statistics and, on the join
    side, bucket pruning). The aggregate itself is an ordinary
    partial-agg groupBy."""
    t = prep(spark, sf_dir)
    t["documents"]
    return spark.sql(
        """
        WITH mixed AS (
            SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END
                       COLLATE UTF8_LCASE AS lang_key,
                   n_chars
            FROM documents
        )
        SELECT lower(lang_key) AS lang_ci,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM mixed GROUP BY lower(lang_key)
        """
    )


@register(
    "q210_approx_top_k",
    oracle="""
    SELECT event_type AS item,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY event_type
    """,
)
def q210_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter sketch via the native ``approx_top_k`` aggregate
    (Spark 4.1, DataSketches frequent-items under the hood).

    The event-type domain (5 values) sits far below the sketch's
    tracked-item capacity, so the sketch is in its EXACT regime and
    every (item, count) it reports must equal the true grouped counts —
    the same exact-below-threshold gating convention as the HLL/KLL/
    Theta queries (q180/q184/q185).  k is set above the domain size so
    no tie-at-the-boundary can make membership arbitrary.

    100 TB shape: the sketch aggregates map-side into a bounded
    structure (maxItemsTracked entries) and merges associatively — the
    streaming-friendly alternative to count-then-top-k when the key
    domain explodes; for exact audited heavy hitters over a bounded
    probe set, the CMS relation (q192) is the compositional option."""
    t = prep(spark, sf_dir)
    t["events"]
    return spark.sql(
        """
        SELECT s.item, CAST(s.count AS BIGINT) AS cnt
        FROM (
            SELECT explode(approx_top_k(event_type, 10)) AS s
            FROM events
        )
        """
    )
