"""pyspark.ml-backed LSH variants (SURVEY.md §7.2 item 7).

Alternative backends for near-dup detection and ANN using MLlib's
``MinHashLSH`` and ``BucketedRandomProjectionLSH``. The native
implementations in operators/dedup.py and operators/similarity.py are
the primary path (transparent, oracle-replayable); these exist for
parity with the MLlib ecosystem and for workloads already standardized
on ml.Vector columns.

Import of pyspark.ml is deferred so environments without MLlib native
deps still import the package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators.dedup import word_shingles


def minhash_lsh_pairs_ml(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hash_tables: int = 8,
    max_jaccard_distance: float = 0.7,
) -> DataFrame:
    """Near-dup pairs via MLlib MinHashLSH over hashed shingle vectors.

    Returns (id_a, id_b, jaccard_distance ≤ max). Distance = 1 − Jaccard
    estimated over the hashed feature space (HashingTF buckets), so
    values differ slightly from exact set Jaccard — use the native
    operators for oracle-grade numbers.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, k).alias("shingles")
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(sh)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, max_jaccard_distance, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
    )


def ann_neighbors_ml(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Approx nearest neighbors (euclidean) via BucketedRandomProjectionLSH."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    feats = df.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = brp.fit(feats)
    return model.approxNearestNeighbors(feats, Vectors.dense(query_vec), k).select(
        "id", F.round("distCol", 6).alias("euclidean_dist")
    )
