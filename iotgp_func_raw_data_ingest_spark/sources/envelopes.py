"""Envelope sources: raw event bodies as a DataFrame/stream of `body` rows.

The reference consumes Event Hub events (src/function_app.py:302-310). In
Spark that surface is:

- production: ``spark.readStream.format("kafka")`` against Event Hubs'
  Kafka-compatible endpoint (value → CAST AS STRING = the body);
- local/dev & tests: text/json file sources or an in-memory list.

Each returns a DataFrame with a single ``body: string`` column feeding
``operators.ingest.ingest_pipeline``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

BODY_SCHEMA = StructType([StructField("body", StringType())])


def envelopes_from_list(spark: SparkSession, bodies: list[str]) -> DataFrame:
    """Test/dev source: in-memory event bodies."""
    return spark.createDataFrame([(b,) for b in bodies], BODY_SCHEMA)


def envelopes_from_text(spark: SparkSession, path: str) -> DataFrame:
    """One event body per line (newline-delimited raw bodies)."""
    return spark.read.text(path).select(F.col("value").alias("body"))


def envelopes_from_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Streaming source: Kafka surface (works for Event Hubs' Kafka
    endpoint). Body = value bytes decoded as UTF-8 — reference S2
    (`azeventhub.get_body().decode("utf-8")`, src/function_app.py:319)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("body"))
    )


def parse_eventhubs_connection_string(conn: str) -> dict[str, str]:
    """Parse an Event Hubs connection string into its parts.

    Format (public Azure docs):
    ``Endpoint=sb://<ns>.servicebus.windows.net/;SharedAccessKeyName=<k>;
    SharedAccessKey=<secret>;EntityPath=<hub>``.

    Fails fast on a missing Endpoint — same eager-validation posture as
    EngineConfig (reference `src/function_app.py:24-58`)."""
    parts: dict[str, str] = {}
    for seg in conn.split(";"):
        seg = seg.strip()
        if seg and "=" in seg:
            k, v = seg.split("=", 1)
            parts[k] = v
    endpoint = parts.get("Endpoint", "")
    if not endpoint.startswith("sb://"):
        raise ValueError("connection string must contain Endpoint=sb://<namespace>...")
    host = endpoint.removeprefix("sb://").strip("/")
    return {
        "host": host,
        "namespace": host.split(".", 1)[0],
        "entity_path": parts.get("EntityPath", ""),
        "key_name": parts.get("SharedAccessKeyName", ""),
        "key": parts.get("SharedAccessKey", ""),
    }


def eventhubs_kafka_options(
    conn: str, topic: str | None = None, consumer_group: str | None = None
) -> dict[str, str]:
    """Reader options for Event Hubs' Kafka-compatible endpoint (port
    9093, SASL PLAIN with the literal ``$ConnectionString`` user — the
    mapping Microsoft documents publicly). This is the portable surface:
    any stock Spark distribution with the Kafka connector can consume an
    Event Hub through it, no Azure-specific jar required.

    ``consumer_group`` maps to ``kafka.group.id`` — Event Hubs' Kafka
    surface honors consumer-group names, so the Event Hubs
    ``$Default``-style group semantics carry over. Left unset, Spark
    generates its own group id per query (its default)."""
    p = parse_eventhubs_connection_string(conn)
    subscribe = topic or p["entity_path"]
    if not subscribe:
        raise ValueError("no topic: pass one or use a connection string with EntityPath")
    jaas = (
        "org.apache.kafka.common.security.plain.PlainLoginModule required "
        f'username="$ConnectionString" password="{conn}";'
    )
    opts = {
        "kafka.bootstrap.servers": f"{p['host']}:9093",
        "subscribe": subscribe,
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "PLAIN",
        "kafka.sasl.jaas.config": jaas,
        "kafka.request.timeout.ms": "60000",
        "kafka.session.timeout.ms": "30000",
    }
    if consumer_group is not None and consumer_group != "$Default":
        opts["kafka.group.id"] = consumer_group
    return opts


def eventhubs_kafka_oauth_options(
    namespace_host: str,
    topic: str,
    tenant_id: str,
    client_id: str | None = None,
    consumer_group: str | None = None,
) -> dict[str, str]:
    """Reader options for Event Hubs' Kafka endpoint authenticated via
    Microsoft Entra ID (AAD) OAuth instead of a shared-access key — the
    managed-identity-class path the reference uses (its Function App
    authenticates with a user-assigned identity,
    ``infra/iothub.tf:18-37`` / ``infra/function-app.tf:90-96``), which
    the SASL-PLAIN connection-string surface cannot express.

    Built entirely from public interfaces: Kafka's OAUTHBEARER mechanism
    with the stock ``OAuthBearerLoginCallbackHandler``
    (client-credentials grant against a token endpoint, KIP-768) and
    Azure's documented token shape for Event Hubs — token endpoint
    ``https://login.microsoftonline.com/<tenant>/oauth2/v2.0/token``,
    scope ``https://<namespace host>/.default``. ``client_id`` plus the
    ``clientSecret`` left for the deployer to inject selects a service
    principal; on Azure compute a managed identity is exchanged through
    the same mechanism by pointing the token endpoint at the IMDS-backed
    identity endpoint or using a workload-identity federation — both are
    deploy-time settings on top of these same option keys, so this
    builder is the unit-testable core and DEPLOYMENT.md carries the
    environment-specific remainder (no Azure endpoint is reachable from
    the test sandbox).
    """
    if not namespace_host or "." not in namespace_host:
        raise ValueError(
            "namespace_host must be the full host, e.g. myns.servicebus.windows.net"
        )
    if not topic:
        raise ValueError("topic (event hub name) is required")
    if not tenant_id:
        raise ValueError("tenant_id is required")
    # KIP-768: the login callback handler reads clientId/clientSecret/
    # scope from the JAAS module OPTIONS, not from client configs — a
    # "sasl.oauthbearer.scope" client config would be silently dropped
    # and AAD's v2.0 token endpoint rejects scopeless client-credentials
    # requests, so scope MUST ride in the JAAS string.
    jaas = (
        "org.apache.kafka.common.security.oauthbearer.OAuthBearerLoginModule required"
        + (f' clientId="{client_id}"' if client_id else "")
        + f' scope="https://{namespace_host}/.default"'
        + ";"
    )
    opts = {
        "kafka.bootstrap.servers": f"{namespace_host}:9093",
        "subscribe": topic,
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "OAUTHBEARER",
        "kafka.sasl.jaas.config": jaas,
        # non-deprecated package path (KAFKA-13662): the ".secured" stub
        # existed only in kafka-clients 3.1-3.9 and is gone in 4.x
        "kafka.sasl.login.callback.handler.class": (
            "org.apache.kafka.common.security.oauthbearer."
            "OAuthBearerLoginCallbackHandler"
        ),
        "kafka.sasl.oauthbearer.token.endpoint.url": (
            f"https://login.microsoftonline.com/{tenant_id}/oauth2/v2.0/token"
        ),
    }
    if consumer_group is not None and consumer_group != "$Default":
        opts["kafka.group.id"] = consumer_group
    return opts


def eventhubs_native_options(
    conn: str, consumer_group: str = "$Default", starting_position: str = "latest"
) -> dict[str, str]:
    """Reader options for the native ``format("eventhubs")`` connector
    (com.microsoft.azure:azure-eventhubs-spark). Kept as a pure option
    builder so the mapping is unit-testable without the connector jar on
    the classpath; ``envelopes_from_eventhubs`` applies it."""
    parse_eventhubs_connection_string(conn)  # fail fast on malformed input
    return {
        "eventhubs.connectionString": conn,
        "eventhubs.consumerGroup": consumer_group,
        "eventhubs.startingPosition": starting_position,
    }


def envelopes_from_eventhubs(
    spark: SparkSession,
    connection_string: str,
    consumer_group: str = "$Default",
    native: bool = False,
) -> DataFrame:
    """Streaming source against an Event Hub — reference S1
    (`src/function_app.py:302-310`'s event_hub_message_trigger).

    Default is the Kafka endpoint (portable, no extra jar); pass
    ``native=True`` to use the azure-eventhubs-spark connector, whose
    ``body`` column is bytes → decoded UTF-8 exactly like the reference's
    ``get_body().decode("utf-8")``. Both yield the same one-column
    ``body: string`` contract."""
    if native:
        reader = spark.readStream.format("eventhubs")
        for k, v in eventhubs_native_options(connection_string, consumer_group).items():
            reader = reader.option(k, v)
        return reader.load().select(F.col("body").cast("string").alias("body"))
    reader = spark.readStream.format("kafka")
    opts = eventhubs_kafka_options(connection_string, consumer_group=consumer_group)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load().select(F.col("value").cast("string").alias("body"))


def envelopes_stream_from_text(spark: SparkSession, path: str) -> DataFrame:
    """Streaming file source for local dev: drop newline-delimited body
    files into ``path`` and they are ingested exactly-once."""
    # text source with an explicit single-field schema names the column
    # after the schema field — already `body`.
    return spark.readStream.schema(BODY_SCHEMA).format("text").load(path)
