"""Event Hubs source surface: connection-string parsing and the two
reader-option mappings (Kafka endpoint / native connector). The option
builders are pure functions, so the full mapping is testable without an
Event Hubs connector jar or a live namespace."""

from __future__ import annotations

import pytest

from iotgp_func_raw_data_ingest_spark.sources.envelopes import (
    eventhubs_kafka_options,
    eventhubs_native_options,
    parse_eventhubs_connection_string,
)

CONN = (
    "Endpoint=sb://myns.servicebus.windows.net/;"
    "SharedAccessKeyName=listen;SharedAccessKey=sekrit=extra;EntityPath=telemetry"
)


def test_parse_connection_string():
    p = parse_eventhubs_connection_string(CONN)
    assert p["host"] == "myns.servicebus.windows.net"
    assert p["namespace"] == "myns"
    assert p["entity_path"] == "telemetry"
    assert p["key_name"] == "listen"
    # value containing '=' splits once, not greedily
    assert p["key"] == "sekrit=extra"


def test_parse_rejects_missing_endpoint():
    with pytest.raises(ValueError, match="Endpoint"):
        parse_eventhubs_connection_string("SharedAccessKeyName=x;SharedAccessKey=y")


def test_kafka_options_mapping():
    o = eventhubs_kafka_options(CONN)
    assert o["kafka.bootstrap.servers"] == "myns.servicebus.windows.net:9093"
    assert o["subscribe"] == "telemetry"
    assert o["kafka.security.protocol"] == "SASL_SSL"
    assert o["kafka.sasl.mechanism"] == "PLAIN"
    assert 'username="$ConnectionString"' in o["kafka.sasl.jaas.config"]
    assert CONN in o["kafka.sasl.jaas.config"]


def test_kafka_options_consumer_group():
    # explicit group maps to kafka.group.id (Event Hubs' Kafka surface
    # honors group names); $Default / unset leave Spark's per-query group
    assert eventhubs_kafka_options(CONN, consumer_group="ingest")["kafka.group.id"] == "ingest"
    assert "kafka.group.id" not in eventhubs_kafka_options(CONN)
    assert "kafka.group.id" not in eventhubs_kafka_options(CONN, consumer_group="$Default")


def test_kafka_options_topic_override_and_missing_topic():
    assert eventhubs_kafka_options(CONN, topic="other")["subscribe"] == "other"
    no_entity = "Endpoint=sb://ns.servicebus.windows.net/;SharedAccessKeyName=k;SharedAccessKey=v"
    with pytest.raises(ValueError, match="topic"):
        eventhubs_kafka_options(no_entity)


def test_native_options_mapping():
    o = eventhubs_native_options(CONN, consumer_group="ingest", starting_position="earliest")
    assert o == {
        "eventhubs.connectionString": CONN,
        "eventhubs.consumerGroup": "ingest",
        "eventhubs.startingPosition": "earliest",
    }
    with pytest.raises(ValueError):
        eventhubs_native_options("not-a-connection-string")


def test_oauth_options_mapping():
    """AAD/managed-identity-class auth for the Kafka surface: OAUTHBEARER
    with the stock login callback handler (KIP-768 client-credentials),
    Azure token endpoint + namespace-scoped audience."""
    from iotgp_func_raw_data_ingest_spark.sources.envelopes import (
        eventhubs_kafka_oauth_options,
    )

    opts = eventhubs_kafka_oauth_options(
        "myns.servicebus.windows.net", "hub1", tenant_id="tid-123",
        client_id="app-9", consumer_group="ingest",
    )
    assert opts["kafka.bootstrap.servers"] == "myns.servicebus.windows.net:9093"
    assert opts["subscribe"] == "hub1"
    assert opts["kafka.sasl.mechanism"] == "OAUTHBEARER"
    assert (
        opts["kafka.sasl.oauthbearer.token.endpoint.url"]
        == "https://login.microsoftonline.com/tid-123/oauth2/v2.0/token"
    )
    # KIP-768: scope must be a JAAS module OPTION (client configs named
    # sasl.oauthbearer.scope don't exist and would be silently dropped)
    assert 'scope="https://myns.servicebus.windows.net/.default"' in opts["kafka.sasl.jaas.config"]
    assert "kafka.sasl.oauthbearer.scope" not in opts
    # non-deprecated handler path (".secured" is gone in kafka-clients 4.x)
    assert opts["kafka.sasl.login.callback.handler.class"] == (
        "org.apache.kafka.common.security.oauthbearer.OAuthBearerLoginCallbackHandler"
    )
    assert 'clientId="app-9"' in opts["kafka.sasl.jaas.config"]
    assert opts["kafka.group.id"] == "ingest"
    # no client_id -> module line still valid JAAS; $Default group omitted
    o2 = eventhubs_kafka_oauth_options(
        "myns.servicebus.windows.net", "hub1", tenant_id="tid-123"
    )
    assert "clientId" not in o2["kafka.sasl.jaas.config"]
    assert "kafka.group.id" not in o2

    import pytest as _pytest
    with _pytest.raises(ValueError):
        eventhubs_kafka_oauth_options("myns", "hub1", "tid")
    with _pytest.raises(ValueError):
        eventhubs_kafka_oauth_options("myns.servicebus.windows.net", "", "tid")
    with _pytest.raises(ValueError):
        eventhubs_kafka_oauth_options("myns.servicebus.windows.net", "hub1", "")
