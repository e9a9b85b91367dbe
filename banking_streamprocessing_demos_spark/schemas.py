"""Declared schemas for the engine's data plane.

The reference declares every schema statically: Avro literals registered
in Schema Registry (phone_message_producer.py:302-341), SQLite DDL
(phone_message_producer.py:81-105), and a static generator value shape
(message-tracking.json:42-55).  We mirror that stance: explicit
StructTypes, no inference, Avro schema JSON kept verbatim for
``from_avro``/``to_avro`` wire compatibility.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Wire schemas (Avro, verbatim) — phone_message_producer.py:302-323
# ---------------------------------------------------------------------------

MESSAGE_KEY_AVRO_JSON = """{
    "type": "record",
    "name": "MessageKey",
    "fields": [
        {"name": "messageId", "type": "string"}
    ]
}"""

MESSAGE_STATUS_AVRO_JSON = """{
    "type": "record",
    "name": "MessageStatus",
    "fields": [
        {"name": "status", "type": "string"},
        {"name": "phoneNumber", "type": "long"},
        {"name": "carrier", "type": "string"},
        {"name": "timestamp", "type": "long"}
    ]
}"""

MESSAGE_KEY_SCHEMA = StructType([StructField("messageId", StringType(), False)])

MESSAGE_STATUS_SCHEMA = StructType(
    [
        StructField("status", StringType(), False),
        StructField("phoneNumber", LongType(), False),
        StructField("carrier", StringType(), False),
        StructField("timestamp", LongType(), False),  # event time, ms epoch
    ]
)

# Flattened key+value event record as the engine's canonical stream table
# (FIXTURES.md §1).  `timestamp` is ms-epoch BIGINT exactly as on the wire
# (phone_message_producer.py:406-408).
MESSAGE_EVENT_SCHEMA = StructType(
    [
        StructField("message_id", StringType(), False),
        StructField("status", StringType(), False),  # 'sent' | 'delivered'
        StructField("phone_number", LongType(), False),
        StructField("carrier", StringType(), False),
        StructField("timestamp", LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Entity / state tables — phone_message_producer.py:81-105
# ---------------------------------------------------------------------------

# phone_numbers (DDL py:81-90).  AUTOINCREMENT has no Spark equivalent;
# ids are unique-not-dense via monotonically_increasing_id (SURVEY §1.2).
PHONE_NUMBERS_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("phone_number", LongType(), False),  # UNIQUE NOT NULL
        StructField("carrier", StringType(), False),
        StructField("created_at", TimestampType(), False),
        StructField("total_messages_sent", IntegerType(), False),
        StructField("total_messages_delivered", IntegerType(), False),
    ]
)

# messages (DDL py:92-105).  delivered_time nullability is load-bearing:
# "undelivered" <=> delivered_time IS NULL (py:100, SURVEY §1.2 P7).
MESSAGES_SCHEMA = StructType(
    [
        StructField("message_id", StringType(), False),
        StructField("phone_number", LongType(), False),
        StructField("carrier", StringType(), False),
        StructField("status", StringType(), False),
        StructField("delivery_type", StringType(), False),  # normal|delayed|never
        StructField("sent_time", LongType(), False),
        StructField("delivered_time", LongType(), True),
        StructField("last_heartbeat", LongType(), False),
        StructField("created_at", TimestampType(), False),
    ]
)

# Alert output of the flagship detector (FIXTURES.md §4).
ALERT_SCHEMA = StructType(
    [
        StructField("message_id", StringType(), False),
        StructField("phone_number", LongType(), False),
        StructField("carrier", StringType(), False),
        StructField("first_sent_time", LongType(), False),
        StructField("alert_time", LongType(), False),
        StructField("resolved_late", BooleanType(), True),
    ]
)

# ---------------------------------------------------------------------------
# LLM-pipeline extension schemas (north-star ops over documents/embeddings)
# ---------------------------------------------------------------------------

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)

# Multimodal: opaque binary payload + typed metadata (SURVEY §7.5 stance:
# media bytes are an opaque `binary` column; decode/feature-extract runs
# as Arrow-batched pandas over mapInPandas).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("media_type", StringType(), True),  # image|audio|video|text
        StructField("n_bytes", LongType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_s", DoubleType(), True),
    ]
)

CARRIERS = ["verizon", "att", "t-mobile"]  # py:62; message-tracking.json:28-34
STATUS_DOMAIN = ["sent", "delivered"]  # py:513,552,592 — wire statuses only
DELIVERY_TYPES = ["normal", "delayed", "never"]  # py:463-472 (internal)
