"""Minimal Confluent Schema Registry REST client (S2 companion).

The reference registers its Avro schemas through
``confluent_kafka.schema_registry.SchemaRegistryClient`` with basic
auth (phone_message_producer.py:325-343) and lets ``AvroSerializer``
resolve subject names with the default TopicNameStrategy
(``<topic>-key`` / ``<topic>-value``).  That package is not in this
container, so the REST protocol is implemented directly from
Confluent's public API spec:

- ``POST /subjects/{subject}/versions`` body ``{"schema": ...}``
  content-type ``application/vnd.schemaregistry.v1+json`` → ``{"id"}``
- ``GET /schemas/ids/{id}`` → ``{"schema"}``
- ``GET /subjects/{subject}/versions/latest`` → version record
- basic auth from ``key:secret`` (the reference's
  ``basic.auth.user.info``)

The HTTP transport is injectable so the protocol is fully spec-testable
without a live registry (the same stance as avro_wire.py: the wire
format is real, the network dependency is the only stub).  Ids returned
by ``register`` feed directly into ``avro_wire.to_wire``'s Confluent
framing.
"""

from __future__ import annotations

import base64
import json
from collections.abc import Callable
from dataclasses import dataclass, field

from ..schemas import MESSAGE_KEY_AVRO_JSON, MESSAGE_STATUS_AVRO_JSON

CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"

# transport(method, url, headers, body) -> (status_code, response_body)
Transport = Callable[[str, str, dict[str, str], bytes | None], tuple[int, bytes]]


def urllib_transport(method: str, url: str, headers: dict[str, str], body: bytes | None):
    """Default transport over stdlib urllib (no extra dependencies).

    4xx/5xx responses are returned as (status, body) rather than raised,
    so ``_call`` applies its uniform SchemaRegistryError handling for
    every transport, not only injected test stubs (urlopen raises
    HTTPError on non-2xx by default)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310 (url from config)
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx status, NOT a transport failure
        return e.code, e.read()


class SchemaRegistryError(RuntimeError):
    def __init__(self, status: int, body: bytes):
        super().__init__(f"schema registry error {status}: {body[:200]!r}")
        self.status = status


@dataclass
class SchemaRegistryClient:
    """Register/fetch Avro schemas; caches ids like the Confluent client
    (one HTTP round-trip per schema per process, py:325-331)."""

    url: str
    basic_auth: str | None = None  # "key:secret", py:328
    transport: Transport = urllib_transport
    _id_cache: dict[tuple[str, str], int] = field(default_factory=dict)
    _schema_cache: dict[int, str] = field(default_factory=dict)

    def _headers(self) -> dict[str, str]:
        h = {"Content-Type": CONTENT_TYPE, "Accept": CONTENT_TYPE}
        if self.basic_auth:
            h["Authorization"] = "Basic " + base64.b64encode(self.basic_auth.encode()).decode()
        return h

    def _call(self, method: str, path: str, payload: dict | None = None) -> dict:
        body = json.dumps(payload).encode() if payload is not None else None
        status, resp = self.transport(
            method, self.url.rstrip("/") + path, self._headers(), body
        )
        if status >= 400:
            raise SchemaRegistryError(status, resp)
        return json.loads(resp)

    def register(self, subject: str, schema_json: str) -> int:
        """POST /subjects/{subject}/versions → schema id (idempotent on
        the server for identical schemas; cached client-side)."""
        key = (subject, schema_json)
        if key not in self._id_cache:
            out = self._call("POST", f"/subjects/{subject}/versions", {"schema": schema_json})
            self._id_cache[key] = int(out["id"])
        return self._id_cache[key]

    def get_schema(self, schema_id: int) -> str:
        """GET /schemas/ids/{id} → schema JSON (what a consumer does with
        the 4-byte id from the Confluent frame)."""
        if schema_id not in self._schema_cache:
            out = self._call("GET", f"/schemas/ids/{schema_id}")
            self._schema_cache[schema_id] = out["schema"]
        return self._schema_cache[schema_id]

    def latest_version(self, subject: str) -> dict:
        """GET /subjects/{subject}/versions/latest."""
        return self._call("GET", f"/subjects/{subject}/versions/latest")


def subject_names(topic: str) -> tuple[str, str]:
    """TopicNameStrategy: the default subject naming the reference's
    AvroSerializer uses."""
    return f"{topic}-key", f"{topic}-value"


def register_message_schemas(
    client: SchemaRegistryClient, topic: str = "message_status"
) -> tuple[int, int]:
    """Register the MessageKey/MessageStatus schemas (py:300-322) under
    TopicNameStrategy subjects; the returned ids are what
    ``avro_wire.to_wire(key_schema_id=..., value_schema_id=...)`` frames
    into every record."""
    key_subject, value_subject = subject_names(topic)
    return (
        client.register(key_subject, MESSAGE_KEY_AVRO_JSON),
        client.register(value_subject, MESSAGE_STATUS_AVRO_JSON),
    )
