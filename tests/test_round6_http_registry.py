"""HttpSchemaRegistry pinned against a LOCAL stdlib http.server fake
(VERDICT r5 §Next-7): no network needed, but the URL paths, request
headers/payloads, and response parsing are exercised for real —
reference contract ``utils.py:43-54`` (register) and ``utils.py:
170-179`` (fetch by id)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from jibaro_spark.codecs.confluent import HttpSchemaRegistry


class _FakeRegistry(BaseHTTPRequestHandler):
    """Minimal Confluent Schema Registry: stores schemas per subject,
    serves them by global id; records every request for assertions."""

    store: dict[int, str] = {}
    by_subject: dict[tuple[str, str], int] = {}
    requests: list[dict] = []
    next_id = 7  # non-1 start so tests can't pass by accident

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        type(self).requests.append({"method": "GET", "path": self.path})
        if self.path.startswith("/schemas/ids/"):
            sid = int(self.path.rsplit("/", 1)[1])
            if sid in self.store:
                self._json(200, {"schema": self.store[sid]})
            else:
                self._json(
                    404, {"error_code": 40403, "message": "Schema not found"}
                )
        else:
            self._json(404, {"error_code": 404, "message": "bad path"})

    def do_POST(self):
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        type(self).requests.append(
            {
                "method": "POST",
                "path": self.path,
                "content_type": self.headers.get("Content-Type"),
                "body": body,
            }
        )
        if self.path.startswith("/subjects/") and self.path.endswith("/versions"):
            subject = self.path.split("/")[2]
            key = (subject, body["schema"])
            cls = type(self)
            if key not in cls.by_subject:
                cls.by_subject[key] = cls.next_id
                cls.store[cls.next_id] = body["schema"]
                cls.next_id += 1
            self._json(200, {"id": cls.by_subject[key]})
        else:
            self._json(404, {"error_code": 404, "message": "bad path"})

    def _json(self, code: int, obj: dict):
        payload = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header(
            "Content-Type", "application/vnd.schemaregistry.v1+json"
        )
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture()
def fake_registry():
    _FakeRegistry.store = {}
    _FakeRegistry.by_subject = {}
    _FakeRegistry.requests = []
    _FakeRegistry.next_id = 7
    srv = HTTPServer(("127.0.0.1", 0), _FakeRegistry)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", _FakeRegistry
    finally:
        srv.shutdown()
        srv.server_close()


AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Envelope",
        "fields": [{"name": "id", "type": "long"}],
    }
)
PROTO_SCHEMA = 'syntax = "proto3";\n\nmessage Envelope {\n  int64 id = 1;\n}'


def test_register_then_fetch_round_trip(fake_registry):
    url, fake = fake_registry
    reg = HttpSchemaRegistry(url + "/")  # trailing slash must normalize
    sid = reg.register("orders-value", AVRO_SCHEMA)
    assert sid == 7
    # idempotent re-register returns the same id
    assert reg.register("orders-value", AVRO_SCHEMA) == sid
    assert reg.get_schema(sid) == AVRO_SCHEMA

    post = [r for r in fake.requests if r["method"] == "POST"][0]
    assert post["path"] == "/subjects/orders-value/versions"
    assert post["content_type"] == "application/vnd.schemaregistry.v1+json"
    assert post["body"] == {"schema": AVRO_SCHEMA}  # AVRO omits schemaType
    get = [r for r in fake.requests if r["method"] == "GET"][0]
    assert get["path"] == f"/schemas/ids/{sid}"


def test_register_protobuf_sends_schema_type(fake_registry):
    url, fake = fake_registry
    reg = HttpSchemaRegistry(url)
    sid = reg.register("orders-value", PROTO_SCHEMA, "PROTOBUF")
    assert reg.get_schema(sid) == PROTO_SCHEMA
    post = [r for r in fake.requests if r["method"] == "POST"][0]
    assert post["body"] == {"schema": PROTO_SCHEMA, "schemaType": "PROTOBUF"}


def test_unknown_id_raises(fake_registry):
    url, _ = fake_registry
    reg = HttpSchemaRegistry(url)
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        reg.get_schema(999)
