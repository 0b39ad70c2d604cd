"""HttpEmbedder against an in-process OpenAI-wire HTTP server:
batching, index-ordered reassembly, auth header, retry/backoff on
transient failures, immediate surfacing of client errors, and the
P1-protocol fit (engine runs end-to-end with it)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from grafeo_memory_spark.embedding import HttpEmbedder

DIMS = 8


def _vec(text: str) -> list[float]:
    # deterministic per-text embedding
    h = sum(ord(c) for c in text)
    return [float((h + i) % 97) / 97.0 for i in range(DIMS)]


class _Handler(BaseHTTPRequestHandler):
    server_version = "FakeEmb/0"
    fail_next: list[int] = []  # status codes to emit before succeeding
    requests: list[dict] = []

    def do_POST(self):  # noqa: N802 — http.server API
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        type(self).requests.append(
            {
                "path": self.path,
                "auth": self.headers.get("Authorization"),
                "n_inputs": len(body["input"]),
                "model": body["model"],
            }
        )
        if type(self).fail_next:
            code = type(self).fail_next.pop(0)
            self.send_response(code)
            self.end_headers()
            self.wfile.write(b'{"error": "induced"}')
            return
        # reply with indices deliberately reversed — the client must
        # reorder by the index field
        data = [
            {"index": i, "embedding": _vec(t)}
            for i, t in enumerate(body["input"])
        ][::-1]
        payload = json.dumps({"data": data}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def server():
    _Handler.fail_next = []
    _Handler.requests = []
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1"
    srv.shutdown()


class TestHttpEmbedder:
    def test_embed_round_trip_preserves_order(self, server):
        emb = HttpEmbedder(server, api_key="sk-test")
        texts = ["alpha", "beta", "gamma"]
        vecs = emb.embed(texts)
        assert vecs == [_vec(t) for t in texts]
        assert _Handler.requests[0]["auth"] == "Bearer sk-test"
        assert _Handler.requests[0]["path"] == "/v1/embeddings"

    def test_batching_splits_requests(self, server):
        emb = HttpEmbedder(server, batch_size=2)
        texts = [f"t{i}" for i in range(5)]
        vecs = emb.embed(texts)
        assert vecs == [_vec(t) for t in texts]
        assert [r["n_inputs"] for r in _Handler.requests] == [2, 2, 1]

    def test_empty_input_no_request(self, server):
        emb = HttpEmbedder(server)
        assert emb.embed([]) == []
        assert _Handler.requests == []

    def test_dimensions_probe_cached(self, server):
        emb = HttpEmbedder(server)
        assert emb.dimensions == DIMS
        assert emb.dimensions == DIMS
        assert len(_Handler.requests) == 1  # probed once

    def test_transient_5xx_retries_then_succeeds(self, server):
        _Handler.fail_next = [500, 429]
        emb = HttpEmbedder(server, backoff=0.01)
        assert emb.embed(["x"]) == [_vec("x")]
        assert len(_Handler.requests) == 3

    def test_client_error_raises_immediately(self, server):
        _Handler.fail_next = [401]
        emb = HttpEmbedder(server, backoff=0.01)
        with pytest.raises(RuntimeError, match="401"):
            emb.embed(["x"])
        assert len(_Handler.requests) == 1  # no retry on 4xx

    def test_exhausted_retries_surface_last_error(self, server):
        _Handler.fail_next = [500, 500, 500, 500]
        emb = HttpEmbedder(server, max_retries=2, backoff=0.01)
        with pytest.raises(RuntimeError, match="after 3 attempts"):
            emb.embed(["x"])

    def test_engine_accepts_it_as_p1(self, server, spark):
        from grafeo_memory_spark.manager import MemoryEngine

        eng = MemoryEngine(spark, embedder=HttpEmbedder(server))
        eng.add("network embedded fact", user_id="u", infer=False)
        rows = eng.search(
            "network embedded fact", user_id="u", k=1
        ).collect()
        assert rows and rows[0]["text"] == "network embedded fact"
        eng.close()

    def test_malformed_200_surfaces_with_context(self, server):
        _Handler.fail_next = []
        # monkeypatch the handler to return junk on success path
        orig = _Handler.do_POST

        def junk(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            type(self).requests.append({"n_inputs": 0, "auth": None,
                                        "path": self.path, "model": ""})
            payload = b"<html>gateway error</html>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        _Handler.do_POST = junk
        try:
            emb = HttpEmbedder(server, backoff=0.01)
            with pytest.raises(RuntimeError, match="malformed 200"):
                emb.embed(["x"])
            assert len(_Handler.requests) == 1  # endpoint bug: no retry
        finally:
            _Handler.do_POST = orig
