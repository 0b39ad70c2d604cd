"""Network embedding client behind the P1 embedder protocol.

The reference ships SDK-wrapping embedding clients
(`/root/reference/src/grafeo_memory/embedding.py:22-87` — OpenAI and
Mistral SDK objects injected by the caller). This repo's twin is a
single **dependency-free stdlib HTTP client** speaking the
OpenAI-compatible ``POST {base_url}/embeddings`` wire format, which the
self-hosted servers a Spark deployment actually talks to (vLLM, TGI,
llama.cpp, Ollama's OpenAI shim, or the hosted APIs themselves) all
expose. No SDK import means nothing to stub in this sandbox: the tests
run it against an in-process ``http.server``.

Design notes:
- batching: requests are chunked to ``batch_size`` texts — embedding
  endpoints cap per-request inputs, and the memory engine embeds whole
  ingest batches at once;
- ordering: items are re-assembled by the response's ``index`` field,
  never by arrival order;
- retries: transient failures (HTTP 429/5xx, socket errors) retry with
  exponential backoff; 4xx client errors raise immediately;
- ``dimensions`` probes the endpoint once and caches (reference
  `embedding.py:48-52`).

Driver-side by design: policy/embedding calls are the LLM boundary the
engine isolates behind P1 (protocols.py) — Spark-side plans only ever
see the resulting vectors.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

__all__ = ["HttpEmbedder"]


class HttpEmbedder:
    """OpenAI-wire-compatible embedding client on stdlib urllib.

    Usage::

        emb = HttpEmbedder("http://localhost:8000/v1",
                           model="text-embedding-3-small",
                           api_key="sk-...")
        vecs = emb.embed(["hello", "world"])
    """

    def __init__(
        self,
        base_url: str,
        *,
        model: str = "text-embedding-3-small",
        api_key: str | None = None,
        batch_size: int = 128,
        timeout: float = 30.0,
        max_retries: int = 3,
        backoff: float = 0.5,
    ) -> None:
        if batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {batch_size}")
        self._url = base_url.rstrip("/") + "/embeddings"
        self._model = model
        self._api_key = api_key
        self._batch_size = batch_size
        self._timeout = timeout
        self._max_retries = max_retries
        self._backoff = backoff
        self._dimensions: int | None = None

    # ------------------------------------------------------------ http
    def _post(self, texts: list[str]) -> list[list[float]]:
        body = json.dumps({"model": self._model, "input": texts}).encode()
        headers = {"Content-Type": "application/json"}
        if self._api_key:
            headers["Authorization"] = f"Bearer {self._api_key}"
        last_err: Exception | None = None
        for attempt in range(self._max_retries + 1):
            req = urllib.request.Request(
                self._url, data=body, headers=headers, method="POST"
            )
            try:
                with urllib.request.urlopen(req, timeout=self._timeout) as r:
                    raw = r.read().decode(errors="replace")
                try:
                    payload = json.loads(raw)
                    items = sorted(payload["data"], key=lambda d: d["index"])
                    vecs = [
                        [float(x) for x in item["embedding"]]
                        for item in items
                    ]
                except (ValueError, KeyError, TypeError) as exc:
                    # a 200 with a non-conforming body (HTML error page,
                    # {"error": ...} envelope) is a caller-visible
                    # endpoint bug, not a transient — no retry
                    raise RuntimeError(
                        f"embedding endpoint {self._url} returned a "
                        f"malformed 200 response: {exc!r}; body starts "
                        f"{raw[:200]!r}"
                    ) from exc
                if len(vecs) != len(texts):
                    raise RuntimeError(
                        f"embedding endpoint returned {len(vecs)} vectors "
                        f"for {len(texts)} inputs"
                    )
                return vecs
            except urllib.error.HTTPError as exc:
                # 429/5xx are transient; other 4xx are caller bugs —
                # surface those immediately with the server's message
                if exc.code not in (429,) and exc.code < 500:
                    detail = exc.read().decode(errors="replace")[:500]
                    raise RuntimeError(
                        f"embedding request rejected ({exc.code}): {detail}"
                    ) from exc
                last_err = exc
            except (urllib.error.URLError, OSError, TimeoutError) as exc:
                last_err = exc
            if attempt < self._max_retries:
                time.sleep(self._backoff * (2**attempt))
        raise RuntimeError(
            f"embedding request failed after {self._max_retries + 1} "
            f"attempts: {last_err}"
        ) from last_err

    # -------------------------------------------------------- protocol
    def embed(self, texts: list[str]) -> list[list[float]]:
        if not texts:
            return []
        out: list[list[float]] = []
        for i in range(0, len(texts), self._batch_size):
            out.extend(self._post(list(texts[i : i + self._batch_size])))
        return out

    @property
    def dimensions(self) -> int:
        if self._dimensions is None:
            self._dimensions = len(self.embed(["dimension probe"])[0])
        return self._dimensions
