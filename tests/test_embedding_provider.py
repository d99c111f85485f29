"""S14 HTTP embedding provider tests against an in-process OpenAI-shaped
stub server (reference client: src/embeddings.rs:55-220).

The stub returns the reference's deterministic mock embedding for each
input, so the HTTP path must agree exactly with the column-expression
mock path — the same cross-check the reference uses for its provider.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
import urllib.error

from grape_vector_db_spark.functions.embeddings import (
    EmbeddingProviderConfig,
    _post_embeddings,
    embed_texts,
)
from grape_vector_db_spark.functions.text import mock_embedding_py

DIM = 8


class _Handler(BaseHTTPRequestHandler):
    fail_next = 0  # respond 500 to this many requests
    bad_request = False  # respond 400 (non-retryable)
    seen_auth: list = []
    seen_headers: list = []
    seen_inputs: list = []

    def do_POST(self):
        n = int(self.headers["Content-Length"])
        body = json.loads(self.rfile.read(n))
        _Handler.seen_auth.append(self.headers.get("Authorization"))
        _Handler.seen_headers.append(dict(self.headers))
        _Handler.seen_inputs.append(body["input"])
        if _Handler.bad_request:
            self.send_response(400)
            self.end_headers()
            return
        if _Handler.fail_next > 0:
            _Handler.fail_next -= 1
            self.send_response(500)
            self.end_headers()
            return
        # the reference client sends a bare string for single-text batches
        # (src/embeddings.rs:188-196) — accept both wire shapes
        texts = [body["input"]] if isinstance(body["input"], str) else body["input"]
        data = [
            {"index": i, "embedding": mock_embedding_py(t, DIM)}
            for i, t in enumerate(texts)
        ]
        out = json.dumps({"model": body["model"], "data": data}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *args):  # silence
        pass


@pytest.fixture(scope="module")
def base_url():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/v1"
    srv.shutdown()


def _cfg(base_url, **kw):
    kw.setdefault("model", "test-embed")
    kw.setdefault("batch_size", 2)
    kw.setdefault("backoff_s", 0.01)
    return EmbeddingProviderConfig(base_url=base_url, **kw)


def test_http_provider_matches_mock_expression(spark, base_url):
    """End-to-end mapInPandas: executor processes POST to the stub; results
    must equal the deterministic mock embedder exactly."""
    rows = [(i, f"document number {i} text") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id int, text string").repartition(3)
    got = {
        r["doc_id"]: r["embedding"]
        for r in embed_texts(df, _cfg(base_url, api_key="sk-test"), dim=DIM).collect()
    }
    assert len(got) == 7
    for i, text in rows:
        want = mock_embedding_py(text, DIM)
        assert got[i] == pytest.approx(want, abs=1e-12)
    assert "Bearer sk-test" in _Handler.seen_auth


def test_retry_then_success(base_url):
    _Handler.fail_next = 2
    out = _post_embeddings(_cfg(base_url, max_retries=3), ["alpha", "beta"])
    assert _Handler.fail_next == 0
    assert out[0] == pytest.approx(mock_embedding_py("alpha", DIM))


def test_retries_exhausted_raises(base_url):
    _Handler.fail_next = 10
    with pytest.raises(RuntimeError, match="after 2 attempts"):
        _post_embeddings(_cfg(base_url, max_retries=1), ["x"])
    _Handler.fail_next = 0


def test_non_retryable_4xx_raises_immediately(base_url):
    _Handler.bad_request = True
    try:
        with pytest.raises(urllib.error.HTTPError):
            _post_embeddings(_cfg(base_url, max_retries=5), ["x"])
    finally:
        _Handler.bad_request = False


def test_dimension_validation(base_url):
    with pytest.raises(ValueError, match="dimension"):
        _post_embeddings(_cfg(base_url, dimension=16), ["x"])


def test_provider_factory_variants(base_url):
    """create_provider parity (src/embeddings.rs:269-288): provider name
    picks the default endpoint; azure demands an explicit one; mock maps
    to the no-HTTP path; unknown names are rejected."""
    from grape_vector_db_spark.functions.embeddings import provider_config

    assert (
        provider_config("openai", "m").endpoint
        == "https://api.openai.com/v1/embeddings"
    )
    for p in ("nvidia", "huggingface", "ollama"):
        # the OpenAI-COMPATIBLE route: this client speaks the OpenAI
        # wire shape; Ollama's native /api/embeddings takes {model,
        # prompt} and would KeyError('data') on the executor
        assert (
            provider_config(p, "m").endpoint
            == "http://localhost:11434/v1/embeddings"
        )
    assert provider_config("mock") is None
    with pytest.raises(ValueError, match="azure"):
        provider_config("azure", "m")
    assert provider_config("azure", "m", endpoint=f"{base_url}/embeddings") is not None
    with pytest.raises(ValueError, match="unsupported"):
        provider_config("cohere", "m")


def test_custom_headers_and_single_string_input(base_url):
    """Azure-style api-key header rides the custom header map; a 1-text
    batch goes out as a bare JSON string, not a 1-element array."""
    from grape_vector_db_spark.functions.embeddings import provider_config

    cfg = provider_config(
        "azure",
        "m",
        endpoint=f"{base_url}/embeddings",
        headers={"api-key": "azure-secret"},
        backoff_s=0.01,
    )
    out = _post_embeddings(cfg, ["only one text"])
    assert out[0] == pytest.approx(mock_embedding_py("only one text", DIM))
    assert _Handler.seen_inputs[-1] == "only one text"  # bare string
    got_headers = {k.lower(): v for k, v in _Handler.seen_headers[-1].items()}
    assert got_headers.get("api-key") == "azure-secret"

    out2 = _post_embeddings(cfg, ["a", "b"])
    assert isinstance(_Handler.seen_inputs[-1], list)
    assert len(out2) == 2


def test_mock_fallback_no_http(spark):
    df = spark.createDataFrame([(1, "hello world")], "doc_id int, text string")
    out = embed_texts(df, None, dim=DIM).collect()[0]["embedding"]
    assert out == pytest.approx(mock_embedding_py("hello world", DIM), abs=1e-9)
