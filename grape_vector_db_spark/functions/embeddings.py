"""S14 embedding provider — OpenAI-compatible HTTP + deterministic mock.

The reference ships an HTTP embedding client speaking the OpenAI
`/embeddings` wire shape with Azure/Ollama-compatible variants, request
batching, and retry-with-backoff (src/embeddings.rs:55-220; provider
factory :269-307), plus the deterministic mock used by its tests
(:229-250 — ours lives in functions.text.mock_embedding).

Spark-first shape: embedding is INGEST, not serving — a `mapInPandas`
stage so each Arrow batch issues a handful of batched POSTs from the
executors (requests scale with the cluster, the driver never sees a
vector). The config is a tiny picklable dataclass riding the closure.

Scale notes:
- batch_size bounds request payloads; one Arrow batch => ceil(rows/batch)
  sequential POSTs per task, tasks run in parallel across executors.
- Retries are per-POST with exponential backoff, so one flaky call
  doesn't fail a 100 TB ingest; non-retryable HTTP errors (4xx other
  than 429) surface immediately with the server's message.
- No third-party HTTP dependency: stdlib urllib keeps executors
  dependency-free.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame

from .text import mock_embedding


@dataclass(frozen=True)
class EmbeddingProviderConfig:
    """Connection + batching config for an OpenAI-compatible endpoint.

    ``base_url`` is the API root (e.g. ``http://host:port/v1``); the
    client POSTs to ``{base_url}/embeddings`` unless ``endpoint`` gives a
    full URL (Azure deployment URLs). ``api_key`` (optional) is sent as a
    Bearer token; ``headers`` adds or overrides arbitrary request headers
    (the reference's custom-header map, src/embeddings.rs:79-89 — e.g.
    Azure's ``api-key``). ``dimension``, when set, validates every
    returned vector (mirrors the reference's dim check at insert,
    src/index.rs:165-175). ``single_string_input`` mirrors the reference
    client sending a bare string, not a 1-element array, for single-text
    batches (src/embeddings.rs:188-196).
    """

    base_url: str
    model: str
    api_key: str | None = None
    batch_size: int = 64
    max_retries: int = 3
    backoff_s: float = 0.5
    timeout_s: float = 30.0
    dimension: int | None = None
    endpoint: str | None = None
    headers: tuple[tuple[str, str], ...] = ()
    single_string_input: bool = True


#: provider name -> default endpoint, mirroring the reference factory
#: (src/embeddings.rs:97-111, 269-288): openai has a public default, azure
#: requires an explicit deployment endpoint, every other HTTP provider
#: falls back to the local Ollama default — its OpenAI-COMPATIBLE
#: /v1/embeddings route, because this client speaks the OpenAI wire
#: shape ({model, input} -> payload['data']); Ollama's native
#: /api/embeddings expects {model, prompt} and returns {'embedding'},
#: which would die as an opaque KeyError('data') on the executor.
_DEFAULT_ENDPOINTS = {
    "openai": "https://api.openai.com/v1/embeddings",
    "nvidia": "http://localhost:11434/v1/embeddings",
    "huggingface": "http://localhost:11434/v1/embeddings",
    "ollama": "http://localhost:11434/v1/embeddings",
}


def provider_config(
    provider: str,
    model: str = "",
    endpoint: str | None = None,
    api_key: str | None = None,
    headers: dict[str, str] | None = None,
    **kwargs,
) -> EmbeddingProviderConfig | None:
    """Reference ``create_provider`` (src/embeddings.rs:269-288): resolve a
    provider name to a client config. All HTTP providers speak the same
    OpenAI-compatible wire shape; the name only picks the default endpoint
    (and Azure demands an explicit one). Returns None for ``mock`` — pass
    it straight to :func:`embed_texts`, whose None path is the
    deterministic mock embedder."""
    provider = provider.lower()
    if provider == "mock":
        return None
    if provider == "azure":
        if not endpoint:
            raise ValueError("azure provider requires an explicit endpoint")
    elif provider in _DEFAULT_ENDPOINTS:
        endpoint = endpoint or _DEFAULT_ENDPOINTS[provider]
    else:
        raise ValueError(f"unsupported embedding provider: {provider!r}")
    return EmbeddingProviderConfig(
        base_url="",
        model=model,
        api_key=api_key,
        endpoint=endpoint,
        headers=tuple(sorted((headers or {}).items())),
        **kwargs,
    )


def _post_embeddings(cfg: EmbeddingProviderConfig, texts: list[str]) -> list[list[float]]:
    """One batched POST with retry/backoff; returns vectors in input order."""
    payload_input = (
        texts[0] if len(texts) == 1 and cfg.single_string_input else texts
    )
    body = json.dumps(
        {"model": cfg.model, "input": payload_input, "encoding_format": "float"}
    ).encode("utf-8")
    headers = {"Content-Type": "application/json"}
    if cfg.api_key:
        headers["Authorization"] = f"Bearer {cfg.api_key}"
    headers.update(dict(cfg.headers))
    url = cfg.endpoint or cfg.base_url.rstrip("/") + "/embeddings"
    last_err: Exception | None = None
    for attempt in range(cfg.max_retries + 1):
        try:
            req = urllib.request.Request(url, data=body, headers=headers)
            with urllib.request.urlopen(req, timeout=cfg.timeout_s) as resp:
                payload = json.loads(resp.read().decode("utf-8"))
            rows = sorted(payload["data"], key=lambda d: d["index"])
            out = [[float(x) for x in d["embedding"]] for d in rows]
            if len(out) != len(texts):
                raise ValueError(
                    f"provider returned {len(out)} embeddings for {len(texts)} inputs"
                )
            if cfg.dimension is not None:
                for v in out:
                    if len(v) != cfg.dimension:
                        raise ValueError(
                            f"provider returned dimension {len(v)}, expected {cfg.dimension}"
                        )
            return out
        except urllib.error.HTTPError as e:
            # 429 and 5xx are retryable; other 4xx are caller errors
            if e.code != 429 and e.code < 500:
                raise
            last_err = e
        except (urllib.error.URLError, TimeoutError, ConnectionError) as e:
            last_err = e
        except ValueError:
            raise
        if attempt < cfg.max_retries:
            time.sleep(cfg.backoff_s * (2**attempt))
    raise RuntimeError(
        f"embedding request failed after {cfg.max_retries + 1} attempts: {last_err}"
    )


def embed_texts(
    df: DataFrame,
    cfg: EmbeddingProviderConfig | None = None,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Append ``out_col`` (array<double>) embedding each row's ``text_col``.

    ``cfg=None`` is the mock fallback: the reference's deterministic mock
    embedder as a pure column expression (no I/O, reproducible in any
    engine — the `mock_embed` oracle query pins it). With a config, each
    Arrow batch on the executors issues batched POSTs to the provider.
    """
    if cfg is None:
        return df.withColumn(out_col, mock_embedding(text_col, dim))

    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            texts = ["" if t is None else str(t) for t in pdf[text_col]]
            vecs: list[list[float]] = []
            for i in range(0, len(texts), cfg.batch_size):
                vecs.extend(_post_embeddings(cfg, texts[i : i + cfg.batch_size]))
            pdf = pdf.copy()
            pdf[out_col] = vecs
            yield pdf

    return df.mapInPandas(run, out_schema)
