"""HTTP API contract tests (aiohttp test client) mirroring SURVEY.md §3.1's
endpoint surface against a mock-stage pipeline. No pytest-asyncio in the
image, so each test drives its own event loop via asyncio.run."""

import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

from adaptive_sd_tpu.cascade import (
    AdaptiveCascadePipeline,
    MockStage,
    PipelineConfig,
    StageManager,
)
from adaptive_sd_tpu.predict import MLPQualityPredictor, generate_synthetic
from adaptive_sd_tpu.serve import build_app


@pytest.fixture(scope="module")
def pipeline():
    X, y, _ = generate_synthetic(n_prompts=200, seed=0)
    pred = MLPQualityPredictor()
    pred.fit(X, y, epochs=10, patience=3)
    stages = StageManager(
        [
            MockStage("7b", cost_per_token=1.0, capacity=0.5),
            MockStage("72b", cost_per_token=10.0, capacity=0.97),
        ]
    )
    return AdaptiveCascadePipeline(stages, pred, PipelineConfig(lam=1.0))


def with_client(pipeline, coro_fn, **app_kwargs):
    async def runner():
        app = build_app(pipeline, **app_kwargs)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            return await coro_fn(client)
        finally:
            await client.close()

    return asyncio.run(runner())


def test_health(pipeline):
    async def t(client):
        r = await client.get("/health")
        assert r.status == 200
        body = await r.json()
        assert body["status"] == "healthy" and body["stages"] == ["7b", "72b"]

    with_client(pipeline, t)


def test_generate(pipeline):
    async def t(client):
        r = await client.post("/generate", json={"prompt": "What is 2+2?"})
        assert r.status == 200
        body = await r.json()
        assert body["text"] and body["final_stage"] in (0, 1)
        assert body["latency_s"] > 0

    with_client(pipeline, t)


def test_generate_validation_422(pipeline):
    async def t(client):
        r = await client.post("/generate", json={"prompt": "   "})
        assert r.status == 422
        r = await client.post("/generate", json={"prompt": "x", "max_tokens": -1})
        assert r.status == 422

    with_client(pipeline, t)


def test_batch_generate(pipeline):
    async def t(client):
        r = await client.post(
            "/batch_generate", json={"prompts": ["a question", "another question"]}
        )
        assert r.status == 200
        body = await r.json()
        assert len(body["results"]) == 2

    with_client(pipeline, t)


def test_stats_and_reset(pipeline):
    async def t(client):
        await client.post("/generate", json={"prompt": "for stats"})
        r = await client.get("/stats")
        body = await r.json()
        assert body["total_requests"] >= 1
        assert len(body["stage_distribution"]) == 2
        r = await client.post("/reset_stats")
        assert (await r.json())["reset"]
        body = await (await client.get("/stats")).json()
        assert body["total_requests"] == 0

    with_client(pipeline, t)


def test_update_lambda_and_bounds(pipeline):
    async def t(client):
        r = await client.post("/update_lambda", json={"lambda_value": 2.5})
        assert r.status == 200 and pipeline.lam == 2.5
        r = await client.post("/update_lambda", json={"lambda_value": 0.001})
        assert r.status == 422

    with_client(pipeline, t)


def test_models(pipeline):
    async def t(client):
        r = await client.get("/models")
        body = await r.json()
        assert len(body["models"]) == 2 and body["costs"][1] > body["costs"][0]

    with_client(pipeline, t)


def test_cache_stats(pipeline):
    async def t(client):
        r = await client.get("/cache_stats")
        body = await r.json()
        assert "hit_rate" in body and "utilization" in body

    with_client(pipeline, t)


def test_api_key_auth(pipeline):
    async def t(client):
        r = await client.get("/health")
        assert r.status == 401
        r = await client.get("/health", headers={"x-api-key": "secret"})
        assert r.status == 200

    with_client(pipeline, t, api_key="secret")


def test_rate_limit(pipeline):
    async def t(client):
        statuses = []
        for _ in range(30):
            r = await client.get("/health")
            statuses.append(r.status)
        assert 429 in statuses  # tiny bucket must throttle a burst

    with_client(pipeline, t, rate_limit_rps=1.0)


def test_generate_stream_sse(pipeline):
    async def t(client):
        async with client.post(
            "/generate_stream", json={"prompt": "stream me a story please"}
        ) as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/event-stream")
            body = (await r.read()).decode()
        assert "data: " in body
        assert "event: done" in body
        assert '"final_stage"' in body

    with_client(pipeline, t)
