"""HTTP serving layer: concurrent requests through continuous batching."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from ctransformers_tpu import AutoModelForCausalLM
from ctransformers_tpu.serving.server import make_server

from .fixtures import build_gpt2


@pytest.fixture
def server(tmp_path):
    path = str(tmp_path / "m.bin")
    build_gpt2(path, seed=101)
    llm = AutoModelForCausalLM.from_pretrained(path, model_type="gpt2")
    srv = make_server(llm, port=0, batch_slots=4)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.serving_loop.shutdown()


def _post(srv, payload):
    host, port = srv.server_address
    req = urllib.request.Request(
        f"http://{host}:{port}/v1/completions",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_health(server):
    host, port = server.server_address
    with urllib.request.urlopen(f"http://{host}:{port}/health", timeout=30) as r:
        out = json.loads(r.read())
    assert out["status"] == "ok"
    assert out["slots"] == 4


def test_single_completion(server):
    out = _post(server, {"prompt": "hello", "max_tokens": 4, "temperature": 0})
    assert isinstance(out["text"], str)
    assert len(out["tokens"]) <= 4
    # greedy -> deterministic
    again = _post(server, {"prompt": "hello", "max_tokens": 4, "temperature": 0})
    assert again["text"] == out["text"]


def test_concurrent_requests_batch(server):
    prompts = ["hello", "the cat", "a b", "world", "big", "cat is"]
    results = [None] * len(prompts)

    def call(i):
        results[i] = _post(
            server, {"prompt": prompts[i], "max_tokens": 5, "temperature": 0}
        )

    threads = [threading.Thread(target=call, args=(i,)) for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None for r in results)
    # each must match its own solo greedy result
    solo = _post(server, {"prompt": prompts[2], "max_tokens": 5, "temperature": 0})
    assert results[2]["text"] == solo["text"]


def test_bad_request(server):
    host, port = server.server_address
    req = urllib.request.Request(
        f"http://{host}:{port}/v1/completions",
        data=b'{"no_prompt": 1}',
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def _post_stream(srv, payload):
    host, port = srv.server_address
    req = urllib.request.Request(
        f"http://{host}:{port}/v1/completions",
        data=json.dumps(dict(payload, stream=True)).encode(),
        headers={"Content-Type": "application/json"},
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        for line in r:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            data = line[len("data: "):]
            if data == "[DONE]":
                break
            chunks.append(json.loads(data)["text"])
    return chunks


def test_streaming_matches_blocking(server):
    payload = {"prompt": "ab", "max_tokens": 6, "temperature": 0.0, "seed": 3}
    blocking = _post(server, payload)["text"]
    chunks = _post_stream(server, payload)
    assert len(chunks) >= 1
    assert "".join(chunks) == blocking


def test_server_stop_strings(server):
    base = _post(server, {"prompt": "ab", "max_tokens": 8,
                          "temperature": 0.0, "seed": 3})["text"]
    assert len(base) > 4
    needle = base[2:4]
    expected = base[: base.index(needle)]
    got = _post(server, {"prompt": "ab", "max_tokens": 8,
                         "temperature": 0.0, "seed": 3, "stop": needle})
    assert got["text"] == expected
    # streamed chunks reassemble to the same truncated text
    chunks = _post_stream(server, {"prompt": "ab", "max_tokens": 8,
                                   "temperature": 0.0, "seed": 3,
                                   "stop": [needle]})
    assert "".join(chunks) == expected
