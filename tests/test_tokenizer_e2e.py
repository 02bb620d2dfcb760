"""Real-tokenizer end-to-end serving (VERDICT r1 item 2c).

Every server test so far used the ByteTokenizer; the production flow
loads an HF tokenizer.json (reference cache/loader.py tokenizer path).
This builds a genuine `tokenizers`-backed fast tokenizer on disk, serves
the tiny model with it, and exercises encode -> engine -> incremental
detokenize through the HTTP API.
"""

import asyncio
import json
import socket
import threading
import time

import pytest
import requests

pytest.importorskip("tokenizers")
pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    """A tiny WordLevel fast tokenizer saved as tokenizer.json (+ config),
    loadable by AutoTokenizer — ids fit the tiny model's 256 vocab."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    words = (
        "<unk> <s> </s> hello world the quick brown fox jumps over lazy dog "
        "a b c d e f g h i j k . , ! ?"
    ).split()
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    d = tmp_path_factory.mktemp("tok")
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "unk_token": "<unk>", "bos_token": "<s>", "eos_token": "</s>",
        "clean_up_tokenization_spaces": False,
    }))
    return str(d)


@pytest.fixture(scope="module")
def server_url(tok_dir):
    from aiohttp import web

    from wrinklefree_tpu.server.http import build_app, create_server

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    server = create_server(tiny=True, use_pallas=False, tokenizer_path=tok_dir)
    app = build_app(server)
    loop = asyncio.new_event_loop()
    runner = web.AppRunner(app)

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", port)
        loop.run_until_complete(site.start())
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    url = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            if requests.get(f"{url}/health", timeout=1).status_code == 200:
                break
        except requests.RequestException:
            time.sleep(0.1)
    else:
        pytest.fail("server did not come up")
    yield url
    loop.call_soon_threadsafe(loop.stop)
    server.async_engine.shutdown()  # leaked scheduler threads drag CPU


def test_tokenize_roundtrip_real_tokenizer(server_url):
    text = "hello world the quick brown fox"
    r = requests.post(f"{server_url}/tokenize", json={"content": text},
                      timeout=30)
    assert r.status_code == 200
    ids = r.json()["tokens"]
    assert len(ids) == 6 and all(isinstance(i, int) for i in ids)
    r2 = requests.post(f"{server_url}/detokenize", json={"tokens": ids},
                       timeout=30)
    assert r2.status_code == 200
    assert r2.json()["content"].split() == text.split()


def test_chat_completion_decodes_through_real_tokenizer(server_url):
    r = requests.post(
        f"{server_url}/v1/chat/completions",
        json={
            "model": "x",
            "messages": [{"role": "user", "content": "hello world"}],
            "max_tokens": 8, "temperature": 0,
        },
        timeout=120,
    )
    assert r.status_code == 200
    body = r.json()
    text = body["choices"][0]["message"]["content"]
    assert isinstance(text, str)
    # WordLevel decode yields space-joined in-vocab words (the random
    # tiny model may emit ids >= tokenizer vocab -> decoded as empty/unk;
    # the contract is "no crash, str out, usage counted")
    assert body["usage"]["completion_tokens"] >= 1


def test_stream_with_real_tokenizer(server_url):
    r = requests.post(
        f"{server_url}/v1/chat/completions",
        json={
            "model": "x",
            "messages": [{"role": "user", "content": "the lazy dog"}],
            "max_tokens": 6, "temperature": 0, "stream": True,
        },
        stream=True, timeout=120,
    )
    assert r.status_code == 200
    saw_done = False
    for line in r.iter_lines():
        if not line:
            continue
        line = line.decode()
        assert line.startswith("data: ")
        if line == "data: [DONE]":
            saw_done = True
            break
        json.loads(line[len("data: "):])
    assert saw_done
