"""Streamlit chat UI against any wf-tpu (or OpenAI-compatible) server.

Analog of the reference's demo (reference demo/serve_sglang.py:33-306:
backend picked by env, SSE streaming parse, live tok/s stats). Run:

    WF_URL=http://localhost:30000 streamlit run demo/chat_ui.py

Gated: prints instructions instead of crashing when streamlit is absent.
"""

import json
import os
import time

SERVER_URL = os.environ.get("WF_URL", os.environ.get("INFERENCE_URL", "http://127.0.0.1:30000"))
MODEL = os.environ.get("WF_MODEL", "wrinklefree-tpu")


def stream_chat(messages, max_tokens=512, temperature=0.7):
    """Yield content deltas from /v1/chat/completions (SSE).

    Same wire parsing as the reference UI (demo/serve_sglang.py:77-111):
    'data: ' lines, '[DONE]' sentinel, delta.content accumulation.
    """
    import requests

    resp = requests.post(
        f"{SERVER_URL}/v1/chat/completions",
        json={
            "model": MODEL,
            "messages": messages,
            "stream": True,
            "max_tokens": max_tokens,
            "temperature": temperature,
        },
        stream=True,
        timeout=300,
    )
    resp.raise_for_status()
    for raw in resp.iter_lines():
        if not raw:
            continue
        line = raw.decode()
        if not line.startswith("data: "):
            continue
        payload = line[len("data: "):]
        if payload.strip() == "[DONE]":
            break
        delta = json.loads(payload)["choices"][0].get("delta", {})
        content = delta.get("content")
        if content:
            yield content


def main():
    try:
        import streamlit as st
    except ImportError:
        raise SystemExit(
            "streamlit is not installed in this environment.\n"
            "Install it (pip install streamlit) and run:\n"
            f"  WF_URL={SERVER_URL} streamlit run demo/chat_ui.py\n"
            "Or chat from the terminal instead:\n"
            f"  python -m wrinklefree_tpu.cli chat --url {SERVER_URL}"
        )

    st.set_page_config(page_title="WrinkleFree-TPU Chat", page_icon="~")
    st.title("WrinkleFree-TPU — ternary LLM serving")
    st.caption(f"server: {SERVER_URL}")

    with st.sidebar:
        temperature = st.slider("temperature", 0.0, 1.5, 0.7, 0.05)
        max_tokens = st.slider("max tokens", 16, 2048, 512, 16)
        if st.button("clear chat"):
            st.session_state.messages = []

    if "messages" not in st.session_state:
        st.session_state.messages = []

    for m in st.session_state.messages:
        with st.chat_message(m["role"]):
            st.markdown(m["content"])

    if prompt := st.chat_input("ask something"):
        st.session_state.messages.append({"role": "user", "content": prompt})
        with st.chat_message("user"):
            st.markdown(prompt)

        with st.chat_message("assistant"):
            box = st.empty()
            parts = []
            t0 = time.perf_counter()
            first = None
            for chunk in stream_chat(
                st.session_state.messages, max_tokens, temperature
            ):
                if first is None:
                    first = time.perf_counter() - t0
                parts.append(chunk)
                box.markdown("".join(parts) + "▌")
            total = time.perf_counter() - t0
            text = "".join(parts)
            box.markdown(text)
            n = max(1, len(text.split()))
            st.caption(
                f"TTFT {first:.2f}s · {total:.2f}s total · ~{n/total:.1f} words/s"
            )
        st.session_state.messages.append({"role": "assistant", "content": text})


if __name__ == "__main__":  # `streamlit run` executes with __main__
    main()
