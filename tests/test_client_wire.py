"""Wire-level VLM client tests: real sockets, no SDKs.

The reference's network seam (/root/reference/api_client.py:154-261) was
only ever exercised against live Nebius/Ollama.  Here a local stdlib HTTP
server speaks both wire protocols (OpenAI chat-completions REST and
Ollama's /api/chat) so the full adapter — multimodal message parts, tool
forwarding, response normalization, error paths — runs over actual HTTP,
using the client's SDK-free urllib transport.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from types import SimpleNamespace

import pytest

import image_transformation_tpu.vlm.client as client_mod
from image_transformation_tpu.vlm.client import APIClient, register_fake_client

REPO = Path(__file__).resolve().parents[1]


class _WireHandler(BaseHTTPRequestHandler):
    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(length).decode("utf-8"))
        record = {"path": self.path, "headers": dict(self.headers), "body": body}
        self.server.requests.append(record)
        status, payload = self.server.responder(record)
        data = json.dumps(payload).encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        # liveness probes (auto-mode Ollama detection hits GET /api/tags)
        record = {"path": self.path, "headers": dict(self.headers), "body": None}
        self.server.requests.append(record)
        data = json.dumps({"models": []}).encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # keep pytest output clean
        pass


def _default_responder(record):
    if record["path"].endswith("/chat/completions"):
        return 200, {"choices": [{"message": {"content": "wire-ok"}}]}
    return 200, {"message": {"content": "wire-ok"}}


@pytest.fixture
def wire(monkeypatch):
    server = ThreadingHTTPServer(("127.0.0.1", 0), _WireHandler)
    server.requests = []
    server.responder = _default_responder
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    server.url = f"http://127.0.0.1:{server.server_address[1]}"
    # force the raw transports even if SDKs appear in the image later
    monkeypatch.setattr(client_mod, "OPENAI_AVAILABLE", False)
    monkeypatch.setattr(client_mod, "OLLAMA_AVAILABLE", False)
    register_fake_client(None)  # drop any cached clients
    yield server
    register_fake_client(None)
    server.shutdown()
    thread.join(timeout=5)


def test_nebius_raw_multimodal_request(wire):
    client = APIClient(api_type="nebius", api_key="secret-key",
                       base_url=wire.url + "/v1/")
    out = client.chat_completion(
        messages=[
            {"role": "system", "content": "sys contract"},
            {"role": "user", "content": "place things", "images": ["QUJD"]},
        ],
        temperature=0.3,
    )
    assert out == {"message": {"content": "wire-ok"}}

    (req,) = wire.requests
    assert req["path"] == "/v1/chat/completions"
    assert req["headers"]["Authorization"] == "Bearer secret-key"
    body = req["body"]
    assert body["model"] == client_mod.NEBIUS_DEFAULT_VLM
    assert body["temperature"] == 0.3
    sys_msg, user_msg = body["messages"]
    assert sys_msg == {"role": "system", "content": "sys contract"}
    parts = user_msg["content"]
    assert parts[0] == {"type": "text", "text": "place things"}
    assert parts[1]["type"] == "image_url"
    assert parts[1]["image_url"]["url"] == "data:image/jpeg;base64,QUJD"


def test_nebius_raw_tools_roundtrip(wire):
    tools = [{"type": "function",
              "function": {"name": "adjust_x",
                           "parameters": {"type": "object", "properties": {}}}}]

    def responder(record):
        return 200, {"choices": [{"message": {
            "content": None,
            "tool_calls": [{"id": "call_1", "type": "function",
                            "function": {"name": "adjust_x",
                                         "arguments": '{"object": "logo", "pixels": 12}'}}],
        }}]}

    wire.responder = responder
    client = APIClient(api_type="nebius", api_key="k", base_url=wire.url + "/v1/")
    out = client.chat_completion(
        messages=[{"role": "user", "content": "nudge it"}],
        tools=tools, tool_choice="auto", max_tokens=256,
    )
    body = wire.requests[0]["body"]
    assert body["tools"] == tools
    assert body["tool_choice"] == "auto"
    assert body["max_tokens"] == 256
    assert out["message"]["content"] == ""
    (tc,) = out["message"]["tool_calls"]
    assert tc["id"] == "call_1"
    assert tc["function"]["name"] == "adjust_x"
    assert json.loads(tc["function"]["arguments"]) == {"object": "logo", "pixels": 12}


def test_nebius_http_error_raises(wire):
    wire.responder = lambda record: (500, {"error": "boom"})
    client = APIClient(api_type="nebius", api_key="k", base_url=wire.url + "/v1/")
    with pytest.raises(RuntimeError, match="HTTP 500"):
        client.chat_completion(messages=[{"role": "user", "content": "x"}])


def test_auto_resolves_nebius_without_sdk(wire, monkeypatch):
    monkeypatch.setenv("NEBIUS_API_KEY", "env-key")
    monkeypatch.setenv("NEBIUS_BASE_URL", wire.url + "/v1")  # no trailing slash
    client = APIClient(api_type="auto")
    assert client.api_type == "nebius"
    out = client.chat_completion(messages=[{"role": "user", "content": "hi"}])
    assert out["message"]["content"] == "wire-ok"
    assert wire.requests[0]["headers"]["Authorization"] == "Bearer env-key"


def test_auto_resolves_ollama_without_sdk(wire, monkeypatch):
    """auto mode must select the SDK-free Ollama transport when only a
    running server is present (no NEBIUS key, no ollama package)."""
    monkeypatch.delenv("NEBIUS_API_KEY", raising=False)
    monkeypatch.setenv("OLLAMA_HOST", wire.url)
    client = APIClient(api_type="auto")
    assert client.api_type == "ollama"
    out = client.chat_completion(messages=[{"role": "user", "content": "hi"}])
    assert out["message"]["content"] == "wire-ok"
    # the liveness probe hit /api/tags, the chat hit /api/chat — raw HTTP
    assert wire.requests[0]["path"] == "/api/tags"
    assert wire.requests[-1]["path"] == "/api/chat"


def test_nebius_sdk_path_builds_identical_params(wire):
    """With an SDK client injected, the same request params reach
    .chat.completions.create and SDK-object responses normalize the same."""
    client = APIClient(api_type="nebius", api_key="k", base_url=wire.url + "/v1/")
    seen = {}

    def create(**params):
        seen.update(params)
        msg = SimpleNamespace(
            content="sdk-ok",
            tool_calls=[SimpleNamespace(
                id="c9", function=SimpleNamespace(name="adjust_y", arguments="{}"))],
        )
        return SimpleNamespace(choices=[SimpleNamespace(message=msg)])

    client.nebius_client = SimpleNamespace(
        chat=SimpleNamespace(completions=SimpleNamespace(create=create)))
    out = client.chat_completion(
        messages=[{"role": "user", "content": "go", "images": ["QUJD"]}],
        model="custom/model", temperature=0.7, tools=[{"type": "function"}],
        tool_choice="required",
    )
    assert seen["model"] == "custom/model"
    assert seen["temperature"] == 0.7
    assert seen["tool_choice"] == "required"
    assert seen["messages"][0]["content"][1]["image_url"]["url"].startswith(
        "data:image/jpeg;base64,")
    assert out["message"]["content"] == "sdk-ok"
    assert out["message"]["tool_calls"][0]["function"]["name"] == "adjust_y"
    assert not wire.requests  # nothing hit the raw transport


def test_ollama_raw_request_and_passthrough(wire, monkeypatch):
    monkeypatch.setenv("OLLAMA_HOST", wire.url)
    wire.responder = lambda record: (200, {
        "model": "llava:13b", "message": {"content": "olla-ok"}, "done": True})
    client = APIClient(api_type="ollama")
    out = client.chat_completion(
        messages=[{"role": "user", "content": "describe", "images": ["QUJD"]}],
        temperature=0.2, max_tokens=77, format="json",
        tools=[{"type": "function"}], keep_alive="5m",
    )
    assert out["message"]["content"] == "olla-ok"
    (req,) = wire.requests
    assert req["path"] == "/api/chat"
    body = req["body"]
    assert body["model"] == client_mod.OLLAMA_DEFAULT_VLM
    assert body["stream"] is False
    # Ollama keeps the reference's native message shape (images list intact)
    assert body["messages"][0]["images"] == ["QUJD"]
    assert body["options"] == {"temperature": 0.2, "top_p": 0.1, "num_predict": 77}
    assert body["format"] == "json"
    assert body["tools"] == [{"type": "function"}]
    assert body["keep_alive"] == "5m"


def test_ollama_model_not_found(wire, monkeypatch):
    monkeypatch.setenv("OLLAMA_HOST", wire.url)
    wire.responder = lambda record: (404, {"error": "model 'llava:13b' not found"})
    client = APIClient(api_type="ollama")
    with pytest.raises(RuntimeError, match="ollama pull"):
        client.chat_completion(messages=[{"role": "user", "content": "x"}])


def test_full_pipeline_over_wire(wire, monkeypatch, tmp_path):
    """run_macro_only speaks real HTTP end-to-end: planner (multimodal),
    critic, refiner — all served by the local chat-completions server."""
    from image_transformation_tpu.pipeline.run import run_macro_only

    items = json.loads((REPO / "data" / "squarespace" / "results.json").read_text())
    layout = json.dumps({"root": {"type": "flex", "direction": "column", "children": [
        {"object_id": int(it["object_id"]), "name": it["label"]} for it in items]}})

    def responder(record):
        first = record["body"]["messages"][0]
        sys_text = first["content"] if isinstance(first["content"], str) else ""
        content = ("1. Overall Score: 8/10\nFine." if "critic" in sys_text.lower()
                   else layout)
        return 200, {"choices": [{"message": {"content": content}}]}

    wire.responder = responder
    monkeypatch.setenv("NEBIUS_BASE_URL", wire.url + "/v1/")
    run_macro_only(
        "data/squarespace", "9:16", "center", 0.05,
        api_type="nebius", api_key="wire-key", refine_iters=1,
        base_output_root=tmp_path,
    )
    out = tmp_path / "squarespace"
    assert (out / "iteration_00" / "final_product" / "draft_macro_iter_00.png").exists()
    # planner + critic + refiner all travelled over the socket
    assert len(wire.requests) >= 3
    planner_parts = wire.requests[0]["body"]["messages"][-1]["content"]
    assert isinstance(planner_parts, list)
    assert sum(p["type"] == "image_url" for p in planner_parts) >= 2
    assert all(r["headers"]["Authorization"] == "Bearer wire-key"
               for r in wire.requests)


def test_agentic_workflow_over_wire_with_tool_calls(wire, monkeypatch, tmp_path):
    """The agentic pipeline speaks real HTTP end-to-end: macro layout,
    critic, and a micro round whose TOOL CALLS travel the wire (the
    behavior that is dead code in the reference, SURVEY §2.6.2)."""
    from image_transformation_tpu.agentic.workflow import run_workflow

    layout = {"root": {"type": "flex", "direction": "column", "gap_px": 4,
                       "children": [
                           {"object_id": 1, "name": "logo"},
                           {"object_id": 2, "name": "photo"},
                           {"object_id": 3, "name": "text"},
                           {"object_id": 4, "name": "cta"},
                       ]}}
    plain_calls = {"n": 0}

    def responder(record):
        body = record["body"]
        if body.get("tools"):  # micro round: answer with executable calls
            return 200, {"choices": [{"message": {
                "content": "",
                "tool_calls": [{"id": "w1", "type": "function",
                                "function": {"name": "adjust_x",
                                             "arguments": json.dumps(
                                                 {"object": "logo", "pixels": 10})}}],
            }}]}
        plain_calls["n"] += 1
        content = (json.dumps(layout) if plain_calls["n"] == 1
                   else "Score: 8/10\nSuggestions: nudge the logo right")
        return 200, {"choices": [{"message": {"content": content}}]}

    wire.responder = responder
    monkeypatch.setenv("NEBIUS_BASE_URL", wire.url + "/v1/")
    state = run_workflow(
        bundle_dir="data/squarespace", ratio="9:16", base_run_dir=tmp_path,
        api_type="nebius", api_key="wire-key", max_iterations=1,
    )
    assert state.iteration == 1
    assert len(state.last_tool_calls) == 1
    assert state.placements[1].x == 10  # the wire-delivered adjust_x ran

    # the micro request really carried the tool schemas over the socket
    tool_reqs = [r for r in wire.requests if r["body"].get("tools")]
    assert tool_reqs, "no request carried tools"
    names = {t["function"]["name"] for t in tool_reqs[0]["body"]["tools"]}
    assert names == {"adjust_x", "adjust_y"}
    assert tool_reqs[0]["body"].get("tool_choice") is not None
