"""Serving daemon tests: device-resident compose over HTTP."""

import io
import json
import os
import tempfile
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from image_transformation_tpu.serving import ComposeService, serve

# Keep test-created batch-step records out of the user's real warm-start
# manifest: every ComposeService in this module writes here — a FORCED
# override, because a developer with ITPU_SERVING_MANIFEST exported (e.g.
# pointing at a production daemon's manifest) must not get test layouts
# warm-compiled on their next restart.
os.environ["ITPU_SERVING_MANIFEST"] = os.path.join(
    tempfile.mkdtemp(prefix="itpu_serving_manifest_"), "steps.json"
)


@pytest.fixture(scope="module")
def server():
    srv = serve("data", port=0)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()
    thread.join(timeout=5)


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(), method="POST",
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read(), r.headers.get("Content-Type", "")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type", "")


def test_healthz_and_bundles(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        health = json.loads(r.read())
    assert health["ok"] and health["bundles"] == 2
    with urllib.request.urlopen(server + "/v1/bundles") as r:
        bundles = json.loads(r.read())
    assert {b["stem"] for b in bundles} == {"squarespace", "audio_book"}
    assert all(b["original"] == [970, 250] for b in bundles)


def test_render_default_layout_png(server):
    status, body, ctype = _post(server, "/v1/render",
                                {"bundle": "squarespace", "ratio": "9:16"})
    assert status == 200 and ctype == "image/png"
    im = Image.open(io.BytesIO(body))
    assert im.size == (369, 657)
    # matches the exact library path for the same canned layout
    from image_transformation_tpu.serving.server import ComposeService

    svc = ComposeService("data")
    _, _, composed = svc.render("squarespace", "9:16")
    assert np.array_equal(np.asarray(im.convert("RGBA")), composed)


def test_render_boxes_only_and_custom_layout(server):
    layout = {"root": {"type": "flex", "direction": "row",
                       "children": [{"object_id": 2, "name": "photo"}]}}
    status, body, _ = _post(server, "/v1/render", {
        "bundle": "squarespace", "ratio": "1:1",
        "layout": layout, "boxes_only": True,
    })
    assert status == 200
    data = json.loads(body)
    assert data["canvas"] == {"width": 492, "height": 492}
    assert len(data["placements"]) == 1
    assert data["placements"][0]["object_id"] == 2


def test_render_gradient_background(server):
    status, body, ctype = _post(server, "/v1/render", {
        "bundle": "audio_book", "ratio": "1:1", "background": "gradient",
    })
    assert status == 200 and ctype == "image/png"


def test_render_errors(server):
    status, body, _ = _post(server, "/v1/render", {"ratio": "1:1"})
    assert status == 400
    status, body, _ = _post(server, "/v1/render",
                            {"bundle": "nope", "ratio": "1:1"})
    assert status in (404, 500)
    status, body, _ = _post(server, "/v1/render", {
        "bundle": "squarespace", "ratio": "1:1", "layout": {"type": "flex"},
    })
    assert status == 500
    assert b"root" in body


def test_render_batch_endpoint(server):
    """POST /v1/render_batch: all ratio variants in one fused device pass
    (pallas kernel with latched XLA fallback on CPU); PNGs decode to the
    solved canvas sizes and match the fused renderer's output."""
    import base64

    status, body, ctype = _post(server, "/v1/render_batch", {
        "bundle": "squarespace", "ratios": ["9:16", "1:1"],
    })
    assert status == 200 and "json" in ctype
    payload = json.loads(body)
    assert set(payload) == {"9:16", "1:1"}
    for ratio, entry in payload.items():
        w, h = entry["canvas"]["width"], entry["canvas"]["height"]
        img = Image.open(io.BytesIO(base64.b64decode(entry["png_b64"])))
        assert img.size == (w, h)
        assert len(entry["boxes"]) == 4  # squarespace has 4 objects
    # 9:16 canvas must be taller than wide, 1:1 square
    assert payload["9:16"]["canvas"]["height"] > payload["9:16"]["canvas"]["width"]
    assert (payload["1:1"]["canvas"]["height"]
            == payload["1:1"]["canvas"]["width"])


def test_render_batch_errors(server):
    status, body, _ = _post(server, "/v1/render_batch", {"ratios": ["1:1"]})
    assert status == 400
    status, body, _ = _post(server, "/v1/render_batch", {
        "bundle": "squarespace", "layout": {"notroot": {}},
    })
    assert status == 500 or status == 400


def test_render_fleet_endpoint(server):
    """POST /v1/render_fleet: bundles x ratios matrix; defaults to every
    bundle under the root; entries match the single-bundle batch path."""
    import base64

    status, body, ctype = _post(server, "/v1/render_fleet", {
        "ratios": ["1:1", "9:16"],
    })
    assert status == 200 and "json" in ctype
    payload = json.loads(body)
    assert set(payload) == {"squarespace", "audio_book"}
    for stem, per_ratio in payload.items():
        assert set(per_ratio) == {"1:1", "9:16"}
        for r, entry in per_ratio.items():
            w, h = entry["canvas"]["width"], entry["canvas"]["height"]
            img = Image.open(io.BytesIO(base64.b64decode(entry["png_b64"])))
            assert img.size == (w, h)
    # cross-check one cell against the direct batch endpoint
    status, body, _ = _post(server, "/v1/render_batch", {
        "bundle": "squarespace", "ratios": ["1:1"],
    })
    single = json.loads(body)
    assert payload["squarespace"]["1:1"] == single["1:1"]


def test_render_fleet_isolates_bundle_failures(server):
    """A missing bundle fails alone; the others still render."""
    status, body, _ = _post(server, "/v1/render_fleet", {
        "bundles": ["squarespace", "no_such_bundle"], "ratios": ["1:1"],
    })
    assert status == 200
    payload = json.loads(body)
    assert "error" in payload["no_such_bundle"]
    assert "1:1" in payload["squarespace"]


def test_render_batch_streaming_ndjson(server):
    """"stream": true turns /v1/render_batch into chunked NDJSON — one
    line per requested ratio, byte-identical content to the buffered
    JSON payload."""
    status, body, ctype = _post(server, "/v1/render_batch", {
        "bundle": "squarespace", "ratios": ["1:1", "9:16"], "stream": True,
    })
    assert status == 200 and "ndjson" in ctype
    lines = [json.loads(ln) for ln in body.decode().splitlines() if ln]
    assert [ln["ratio"] for ln in lines] == ["1:1", "9:16"]
    status, buffered_body, _ = _post(server, "/v1/render_batch", {
        "bundle": "squarespace", "ratios": ["1:1", "9:16"],
    })
    buffered = json.loads(buffered_body)
    for ln in lines:
        r = ln.pop("ratio")
        assert ln == buffered[r]


def test_render_fleet_streaming_completion_order(server):
    """"stream": true on /v1/render_fleet yields one NDJSON line per
    bundle (completion order), per-bundle errors isolated in-stream."""
    import base64

    status, body, ctype = _post(server, "/v1/render_fleet", {
        "bundles": ["squarespace", "no_such_bundle", "audio_book"],
        "ratios": ["1:1"], "stream": True,
    })
    assert status == 200 and "ndjson" in ctype
    lines = [json.loads(ln) for ln in body.decode().splitlines() if ln]
    by_stem = {ln["bundle"]: ln for ln in lines}
    assert set(by_stem) == {"squarespace", "no_such_bundle", "audio_book"}
    assert "error" in by_stem["no_such_bundle"]
    for stem in ("squarespace", "audio_book"):
        entry = by_stem[stem]["renders"]["1:1"]
        img = Image.open(io.BytesIO(base64.b64decode(entry["png_b64"])))
        assert img.size == (
            entry["canvas"]["width"], entry["canvas"]["height"],
        )


def test_streaming_first_line_before_last(server):
    """The first NDJSON line is readable off the socket before the stream
    finishes — i.e. results really are flushed incrementally, not
    buffered into one body."""
    req = urllib.request.Request(
        server + "/v1/render_fleet",
        data=json.dumps({
            "bundles": ["squarespace", "audio_book"],
            "ratios": ["1:1"], "stream": True,
        }).encode(),
        method="POST", headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        first = r.readline()
        ln = json.loads(first)
        assert ln.get("renders") or ln.get("error")
        rest = r.read().decode().splitlines()
    assert len([x for x in rest if x]) == 1  # exactly one more bundle line


def test_keepalive_framing_mixed_responses(server):
    """HTTP/1.1 keep-alive: one socket carries buffered PNG, chunked
    NDJSON, and buffered JSON responses back-to-back — i.e. every
    response is framed exactly (Content-Length or chunked), so the
    connection never desyncs."""
    import http.client
    from urllib.parse import urlparse

    u = urlparse(server)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=120)
    try:
        def post(path, payload):
            conn.request(
                "POST", path, body=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            r = conn.getresponse()
            return r.status, r.read(), r.headers.get("Content-Type", "")

        s1, png, ct1 = post("/v1/render", {
            "bundle": "squarespace", "ratio": "1:1",
        })
        assert s1 == 200 and ct1 == "image/png" and png[:4] == b"\x89PNG"
        s2, body2, ct2 = post("/v1/render_batch", {
            "bundle": "squarespace", "ratios": ["1:1"], "stream": True,
        })
        assert s2 == 200 and "ndjson" in ct2
        assert json.loads(body2.decode().splitlines()[0])["ratio"] == "1:1"
        s3, body3, ct3 = post("/v1/render", {
            "bundle": "squarespace", "ratio": "1:1", "boxes_only": True,
        })
        assert s3 == 200 and "json" in ct3 and "placements" in json.loads(body3)
    finally:
        conn.close()


def test_keepalive_error_paths_drain_request_body(server):
    """A 404 (unknown path) and a 400 (bad request) must consume the
    POSTed body before responding: an unread body on the persistent
    connection would be parsed as the next request line, desyncing every
    later request on the same socket."""
    import http.client
    from urllib.parse import urlparse

    u = urlparse(server)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=120)
    try:
        def post(path, payload):
            conn.request(
                "POST", path, body=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            r = conn.getresponse()
            return r.status, r.read()

        s1, body1 = post("/v1/nope", {"bundle": "squarespace", "pad": "x" * 512})
        assert s1 == 404 and "error" in json.loads(body1)
        # missing-field 400 on a real endpoint, body still drained
        s2, body2 = post("/v1/render_batch", {"pad": "y" * 512})
        assert s2 == 400 and "error" in json.loads(body2)
        # the SAME connection must still serve a valid request cleanly
        s3, body3 = post("/v1/render", {
            "bundle": "squarespace", "ratio": "1:1", "boxes_only": True,
        })
        assert s3 == 200 and "placements" in json.loads(body3)
    finally:
        conn.close()


def test_http10_client_stream_degrades_to_buffered(server):
    """An HTTP/1.0 client asking for "stream": true cannot decode
    chunked framing, so the server must answer with the buffered JSON
    response instead."""
    import socket
    from urllib.parse import urlparse

    u = urlparse(server)
    body = json.dumps({
        "bundle": "squarespace", "ratios": ["1:1"], "stream": True,
    }).encode()
    request = (
        f"POST /v1/render_batch HTTP/1.0\r\n"
        f"Host: {u.hostname}\r\n"
        f"Content-Type: application/json\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"\r\n"
    ).encode() + body
    with socket.create_connection((u.hostname, u.port), timeout=120) as sock:
        sock.sendall(request)
        raw = b""
        while True:
            piece = sock.recv(65536)
            if not piece:
                break
            raw += piece
    head, _, payload = raw.partition(b"\r\n\r\n")
    headers = head.decode("latin-1").lower()
    assert " 200 " in headers.splitlines()[0]
    assert "transfer-encoding: chunked" not in headers
    assert "content-length:" in headers
    assert "png_b64" in json.loads(payload)["1:1"]


def test_malformed_content_length_closes_connection(server):
    """An unparsable Content-Length makes the request framing unknowable:
    the server answers with an error and CLOSES the connection (the next
    bytes on the socket could be anything)."""
    import socket
    from urllib.parse import urlparse

    u = urlparse(server)
    request = (
        "POST /v1/render HTTP/1.1\r\n"
        f"Host: {u.hostname}\r\n"
        "Content-Type: application/json\r\n"
        "Content-Length: notanumber\r\n"
        "\r\n"
    ).encode()
    with socket.create_connection((u.hostname, u.port), timeout=60) as sock:
        sock.sendall(request)
        raw = b""
        while True:  # server must close: recv drains to EOF
            piece = sock.recv(65536)
            if not piece:
                break
            raw += piece
    status = raw.split(b"\r\n", 1)[0]
    assert b"500" in status or b"400" in status, status
    headers = raw.split(b"\r\n\r\n", 1)[0].decode("latin-1").lower()
    assert "connection: close" in headers


def test_fleet_iter_abandoned_cancels_queued_bundles(monkeypatch):
    """Closing render_fleet_iter mid-stream (a streaming client
    disconnected) must cancel queued bundles instead of rendering the
    whole remaining matrix for a dead consumer."""
    import time

    service = ComposeService("data")
    rendered = []

    def fake_render_batch(stem, ratios, layout=None, background="solid"):
        rendered.append(stem)
        time.sleep(0.2)
        return {r: ((10, 10), [], np.zeros((10, 10, 4), np.uint8))
                for r in ratios}

    monkeypatch.setattr(service, "render_batch", fake_render_batch)
    stems = [f"b{i}" for i in range(6)]
    monkeypatch.setattr(
        service, "_resolve_stems", lambda s: list(s) if s else stems
    )

    it = service.render_fleet_iter(stems, ["1:1"], parallel=1)
    first = next(it)
    assert first[0] in stems and "renders" in first[1]
    it.close()  # client gone: GeneratorExit inside the pool block
    time.sleep(1.0)  # were the queue NOT cancelled, more would render
    # parallel=1: the first bundle rendered, at most one more was already
    # in flight when the generator closed; the other four were cancelled
    assert len(rendered) <= 2, rendered


def test_stats_endpoint(server):
    """GET /v1/stats exposes cache/coalescing counters."""
    with urllib.request.urlopen(server + "/v1/stats") as r:
        stats = json.loads(r.read())
    for key in ("bundles_loaded", "engines", "batch_steps",
                "device_inputs", "requests", "dispatches"):
        assert key in stats, key
    assert stats["bundles_loaded"] >= 1
    assert stats["requests"] >= stats["dispatches"]


def test_render_latency_split(server):
    """Each /v1/render response attributes its latency across phases
    (X-Render-Timings header), and /v1/stats aggregates rolling
    percentiles per phase — how an operator tells device compose from
    readback from PNG encode on a production host."""
    req = urllib.request.Request(
        server + "/v1/render",
        data=json.dumps({"bundle": "squarespace", "ratio": "9:16"}).encode(),
        method="POST", headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        timings = json.loads(r.headers["X-Render-Timings"])
        r.read()
    for phase in ("solve_ms", "queue_ms", "pipeline_wait_ms", "dispatch_ms",
                  "device_ms", "readback_ms", "encode_ms"):
        assert phase in timings, phase
        assert timings[phase] >= 0
    assert timings["merged"] >= 1
    # the calibrated transport floor is positive (a dispatch + fence is
    # never free) and bounded by the raw fenced wall
    assert timings["dispatch_ms"] > 0

    with urllib.request.urlopen(server + "/v1/stats") as r:
        stats = json.loads(r.read())
    latency = stats["latency_ms"]
    for phase in ("solve", "queue", "pipeline_wait", "dispatch", "device",
                  "readback", "encode"):
        assert latency[phase]["count"] >= 1, phase
        assert latency[phase]["p95_ms"] >= latency[phase]["p50_ms"] >= 0
    # the floor sample distribution is public (advisor r4): benchmarks
    # stamp it instead of reaching into module privates
    floor = stats["dispatch_floor"]
    assert floor["floor_ms"] is not None and floor["samples"] >= 1
    assert floor["p95_ms"] >= floor["p50_ms"] > 0


def test_render_batch_user_errors_do_not_latch():
    """A malformed request (bad ratio / bad layout) must raise during
    validation WITHOUT latching the kernel fallback — only backend/kernel
    failures may downgrade the serving daemon."""
    svc = ComposeService("data")
    with pytest.raises(Exception):
        svc.render_batch("squarespace", ["not-a-ratio"])
    with pytest.raises(ValueError):
        svc.render_batch("squarespace", ["1:1"], layout={"notroot": {}})
    assert svc._batch_latched is False
    # a valid request afterwards still works (CPU latches here, loudly,
    # because Mosaic is unavailable — that IS a kernel failure)
    out = svc.render_batch("squarespace", ["1:1"])
    assert "1:1" in out


def test_concurrent_render_requests(server):
    """ThreadingHTTPServer + device dispatch: concurrent render requests on
    the same and different engines must all succeed with identical pixels
    for identical inputs (the engine cache races are lock-guarded)."""
    import concurrent.futures

    def one(i):
        ratio = "1:1" if i % 2 == 0 else "9:16"
        status, body, ctype = _post(server, "/v1/render", {
            "bundle": "squarespace", "ratio": ratio,
        })
        assert status == 200 and "png" in ctype, (status, ctype)
        return ratio, body

    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as pool:
        results = list(pool.map(one, range(12)))
    by_ratio = {}
    for ratio, body in results:
        by_ratio.setdefault(ratio, set()).add(body)
    # identical requests -> identical PNG bytes
    for ratio, bodies in by_ratio.items():
        assert len(bodies) == 1, f"{ratio}: {len(bodies)} distinct renders"


def test_render_batch_gradient_background():
    """Batch endpoint renders gradient backgrounds: uncovered pixels match
    the per-request gradient canvas within the documented f32-lerp
    truncation envelope (<= 1/255 — the fused step divides by a traced
    extent, the standalone canvas by a static one, so truncation at ramp
    boundaries can flip by one, exactly like the reference cross-check in
    test_cross_legacy.py)."""
    import jax.numpy as jnp

    from image_transformation_tpu.ops.background import synthesize_canvas

    svc = ComposeService("data")
    out = svc.render_batch("audio_book", ["1:1", "9:16"], background="gradient")
    for ratio, ((w, h), boxes, img) in out.items():
        assert img.shape == (h, w, 4)
        bg = np.asarray(synthesize_canvas(
            jnp.asarray(np.asarray(svc._bundle("audio_book").background)),
            w, h, "gradient",
        ))
        covered = np.zeros((h, w), bool)
        for x1, y1, x2, y2 in boxes:
            covered[max(0, y1):max(0, y2), max(0, x1):max(0, x2)] = True
        assert not covered.all(), "need uncovered background to compare"
        diff = np.abs(img[~covered].astype(int) - bg[~covered].astype(int))
        assert diff.max() <= 1, (ratio, diff.max())


def test_render_batch_ratio_order_shares_cache():
    """The compiled batch step is keyed on the canonical ratio set: request
    order and duplicates reuse one entry, responses keep request order."""
    svc = ComposeService("data")
    a = svc.render_batch("squarespace", ["9:16", "1:1"])
    assert len(svc._batch_steps) == 1
    entry = next(iter(svc._batch_steps.values()))
    b = svc.render_batch("squarespace", ["1:1", "9:16"])
    c = svc.render_batch("squarespace", ["1:1", "1:1", "9:16"])
    assert len(svc._batch_steps) == 1
    assert next(iter(svc._batch_steps.values())) is entry
    for ratio in ("9:16", "1:1"):
        assert a[ratio][0] == b[ratio][0] == c[ratio][0]
        assert np.array_equal(a[ratio][2], b[ratio][2])
        assert np.array_equal(a[ratio][2], c[ratio][2])


def test_render_batch_iter_semantics():
    """render_batch_iter: yields each UNIQUE ratio once in first-seen
    request order (duplicates fold, matching the buffered dict API —
    ADVICE r3), each exact crop equals the dict API's, and bad input
    raises at CALL time — before any line could have been streamed."""
    svc = ComposeService("data")
    ratios = ["9:16", "1:1", "9:16"]
    entries = list(svc.render_batch_iter("squarespace", ratios))
    assert [r for r, _ in entries] == ["9:16", "1:1"]
    buffered = svc.render_batch("squarespace", ["1:1", "9:16"])
    for r, ((w, h), boxes, img) in entries:
        assert img.shape == (h, w, 4)
        assert buffered[r][0] == (w, h) and buffered[r][1] == boxes
        assert np.array_equal(img, buffered[r][2])
    # eager validation/dispatch: the CALL raises, not the first next()
    with pytest.raises(Exception):
        svc.render_batch_iter("squarespace", ["not-a-ratio"])
    with pytest.raises(FileNotFoundError):
        svc.render_batch_iter("no-such-bundle", ["1:1"])


def test_engine_compose_many_matches_sequential():
    """The coalescer's vmapped batch compose is bit-exact vs sequential
    compose, including ragged placement counts (no-op padding)."""
    svc = ComposeService("data")
    full, canvas_size = svc.solve("squarespace", "1:1")
    partial = full[:2]
    engine = svc._engine("squarespace", canvas_size, "solid")
    stacked = np.asarray(engine.compose_many([full, partial, full]))
    assert stacked.shape[0] == 3
    seq_full = np.asarray(engine.compose(full))
    seq_partial = np.asarray(engine.compose(partial))
    assert np.array_equal(stacked[0], seq_full)
    assert np.array_equal(stacked[1], seq_partial)
    assert np.array_equal(stacked[2], seq_full)


def test_engine_call_cache_lru_bounds_bytes():
    """The engine's per-call input cache evicts oldest entries when the
    device-byte budget is exceeded (compose_many entries stack tables up
    to ~64x a single compose's, so a count-only cap could pin HBM)."""
    svc = ComposeService("data")
    full, canvas_size = svc.solve("squarespace", "1:1")
    engine = svc._engine("squarespace", canvas_size, "solid")
    engine._cache_clear()
    # measure one signature's footprint (may include a fused-path entry
    # alongside the XLA-path entry), then budget ~1.5x that and keep
    # composing distinct signatures: the cache must evict to the budget
    engine.compose(full)
    one_sig = engine._cache_bytes
    assert one_sig > 0
    engine._cache_max_bytes = one_sig + one_sig // 2
    for i in range(1, 6):
        shifted = [
            {**p, "box": [v + i for v in p["box"]]} for p in full
        ]
        engine.compose(shifted)
    assert engine._cache_bytes <= engine._cache_max_bytes
    assert len(engine._call_cache) < 6  # evictions actually happened
    # repeated signature is a hit (stays cached, no growth)
    n, nbytes = len(engine._call_cache), engine._cache_bytes
    shifted = [{**p, "box": [v + 5 for v in p["box"]]} for p in full]
    engine.compose(shifted)
    assert (len(engine._call_cache), engine._cache_bytes) == (n, nbytes)


def test_concurrent_renders_coalesce_dispatches():
    """Queued compatible requests merge into fewer device dispatches than
    requests (the first dispatch is slowed so a queue builds up)."""
    import concurrent.futures
    import time

    svc = ComposeService("data")
    placements, canvas_size = svc.solve("squarespace", "1:1")
    engine = svc._engine("squarespace", canvas_size, "solid")
    # warm the compiled paths so timing is deterministic
    np.asarray(engine.compose(placements))
    np.asarray(engine.compose_many([placements, placements]))

    real_compose = engine.compose

    def slow_compose(p):
        time.sleep(0.3)  # let followers pile into the coalescer queue
        return real_compose(p)

    engine.compose = slow_compose
    try:
        with concurrent.futures.ThreadPoolExecutor(max_workers=6) as pool:
            outs = list(pool.map(
                lambda _: svc.render("squarespace", "1:1")[2], range(6)
            ))
    finally:
        engine.compose = real_compose
    stats = svc.coalescing_stats()
    assert stats["requests"] == 6
    assert stats["dispatches"] < stats["requests"], stats
    for out in outs[1:]:
        assert np.array_equal(out, outs[0])


def test_identical_requests_dedupe_to_one_compose_leg():
    """Singleflight (r4): identical placements queued behind an in-flight
    dispatch merge into ONE compose leg — the deduped counter counts the
    free riders and every duplicate still gets the right pixels."""
    import concurrent.futures
    import time

    svc = ComposeService("data")
    placements, canvas_size = svc.solve("squarespace", "1:1")
    engine = svc._engine("squarespace", canvas_size, "solid")
    np.asarray(engine.compose(placements))  # warm

    real_compose = engine.compose
    real_many = engine.compose_many
    many_calls = []

    def spy_many(sets):
        # only coalescer-issued batches count: the service's background
        # merge-bucket warmer also calls compose_many on this engine
        if threading.current_thread().name == "coalescer-drain":
            many_calls.append(len(sets))
        return real_many(sets)

    engine.compose_many = spy_many

    def slow_compose(p):
        time.sleep(0.3)  # let followers pile into the coalescer queue
        return real_compose(p)

    engine.compose = slow_compose
    try:
        with concurrent.futures.ThreadPoolExecutor(max_workers=6) as pool:
            outs = list(pool.map(
                lambda _: svc.render("squarespace", "1:1")[2], range(6)
            ))
    finally:
        engine.compose = real_compose
        engine.compose_many = real_many
    stats = svc.coalescing_stats()
    assert stats["deduped"] >= 4, stats  # followers rode the leader's render
    # identical sets never took the batched path: the merge collapsed to
    # the single-compose leg (compose_many would betray a missed dedup)
    assert many_calls == [], many_calls
    for out in outs[1:]:
        assert np.array_equal(out, outs[0])


def test_distinct_requests_do_not_dedupe():
    """Distinct placements in one merge each keep their own compose leg
    (dedup keys on content, not arrival) and their own pixels."""
    import concurrent.futures
    import time

    svc = ComposeService("data")
    base_placements, canvas_size = svc.solve("squarespace", "1:1")
    engine = svc._engine("squarespace", canvas_size, "solid")
    variants = [
        [{**p, "box": [v + i for v in p["box"]]} for p in base_placements]
        for i in range(4)
    ]
    for v in variants:  # warm singles; compose_many warms on first merge
        np.asarray(engine.compose(v))
    np.asarray(engine.compose_many(variants))
    expected = [np.asarray(engine.compose(v)) for v in variants]

    real_compose = engine.compose

    def slow_compose(p):
        time.sleep(0.3)
        return real_compose(p)

    engine.compose = slow_compose
    before = svc.coalescing_stats()
    try:
        coal = svc._coalescer("squarespace", canvas_size, "solid")
        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
            outs = list(pool.map(coal.render, variants))
    finally:
        engine.compose = real_compose
    after = svc.coalescing_stats()
    assert after["deduped"] == before["deduped"], (before, after)
    for out, want in zip(outs, expected):
        assert np.array_equal(out, want)


def test_dispatch_floor_refreshes_when_stale_at_idle():
    """A stale transport-floor calibration is re-measured when the drain
    worker goes idle (the dev tunnel's RTT drifts 26-89 ms across
    minutes; a stale floor books the drift as device_ms), and the worker
    still retires afterwards."""
    import time

    from image_transformation_tpu.serving import server as srv

    svc = ComposeService("data")
    placements, canvas_size = svc.solve("squarespace", "1:1")
    coal = svc._coalescer("squarespace", canvas_size, "solid")
    coal.render(placements)  # calibrates the floor on first dispatch

    # plant an absurd, stale floor; the next idle transition must replace it
    srv._dispatch_floor_ms[0] = 12345.0
    srv._dispatch_floor_age[0] = (
        time.perf_counter() - 2 * srv._DISPATCH_FLOOR_TTL_S
    )
    assert srv._dispatch_floor_stale()
    coal.render(placements)
    for _ in range(200):  # wait for the worker to refresh + retire
        with coal._lock:
            if coal._worker is None:
                break
        time.sleep(0.05)
    with coal._lock:
        assert coal._worker is None, "drain worker failed to retire"
    assert srv._dispatch_floor_ms[0] != 12345.0
    assert not srv._dispatch_floor_stale()


def test_render_raw_format(server):
    """format:'raw' skips the PNG encode and ships raw RGBA bytes with
    shape/dtype headers — byte-identical pixels to the PNG response
    (the LAN fast path, VERDICT r4 item 6)."""
    req = urllib.request.Request(
        server + "/v1/render",
        data=json.dumps({"bundle": "squarespace", "ratio": "9:16",
                         "format": "raw"}).encode(),
        method="POST", headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/octet-stream"
        shape = tuple(int(v) for v in r.headers["X-Raw-Shape"].split(","))
        timings = json.loads(r.headers["X-Render-Timings"])
        raw = np.frombuffer(r.read(), np.uint8).reshape(shape)
    assert shape == (657, 369, 4)
    assert "encode_ms" not in timings  # no PNG encode on this path
    status, body, _ = _post(server, "/v1/render",
                            {"bundle": "squarespace", "ratio": "9:16"})
    assert status == 200
    png = np.asarray(Image.open(io.BytesIO(body)).convert("RGBA"))
    assert np.array_equal(raw, png)


def test_rgb_readback_off_matches_on(monkeypatch):
    """The opaque-canvas RGB readback (25% fewer tunnel bytes) is a pure
    transport optimization: disabling it must produce byte-identical
    render() output, and the delivered alpha plane is exactly 255."""
    from image_transformation_tpu.serving import server as srv

    svc = ComposeService("data")
    placements, canvas_size = svc.solve("squarespace", "1:1")
    coal = svc._coalescer("squarespace", canvas_size, "solid")
    assert coal.engine.opaque_output  # solid canvas: provably opaque
    on = coal.render(placements)
    assert on.shape[-1] == 4 and bool((on[..., 3] == 255).all())
    monkeypatch.setattr(srv, "_RGB_READBACK", False)
    off = coal.render(placements)
    assert np.array_equal(on, off)


def test_floor_refresh_failure_never_strands_worker(monkeypatch):
    """Advisor r4 (high): a raising idle-time floor refresh must not kill
    the drain worker — the old floor survives with its age bumped (so the
    flaky tunnel is not retried hot) and subsequent renders complete."""
    import time as _time

    from image_transformation_tpu.serving import server as srv

    svc = ComposeService("data")
    placements, canvas_size = svc.solve("squarespace", "1:1")
    coal = svc._coalescer("squarespace", canvas_size, "solid")
    coal.render(placements)  # calibrates the floor on first dispatch
    floor_before = srv._dispatch_floor_ms[0]

    def boom(n=5):
        raise RuntimeError("tunnel wedged")

    monkeypatch.setattr(srv, "_measure_floor_samples", boom)
    srv._dispatch_floor_age[0] = (
        _time.perf_counter() - 2 * srv._DISPATCH_FLOOR_TTL_S
    )
    assert srv._dispatch_floor_stale()
    out = coal.render(placements)  # drain hits the raising refresh at idle
    for _ in range(200):
        with coal._lock:
            if coal._worker is None:
                break
        _time.sleep(0.05)
    with coal._lock:
        assert coal._worker is None, "drain worker stranded by refresh failure"
    assert srv._dispatch_floor_ms[0] == floor_before  # old floor kept
    assert not srv._dispatch_floor_stale()  # age bumped: not retried hot
    out2 = coal.render(placements)  # the coalescer still serves
    assert np.array_equal(out, out2)


def test_device_calibration_publishes_honest_device_ms():
    """VERDICT r4 item 2: after the drain worker's idle pass, device_ms
    is the amortized per-program calibration (reps back-to-back
    dispatches, one fence — floor drift divides by reps), not the
    single-shot round-trip residual; the residual stays published as
    device_residual_ms and /v1/stats exposes the calibration table."""
    import time as _time

    svc = ComposeService("data")
    placements, canvas_size = svc.solve("squarespace", "1:1")
    coal = svc._coalescer("squarespace", canvas_size, "solid")
    _, first = coal.render_timed(placements)
    # before any idle pass the split falls back to the residual
    assert first["device_source"] == "residual"
    assert first["device_ms"] == first["device_residual_ms"]
    for _ in range(400):  # idle pass: floor (maybe) + calibration, retire
        with coal._lock:
            if coal._worker is None:
                break
        _time.sleep(0.05)
    info = coal.calibration_info()
    key = "singlex1"
    assert key in info and info[key]["device_ms"] is not None
    assert info[key]["reps"] >= 16 and not info[key]["failed"]
    _, timings = coal.render_timed(placements)
    assert timings["device_source"] == "calibrated"
    assert timings["device_ms"] == info[key]["device_ms"]
    assert "device_residual_ms" in timings
    assert timings["calibration_age_s"] >= 0.0
    stats = svc.stats()
    assert any(
        key in entries for entries in stats["device_calibration"].values()
    )


def test_calibration_failure_keeps_worker_and_residual(monkeypatch):
    """A raising idle-time device calibration must not strand the drain
    worker (advisor r4 high, same contract as the floor refresh); the
    key's age is bumped so a flaky tunnel is not retried hot, and
    renders keep publishing the residual split."""
    import time as _time

    svc = ComposeService("data")
    placements, canvas_size = svc.solve("squarespace", "1:1")
    coal = svc._coalescer("squarespace", canvas_size, "solid")

    def boom(sets, reps=48, floor_ms=0.0):
        raise RuntimeError("tunnel wedged mid-calibration")

    monkeypatch.setattr(coal.engine, "measure_device_ms", boom)
    out, timings = coal.render_timed(placements)
    for _ in range(400):
        with coal._lock:
            if coal._worker is None:
                break
        _time.sleep(0.05)
    with coal._lock:
        assert coal._worker is None, "drain worker stranded by calibration"
    info = coal.calibration_info()
    assert info["singlex1"]["failed"] and info["singlex1"]["device_ms"] is None
    assert coal._stale_calib_key() is None  # age bumped: not retried hot
    out2, timings2 = coal.render_timed(placements)
    assert np.array_equal(out, out2)
    assert timings2["device_source"] == "residual"


def test_calibration_kept_value_served_after_failed_refresh(monkeypatch):
    """A transient refresh failure keeps the OLD calibration (age
    bumped) — and that kept value must still be SERVED: nulling it would
    revert device_ms to the 20-50x floor-drift residual for a whole TTL,
    the artifact the calibration exists to prevent (review r5)."""
    import time as _time

    from image_transformation_tpu.serving import server as srv

    svc = ComposeService("data")
    placements, canvas_size = svc.solve("squarespace", "1:1")
    coal = svc._coalescer("squarespace", canvas_size, "solid")
    coal.render(placements)
    for _ in range(400):  # idle pass: first calibration lands, retire
        with coal._lock:
            if coal._worker is None:
                break
        _time.sleep(0.05)
    good = coal.calibration_info()["singlex1"]["device_ms"]
    assert good is not None

    def boom(sets, reps=48, floor_ms=0.0):
        raise RuntimeError("tunnel wedged mid-refresh")

    monkeypatch.setattr(coal.engine, "measure_device_ms", boom)
    coal._calib[("single", 1)]["at"] -= 2 * srv._CALIB_TTL_S  # force stale
    coal.render(placements)
    for _ in range(400):  # idle pass: refresh fails, age bumps, retire
        with coal._lock:
            if coal._worker is None:
                break
        _time.sleep(0.05)
    info = coal.calibration_info()["singlex1"]
    assert info["failed"] and info["device_ms"] == good
    monkeypatch.setattr(coal.engine, "measure_device_ms",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("still wedged")))
    _, timings = coal.render_timed(placements)
    assert timings["device_source"] == "calibrated"
    assert timings["device_ms"] == good


def test_render_stuck_error_frees_caller_and_flags_health(monkeypatch):
    """A wedged device RPC (observed: 19+ min tunnel windows) must not
    strand callers forever: the bounded ticket wait raises
    RenderStuckError naming queue depth and backlog age, the service's
    backlog_age_s reports the wedge, and once the wedge clears the
    coalescer serves again (the stuck merge's late settle is harmless)."""
    import threading as _threading
    import time as _time

    from image_transformation_tpu.serving import server as srv

    svc = ComposeService("data")
    placements, canvas_size = svc.solve("squarespace", "1:1")
    coal = svc._coalescer("squarespace", canvas_size, "solid")
    baseline = coal.render(placements)  # warm + calibrate the real path

    wedge = _threading.Event()
    real_compose = coal.engine.compose

    def wedged_compose(p):
        wedge.wait()  # block like a stuck tunnel RPC
        return real_compose(p)

    monkeypatch.setattr(coal.engine, "compose", wedged_compose)
    monkeypatch.setattr(srv, "_RENDER_WAIT_S", 1.5)
    t0 = _time.perf_counter()
    try:
        coal.render(placements)
        raise AssertionError("expected RenderStuckError")
    except srv.RenderStuckError as e:
        assert "queue depth" in str(e) and "wedged" in str(e)
    assert _time.perf_counter() - t0 < 10.0  # freed promptly, not stranded
    # the stuck ticket already left _pending (it is inside the wedged
    # merge) — the backlog signal must count unfinished merges, or
    # /healthz would report ok while the worker is wedged
    assert svc.backlog_age_s() > 1.0
    wedge.set()  # clear the wedge; the stuck merge settles its ticket
    monkeypatch.setattr(coal.engine, "compose", real_compose)
    for _ in range(100):  # wait for the drain worker to finish the wedge
        if coal.backlog_age_s() == 0.0:
            break
        _time.sleep(0.05)
    out = coal.render(placements)
    assert np.array_equal(out, baseline)


def test_placements_key_ignores_dict_order():
    """The dedup key canonicalizes dict field order — semantically equal
    placement sets dedupe even if the JSON arrived with keys shuffled."""
    from image_transformation_tpu.serving.server import _Coalescer

    a = [{"object_id": 1, "box": [0, 0, 4, 4], "scale": 1.0}]
    b = [{"scale": 1.0, "box": [0, 0, 4, 4], "object_id": 1}]
    c = [{"object_id": 1, "box": [0, 0, 4, 5], "scale": 1.0}]
    assert _Coalescer._placements_key(a) == _Coalescer._placements_key(b)
    assert _Coalescer._placements_key(a) != _Coalescer._placements_key(c)


def test_warm_start_rebuilds_recorded_steps(tmp_path):
    """A restarted service rebuilds manifest-recorded batch steps before
    traffic; the next request reuses the warmed entry."""
    manifest = tmp_path / "steps.json"
    svc1 = ComposeService("data", manifest_path=manifest)
    first = svc1.render_batch("squarespace", ["1:1", "9:16"])
    assert manifest.exists()

    svc2 = ComposeService("data", manifest_path=manifest)
    assert svc2.warm_start() == 1
    assert len(svc2._batch_steps) == 1
    entry = next(iter(svc2._batch_steps.values()))
    again = svc2.render_batch("squarespace", ["9:16", "1:1"])
    assert next(iter(svc2._batch_steps.values())) is entry
    for ratio in ("1:1", "9:16"):
        assert np.array_equal(first[ratio][2], again[ratio][2])


def test_serving_fuzz_requests(server):
    """Randomized request fuzz over both endpoints: every response is
    either a valid PNG / JSON payload or a structured JSON error; the
    daemon never wedges, and identical requests stay deterministic."""
    import base64
    import concurrent.futures
    import random

    rng = random.Random(20)
    labels = {"squarespace": [(1, "logo"), (2, "photo"), (3, "text"), (4, "cta")],
              "audio_book": [(1, "logo"), (2, "photo"), (3, "text")]}

    def random_layout(bundle):
        items = labels[bundle]
        chosen = rng.sample(items, rng.randint(1, len(items)))
        children = [{"object_id": oid, "name": name} for oid, name in chosen]
        if rng.random() < 0.3 and len(children) >= 2:
            # nest a sub-container
            children = [children[0], {
                "type": "flex",
                "direction": rng.choice(["row", "column"]),
                "children": children[1:],
            }]
        return {"root": {"type": "flex",
                         "direction": rng.choice(["row", "column"]),
                         "children": children}}

    def one(i):
        bundle = rng.choice(list(labels))
        if i % 7 == 3:  # malformed layout
            payload = {"bundle": bundle, "ratio": "1:1", "layout": {"oops": 1}}
        elif i % 7 == 5:  # bad ratio
            payload = {"bundle": bundle, "ratio": "not-a-ratio"}
        else:
            payload = {
                "bundle": bundle,
                "ratio": rng.choice(["1:1", "9:16", "16:9", "3:2"]),
                "layout": random_layout(bundle) if rng.random() < 0.7 else None,
                "background": rng.choice(["solid", "gradient"]),
            }
        if rng.random() < 0.25:
            payload.pop("layout", None)
            payload["ratios"] = rng.sample(["1:1", "9:16", "16:9"],
                                           rng.randint(1, 3))
            status, body, ctype = _post(server, "/v1/render_batch", payload)
            if status == 200:
                parsed = json.loads(body)
                for r in payload["ratios"]:
                    png = base64.b64decode(parsed[r]["png_b64"])
                    assert png[:4] == b"\x89PNG"
            else:
                assert "error" in json.loads(body)
            return
        status, body, ctype = _post(server, "/v1/render", payload)
        if status == 200:
            assert body[:4] == b"\x89PNG", payload
        else:
            assert status in (400, 404, 500), (status, payload)
            assert "error" in json.loads(body), payload

    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as pool:
        list(pool.map(one, range(40)))

    # daemon still healthy and deterministic afterwards
    s1 = _post(server, "/v1/render", {"bundle": "squarespace", "ratio": "1:1"})
    s2 = _post(server, "/v1/render", {"bundle": "squarespace", "ratio": "1:1"})
    assert s1[0] == 200 and s1[1] == s2[1]


def test_client_disconnect_mid_render_stays_quiet(server, capfd):
    """A client that RSTs its connection before the reply must not kill
    the handler thread with a BrokenPipe traceback (the error reply has
    nobody to go to — the daemon drops the connection and moves on)."""
    import socket
    import time as _time

    host, port_s = server.replace("http://", "").split(":")
    body = json.dumps({"bundle": "squarespace", "ratio": "7:5"}).encode()
    s = socket.socket()
    s.connect((host, int(port_s)))
    s.sendall(
        b"POST /v1/render HTTP/1.1\r\nHost: t\r\n"
        b"Content-Type: application/json\r\n"
        b"Content-Length: %d\r\n\r\n" % len(body) + body
    )
    # full shutdown + close: the kernel RSTs the multi-segment PNG reply,
    # so the server's write path sees a dead peer
    s.shutdown(socket.SHUT_RDWR)
    s.close()

    # the render (fresh 7:5 geometry -> compile) finishes after the RST;
    # give the handler time to attempt its reply, then prove the daemon
    # is healthy and its stderr carried no handler traceback
    deadline = _time.time() + 60
    while _time.time() < deadline:
        status, data, _ = _post(
            server, "/v1/render", {"bundle": "squarespace", "ratio": "7:5"}
        )
        if status == 200:
            break
        _time.sleep(0.5)
    assert status == 200 and data[:4] == b"\x89PNG"
    # let the RST'd handler finish its own render + reply attempt before
    # the test (and eventually the process) exits — a daemon thread still
    # inside device compute at interpreter exit aborts the C++ runtime
    _time.sleep(3.0)
    err = capfd.readouterr().err
    assert "Traceback" not in err, err
