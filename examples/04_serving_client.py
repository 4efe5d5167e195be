"""The HTTP serving daemon: buffered render + chunked NDJSON streaming.

Starts the daemon in-process on an ephemeral port, fetches one PNG via
the buffered /v1/render path, then streams a multi-ratio batch as
chunked NDJSON ("stream": true) — each line arrives as soon as its
variant is encoded.
"""
import json
import threading
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(REPO))

from image_transformation_tpu.core.cache import honor_platform_env

honor_platform_env()

from image_transformation_tpu.serving import serve


def main() -> None:
    server = serve(REPO / "data", port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        def post(path, payload):
            return urllib.request.urlopen(urllib.request.Request(
                base + path, data=json.dumps(payload).encode(),
                method="POST", headers={"Content-Type": "application/json"},
            ), timeout=600)

        # buffered: one PNG body
        with post("/v1/render", {"bundle": "squarespace", "ratio": "1:1"}) as r:
            png = r.read()
        Path("/tmp/example_serving.png").write_bytes(png)
        print(f"/v1/render -> {len(png)} PNG bytes -> /tmp/example_serving.png")

        # streaming: one NDJSON line per ratio, readable incrementally
        with post("/v1/render_batch", {
            "bundle": "squarespace", "ratios": ["9:16", "1:1", "16:9"],
            "stream": True,
        }) as r:
            for raw in r:
                if not raw.strip():
                    continue
                line = json.loads(raw)
                print(f"stream: ratio={line['ratio']} "
                      f"canvas={line['canvas']['width']}x"
                      f"{line['canvas']['height']} "
                      f"png_b64={len(line['png_b64'])} chars")
    finally:
        server.shutdown()
        thread.join(timeout=5)


if __name__ == "__main__":
    main()
