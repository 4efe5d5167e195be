"""Device-resident compose serving daemon (stdlib HTTP, no extra deps).

The reference has no serving story — every render is a fresh CLI process
that re-reads PNGs and re-runs PIL. This daemon keeps bundles ingested and
their object tensors device-resident (pipeline.engine.ComposeEngine), so a
render request is: solve the Flex-DSL on host (microseconds) + one jitted
device compose (bit-exact host-table path) + PNG encode.

    python -m image_transformation_tpu.serving.server \
        --bundles-root data [--host 127.0.0.1] [--port 8601]

API:
    GET  /healthz            -> {"ok": true, "device": "...", "bundles": N}
    GET  /v1/bundles         -> [{"stem", "objects", "original": [w, h]}]
    POST /v1/render          -> image/png
        {"bundle": "<stem>", "ratio": "9:16",
         "layout": {"root": {...}}?,         # default: column of all objects
         "background": "solid"|"gradient"?,  # default solid
         "boxes_only": false?}               # true -> JSON placements, no PNG
    POST /v1/render_batch    -> JSON {ratio: {canvas, boxes, png_b64}}
        {"bundle": "<stem>", "ratios": ["9:16", "1:1", ...],
         "layout": {"root": {...}}?}
        All variants render in ONE fused device pass (solve + background +
        gen-3 Pallas compose; traced-table numerics <= 2/255 vs PIL — the
        per-request /v1/render path stays bit-exact).
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Dict, Optional, Tuple


class ComposeService:
    """Bundle/engine cache + render entry points (thread-safe)."""

    def __init__(self, bundles_root: Path):
        self.root = Path(bundles_root)
        self._lock = threading.Lock()
        self._bundles: Dict[str, object] = {}
        self._engines: Dict[Tuple[str, int, int, str], object] = {}
        self._batch_steps: Dict[tuple, tuple] = {}
        self._batch_latched = False

    def list_bundles(self):
        """Cheap listing: results.json + the PNG header only (no object
        decode — a liveness probe must not ingest every bundle)."""
        import json as _json

        from PIL import Image

        out = []
        for child in sorted(self.root.iterdir()):
            if (child / "results.json").exists() and (child / "background.png").exists():
                items = _json.loads((child / "results.json").read_text())
                with Image.open(child / "background.png") as im:
                    size = list(im.size)  # header read only; pixels stay lazy
                out.append({
                    "stem": child.name,
                    "objects": len(items),
                    "original": size,
                })
        return out

    def _bundle(self, stem: str):
        from ..core.bundle import load_bundle

        with self._lock:
            if stem not in self._bundles:
                self._bundles[stem] = load_bundle(self.root / stem)
            return self._bundles[stem]

    def _canvas_np(self, bundle, canvas_size, background: str):
        import jax.numpy as jnp
        import numpy as np

        from ..ops.background import synthesize_canvas

        dev = synthesize_canvas(
            jnp.asarray(np.asarray(bundle.background)),
            canvas_size[0], canvas_size[1], background,
        )
        return np.asarray(dev)

    def _engine(self, stem: str, canvas_size, background: str):
        from ..pipeline.engine import ComposeEngine

        key = (stem, canvas_size[0], canvas_size[1], background)
        with self._lock:
            engine = self._engines.get(key)
        if engine is not None:
            return engine
        bundle = self._bundle(stem)
        canvas_np = self._canvas_np(bundle, canvas_size, background)
        engine = ComposeEngine(bundle.to_arrays(), canvas_np)
        with self._lock:
            # concurrent first requests race to build; keep ONE device-
            # resident engine (the setdefault winner), drop the loser
            return self._engines.setdefault(key, engine)

    @staticmethod
    def _resolve_layout(bundle, layout: Optional[Dict]) -> Dict:
        """Default column-of-all-objects layout + 'root' validation (shared
        by the per-request and batch endpoints)."""
        if layout is None:
            children = [
                {"object_id": oid, "name": bundle.id_to_label().get(oid, "")}
                for oid in bundle.object_ids()
            ]
            layout = {"root": {"type": "flex", "direction": "column",
                               "children": children}}
        if "root" not in layout:
            raise ValueError("layout must contain 'root'")
        return layout

    def solve(self, stem: str, ratio: str, layout: Optional[Dict] = None):
        """Solve only (no device work): returns (placements, canvas_size)."""
        from ..layout.canvas import compute_canvas_size
        from ..layout.flex import solve_flex

        bundle = self._bundle(stem)
        canvas_size = compute_canvas_size(bundle.background.size, ratio, verbose=False)
        layout = self._resolve_layout(bundle, layout)
        placements = solve_flex(layout["root"], canvas_size, bundle.sizes())
        return placements, canvas_size

    def render(
        self,
        stem: str,
        ratio: str,
        layout: Optional[Dict] = None,
        background: str = "solid",
    ):
        """Returns (placements, canvas_size, composed np.uint8 [H, W, 4])."""
        import numpy as np

        placements, canvas_size = self.solve(stem, ratio, layout)
        engine = self._engine(stem, canvas_size, background)
        composed = np.asarray(engine.compose(placements))
        return placements, canvas_size, composed

    def render_batch(
        self,
        stem: str,
        ratios,
        layout: Optional[Dict] = None,
    ):
        """All ratio variants in ONE device pass (throughput path).

        Uses the fused solve+background+compose program with the gen-3
        Pallas kernel (latched fallback to the XLA compose — e.g. on
        backends without Mosaic); solid median background. The compiled
        step and its device inputs are CACHED per (bundle, layout
        structure, ratio set) — jax.jit caches by function identity, so
        rebuilding the closure per request would re-trace/re-compile every
        time. Request validation happens before any kernel work, so user
        errors (bad ratio/layout) raise without latching the fallback.
        Returns {ratio: (canvas_size, boxes list, np.uint8 [H, W, 4])}.
        Numerics: traced-table envelope (<= 2/255 vs PIL), vs the
        bit-exact per-request /v1/render path.
        """
        import json as _json

        import jax.numpy as jnp
        import numpy as np

        from ..layout.canvas import compute_canvas_size
        from ..layout.solve import FlexProgram
        from ..ops.background import masked_median_rgb
        from ..pipeline.fused import make_fused_render

        bundle = self._bundle(stem)
        layout = self._resolve_layout(bundle, layout)
        ratios = list(ratios)
        # ---- user-input validation: raises BEFORE any kernel attempt ----
        sizes = [
            compute_canvas_size(bundle.background.size, r, verbose=False)
            for r in ratios
        ]
        prog = FlexProgram.from_dsl(layout["root"])

        w_max = max(w for w, _ in sizes)
        h_max = max(h for _, h in sizes)
        key = (
            stem, _json.dumps(layout["root"], sort_keys=True),
            tuple(ratios), h_max, w_max,
        )
        with self._lock:
            entry = self._batch_steps.get(key)
        if entry is None:
            arrays = bundle.to_arrays()
            obj_pad = (arrays.objects.shape[1], arrays.objects.shape[2])
            n = prog.n_objects
            objs = np.zeros((n, *arrays.objects.shape[1:]), np.uint8)
            obj_wh = np.zeros((n, 2), np.int32)
            known = np.zeros((n,), bool)
            size_map = bundle.sizes()
            for k, oid in enumerate(prog.obj_ids):
                oid = int(oid)
                if oid in size_map:
                    objs[k] = arrays.objects[arrays.index_of(oid)]
                    obj_wh[k] = size_map[oid]
                    known[k] = True
            median = masked_median_rgb(jnp.asarray(np.asarray(bundle.background)))
            args = (
                jnp.asarray(np.asarray(sizes, np.int32)),
                median.astype(jnp.uint8),
                jnp.asarray(objs),
                jnp.asarray(obj_wh),
                jnp.asarray(known),
            )
            step = None
            if not self._batch_latched:
                try:
                    step = make_fused_render(
                        prog, (h_max, w_max), obj_pad, kernel="pallas"
                    )
                    probe = step(*args)
                    np.asarray(probe[-1])  # fence: async failures latch HERE
                except Exception as e:  # noqa: BLE001 - no Mosaic here
                    import sys

                    print(f"[serving] pallas batch render failed ({e!r}); "
                          "latching the XLA compose", file=sys.stderr)
                    with self._lock:
                        self._batch_latched = True
                    step = None
            if step is None:
                step = make_fused_render(prog, (h_max, w_max), obj_pad)
            entry = (step, args)
            with self._lock:
                if len(self._batch_steps) >= 32:  # bound device/host memory
                    self._batch_steps.pop(next(iter(self._batch_steps)))
                entry = self._batch_steps.setdefault(key, entry)
        step, args = entry
        result = step(*args)
        out_np = np.asarray(result[0])
        boxes_np = np.asarray(result[1])
        out = {}
        for i, r in enumerate(ratios):
            w, h = sizes[i]
            out[r] = ((w, h), boxes_np[i].tolist(), out_np[i, :h, :w])
        return out


def make_handler(service: ComposeService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _send(self, code, content: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(content)))
            self.end_headers()
            self.wfile.write(content)

        def _json(self, obj, code=200):
            self._send(code, json.dumps(obj).encode("utf-8"), "application/json")

        def do_GET(self):  # noqa: N802
            try:
                if self.path == "/healthz":
                    import jax

                    return self._json({
                        "ok": True,
                        "device": str(jax.devices()[0]),
                        "bundles": len(service.list_bundles()),
                    })
                if self.path == "/v1/bundles":
                    return self._json(service.list_bundles())
                return self._json({"error": "not found"}, 404)
            except Exception as e:  # noqa: BLE001
                return self._json({"error": str(e)}, 500)

        def do_POST(self):  # noqa: N802
            try:
                if self.path == "/v1/render_batch":
                    return self._render_batch()
                if self.path != "/v1/render":
                    return self._json({"error": "not found"}, 404)
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                stem = req["bundle"]
                ratio = req.get("ratio", "1:1")
                if req.get("boxes_only"):
                    # no device work (and no full-frame readback — ~15 MB/s
                    # over the dev tunnel) for a placements-only query
                    placements, canvas_size = service.solve(
                        stem, ratio, layout=req.get("layout")
                    )
                    return self._json({
                        "canvas": {"width": canvas_size[0], "height": canvas_size[1]},
                        "placements": placements,
                    })
                placements, canvas_size, composed = service.render(
                    stem, ratio,
                    layout=req.get("layout"),
                    background=req.get("background", "solid"),
                )
                import io

                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray(composed, "RGBA").save(buf, format="PNG")
                return self._send(200, buf.getvalue(), "image/png")
            except KeyError as e:
                return self._json({"error": f"missing field {e}"}, 400)
            except FileNotFoundError as e:
                return self._json({"error": str(e)}, 404)
            except Exception as e:  # noqa: BLE001
                return self._json({"error": str(e)}, 500)

        def _render_batch(self):
            """POST /v1/render_batch: all ratio variants in one device pass.

            {"bundle": "<stem>", "ratios": ["9:16", ...],
             "layout": {"root": {...}}?}  ->
            {"<ratio>": {"canvas": {...}, "boxes": [...], "png_b64": "..."}}
            """
            try:
                import base64
                import io

                from PIL import Image

                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                stem = req["bundle"]
                ratios = req.get("ratios") or ["1:1"]
                results = service.render_batch(
                    stem, ratios, layout=req.get("layout")
                )
                payload = {}
                for r, (canvas_size, boxes, img) in results.items():
                    buf = io.BytesIO()
                    Image.fromarray(img, "RGBA").save(buf, format="PNG")
                    payload[r] = {
                        "canvas": {"width": canvas_size[0],
                                   "height": canvas_size[1]},
                        "boxes": boxes,
                        "png_b64": base64.b64encode(buf.getvalue()).decode(),
                    }
                return self._json(payload)
            except KeyError as e:
                return self._json({"error": f"missing field {e}"}, 400)
            except FileNotFoundError as e:
                return self._json({"error": str(e)}, 404)
            except Exception as e:  # noqa: BLE001
                return self._json({"error": str(e)}, 500)

    return Handler


def serve(bundles_root, host: str = "127.0.0.1", port: int = 8601):
    return ThreadingHTTPServer((host, port), make_handler(ComposeService(bundles_root)))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Compose serving daemon")
    parser.add_argument("--bundles-root", default="data")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8601)
    args = parser.parse_args(argv)

    from ..core.cache import enable_compile_cache

    enable_compile_cache()
    server = serve(args.bundles_root, args.host, args.port)
    print(f"serving bundles from {args.bundles_root} on http://{args.host}:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
