"""ComposeEngine: device-resident compose session for the iterate loop.

The reference re-opens every cutout PNG and re-runs PIL resize+paste per
iteration (/root/reference/macro_placement_test.py:1679-1697). Here the
padded object tensor and the canvas are uploaded once per run; each
iteration ships only per-placement metadata (boxes, int32 coefficient
tables, permutation) and runs one jitted scan. Output stays on device until
artifact-save time.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax.numpy as jnp

from ..core.bundle import BundleArrays
from ..ops.compose import composite_canvas_tables_indexed
from ..ops.resize import build_coeffs_host


class ComposeEngine:
    def __init__(
        self,
        arrays: BundleArrays,
        canvas_u8: np.ndarray,
        method: str = "lanczos",
    ):
        self.arrays = arrays
        self.method = method
        self.canvas_dev = jnp.asarray(canvas_u8)
        self.objs_dev = jnp.asarray(arrays.objects)
        self.pad_h = arrays.objects.shape[1]
        self.pad_w = arrays.objects.shape[2]
        # The flex solver never upscales, so resized buffers (and the paste
        # halo) only need the object pad envelope, not the canvas.
        self.out_max_h = self.pad_h
        self.out_max_w = self.pad_w
        self._id_to_idx = {
            int(oid): k for k, oid in enumerate(arrays.object_ids) if oid >= 0
        }
        # Device-side per-call input cache: iterate loops re-solve similar
        # layouts, so identical (perm, boxes) signatures skip rebuilding and
        # re-uploading the coefficient tables (the dominant per-call cost
        # on tunneled hosts).
        self._call_cache: dict = {}

    def compose(self, placements: List[Dict]) -> jnp.ndarray:
        """Compose placements (list order = z-order) onto the base canvas.

        Unknown object ids are skipped, matching the reference compositor.
        Returns the device array (uint8 [H, W, 4]); callers np.asarray() it
        at artifact-save time.
        """
        live = [p for p in placements if int(p["object_id"]) in self._id_to_idx]
        if not live:
            return self.canvas_dev
        signature = tuple(
            (int(p["object_id"]), tuple(int(v) for v in p["box"])) for p in live
        )
        cached = self._call_cache.get(signature)
        if cached is not None:
            return composite_canvas_tables_indexed(
                self.canvas_dev, self.objs_dev, *cached
            )
        n = len(live)
        perm = np.zeros((n,), np.int32)
        boxes = np.zeros((n, 4), np.int32)
        kh = np.zeros((n, self.out_max_w, self.pad_w), np.int32)
        kv = np.zeros((n, self.out_max_h, self.pad_h), np.int32)
        same = np.zeros((n,), bool)
        for k, p in enumerate(live):
            idx = self._id_to_idx[int(p["object_id"])]
            perm[k] = idx
            x1, y1, x2, y2 = (int(v) for v in p["box"])
            boxes[k] = (x1, y1, x2, y2)
            w, h = max(1, x2 - x1), max(1, y2 - y1)
            if w > self.out_max_w or h > self.out_max_h:
                raise ValueError(
                    f"placement box {w}x{h} exceeds the downscale-only "
                    f"envelope {self.out_max_w}x{self.out_max_h}; use "
                    "ops.compose.composite_exact for upscaling placements"
                )
            oh, ow = (int(v) for v in self.arrays.obj_hw[idx])
            kh[k] = build_coeffs_host(ow, w, self.pad_w, self.out_max_w, self.method)
            kv[k] = build_coeffs_host(oh, h, self.pad_h, self.out_max_h, self.method)
            same[k] = (w == ow) and (h == oh)
        dev_args = (
            jnp.asarray(perm),
            jnp.asarray(boxes),
            jnp.asarray(kh),
            jnp.asarray(kv),
            jnp.asarray(same),
        )
        if len(self._call_cache) < 64:
            self._call_cache[signature] = dev_args
        return composite_canvas_tables_indexed(
            self.canvas_dev, self.objs_dev, *dev_args
        )
