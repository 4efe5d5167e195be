"""The sharded fused render over a device mesh.

Builds a data-axis jax.sharding.Mesh, jits the one-program solid render
(background fill + gen-3 fused compose + pmean luma collective) under
shard_map, and runs one step: canvases shard over ``data``, the mean
luminance is a cross-device all-reduce (an ICI collective on real
hardware). Without 8 real chips this forces an 8-device virtual CPU
mesh and runs the Pallas kernel in the interpreter — the same path
`__graft_entry__.dryrun_multichip` validates — so the assets are small
synthetic sprites (interpret mode emulates the kernel grid step by
step; real-bundle 207x357 objects belong on hardware, where this same
step renders them at full 1080p scale: see bench.py --kernel pallas).
Scale up via ITPU_EXAMPLE_SCALE=N (canvas and sprite sizes multiply).
"""
import os
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(REPO))

N_DEVICES = 8
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_DEVICES}"
    ).strip()

from image_transformation_tpu.core.cache import honor_platform_env

honor_platform_env()

import jax

# Decide the platform WITHOUT probing jax.devices() first: initializing the
# hardware backend hangs if the tunneled device server is unreachable, so
# the virtual CPU mesh is the default and hardware is opt-in via the env.
# (After the first jax.devices() call the backend is live and the platform
# can no longer change, so there is no probe-then-fall-back option here.)
if os.environ.get("JAX_PLATFORMS", "cpu").lower() in ("", "cpu"):
    jax.config.update("jax_platforms", "cpu")
# On CPU the Pallas kernel runs in the interpreter; any hardware platform
# runs it compiled, over however many chips are actually visible (the
# mesh and batch below are sized from the devices, not from N_DEVICES).
interpret = jax.devices()[0].platform == "cpu"

import numpy as np

from image_transformation_tpu.ops.compose_pallas import planarize_objects
from image_transformation_tpu.parallel.mesh import make_mesh
from image_transformation_tpu.parallel.sweep import (
    make_sharded_solid_render,
    random_downscale_boxes,
)


def main() -> None:
    scale = int(os.environ.get("ITPU_EXAMPLE_SCALE", "1"))
    H, W = 32 * scale, 64 * scale
    n_obj, pad_h, pad_w = 3, 16 * scale, 24 * scale

    # small synthetic sprites: solid-color rectangles with ragged extents
    rng = np.random.default_rng(0)
    objs = np.zeros((n_obj, pad_h, pad_w, 4), np.uint8)
    obj_hw = np.zeros((n_obj, 2), np.int32)
    for k in range(n_obj):
        h = int(rng.integers(pad_h // 2, pad_h + 1))
        w = int(rng.integers(pad_w // 2, pad_w + 1))
        objs[k, :h, :w, :3] = rng.integers(0, 256, 3)
        objs[k, :h, :w, 3] = 255
        obj_hw[k] = (h, w)

    mesh = make_mesh()  # (data, spatial) over every visible device
    # one canvas per data shard — sized from the mesh, so a pre-existing
    # XLA_FLAGS device count (or a smaller real chip count) still divides
    B = mesh.shape["data"]
    step = make_sharded_solid_render(mesh, (H, W), (pad_h, pad_w),
                                     interpret=interpret)

    import jax.numpy as jnp

    plane = np.asarray(planarize_objects(objs[None]))
    objs_p = jnp.asarray(np.broadcast_to(plane, (B, *plane.shape[1:])))
    obj_hw_b = jnp.asarray(np.broadcast_to(obj_hw, (B, n_obj, 2)))
    boxes = jnp.asarray(np.stack([
        random_downscale_boxes(rng, obj_hw, (H, W)) for _ in range(B)
    ]))

    out, luma = step(objs_p, obj_hw_b, boxes)
    print(f"mesh: {mesh.shape}, sharded output plane: {out.shape}, "
          f"global mean luma (pmean collective): {float(luma[0]):.2f}")


if __name__ == "__main__":
    main()
