"""Device mesh helpers for multi-chip scaling.

The reference is a single sequential Python process (SURVEY.md §2.7);
parallelism here is new first-class design. The scaling axes for this
workload are *batch x ratio-variants x pixels*, mapped to a 2D mesh:

- ``data``    — bundle/canvas batch dimension (pure data parallelism; no
  communication on the compose path, collectives only for run-level stats);
- ``spatial`` — canvas rows (output-space sharding: compose is
  destination-driven, so each row shard gathers from replicated object
  buffers with no halo exchange; the resize v-pass matmul shards its
  output rows the same way).

Shardings are expressed with jax.sharding.NamedSharding + pjit; XLA
inserts the (few) collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    spatial: int = 1,
) -> Mesh:
    """Build a (data, spatial) mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // spatial
    if data * spatial != n:
        raise ValueError(f"mesh {data}x{spatial} != {n} devices")
    dev_array = np.array(devices).reshape(data, spatial)
    return Mesh(dev_array, axis_names=("data", "spatial"))


def make_slice_mesh(
    devices: Optional[Sequence] = None,
    slices: int = 2,
    data: Optional[int] = None,
) -> Mesh:
    """Two-level (slice, data) mesh simulating a multi-slice pod: the
    leading ``slice`` axis stands in for DCN between slices, the inner
    ``data`` axis for ICI within a slice. Collectives spanning both axes
    (e.g. run-level stats sharded P(("slice", "data"))) cross both levels,
    which is exactly how a cross-slice reduction lowers on real hardware.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % slices:
            raise ValueError(f"{n} devices not divisible into {slices} slices")
        data = n // slices
    if slices * data != n:
        raise ValueError(f"mesh {slices}x{data} != {n} devices")
    dev_array = np.array(devices).reshape(slices, data)
    return Mesh(dev_array, axis_names=("slice", "data"))


def shard_batched(mesh: Mesh, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Sharding for a batched canvas tensor [B, H, W, C]: batch over
    ``data`` and (optionally) H over ``spatial``."""
    if spatial_dim is None:
        return NamedSharding(mesh, P("data"))
    if spatial_dim == 0:
        # would silently clobber the batch ('data') entry — the batch
        # dim cannot also be the spatial dim
        raise ValueError("spatial_dim 0 is the batch dim (sharded 'data')")
    spec = [None] * 4
    spec[0] = "data"
    spec[spatial_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
