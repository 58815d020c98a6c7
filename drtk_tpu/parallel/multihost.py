"""Multi-host initialization and mesh construction.

The reference is strictly single-GPU (SURVEY.md §2.3); scaling past one host
is this framework's own deliverable (BASELINE.md: 1 chip -> 1 host -> N>=2
hosts). JAX's runtime does the heavy lifting — this module is the thin,
documented entry point:

* :func:`initialize` — `jax.distributed.initialize` wrapper. On TPU pods the
  coordinator/process count/process id are discovered from the TPU metadata
  automatically, so a bare ``initialize()`` works; on CPU/GPU fleets pass
  them explicitly (or set ``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
  ``JAX_PROCESS_ID``).
* :func:`make_pod_mesh` — a (data, pix) mesh over *all* processes' devices,
  with the pix (pixel-row) axis laid out innermost so its halo ppermutes and
  vertex-grad psums ride ICI within a host before crossing DCN.

Typical multi-host program (same SPMD program on every host):

    from drtk_tpu.parallel import multihost, spmd

    multihost.initialize()
    mesh = multihost.make_pod_mesh(batch=n_cameras)
    forward = spmd.make_row_sharded_forward(mesh, vi, H, W)
    # jax.jit + NamedShardings over `mesh`; each host feeds its local shard
    # via jax.make_array_from_process_local_data.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["initialize", "make_pod_mesh"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    Call once per process before any jax.devices() use. No-op when the
    runtime is already initialized or when running single-process.
    """
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return  # already initialized — structural check, not message parsing
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_pod_mesh(batch: int = 1, devices=None) -> Mesh:
    """(data, pix) mesh over all global devices.

    The data axis takes the largest divisor of ``batch`` that divides the
    global device count (cameras are independent — DCN-friendly); the pix
    axis gets the rest and is contiguous within hosts so halo exchange and
    vertex-gradient psums stay on ICI.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    data = 1
    for d in range(min(batch, n), 0, -1):
        if n % d == 0 and batch % d == 0:
            data = d
            break
    return Mesh(
        np.asarray(devices).reshape(data, n // data),
        axis_names=("data", "pix"),
    )
