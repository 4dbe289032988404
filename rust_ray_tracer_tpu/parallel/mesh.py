"""Device mesh construction and multi-host initialization.

The reference's "cluster init" is a rayon thread-pool sized by ``-t``
(``/root/reference/src/main.rs:44-49``). The TPU counterpart is a 1-D
``jax.sharding.Mesh`` over every addressable chip (the ``"rays"`` axis —
pixel chunks shard over it), plus ``jax.distributed.initialize`` when
spanning hosts so all chips of a pod slice join one mesh and collectives
ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

RAY_AXIS = "rays"


def multihost_init(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Join a multi-host run (jax.distributed). No-op if already up or
    single-host with no coordinator configured."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the ray axis.

    ``n_devices`` trims to the first N devices (useful for tests and for
    the driver's virtual-device dry run); default is every device jax can
    see (all chips across all hosts in a multi-host run).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))
