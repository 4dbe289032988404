"""Render metrics & profiling.

The reference's only observability is an indicatif progress bar
(``/root/reference/src/main.rs:59-64``). Here (SURVEY.md §5): wavefront
occupancy per bounce (live-ray fraction — the number that tells you how
much of each SIMD tile is doing useful work), bounce-depth histograms,
rays/s accounting, and a ``jax.profiler`` trace context for XLA-level
drill-down.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Optional

import numpy as np
import jax


@dataclasses.dataclass
class RenderStats:
    """Aggregated wavefront statistics for one render."""
    width: int
    height: int
    spp: int
    depth: int
    wall_s: float
    # occupancy[b] = fraction of lanes still alive ENTERING bounce b
    occupancy: np.ndarray
    # terminated[b] = fraction of paths whose last segment was bounce b
    # (miss -> background, absorbed, or emissive hit)
    depth_histogram: np.ndarray

    @property
    def lane_rays(self) -> int:
        """Wavefront lane-bounces processed (the hardware-work count)."""
        return self.width * self.height * self.spp * self.depth

    @property
    def useful_rays(self) -> float:
        """Live ray-bounces actually contributing (occupancy-weighted)."""
        return float(self.width * self.height * self.spp
                     * self.occupancy.sum())

    @property
    def mrays_per_s(self) -> float:
        return self.lane_rays / self.wall_s / 1e6

    def report(self) -> str:
        occ = " ".join(f"{x:.2f}" for x in self.occupancy)
        hist = " ".join(f"{x:.2f}" for x in self.depth_histogram)
        return (
            f"{self.width}x{self.height} {self.spp}spp depth{self.depth}: "
            f"{self.wall_s:.2f}s, {self.mrays_per_s:.2f} Mrays/s "
            f"(lane), {self.useful_rays / self.wall_s / 1e6:.2f} useful\n"
            f"  occupancy/bounce: {occ}\n"
            f"  termination histogram: {hist}")


def occupancy_probe(scene, width: int, height: int, key, depth: int = 4,
                    chunk_size: int = 8192,
                    sample_chunks: Optional[int] = None) -> RenderStats:
    """Measure per-bounce live-lane occupancy on a 1-spp wave.

    Runs the real bounce loop while recording the alive mask between
    bounces (a diagnostic pass — the production loop doesn't pay for it).
    """
    import jax.numpy as jnp

    from rust_ray_tracer_tpu.ops import camera as cam_ops
    from rust_ray_tracer_tpu.ops.integrator import _bounce
    from rust_ray_tracer_tpu.utils import rng as rngu

    n = width * height
    n_chunks = -(-n // chunk_size)
    if sample_chunks is not None:
        n_chunks = min(n_chunks, sample_chunks)
    wkey = rngu.wave_key(key, 0)

    @jax.jit
    def probe(chunk_id):
        o, d, t, ckey = cam_ops.camera_rays_for_chunk(
            scene.camera, wkey, chunk_id, chunk_size, width, height)
        key_c = rngu.stream(ckey, rngu.CHUNK)
        c = o.shape[0]
        carry = (o, d, t, jnp.zeros((c, 3)), jnp.ones((c, 3)),
                 jnp.ones((c,), bool))
        alive_counts = []
        for b in range(depth):
            alive_counts.append(jnp.sum(carry[5]))
            carry = _bounce(scene, carry, rngu.bounce_key(key_c, b))
        alive_counts.append(jnp.sum(carry[5]))
        return jnp.stack(alive_counts)

    t0 = time.time()
    counts = np.zeros(depth + 1)
    for cidx in range(n_chunks):
        counts += np.asarray(probe(cidx))
    wall = time.time() - t0
    total = n_chunks * chunk_size
    occ = counts[:depth] / total
    term = -np.diff(counts) / total
    return RenderStats(width=width, height=height, spp=1, depth=depth,
                       wall_s=wall, occupancy=occ, depth_histogram=term)


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """``jax.profiler`` trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Tiny rays/s meter for host-side loops (CLI progress uses it)."""

    def __init__(self, rays_per_step: int):
        self.rays_per_step = rays_per_step
        self.t0 = time.time()
        self.steps = 0

    def step(self) -> float:
        self.steps += 1
        return self.rays_per_step * self.steps / (time.time() - self.t0)
