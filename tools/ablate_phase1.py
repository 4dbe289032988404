"""TPU ablation: phase-1 search variants + fwd/bwd split, one process.

Times the suzanne bench step (fwd+bwd) and a forward-only wave for both
the unified one-kernel phase-1 search and the per-kind consider-chain,
back-to-back in a single device session so run-to-run backend variance
(observed ~5% between bench.py invocations) cancels.

Usage: python tools/ablate_phase1.py   (writes one JSON line per probe)
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import __graft_entry__  # noqa: E402
from rust_ray_tracer_tpu.models.scene import combine, partition  # noqa: E402
from rust_ray_tracer_tpu.ops import pallas_intersect as pk  # noqa: E402
from rust_ray_tracer_tpu.ops.integrator import render_waves  # noqa: E402

WIDTH, HEIGHT, DEPTH, CHUNK = 512, 288, 4, 9216


def timed(fn, args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    scene = __graft_entry__._flagship_scene()
    diff, static = partition(scene)
    key = jax.random.PRNGKey(0)

    def loss_fn(diff, key, wave):
        img = render_waves(combine(diff, static), WIDTH, HEIGHT, key,
                           wave, 1, depth=DEPTH, chunk_size=CHUNK)
        return jnp.mean(img)

    rays = WIDTH * HEIGHT * DEPTH
    for unified in (True, False):
        pk.UNIFIED = unified
        tag = "unified" if unified else "perkind"
        step = jax.jit(jax.value_and_grad(loss_fn))
        fwd = jax.jit(loss_fn)
        dt_f = timed(fwd, (diff, key, 0))
        dt_s = timed(step, (diff, key, 0))
        print(json.dumps({
            "variant": tag,
            "fwd_ms": round(dt_f * 1e3, 2),
            "fwd_mrays": round(rays / dt_f / 1e6, 2),
            "step_ms": round(dt_s * 1e3, 2),
            "step_mrays": round(rays / dt_s / 1e6, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
