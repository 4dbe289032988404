"""Chunk-loop unroll sweep on suzanne (north-star shape).

The per-chunk sweep (ops/integrator.render_waves) is a carry-free
sequential loop; the round-4 trace shows ~6ms/wave of device idle
across its 256 chunk-bounce iterations (issue latency). lax.scan
unroll places several chunk bodies per iteration so their kernels
overlap. This measures fwd/step at unroll 1/2/4/8 (each is a fresh
jit; RRT_CHUNK_UNROLL is read at trace time).

Usage: python tools/r4_unroll_check.py [unroll ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
from rust_ray_tracer_tpu.models.scene import combine, compile_scene, partition
from rust_ray_tracer_tpu.ops.integrator import render_waves

W, H, D = 512, 288, 4


def log(*a):
    print("R4UNROLL", *a, flush=True)


def main():
    sweep = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    key = jax.random.PRNGKey(0)
    sd = compile_scene(load_gltf_scene(
        "/root/reference/assets/suzanne.gltf", W / H))
    diff, static = partition(sd)

    def fwd(dd, k_, w):
        img = render_waves(combine(dd, static), W, H, k_, w * 4, 4,
                           depth=D, chunk_size=9216)
        return jnp.mean(img)

    def timed(f):
        t0 = time.perf_counter()
        float(f(diff, key, 0))
        compile_s = time.perf_counter() - t0
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            float(f(diff, key, i))
            ts.append((time.perf_counter() - t0) / 4)
        ts.sort()
        return ts[len(ts) // 2] * 1e3, compile_s

    base = None
    for u in sweep:
        os.environ["RRT_CHUNK_UNROLL"] = str(u)
        try:
            dt, cs = timed(jax.jit(fwd))
            log(f"unroll {u}: fwd {dt:.1f} ms/wave "
                f"({W * H * D / dt / 1e3:.2f} Mrays/s) compile {cs:.0f}s")
            g = jax.jit(jax.value_and_grad(fwd))
            dt, cs = timed(lambda *a: g(*a)[0])
            log(f"unroll {u}: step {dt:.1f} ms/wave "
                f"({W * H * D / dt / 1e3:.2f} Mrays/s) compile {cs:.0f}s")
            if base is None:
                base = dt
        except Exception as e:
            log(f"unroll {u}: FAILED {type(e).__name__} {str(e)[:200]}")
        finally:
            del os.environ["RRT_CHUNK_UNROLL"]
    log("done")


if __name__ == "__main__":
    main()
