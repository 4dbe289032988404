"""Round-4 suzanne experiments (post gather-consolidation).

A. Cluster-count ladder: suzanne's search kernel spends ~86us of its
   ~125us/call on grid-step overhead (288 steps at ~300-430ns). With
   the whole 1024-tri table VMEM-resident, sweeping ONE 1024-wide
   block per tile (grid 36x1) trades cheap MXU flops for 8x fewer
   steps; per-cluster culling only helps partially-culled tiles (fully
   dead/missing tiles skip at any granularity).
   RRT_MAX_CLUSTERS drives it: max_k=1 -> tri_pad 1024 (k=1), 2 -> 512
   (k=2), 4 -> 256 (k=4), default 512 -> 128-wide (k=8).

B. Lane-axis gather microbench: can phase 2 gather winner rows
   DIRECTLY into plane layout ([k, P] table gathered along axis 1 ->
   [k, C]) at a cost comparable to the row gather ([P, k] -> [C, k])
   it would replace + the transpose it would avoid? Decides the
   plane-native-carry design.
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

W, H, D, SPP = 512, 288, 4, 4
RAYS = W * H * D


def log(*a):
    print("R4SUZEXP", *a, flush=True)


def timed(fn, *args, iters=5, div=SPP):
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, i))
        ts.append((time.perf_counter() - t0) / div)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def ladder():
    from rust_ray_tracer_tpu.ops.integrator import render_waves
    gltf = load_gltf_scene("/root/reference/assets/suzanne.gltf", W / H)
    for max_k in (None, 4, 2, 1):
        if max_k is not None:
            os.environ["RRT_MAX_CLUSTERS"] = str(max_k)
        try:
            sd = compile_scene(gltf)
            k = sd.tri_cluster_min.shape[0]
            diff, static = partition(sd)

            def loss(d, k_, s):
                img = render_waves(combine(d, static), W, H, k_, s * SPP,
                                   SPP, depth=D, chunk_size=9216)
                return jnp.mean(img)

            key = jax.random.PRNGKey(0)
            fwd = jax.jit(loss)
            step = jax.jit(jax.value_and_grad(loss))
            jax.block_until_ready(fwd(diff, key, 0))
            f = timed(fwd, diff, key)
            jax.block_until_ready(step(diff, key, 0))
            s = timed(step, diff, key)
            log(f"max_k={max_k} K={k} width={sd.tri_v0.shape[0] // k}: "
                f"fwd {f:.1f} ms/wave ({RAYS / f / 1e3:.2f} Mrays/s) "
                f"step {s:.1f} ({RAYS / s / 1e3:.2f})")
        except Exception as e:
            log(f"max_k={max_k} FAILED {type(e).__name__}: {str(e)[:150]}")
        finally:
            os.environ.pop("RRT_MAX_CLUSTERS", None)


def gather_micro():
    """Per-op cost via an in-graph lax.scan chain (per-dispatch tunnel
    RTT is ~32ms — an un-jitted microbench would measure only that)."""
    from jax import lax
    C, P, K = 9216, 1024, 24
    ITERS = 256
    key = jax.random.PRNGKey(1)
    tab = jax.random.normal(key, (P, K), jnp.float32)
    tabT = jnp.asarray(tab.T)         # [K, P]
    idx = jax.random.randint(jax.random.PRNGKey(2), (C,), 0, P)

    def bench(name, body):
        def run(t, i0, s):
            def step(carry, j):
                out = body(t, (i0 + j + s) % P)
                return carry + out.sum(), None
            acc, _ = lax.scan(step, jnp.float32(0), jnp.arange(ITERS))
            return acc

        f = jax.jit(run)
        jax.block_until_ready(f(tab if body is not lane_body else tabT,
                                idx, 0))
        dt = timed(f, tab if body is not lane_body else tabT, idx,
                   iters=7, div=ITERS)
        log(f"micro {name}: {dt * 1e3:.1f} us/op")

    def row_body(t, i):
        return t[i]                       # [C, K]

    def rowT_body(t, i):
        return t[i].T * 2.0               # [K, C] via transpose

    def lane_body(t, i):
        return jnp.take(t, i, axis=1)     # [K, C] directly

    bench("row_gather [C,K]", row_body)
    bench("row_gather+T [K,C]", rowT_body)
    bench("lane_gather [K,C]", lane_body)


def main():
    gather_micro()
    ladder()
    log("done")


if __name__ == "__main__":
    main()
