"""Round-3 TPU validation batch: megakernel + sub-cluster hierarchy.

One process, several experiments (compiles are minutes each on the
tunneled backend — batching amortizes startup and keeps the queue
serial):

  1. suzanne 128x72: megakernel vs split-kernel vs pure-XLA renders
     (shared threefry -> direct comparison; expect ~bitwise).
  2. suzanne 512x288 d4: fwd and fwd+bwd step timings, megakernel vs
     split (median of 3 SPP-sweeps each).
  3. MetalRoughSpheres 1.04M tris: fwd wave timing with the sub-cluster
     bitmask hierarchy vs round-2 flat sweep (RRT_NO_SUB ablation is by
     recompile of the scene at sub width 0 — here we just measure the
     new path; round-2 number is the baseline 1145 ms).

Prints one line per result; greppable "R3CHECK".
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
from rust_ray_tracer_tpu.models.scene import combine, compile_scene, partition
from rust_ray_tracer_tpu.ops.integrator import render_waves


def log(*a):
    print("R3CHECK", *a, flush=True)


def suzanne():
    return compile_scene(load_gltf_scene(
        "/root/reference/assets/suzanne.gltf", 16 / 9))


def timed(fn, *args, iters=3, inner=4):
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        for w in range(inner):
            jax.block_until_ready(fn(*args, i * inner + w))
        ts.append((time.perf_counter() - t0) / inner)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    sd = suzanne()
    key = jax.random.PRNGKey(0)
    from rust_ray_tracer_tpu.ops import pallas_bounce as pb
    assert pb.eligible(sd), "suzanne must be megakernel-eligible"

    # ---- 1. small-render parity ----
    def render_small(sd, key, wave):
        return render_waves(sd, 128, 72, key, wave, 1, chunk_size=9216)

    r_mega = jax.block_until_ready(jax.jit(render_small)(sd, key, 0))
    os.environ["RRT_NO_MEGAKERNEL"] = "1"

    def render_small_split(sd, key, wave):
        return render_waves(sd, 128, 72, key, wave, 1, chunk_size=9216)

    r_split = jax.block_until_ready(jax.jit(render_small_split)(sd, key, 0))
    os.environ["RRT_NO_PALLAS"] = "1"

    def render_small_xla(sd, key, wave):
        return render_waves(sd, 128, 72, key, wave, 1, chunk_size=9216)

    r_xla = jax.block_until_ready(jax.jit(render_small_xla)(sd, key, 0))
    del os.environ["RRT_NO_PALLAS"]
    del os.environ["RRT_NO_MEGAKERNEL"]

    a, b, c = map(np.asarray, (r_mega, r_split, r_xla))
    log("parity mega-vs-split: maxabs", float(np.abs(a - b).max()),
        "flips", int((a != b).sum()), "/", a.size)
    log("parity mega-vs-xla:   maxabs", float(np.abs(a - c).max()),
        "flips", int((a != c).sum()))
    assert np.isfinite(a).all()

    # ---- 2. suzanne bench-shape timings ----
    W, H, D = 512, 288, 4
    diff, static = partition(sd)

    def loss_mega(diff, key, wave):
        img = render_waves(combine(diff, static), W, H, key, wave, 1,
                           depth=D, chunk_size=9216)
        return jnp.mean(img)

    fwd_m = jax.jit(loss_mega)
    step_m = jax.jit(jax.value_and_grad(loss_mega))
    jax.block_until_ready(fwd_m(diff, key, 0))
    log("suzanne fwd mega ms", round(timed(fwd_m, diff, key) * 1e3, 1))
    jax.block_until_ready(step_m(diff, key, 0))
    log("suzanne step mega ms", round(timed(step_m, diff, key) * 1e3, 1))

    os.environ["RRT_NO_MEGAKERNEL"] = "1"

    def loss_split(diff, key, wave):
        img = render_waves(combine(diff, static), W, H, key, wave, 1,
                           depth=D, chunk_size=9216)
        return jnp.mean(img)

    fwd_s = jax.jit(loss_split)
    step_s = jax.jit(jax.value_and_grad(loss_split))
    jax.block_until_ready(fwd_s(diff, key, 0))
    log("suzanne fwd split ms", round(timed(fwd_s, diff, key) * 1e3, 1))
    jax.block_until_ready(step_s(diff, key, 0))
    log("suzanne step split ms", round(timed(step_s, diff, key) * 1e3, 1))
    del os.environ["RRT_NO_MEGAKERNEL"]

    # grad agreement mega vs split
    _, g_m = jax.block_until_ready(step_m(diff, key, 0))
    _, g_s = jax.block_until_ready(step_s(diff, key, 0))
    worst = 0.0
    for name in ("tri_v0", "tex_color", "mat_fuzz", "background"):
        gm = np.asarray(getattr(g_m, name))
        gs = np.asarray(getattr(g_s, name))
        denom = np.abs(gs).max() + 1e-12
        worst = max(worst, float(np.abs(gm - gs).max() / denom))
    log("suzanne grad mega-vs-split worst relerr", worst)

    # ---- 3. big mesh ----
    path = "/root/reference/assets/MetalRoughSpheres.gltf"
    if os.path.exists(path):
        big = compile_scene(load_gltf_scene(path, 16 / 9))
        log("bigmesh tris", big.n_tris, "clusters",
            big.tri_cluster_min.shape[0], "subrows",
            big.tri_sub_min.shape[0])

        def fwd_big(sd, key, wave):
            img = render_waves(sd, W, H, key, wave, 1, depth=D,
                               chunk_size=9216)
            return jnp.mean(img)

        f = jax.jit(fwd_big)
        jax.block_until_ready(f(big, key, 0))
        log("bigmesh fwd ms", round(timed(f, big, key) * 1e3, 1))
        dbig, sbig = partition(big)

        def loss_big(dbig, key, wave):
            img = render_waves(combine(dbig, sbig), W, H, key, wave, 1,
                               depth=D, chunk_size=9216)
            return jnp.mean(img)

        sb = jax.jit(jax.value_and_grad(loss_big))
        jax.block_until_ready(sb(dbig, key, 0))
        log("bigmesh step ms", round(timed(sb, dbig, key) * 1e3, 1))

    log("done")


if __name__ == "__main__":
    main()
