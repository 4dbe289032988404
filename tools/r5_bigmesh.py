"""Round-5 bigmesh batch: pair-list granularity + LBVH-walk resolution.

Stages (flushed lines; partial output useful):
  A. MetalRoughSpheres fwd/step at RRT_BC=256 (default) — r5 baseline.
  B. Same at RRT_BC=128 (row-granular pair list — each pair sweeps tris
     only for the 128 rays that entered the cluster box).
  C. Entry pre-pass self-cost: time tile_cluster_enter_pallas alone at
     both BC values — the ONLY cost a per-ray LBVH walk could remove
     (the pre-pass already computes per-ray-exact slab hits OR-reduced
     per tile, so a log-depth walk yields the SAME survivor unions;
     VERDICT r4 #3 resolution data).

Run: python tools/r5_bigmesh.py [A|B|C ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ASSET = "/root/reference/assets/MetalRoughSpheres/MetalRoughSpheres.gltf"
W, H, D, CHUNK = 512, 288, 4, 9216


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def bench(scene, tag, compact=False):
    from rust_ray_tracer_tpu.models.scene import combine, partition
    from rust_ray_tracer_tpu.ops.integrator import render_waves

    diff, static = partition(scene)
    key = jax.random.PRNGKey(0)

    def loss(d, k, s):
        img = render_waves(combine(d, static), W, H, k, s, 1,
                           depth=D, chunk_size=CHUNK, compact=compact)
        return jnp.mean(img)

    fwd = jax.jit(loss)
    step = jax.jit(jax.value_and_grad(loss))
    t0 = time.time()
    jax.block_until_ready(fwd(diff, key, 0))
    log(f"{tag}: fwd compile+run {time.time() - t0:.0f}s")

    def timed(fn, iters=3):
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(diff, key, i))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    rays = W * H * D
    dt = timed(fwd)
    log(f"{tag}: fwd {dt * 1000:.1f} ms/wave ({rays / dt / 1e6:.2f} Mrays/s)")
    t0 = time.time()
    jax.block_until_ready(step(diff, key, 0))
    log(f"{tag}: step compile+run {time.time() - t0:.0f}s")
    dt = timed(step)
    log(f"{tag}: step {dt * 1000:.1f} ms/wave ({rays / dt / 1e6:.2f} Mrays/s)")


def prepass(scene, tag):
    """Entry pre-pass cost in isolation."""
    from rust_ray_tracer_tpu.ops import pallas_intersect as pk
    from rust_ray_tracer_tpu.ops.intersect import _ray_features

    key = jax.random.PRNGKey(1)
    o = jnp.zeros((CHUNK, 3))
    d = jax.random.normal(key, (CHUNK, 3))
    feats = pk._pad_axis(_ray_features(o, d), pk.BC, 0, 0.0)
    tmin = jnp.full((feats.shape[0],), 1e-4)
    tmax = jnp.full((feats.shape[0],), jnp.inf)

    fn = jax.jit(lambda f: pk.tile_cluster_enter_pallas(
        f[:, 0:3], f[:, 3:6], scene.tri_cluster_min,
        scene.tri_cluster_max, tmin, tmax))
    jax.block_until_ready(fn(feats))
    # async-pipelined: 16 dispatches in flight amortize the ~25ms
    # fixed tunnel RTT that a one-dispatch loop would measure instead
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready([fn(feats) for _ in range(16)])
        ts.append((time.perf_counter() - t0) / 16)
    ts.sort()
    k = scene.tri_cluster_min.shape[0]
    log(f"{tag}: entry pre-pass (1 chunk x {k} clusters, BC={pk.BC}): "
        f"{ts[len(ts) // 2] * 1000:.3f} ms "
        f"(x{-(-W * H // CHUNK)} chunks x {D} bounces = "
        f"{ts[len(ts) // 2] * 1000 * (-(-W * H // CHUNK)) * D:.1f} "
        f"ms/wave upper bound)")


def main():
    from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
    from rust_ray_tracer_tpu.models.scene import compile_scene

    stages = sys.argv[1:] or ["A", "C", "B"]
    log(f"devices: {jax.devices()}  stages: {stages}")
    t0 = time.time()
    scene = compile_scene(load_gltf_scene(ASSET, W / H))
    log(f"loaded 1M-tri scene in {time.time() - t0:.0f}s "
        f"(n_tris={int(scene.n_tris)})")
    from rust_ray_tracer_tpu.ops import pallas_intersect as pk

    if "A" in stages:
        bench(scene, f"A/bc{pk.BC}/plain")
    if "D" in stages:
        bench(scene, f"D/bc{pk.BC}/compact", compact=True)
    if "C" in stages:
        prepass(scene, f"C/bc{pk.BC}")
    if "B" in stages:
        # re-import with BC=128: module constant read at import time
        log("B: restart with RRT_BC=128 (module reload not supported) — "
            "run `RRT_BC=128 python tools/r5_bigmesh.py A C`")
    return 0


if __name__ == "__main__":
    sys.exit(main())
