"""Round-4 pair-list search-grid hardware check.

The search kernel's dense grid is (ray tiles x ALL clusters); the 1D
dynamic pair-list grid (ops/pallas_intersect._make_pair_kernel) runs
only live (tile, cluster) pairs. This script validates the new default
on real Mosaic (interpret mode hides pipeline/layout hazards) and then
measures it: image parity pair-vs-dense, then fwd / step timings on
suzanne (k=8 clusters), MetalRoughSpheres-1M (k=508) and composite
(k=22) — each pair-on vs pair-off (RRT_PAIR=0), one-dispatch 4-wave
swept form.

Usage: python tools/r4_pair_check.py [suzanne|bigmesh|composite ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_ray_tracer_tpu.models import builders
from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
from rust_ray_tracer_tpu.models.scene import combine, compile_scene, partition
from rust_ray_tracer_tpu.ops.integrator import render_waves

W, H, D = 512, 288, 4


def log(*a):
    print("R4PAIR", *a, flush=True)


def parity(sd, compact):
    """pair-vs-dense image at 128x72 4spp — must be bitwise EXACT."""
    key = jax.random.PRNGKey(0)

    def render():
        f = jax.jit(lambda s, k: render_waves(s, 128, 72, k, 0, 4,
                                              depth=D, chunk_size=9216,
                                              compact=compact))
        return np.asarray(f(sd, key))

    img_pair = render()
    os.environ["RRT_PAIR"] = "0"
    try:
        img_dense = render()
    finally:
        del os.environ["RRT_PAIR"]
    flips = int((np.abs(img_pair - img_dense).max(-1) > 0).sum())
    log("parity flips", flips, "of", img_pair.shape[0] * img_pair.shape[1],
        "maxabs", float(np.abs(img_pair - img_dense).max()))
    return flips == 0


def measure(sd, compact, tag, step_too=True):
    key = jax.random.PRNGKey(0)
    diff, static = partition(sd)

    def fwd(dd, k_, w):
        img = render_waves(combine(dd, static), W, H, k_, w * 4, 4,
                           depth=D, chunk_size=9216, compact=compact)
        return jnp.mean(img)

    def timed(f):
        float(f(diff, key, 0))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(f(diff, key, i))
            ts.append((time.perf_counter() - t0) / 4)
        ts.sort()
        return ts[1] * 1e3

    dt = timed(jax.jit(fwd))
    log(tag, "fwd ms/wave", round(dt, 1), "mrays",
        round(W * H * D / dt / 1e3, 2))
    if step_too:
        g = jax.jit(jax.value_and_grad(fwd))
        dt = timed(lambda *a: g(*a)[0])
        log(tag, "step ms/wave", round(dt, 1), "mrays",
            round(W * H * D / dt / 1e3, 2))


def run_scene(name):
    if name == "suzanne":
        sd = compile_scene(load_gltf_scene(
            "/root/reference/assets/suzanne.gltf", W / H))
        compact = False
    elif name == "bigmesh":
        sd = compile_scene(load_gltf_scene(
            "/root/reference/assets/MetalRoughSpheres/MetalRoughSpheres.gltf",
            W / H))
        compact = True
    else:
        sd = compile_scene(builders.get_scene(name, W / H))
        compact = name != "suzanne"
    k = sd.tri_cluster_min.shape[0]
    log(name, "n_tris", int(sd.n_tris), "clusters", k)
    if not parity(sd, compact):
        log(name, "PARITY FAILED — skipping timings")
        return
    measure(sd, compact, f"{name}_pair", step_too=name != "bigmesh")
    os.environ["RRT_PAIR"] = "0"
    try:
        measure(sd, compact, f"{name}_dense", step_too=name != "bigmesh")
    finally:
        del os.environ["RRT_PAIR"]
    if name == "bigmesh":
        # step timing once, pair only (the dense step is known: 1042.7)
        measure(sd, compact, "bigmesh_pair_step")


def main():
    names = sys.argv[1:] or ["suzanne", "composite", "bigmesh"]
    for n in names:
        run_scene(n)
    log("done")


if __name__ == "__main__":
    main()
