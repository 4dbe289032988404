"""Bigmesh search-grid ablation: fine-pair vs coarse-pair vs dense.

The 1M-tri MetalRoughSpheres sweep is grid-step-bound (roofline:
293k dense steps/wave at ~4.3us amortized). Three grids compete:
  fine   — pair list over 128-wide sub-boxes (default; measured 948ms
           fwd earlier this round vs 922 dense-compact)
  coarse — pair list over 2048-wide cluster survivors (RRT_PAIR_FINE=0)
  dense  — (tiles x clusters) grid with survivor pinning (RRT_PAIR=0)
All with compaction on (the measured bigmesh winner) and a
RRT_PAIR_CAP sweep for fine. fwd only (the step adds a constant).

Usage: python tools/r4_bigmesh_pair.py [cfg ...]; cfgs: fine coarse
dense fine256 fine1024
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

CFG = {
    "fine": {},
    "coarse": {"RRT_PAIR_FINE": "0"},
    "dense": {"RRT_PAIR": "0"},
    "fine256": {"RRT_PAIR_CAP": "256"},
    "fine1024": {"RRT_PAIR_CAP": "1024"},
}


def log(*a):
    print("R4BMPAIR", *a, flush=True)


def main():
    names = sys.argv[1:] or ["fine", "coarse", "dense", "fine256",
                             "fine1024"]
    sd = compile_scene(load_gltf_scene(
        "/root/reference/assets/MetalRoughSpheres/MetalRoughSpheres.gltf",
        W / H))
    log("n_tris", int(sd.n_tris), "clusters",
        sd.tri_cluster_min.shape[0], "subs", sd.tri_sub_min.shape[0])
    diff, static = partition(sd)
    key = jax.random.PRNGKey(0)

    for name in names:
        env = CFG[name]
        for k_, v in env.items():
            os.environ[k_] = v
        try:
            def fwd(dd, k2, w):
                img = render_waves(combine(dd, static), W, H, k2, w * 4,
                                   4, depth=D, chunk_size=9216,
                                   compact=True)
                return jnp.mean(img)

            f = jax.jit(fwd)
            float(f(diff, key, 0))
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                float(f(diff, key, i))
                ts.append((time.perf_counter() - t0) / 4)
            ts.sort()
            dt = ts[1] * 1e3
            log(name, "fwd ms/wave", round(dt, 1), "mrays",
                round(W * H * D / dt / 1e3, 2))
        finally:
            for k_ in env:
                del os.environ[k_]
    log("done")


if __name__ == "__main__":
    main()
