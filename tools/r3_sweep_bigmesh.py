"""Stage-2 TPU tuning sweep: hierarchy shape on the 1M-tri mesh.

Sweeps the two compile-time knobs that set the fused search kernel's
grid shape (models/scene.compile_scene):
  RRT_MAX_CLUSTERS — cluster-count cap (512 default -> width 2048 at
    1.04M tris); more clusters = narrower per-step sweeps, longer grid.
  RRT_SUB_W — sub-span width for the per-(tile,cluster) bitmask gating
    (default tri_pad/16 = 128): wider spans = fewer @pl.when branches,
    coarser skipping.

Each variant recompiles (fresh table shapes), so this runs AFTER the
main r3_tpu_check batch. One line per variant, greppable "R3SWEEP".
Reference workload being beaten: the per-ray BVH descent of
geometry/mod.rs:137-153 at 1M triangles.
"""

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
from rust_ray_tracer_tpu.models.scene import compile_scene
from rust_ray_tracer_tpu.ops.integrator import render_waves

W, H, D = 512, 288, 4
ASSET = "/root/reference/assets/MetalRoughSpheres/MetalRoughSpheres.gltf"


def log(*a):
    print("R3SWEEP", *a, flush=True)


def timed(fn, *args, iters=3, inner=2):
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        for w in range(inner):
            jax.block_until_ready(fn(*args, i * inner + w))
        ts.append((time.perf_counter() - t0) / inner)
    ts.sort()
    return ts[len(ts) // 2]


VARIANTS = [
    # r4: the sub-cluster bitmask REGRESSED on hardware (r3/r4_compact
    # checks: 1437 sub vs 1352 flat fwd ms/wave) and is now off by
    # default (models/scene.py), so the live question is pure cluster
    # granularity — narrower survivor DMA blocks (tighter culling, less
    # HBM streaming) vs a longer (tile x K) grid (more skipped-step
    # overhead past cnt[i]). Default cap 512 -> width 2048 at 1.04M.
    ("k512_w2048", {}),
    ("k1024_w1024", {"RRT_MAX_CLUSTERS": "1024"}),
    ("k2048_w512", {"RRT_MAX_CLUSTERS": "2048"}),
    ("k4096_w256", {"RRT_MAX_CLUSTERS": "4096"}),
    ("k8192_w128", {"RRT_MAX_CLUSTERS": "8192"}),
]


def main():
    key = jax.random.PRNGKey(0)
    gltf = load_gltf_scene(ASSET, W / H)
    ref_img = None
    for tag, env in VARIANTS:
        try:
            for k, v in env.items():
                os.environ[k] = v
            sd = compile_scene(gltf)
            log(tag, "tris", int(sd.n_tris),
                "K", sd.tri_cluster_min.shape[0],
                "subrows", sd.tri_sub_min.shape[0])

            def fwd(s, k_, w):
                return render_waves(s, W, H, k_, w, 1, depth=D,
                                    chunk_size=9216)

            f = jax.jit(fwd)
            t0 = time.perf_counter()
            img = np.asarray(jax.block_until_ready(f(sd, key, 0)))
            log(tag, "compile+1st_s", round(time.perf_counter() - t0, 1))
            if ref_img is None:
                ref_img = img
            else:  # hierarchy shape must not change the image
                log(tag, "maxabs_vs_default",
                    float(np.abs(img - ref_img).max()))
            dt = timed(f, sd, key)
            rays = W * H * D
            log(tag, "fwd ms", round(dt * 1e3, 1),
                "mrays", round(rays / dt / 1e6, 2))
        except Exception:
            log(tag, "FAILED:")
            traceback.print_exc()
        finally:
            for k in env:
                os.environ.pop(k, None)
    log("done")


if __name__ == "__main__":
    main()
