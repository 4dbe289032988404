"""Big-mesh TPU benchmark: MetalRoughSpheres (~1M triangles).

BASELINE config-5 scaling workload (the reference importer cannot even
load this asset — external .bin + u32 indices, gltf.rs:118-130,194-197).
Exercises the adaptive cluster width (compile_scene caps the cluster
count K at MAX_CLUSTERS by widening clusters) end to end on a real TPU:
forward render + a differentiable train step w.r.t. materials.

Usage: python tools/bench_bigmesh.py [--spp N] [--width W] [--height H]
Prints one JSON line per probe and saves a PNG sanity render.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_ray_tracer_tpu.models.gltf import load_gltf_scene  # noqa: E402
from rust_ray_tracer_tpu.models.scene import (combine, compile_scene,  # noqa: E402
                                              partition)
from rust_ray_tracer_tpu.ops.integrator import render_waves  # noqa: E402
from rust_ray_tracer_tpu.ops.tonemap import tonemap_mean  # noqa: E402
from rust_ray_tracer_tpu.utils.image import save_png  # noqa: E402

ASSET = "/root/reference/assets/MetalRoughSpheres/MetalRoughSpheres.gltf"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=9216)
    ap.add_argument("--tri-pad", type=int, default=None,
                    help="override cluster width (default: adaptive)")
    args = ap.parse_args()

    t0 = time.perf_counter()
    scene = load_gltf_scene(ASSET, args.width / args.height)
    t_load = time.perf_counter() - t0

    # The asset has no camera node or lights: the reference-parity
    # default (identity pose, 30 deg vfov — camera.rs:41-54) never frames
    # the ~6 mm sphere grid, so every ray would miss. Frame the grid
    # properly and hang an emissive sphere above it so the bench
    # exercises real hit + bounce + light-sampling work.
    vs = np.array([t.v0 for t in scene.world[::61]], np.float32)
    mn, mx = vs.min(0), vs.max(0)
    ctr, ext = (mn + mx) / 2, float((mx - mn).max())
    lookfrom = ctr + np.array([0.35, 0.5, 1.6], np.float32) * ext
    from rust_ray_tracer_tpu.models import scene as S
    from rust_ray_tracer_tpu.ops.camera import make_camera

    # a TRUE camera-to-world (not the look_at_rh pose quirk the
    # procedural builders replicate) so the grid is guaranteed in frame
    f = ctr - lookfrom
    f = f / np.linalg.norm(f)
    s = np.cross(f, (0.0, 1.0, 0.0))
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    c2w = np.concatenate(
        [np.stack([s, u, -f], axis=1), lookfrom[:, None]], axis=1)
    cam = make_camera(c2w.astype(np.float32), 40.0,
                      args.width / args.height)
    lamp = S.Sphere(ctr + np.array([0.0, 1.5, 0.3], np.float32) * ext,
                    0.35 * ext, S.DiffuseLight.from_color((6.0, 6.0, 6.0)))
    scene = S.Scene(camera=cam, world=scene.world + [lamp],
                    lights=[lamp], background=(0.051, 0.051, 0.051))

    t0 = time.perf_counter()
    sd = compile_scene(scene, tri_pad=args.tri_pad)
    t_compile = time.perf_counter() - t0
    k = sd.tri_cluster_min.shape[0]
    print(json.dumps({"probe": "compile", "n_tris": int(sd.n_tris),
                      "clusters": k,
                      "cluster_width": int(sd.tri_v0.shape[0] // k),
                      "load_s": round(t_load, 1),
                      "compile_scene_s": round(t_compile, 1)}), flush=True)

    diff, static = partition(sd)
    key = jax.random.PRNGKey(0)
    W, H, D = args.width, args.height, args.depth

    def one_wave(diff, key, wave):
        return render_waves(combine(diff, static), W, H, key, wave, 1,
                            depth=D, chunk_size=args.chunk)

    fwd = jax.jit(one_wave)
    t0 = time.perf_counter()
    img = fwd(diff, key, 0)
    jax.block_until_ready(img)
    print(json.dumps({"probe": "fwd_compile_s",
                      "value": round(time.perf_counter() - t0, 1)}),
          flush=True)

    rays = W * H * D
    iters = max(1, args.spp - 1)
    acc = np.asarray(img, np.float64)
    t0 = time.perf_counter()
    for wv in range(1, iters + 1):
        img = fwd(diff, key, wv)
        jax.block_until_ready(img)
        acc += np.asarray(img, np.float64)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"probe": "fwd", "ms_per_wave": round(dt * 1e3, 1),
                      "mrays_per_s": round(rays / dt / 1e6, 2)}),
          flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "renders",
        "metal_rough_spheres.png")
    save_png(out, np.asarray(tonemap_mean(
        jnp.asarray(acc / (iters + 1), jnp.float32))))
    finite = bool(np.isfinite(acc).all())
    print(json.dumps({"probe": "image", "path": out, "finite": finite,
                      "mean": round(float(acc.mean() / (iters + 1)), 4)}),
          flush=True)

    def loss_fn(diff, key, wave):
        return jnp.mean(one_wave(diff, key, wave))

    step = jax.jit(jax.value_and_grad(loss_fn))
    t0 = time.perf_counter()
    loss, grads = step(diff, key, 0)
    jax.block_until_ready((loss, grads))
    print(json.dumps({"probe": "step_compile_s",
                      "value": round(time.perf_counter() - t0, 1)}),
          flush=True)
    t0 = time.perf_counter()
    for wv in range(1, iters + 1):
        loss, grads = step(diff, key, wv)
        jax.block_until_ready((loss, grads))
    dt = (time.perf_counter() - t0) / iters
    leaves = [g for g in jax.tree_util.tree_leaves(grads)]
    gfinite = bool(all(np.isfinite(np.asarray(g)).all() for g in leaves))
    gnorm = float(sum(float(jnp.sum(g * g)) for g in leaves) ** 0.5)
    print(json.dumps({"probe": "fwd_bwd", "ms_per_wave": round(dt * 1e3, 1),
                      "mrays_per_s": round(rays / dt / 1e6, 2),
                      "grads_finite": gfinite,
                      "grad_norm": round(gnorm, 6)}), flush=True)


if __name__ == "__main__":
    main()
