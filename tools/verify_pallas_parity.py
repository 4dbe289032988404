"""On-TPU parity gate: the full fused-Pallas pipeline vs the pure-XLA path.

Both backends draw the bounce randoms with the SAME XLA threefry streams
(ops/shade.py), so they follow identical sampled paths and the rendered
images are directly comparable — measured EXACT (rel mean 0.0, zero
pixel flips) on suzanne 256x144/8spp, 2026-08-17. The thresholds below
leave room only for fp-reassociation boundary flips inside the kernels
(different-but-valid paths on a handful of pixels):

  * relative mean-radiance difference < 0.1%
  * pixel flip rate (|dR|+|dG|+|dB| > 1e-3 at 8spp) < 2%

``RRT_NO_PALLAS_SHADE=1`` additionally isolates the deterministic
stages (pallas intersect/hit + XLA shade) when debugging a failure.

History: before 2026-08-17 the shade kernel generated its randoms
in-kernel (hardware PRNG) — a different stream, making this comparison
statistical only (seed-to-seed mean spread ~6.5% at 8spp). The streams
were unified (see ops/pallas_shade.py module docstring) and the gate
tightened from pooled-seed statistics to the direct comparison below.

Usage: python tools/verify_pallas_parity.py   (exit 0 = pass)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W, H, SPP, DEPTH, CHUNK = 256, 144, 8, 4, 9216
MEAN_TOL = 1e-3
FLIP_TOL = 0.02
FLIP_EPS = 1e-3


def render(scene):
    from rust_ray_tracer_tpu.ops.integrator import render_image

    fn = jax.jit(lambda s, k: render_image(s, W, H, SPP, k,
                                           depth=DEPTH, chunk_size=CHUNK))
    img = fn(scene, jax.random.PRNGKey(0))
    return np.asarray(jax.block_until_ready(img))


def shard_gate(scene, img_seq):
    """Gate B: shard_map x Mosaic interaction on the real chip — the
    sharded renderer on a 1-device TPU mesh with the Pallas kernels
    ENABLED must reproduce the sequential TPU render (CPU-mesh tests
    force the XLA path, so only this pins the combination; VERDICT r2
    weak #8). 1 device keeps it runnable on this box; chunk dealing and
    the shard body are device-count-independent."""
    from rust_ray_tracer_tpu.parallel.mesh import make_mesh
    from rust_ray_tracer_tpu.parallel.render import (render_image_sharded,
                                                     replicate_scene)

    mesh = make_mesh(n_devices=1)
    fn = jax.jit(lambda s, k: render_image_sharded(
        s, W, H, SPP, k, mesh, depth=DEPTH, chunk_size=CHUNK))
    img = np.asarray(jax.block_until_ready(
        fn(replicate_scene(scene, mesh), jax.random.PRNGKey(0))))
    bitwise = bool((img == img_seq).all())
    maxabs = float(np.abs(img - img_seq).max())
    return bitwise, maxabs, bool(np.isfinite(img).all())


def main():
    import __graft_entry__

    scene = __graft_entry__._flagship_scene()

    os.environ.pop("RRT_NO_PALLAS", None)
    img_k = render(scene)
    sh_bitwise, sh_maxabs, sh_finite = shard_gate(scene, img_k)
    os.environ["RRT_NO_PALLAS"] = "1"
    img_x = render(scene)
    os.environ.pop("RRT_NO_PALLAS", None)

    rel = (abs(img_k.mean() - img_x.mean())
           / max(abs(img_x.mean()), 1e-12))
    flips = float((np.abs(img_k - img_x).sum(-1) > FLIP_EPS).mean())
    # sharded gate: documented fusion-reassociation allowance <= 5e-6
    # (parallel/render.py); bitwise expected with the kernels enabled
    sh_ok = sh_finite and (sh_bitwise or sh_maxabs <= 5e-6 * SPP)
    ok = bool(np.isfinite(img_k).all() and np.isfinite(img_x).all()
              and rel < MEAN_TOL and flips < FLIP_TOL and sh_ok)
    print(json.dumps({
        "gate": "pallas_vs_xla_parity",
        "mean_pallas": round(float(img_k.mean()), 6),
        "mean_xla": round(float(img_x.mean()), 6),
        "rel_mean_diff": round(float(rel), 6),
        "pixel_flip_rate": round(flips, 5),
        "sharded_1dev_bitwise": sh_bitwise,
        "sharded_1dev_maxabs": sh_maxabs,
        "thresholds": {"rel_mean": MEAN_TOL, "flip_rate": FLIP_TOL},
        "ok": ok,
    }), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
