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
FLIP_EPS = 1e-3

# Per-scene budgets = ~2x the MEASURED pallas-vs-XLA drift of the scene
# class (v5e 2026-08-20, tools/r5_parity_diag.py across seeds 0-2), so
# the gate stays red-sensitive to regressions while budgeting the
# documented fp class: both backends share threefry streams, so any
# divergence starts at an fp boundary and forks that sample's whole
# path. suzanne measured EXACT (0 flips). random measured flips
# 5.2-5.4% / rel_mean +1.1e-4..+1.9e-4; the phase-1 winners agree
# EXACTLY (tools/r5_search_agree: 0 found/kind/idx mismatches on 18k+
# rays incl. post-bounce-like jitter), so the class is continuous
# shade-math fp drift amplified over curved glass/fuzz bounces until a
# downstream compare forks. final_scene measured flips 0.24-0.32% with rel_mean
# SIGN-FLIPPING across seeds (+3.3e-3 / -7.6e-3): unbiased media
# boundary forks that land on the 15-bright lamp (61-65% of flipped
# pixels are lamp-lit), not bias. composite measured 1.55% / 8.8e-5.
SCENE_TOL = {
    #            rel-mean   flip-rate
    "suzanne":     (1e-4,   0.002),
    "random":      (1e-3,   0.08),
    "composite":   (1e-3,   0.03),
    "final_scene": (2e-2,   0.01),
    "bigmesh":     (1e-3,   0.02),   # compact-vs-plain only
}
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
        return compile_scene(load_gltf_scene(BIGMESH, W / H))
    return compile_scene(builders.get_scene(name, W / H))


def gate_scene(name):
    mean_tol, flip_tol = SCENE_TOL[name]
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
    ok &= bool(np.isfinite(img_c).all()) and cflips < flip_tol
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
                   and rel < mean_tol and flips < flip_tol)
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
