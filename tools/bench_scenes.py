"""Per-scene TPU benchmark: forward and fwd+bwd Mrays/s at the bench shape.

Covers the sphere-heavy procedural scenes (``random``/``final_scene`` —
the pallas sphere/quad kernels' real workloads, scene.rs:33-92,288-391)
and the config-5 ``composite`` multi-mesh scene, which the suzanne-only
bench.py never exercises. One process so backend variance cancels.

Usage: python tools/bench_scenes.py [scene ...]   (default: all three)
Prints one JSON line per (scene, probe).
"""

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

from rust_ray_tracer_tpu.models import builders  # noqa: E402
from rust_ray_tracer_tpu.models.scene import (combine, compile_scene,  # noqa: E402
                                              partition)
from rust_ray_tracer_tpu.ops.integrator import render_waves  # noqa: E402
from rust_ray_tracer_tpu.ops.tonemap import tonemap_mean  # noqa: E402
from rust_ray_tracer_tpu.utils.image import save_png  # noqa: E402

WIDTH, HEIGHT, DEPTH, CHUNK = 512, 288, 4, 9216
V5E_BF16_FLOPS = 394e12 / 2     # v5e peak: 394 TOPS int8 / 197 bf16
V5E_HBM_BPS = 819e9


def _cost(jitted, *args):
    """XLA's own cost model for the compiled executable (includes the
    Pallas kernels' CostEstimates) — lets BASELINE.md attribute a
    measured ms to an MFU%% / HBM-BW%% roofline (VERDICT r2 weak #2)."""
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return {"flops": float(c.get("flops", -1.0)),
                "bytes": float(c.get("bytes accessed", -1.0))}
    except Exception as e:  # pragma: no cover - cost model availability
        return {"error": str(e)[:120]}


RENDER_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "renders")


def bench_scene(name: str, iters: int = 6, compact: bool = False):
    aspect = WIDTH / HEIGHT
    sd = compile_scene(builders.get_scene(name, aspect))
    tag = "_compact" if compact else ""
    if not compact:
        print(json.dumps({"scene": name, "probe": "compile",
                          "n_tris": int(sd.n_tris),
                          "n_spheres": int(sd.n_spheres),
                          "n_quads": int(sd.n_quads)}), flush=True)

    diff, static = partition(sd)
    key = jax.random.PRNGKey(0)

    def one_wave(diff, key, wave):
        return render_waves(combine(diff, static), WIDTH, HEIGHT, key,
                            wave, 1, depth=DEPTH, chunk_size=CHUNK,
                            compact=compact)

    def loss_fn(diff, key, wave):
        return jnp.mean(one_wave(diff, key, wave))

    rays = WIDTH * HEIGHT * DEPTH
    fwd = jax.jit(one_wave)
    step = jax.jit(jax.value_and_grad(loss_fn))

    t0 = time.perf_counter()
    img = fwd(diff, key, 0)
    jax.block_until_ready(img)
    fwd_compile = time.perf_counter() - t0
    cost = _cost(fwd, diff, key, 0)
    acc = np.asarray(img, np.float64)
    t0 = time.perf_counter()
    for wv in range(1, iters + 1):
        img = fwd(diff, key, wv)
        jax.block_until_ready(img)
        acc += np.asarray(img, np.float64)
    dt = (time.perf_counter() - t0) / iters
    save_png(os.path.join(RENDER_DIR, f"{name}_bench{tag}.png"),
             np.asarray(tonemap_mean(jnp.asarray(acc / (iters + 1),
                                                 jnp.float32))))
    roof = {}
    if cost.get("flops", 0) > 0:
        roof = {"mfu_pct": round(cost["flops"] / dt / V5E_BF16_FLOPS
                                 * 100, 2),
                "hbm_bw_pct": round(cost["bytes"] / dt / V5E_HBM_BPS
                                    * 100, 2)}
    print(json.dumps({"scene": name, "probe": "fwd" + tag,
                      "compile_s": round(fwd_compile, 1),
                      "ms_per_wave": round(dt * 1e3, 2),
                      "mrays_per_s": round(rays / dt / 1e6, 2),
                      "img_mean": round(float(acc.mean() / (iters + 1)), 4),
                      "finite": bool(np.isfinite(acc).all()),
                      **cost, **roof}), flush=True)

    t0 = time.perf_counter()
    loss, grads = step(diff, key, 0)
    jax.block_until_ready((loss, grads))
    step_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for wv in range(1, iters + 1):
        loss, grads = step(diff, key, wv)
        jax.block_until_ready((loss, grads))
    dt = (time.perf_counter() - t0) / iters
    leaves = jax.tree_util.tree_leaves(grads)
    print(json.dumps({"scene": name, "probe": "fwd_bwd" + tag,
                      "compile_s": round(step_compile, 1),
                      "ms_per_wave": round(dt * 1e3, 2),
                      "mrays_per_s": round(rays / dt / 1e6, 2),
                      "grads_finite": bool(all(
                          np.isfinite(np.asarray(g)).all()
                          for g in leaves))}), flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = args or ["random", "final_scene", "composite"]
    both = "--compact" not in sys.argv and "--no-compact" not in sys.argv
    for name in names:
        if "--compact" not in sys.argv:
            bench_scene(name)
        if both or "--compact" in sys.argv:
            bench_scene(name, compact=True)


if __name__ == "__main__":
    main()
