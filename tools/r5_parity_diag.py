"""Diagnose the r5 parity-matrix failures (random flips 5.4%,
final_scene rel_mean 0.33%): boundary-flip noise or systematic bias?

Per scene, renders the frame through each backend the scene can route
to — uber whole-wave (default), split pallas (RRT_NO_UBER=1), pure XLA
(RRT_NO_PALLAS=1) — across several seeds, and reports pairwise:
  * signed rel-mean per seed (bias has one sign across seeds; fp
    boundary noise flips sign / shrinks with averaging)
  * pixel flip rate at eps=1e-3 and at 0.1 (are flips tiny-drift or
    path-divergence magnitude?)
  * where the flips live: fraction of flipped pixels whose XLA value
    sees the light (>1.0 channel) — boundary flips near glass/lamp
    paths are the expected fp class (identical threefry streams mean
    any divergence starts at an fp compare, then the whole path forks).

Run: python tools/r5_parity_diag.py [random final_scene ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W, H, SPP, DEPTH, CHUNK = 256, 144, 4, 4, 9216
SEEDS = (0, 1, 2)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def render(scene, seed):
    from rust_ray_tracer_tpu.ops.integrator import render_waves

    def f(s, k):
        return render_waves(s, W, H, k, 0, SPP, depth=DEPTH,
                            chunk_size=CHUNK) / SPP

    img = jax.jit(f)(scene, jax.random.PRNGKey(seed))
    return np.asarray(jax.block_until_ready(img))


def backend(mode):
    os.environ.pop("RRT_NO_UBER", None)
    os.environ.pop("RRT_NO_PALLAS", None)
    if mode == "split":
        os.environ["RRT_NO_UBER"] = "1"
    elif mode == "xla":
        os.environ["RRT_NO_PALLAS"] = "1"


def compare(a, b, tag):
    d = np.abs(a - b).sum(-1)
    rel = (a.mean() - b.mean()) / max(abs(b.mean()), 1e-12)
    f_lo = float((d > 1e-3).mean())
    f_hi = float((d > 0.1).mean())
    mx = float(d.max())
    lit = float((b[d > 1e-3].max(-1) > 1.0).mean()) if f_lo else 0.0
    log(f"  {tag}: rel_mean {rel:+.2e}  flips>1e-3 {f_lo:.4f}  "
        f">0.1 {f_hi:.4f}  maxabs {mx:.3f}  flipped-px-lit {lit:.2f}")
    return rel


def main():
    from rust_ray_tracer_tpu.models import builders
    from rust_ray_tracer_tpu.models.scene import compile_scene

    scenes = sys.argv[1:] or ["random", "final_scene"]
    for name in scenes:
        scene = compile_scene(builders.get_scene(name, W / H))
        for seed in SEEDS:
            imgs = {}
            for mode in ("uber", "split", "xla"):
                backend(mode)
                imgs[mode] = render(scene, seed)
            backend("uber")
            log(f"{name} seed {seed}:")
            bw = bool((imgs["uber"] == imgs["split"]).all())
            log(f"  uber-vs-split bitwise: {bw}")
            if not bw:
                compare(imgs["uber"], imgs["split"], "uber-vs-split")
            compare(imgs["split"], imgs["xla"], "split-vs-xla")
            compare(imgs["uber"], imgs["xla"], "uber-vs-xla ")


if __name__ == "__main__":
    main()
