"""Round-4 suzanne deep-dive: chunk-size sweep + XLA op-level trace.

The north star (bench.py) is the suzanne 512x288 4spp d4 fwd+bwd step;
round-3 hardware numbers: fwd 27.8-30.9 ms/wave, step 57.3-60.1 ms/wave
(one-dispatch 4-wave swept form). Round-2 tracing found "no hot op, all
fusion islands"; the megakernel removed most of those. This script
answers what is left:

1. chunk-size sweep — per-chunk machinery (lax.map iterations, cond
   early-outs, RNG fold-ins, reshapes) amortizes with bigger chunks;
   VMEM per kernel is tile-sized so chunk size only changes XLA-level
   intermediates.
2. a jax.profiler device trace of fwd and step at the winning chunk,
   parsed to a per-op time table (top 25 by total device time).

Usage: python tools/r4_suzanne.py [--sweep] [--trace]  (default: both)
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
from rust_ray_tracer_tpu.models.scene import combine, compile_scene, partition

W, H, D, SPP = 512, 288, 4, 4
RAYS_PER_WAVE = W * H * D


def log(*a):
    print("R4SUZ", *a, flush=True)


def make_fns(sd, chunk):
    from rust_ray_tracer_tpu.ops.integrator import render_waves
    diff, static = partition(sd)

    def loss(d, k, s):
        img = render_waves(combine(d, static), W, H, k, s * SPP, SPP,
                           depth=D, chunk_size=chunk)
        return jnp.mean(img)

    key = jax.random.PRNGKey(0)
    return diff, key, jax.jit(loss), jax.jit(jax.value_and_grad(loss))


def timed(fn, diff, key, iters=5):
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(diff, key, i))
        ts.append((time.perf_counter() - t0) / SPP)
    ts.sort()
    return ts[len(ts) // 2] * 1e3  # ms per wave


def sweep(sd):
    best = (None, 1e9)
    for chunk in (9216, 18432, 36864, 73728, 147456):
        try:
            diff, key, fwd, step = make_fns(sd, chunk)
            jax.block_until_ready(fwd(diff, key, 0))
            f = timed(fwd, diff, key)
            jax.block_until_ready(step(diff, key, 0))
            s = timed(step, diff, key)
            log(f"chunk {chunk}: fwd {f:.1f} ms/wave "
                f"({RAYS_PER_WAVE / f / 1e3:.2f} Mrays/s)  "
                f"step {s:.1f} ({RAYS_PER_WAVE / s / 1e3:.2f})")
            if s < best[1]:
                best = (chunk, s)
        except Exception as e:
            log(f"chunk {chunk}: FAILED {type(e).__name__}: {e}")
    log("sweep winner:", best)
    return best[0] or 9216


def parse_trace(log_dir):
    """Aggregate device-event durations per op name from the newest
    xprof trace.json.gz under ``log_dir``."""
    paths = sorted(glob.glob(
        os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        log("no trace file found under", log_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device pids: process names containing "TPU" (xprof labels device
    # lanes "/device:TPU:0" or "TPU:0"); fall back to all complete events
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items() if "TPU" in n.upper()}
    per_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        per_op[e["name"]] += e["dur"]
        total += e["dur"]
    log(f"device total {total / 1e3:.1f} ms across {len(per_op)} op names"
        f" (pids: {sorted(pid_name.items())})")
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        log(f"  {dur / 1e3:9.2f} ms  {100 * dur / max(total, 1):5.1f}%  "
            f"{name[:110]}")


def trace(sd, chunk):
    diff, key, fwd, step = make_fns(sd, chunk)
    jax.block_until_ready(fwd(diff, key, 0))
    jax.block_until_ready(step(diff, key, 0))
    for tag, fn in (("fwd", fwd), ("step", step)):
        td = f"/tmp/r4_trace_{tag}"
        os.system(f"rm -rf {td}")
        jax.profiler.start_trace(td)
        for i in range(3):
            jax.block_until_ready(fn(diff, key, i))
        jax.profiler.stop_trace()
        log(f"--- {tag} trace (3 sweeps = 12 waves) chunk {chunk} ---")
        parse_trace(td)


def main():
    args = sys.argv[1:]
    do_sweep = "--trace" not in args or "--sweep" in args
    do_trace = "--sweep" not in args or "--trace" in args
    sd = compile_scene(load_gltf_scene(
        "/root/reference/assets/suzanne.gltf", W / H))
    chunk = sweep(sd) if do_sweep else 9216
    if do_trace:
        trace(sd, chunk)
    log("done")


if __name__ == "__main__":
    main()
