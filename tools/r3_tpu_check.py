"""Round-3 TPU validation batch: megakernel + sub-cluster hierarchy +
cross-chunk compaction + fused shade/update.

One process, phased (compiles are minutes each on the tunneled backend —
batching amortizes startup and keeps the queue serial); each phase is
try/except-guarded so a single failure doesn't lose the batch. Prints
one line per result; greppable "R3CHECK".

Phases:
  1. suzanne 128x72 parity: megakernel vs split-kernel vs pure-XLA
     (shared threefry -> direct comparison; expect ~bitwise).
  2. suzanne 512x288 d4: fwd and fwd+bwd timings, megakernel vs split,
     + grad agreement (median of 3 x 4-wave sweeps each).
  3. random 512x288 d4: fwd/step, su-fused+compact vs split ablations.
  4. MetalRoughSpheres 1.04M tris: fwd/step with the sub-cluster bitmask
     hierarchy, + RRT_NO_SUB ablation (round-2 flat baseline: 1145 ms).
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

from rust_ray_tracer_tpu.models import builders
from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
from rust_ray_tracer_tpu.models.scene import combine, compile_scene, partition
from rust_ray_tracer_tpu.ops.integrator import render_waves

W, H, D = 512, 288, 4


def log(*a):
    print("R3CHECK", *a, flush=True)


def phase(name):
    def deco(fn):
        def run(*args):
            try:
                t0 = time.perf_counter()
                fn(*args)
                log(f"phase {name} done in {time.perf_counter()-t0:.0f}s")
            except Exception:
                log(f"phase {name} FAILED:")
                traceback.print_exc()
        return run
    return deco


def timed(fn, *args, iters=3, inner=4):
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        for w in range(inner):
            jax.block_until_ready(fn(*args, i * inner + w))
        ts.append((time.perf_counter() - t0) / inner)
    ts.sort()
    return ts[len(ts) // 2]


def timed_async(fn, *args, iters=3, inner=4):
    """Same sweep but block only once at the end: JAX pipelines the
    dispatches, so this separates tunnel/dispatch RTT (paid per wave in
    ``timed``) from actual device time."""
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        outs = [fn(*args, i * inner + w) for w in range(inner)]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / inner)
    ts.sort()
    return ts[len(ts) // 2]


def render_fn(static_scene=None, compact=False):
    if static_scene is None:
        def f(sd, key, wave):
            return render_waves(sd, 128, 72, key, wave, 1,
                                chunk_size=9216, compact=compact)
    else:
        diff_, static = static_scene

        def f(diff, key, wave):
            img = render_waves(combine(diff, static), W, H, key, wave, 1,
                               depth=D, chunk_size=9216, compact=compact)
            return jnp.mean(img)
    return jax.jit(f)


@phase("1-parity")
def p1(sd, key):
    r_mega = np.asarray(jax.block_until_ready(render_fn()(sd, key, 0)))
    os.environ["RRT_NO_MEGAKERNEL"] = "1"
    r_split = np.asarray(jax.block_until_ready(render_fn()(sd, key, 0)))
    os.environ["RRT_NO_PALLAS"] = "1"
    r_xla = np.asarray(jax.block_until_ready(render_fn()(sd, key, 0)))
    del os.environ["RRT_NO_PALLAS"]
    del os.environ["RRT_NO_MEGAKERNEL"]
    log("parity mega-vs-split: maxabs", float(np.abs(r_mega - r_split).max()),
        "flips", int((r_mega != r_split).sum()), "/", r_mega.size)
    log("parity mega-vs-xla:   maxabs", float(np.abs(r_mega - r_xla).max()),
        "flips", int((r_mega != r_xla).sum()))
    assert np.isfinite(r_mega).all()


@phase("2-suzanne")
def p2(sd, key):
    diff, static = partition(sd)

    def loss_mega(d, k, w):
        img = render_waves(combine(d, static), W, H, k, w, 1, depth=D,
                           chunk_size=9216)
        return jnp.mean(img)
    fwd_m = jax.jit(loss_mega)
    step_m = jax.jit(jax.value_and_grad(loss_mega))
    jax.block_until_ready(fwd_m(diff, key, 0))
    log("suzanne fwd mega ms", round(timed(fwd_m, diff, key) * 1e3, 1))
    log("suzanne fwd mega async ms",
        round(timed_async(fwd_m, diff, key) * 1e3, 1))
    jax.block_until_ready(step_m(diff, key, 0))
    log("suzanne step mega ms", round(timed(step_m, diff, key) * 1e3, 1))
    log("suzanne step mega async ms",
        round(timed_async(step_m, diff, key) * 1e3, 1))

    # one-dispatch 4-wave sweep: render_waves' own lax.scan over spp —
    # amortizes dispatch RTT entirely (what render_image/CLI users get)
    def loss_mega4(d, k, s):
        img = render_waves(combine(d, static), W, H, k, s * 4, 4, depth=D,
                           chunk_size=9216)
        return jnp.mean(img)
    fwd_m4 = jax.jit(loss_mega4)
    step_m4 = jax.jit(jax.value_and_grad(loss_mega4))
    jax.block_until_ready(fwd_m4(diff, key, 0))
    log("suzanne fwd mega swept ms/wave",
        round(timed(fwd_m4, diff, key, inner=1) * 1e3 / 4, 1))
    jax.block_until_ready(step_m4(diff, key, 0))
    log("suzanne step mega swept ms/wave",
        round(timed(step_m4, diff, key, inner=1) * 1e3 / 4, 1))

    os.environ["RRT_NO_MEGAKERNEL"] = "1"

    def loss_split(d, k, w):
        img = render_waves(combine(d, static), W, H, k, w, 1, depth=D,
                           chunk_size=9216)
        return jnp.mean(img)

    fwd_s = jax.jit(loss_split)
    step_s = jax.jit(jax.value_and_grad(loss_split))
    jax.block_until_ready(fwd_s(diff, key, 0))
    log("suzanne fwd split ms", round(timed(fwd_s, diff, key) * 1e3, 1))
    jax.block_until_ready(step_s(diff, key, 0))
    log("suzanne step split ms", round(timed(step_s, diff, key) * 1e3, 1))
    del os.environ["RRT_NO_MEGAKERNEL"]

    _, g_m = jax.block_until_ready(step_m(diff, key, 0))
    _, g_s = jax.block_until_ready(step_s(diff, key, 0))
    worst = 0.0
    for name in ("tri_v0", "tex_color", "mat_fuzz", "background"):
        gm = np.asarray(getattr(g_m, name))
        gs = np.asarray(getattr(g_s, name))
        denom = np.abs(gs).max() + 1e-12
        worst = max(worst, float(np.abs(gm - gs).max() / denom))
    log("suzanne grad mega-vs-split worst relerr", worst)


@phase("3-random")
def p3(key):
    sd = compile_scene(builders.get_scene("random", W / H))

    # compact-vs-plain image parity ON HARDWARE (CPU gate allows the
    # 5e-6 fusion-reassociation drift; same sampled paths either way)
    def small(s, k, w, compact):
        return render_waves(s, 128, 72, k, w, 1, depth=D,
                            chunk_size=9216, compact=compact)
    a = np.asarray(jax.block_until_ready(
        jax.jit(lambda s, k: small(s, k, 0, False))(sd, key)))
    b = np.asarray(jax.block_until_ready(
        jax.jit(lambda s, k: small(s, k, 0, True))(sd, key)))
    rel = np.abs(b - a) / (np.abs(a) + 1e-6)
    log("random compact parity: maxabs", float(np.abs(b - a).max()),
        "maxrel", float(rel.max()), "flips", int((a != b).sum()),
        "/", a.size)
    assert np.isfinite(b).all()

    diff, static = partition(sd)

    def loss(d, k, w, compact):
        img = render_waves(combine(d, static), W, H, k, w, 1, depth=D,
                           chunk_size=9216, compact=compact)
        return jnp.mean(img)

    for compact in (True, False):
        tag = "compact" if compact else "fused"
        fwd = jax.jit(lambda d, k, w, c=compact: loss(d, k, w, c))
        step = jax.jit(jax.value_and_grad(
            lambda d, k, w, c=compact: loss(d, k, w, c)))
        jax.block_until_ready(fwd(diff, key, 0))
        log(f"random fwd {tag} ms", round(timed(fwd, diff, key) * 1e3, 1))
        jax.block_until_ready(step(diff, key, 0))
        log(f"random step {tag} ms", round(timed(step, diff, key) * 1e3, 1))

    os.environ["RRT_NO_MEGAKERNEL"] = "1"
    fwd = jax.jit(lambda d, k, w: loss(d, k, w, False))
    jax.block_until_ready(fwd(diff, key, 0))
    log("random fwd split ms", round(timed(fwd, diff, key) * 1e3, 1))
    del os.environ["RRT_NO_MEGAKERNEL"]


@phase("4-bigmesh")
def p4(key):
    path = ("/root/reference/assets/MetalRoughSpheres/"
            "MetalRoughSpheres.gltf")
    if not os.path.exists(path):
        log("bigmesh asset missing, skipped")
        return
    big = compile_scene(load_gltf_scene(path, W / H))
    log("bigmesh tris", int(big.n_tris), "clusters",
        big.tri_cluster_min.shape[0], "subrows", big.tri_sub_min.shape[0])

    def fwd_big(sd, k, w):
        img = render_waves(sd, W, H, k, w, 1, depth=D, chunk_size=9216)
        return jnp.mean(img)

    f = jax.jit(fwd_big)
    jax.block_until_ready(f(big, key, 0))
    log("bigmesh fwd sub ms", round(timed(f, big, key) * 1e3, 1))

    os.environ["RRT_NO_SUB"] = "1"
    f2 = jax.jit(lambda sd, k, w: fwd_big(sd, k, w))
    jax.block_until_ready(f2(big, key, 0))
    log("bigmesh fwd nosub ms", round(timed(f2, big, key) * 1e3, 1))
    del os.environ["RRT_NO_SUB"]

    dbig, sbig = partition(big)

    def loss_big(d, k, w):
        img = render_waves(combine(d, sbig), W, H, k, w, 1, depth=D,
                           chunk_size=9216)
        return jnp.mean(img)

    sb = jax.jit(jax.value_and_grad(loss_big))
    jax.block_until_ready(sb(dbig, key, 0))
    log("bigmesh step sub ms", round(timed(sb, dbig, key) * 1e3, 1))


def main():
    key = jax.random.PRNGKey(0)
    sd = compile_scene(load_gltf_scene(
        "/root/reference/assets/suzanne.gltf", 16 / 9))
    from rust_ray_tracer_tpu.ops import pallas_bounce as pb
    assert pb.eligible(sd), "suzanne must be megakernel-eligible"

    p1(sd, key)
    p2(sd, key)
    p3(key)
    p4(key)
    log("done")


if __name__ == "__main__":
    main()
