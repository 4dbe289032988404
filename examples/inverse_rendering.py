"""Inverse rendering demo: recover material parameters by gradient descent.

The capability BASELINE.json adds on top of the reference (which has no
gradients at all): render a target image with known materials, then
optimize a mis-initialized scene's albedo/emission until the renders
match — gradients flow through the full wavefront path tracer via
detached sampling.

Run:  python examples/inverse_rendering.py  (CPU-friendly, ~1 min)
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import (
    combine, compile_scene, partition)
from rust_ray_tracer_tpu.ops.camera import make_camera
from rust_ray_tracer_tpu.ops.integrator import render_image

W, H, SPP, DEPTH = 48, 48, 4, 3


def build(albedo, emit):
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 45.0, 1.0)
    return compile_scene(S.Scene(cam, [
        S.Sphere((0, 0, -4), 1.3, S.Lambertian.from_color(albedo)),
        S.XYRect(-4.0, 4.0, -4.0, 4.0, 3.0,
                 S.DiffuseLight.from_color(emit)),
    ], [], (0.05, 0.05, 0.08)))


def main():
    key = jax.random.PRNGKey(0)
    target_scene = build((0.75, 0.25, 0.55), (3.0, 2.6, 2.2))
    target = render_image(target_scene, W, H, SPP, key, depth=DEPTH,
                          chunk_size=1024)

    # mis-initialize the albedo; emission starts at truth and stays
    # fixed — albedo and emission are gauge-ambiguous from an image in
    # which the lamp is not directly visible (brighter paint + dimmer
    # lamp renders identically), so we demo the well-posed recovery
    scene0 = build((0.5, 0.5, 0.5), (3.0, 2.6, 2.2))
    diff, static = partition(scene0)

    def loss_fn(diff, k):
        img = render_image(combine(diff, static), W, H, SPP, k,
                           depth=DEPTH, chunk_size=1024)
        return jnp.mean((img - target) ** 2)

    # optimize ONLY the albedo texture row; the full diff pytree also
    # carries geometry and camera leaves, and letting Adam wander those
    # turns a material-recovery demo into a shape search
    def only_albedo(g):
        zeros = jax.tree.map(lambda x: x * 0.0, g)
        keep = zeros.tex_color.at[0].set(g.tex_color[0])
        return zeros._replace(tex_color=keep)

    # clip: a single firefly path (importance-sampling pdf floored at
    # 1e-5 -> ~1e5 path weight) can spike one step's gradient by orders
    # of magnitude and throw Adam onto a plateau
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(5e-2))
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, opt_state, k):
        loss, grads = jax.value_and_grad(loss_fn)(diff, k)
        updates, opt_state = opt.update(only_albedo(grads), opt_state)
        return optax.apply_updates(diff, updates), opt_state, loss

    for i in range(60):
        # common random numbers: render with the TARGET's key so the MC
        # noise cancels in the residual. With independent samples the
        # expected MSE contains the estimator variance, which pulls the
        # optimum toward darker (lower-variance) scenes — emission would
        # collapse instead of converging.
        diff, opt_state, loss = step(diff, opt_state, key)
        if i % 10 == 0 or i == 59:
            print(f"step {i:3d}  loss {float(loss):.6f}")

    got = combine(diff, static)
    # recovered albedo lives in the texture table
    alb_t = np.asarray(target_scene.tex_color)[0]
    alb_g = np.asarray(got.tex_color)[0]
    print("target  albedo:", np.round(alb_t, 3).tolist())
    print("learned albedo:", np.round(alb_g, 3).tolist())
    err = np.abs(alb_t - alb_g).max()
    print(f"max albedo error: {err:.3f}")
    return 0 if err < 0.1 else 1


if __name__ == "__main__":
    sys.exit(main())
