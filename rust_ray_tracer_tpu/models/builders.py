"""The eight built-in procedural scenes.

Counterpart of ``/root/reference/src/scene.rs`` (``get_scene``,
``scene.rs:406-563``, and the eight builders at ``scene.rs:33-391``). Scene
content, camera poses, vfovs, backgrounds and light lists are reproduced
one-to-one; construction is host-side Python emitting the object API from
:mod:`rust_ray_tracer_tpu.models.scene`, compiled to device arrays with
:func:`compile_scene`.

Reference quirks carried over deliberately:
  * the builders pass glam's ``look_at_rh`` — a WORLD->VIEW matrix — as
    "camera_to_world" (``scene.rs:417-418`` etc.); the pose quirk shapes the
    reference's output so we feed the identical matrix;
  * ``aperture`` is computed but unused (no depth of field) —
    ``Camera::new`` ignores it (``camera.rs:18-39``);
  * Random / FinalScene randomize layout with *unseeded* ``thread_rng``
    (``scene.rs:34,294``); here layout randomness is seeded (``seed``
    argument) so renders are reproducible — the distribution matches;
  * FinalScene's light list wraps its XZRect in FlipFace (``scene.rs:545``),
    which has no pdf/random implementation — the reference samples the
    Hittable *defaults* (pdf=0, dir=(1,0,0); ``geometry/mod.rs:56-61``).
    compile_scene maps that to LIGHT_NULL with the same semantics.
"""

from __future__ import annotations

import numpy as np

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.ops.camera import look_at_rh, make_camera

SCENE_TYPES = (
    "random", "two_spheres", "perlin_spheres", "earth", "rect_light",
    "cornell_box", "cornell_triangle", "final_scene",
)

_SKY = (0.7, 0.8, 1.0)


def _camera(lookfrom, lookat, vfov, aspect, time0=0.0, time1=1.0):
    c2w = look_at_rh(lookfrom, lookat, (0.0, 1.0, 0.0))
    return make_camera(c2w, vfov, aspect, time0, time1)


def _earth_texture():
    # ImageTexture::from_file("./earthmap.jpg"): the file does not exist in
    # the reference repo either -> solid yellow fallback (texture.rs:129).
    return S.ImageTexture(path="./earthmap.jpg")


def random_scene(aspect: float, seed: int = 0) -> S.Scene:
    """`random_scene` + Random camera wiring (scene.rs:33-92,411-426)."""
    rng = np.random.default_rng(seed)
    world: list = []
    world.append(S.Sphere((0, -1000, 0), 1000.0,
                          S.Lambertian(S.Noise(4.0))))
    comp = np.array([4.0, 0.2, 0.0])
    for a in range(-15, 15):
        for b in range(-15, 15):
            choose_mat = rng.random()
            center = np.array([a + 0.9 * rng.random(), 0.2,
                               b + 0.9 * rng.random()], np.float32)
            if np.linalg.norm(center - comp) <= 0.9:
                continue
            if choose_mat < 0.8:
                albedo = rng.random(3).astype(np.float32)
                c1 = center + np.array([0, rng.uniform(0, 0.5), 0],
                                       np.float32)
                world.append(S.MovingSphere(center, c1, 0.0, 1.0, 0.2,
                                            S.Lambertian.from_color(albedo)))
            elif choose_mat < 0.95:
                albedo = rng.random(3).astype(np.float32)
                world.append(S.Sphere(center, 0.2,
                                      S.Metal(albedo, rng.uniform(0, 0.5))))
            else:
                world.append(S.Sphere(center, 0.2, S.Dielectric(1.5)))
    world.append(S.Sphere((-4, 1, 0), 1.0,
                          S.Lambertian.from_rgb(0.4, 0.2, 0.1)))
    world.append(S.Sphere((0, 1, 0), 1.0, S.Dielectric(1.5)))
    world.append(S.Sphere((4, 1, 0), 1.0, S.Lambertian(_earth_texture())))
    cam = _camera((13, -2, 3), (0, 0, 0), 20.0, aspect)
    return S.Scene(camera=cam, world=world, lights=[], background=_SKY)


def two_spheres(aspect: float, seed: int = 0) -> S.Scene:
    """scene.rs:94-121,427-441."""
    world = [
        S.Sphere((0, -10, 0), 10.0,
                 S.Lambertian(S.Checker.from_colors((0.2, 0.3, 0.1),
                                                    (0.9, 0.9, 0.9)))),
        S.Sphere((0, 10, 0), 10.0,
                 S.Lambertian(S.Checker(_earth_texture(), _earth_texture()))),
    ]
    cam = _camera((13, -2, 3), (0, 0, 0), 40.0, aspect)
    return S.Scene(camera=cam, world=world, lights=[], background=_SKY)


def perlin_spheres(aspect: float, seed: int = 0) -> S.Scene:
    """scene.rs:123-141,442-456."""
    pertex = S.Noise(4.0)
    world = [
        S.Sphere((0, -1000, 0), 1000.0, S.Lambertian(pertex)),
        S.Sphere((0, 1, 0), 1.0, S.Lambertian(pertex)),
    ]
    cam = _camera((13, -2, 7), (0, 0, 0), 20.0, aspect)
    return S.Scene(camera=cam, world=world, lights=[], background=_SKY)


def earth(aspect: float, seed: int = 0) -> S.Scene:
    """scene.rs:144-153,457-471."""
    world = [S.Sphere((0, 0, 0), 2.0, S.Lambertian(_earth_texture()))]
    cam = _camera((13, -2, 3), (0, 0, 0), 20.0, aspect)
    return S.Scene(camera=cam, world=world, lights=[], background=_SKY)


def rect_light(aspect: float, seed: int = 0) -> S.Scene:
    """`simple_light` + RectLight wiring (scene.rs:155-189,472-495)."""
    diff_light = S.DiffuseLight.from_color((4, 4, 4))
    world = [
        S.Sphere((0, -1000, 0), 1000.0, S.Lambertian(S.Noise(4.0))),
        S.Sphere((0, 2, 0), 2.0, S.Metal((0.5, 0.5, 0.5), 0.1)),
        S.XYRect(3.0, 5.0, 1.0, 3.0, -2.0, diff_light),
        S.Sphere((0, 6, 0), 1.0, diff_light),
    ]
    # the light list holds an XYRect — which has NO pdf/random impl in the
    # reference (only XZRect does, aarect.rs:123-143) -> LIGHT_NULL semantics
    lights = [S.XYRect(3.0, 5.0, 1.0, 3.0, -2.0,
                       S.DiffuseLight.from_color((1, 1, 1)))]
    cam = _camera((26, -6, 6), (0, -2, 0), 20.0, aspect)
    return S.Scene(camera=cam, world=world, lights=lights,
                   background=(0, 0, 0))


def _cornell_walls(light_flipped: bool):
    red = S.Lambertian.from_rgb(0.65, 0.05, 0.05)
    green = S.Lambertian.from_rgb(0.12, 0.45, 0.15)
    white = S.Lambertian.from_rgb(0.73, 0.73, 0.73)
    light = S.DiffuseLight.from_color((15, 15, 15))
    lamp = S.XZRect(213.0, 343.0, 227.0, 332.0, 554.0, light)
    walls = [
        S.YZRect(0.0, 555.0, 0.0, 555.0, 555.0, green),
        S.YZRect(0.0, 555.0, 0.0, 555.0, 0.0, red),
        S.FlipFace(lamp) if light_flipped else lamp,
        S.XZRect(0.0, 555.0, 0.0, 555.0, 0.0, white),
        S.XZRect(0.0, 555.0, 0.0, 555.0, 555.0, white),
        S.XYRect(0.0, 555.0, 0.0, 555.0, 555.0, white),
    ]
    return walls, white


def cornell_box(aspect: float, seed: int = 0) -> S.Scene:
    """scene.rs:192-246,496-519 (lamp FlipFace-wrapped in the world)."""
    world, white = _cornell_walls(light_flipped=True)
    world.append(S.Translate(
        S.RotateY(S.Cuboid((0, 0, 0), (165, 330, 165), white), 15.0),
        (265, 0, 295)))
    world.append(S.Translate(
        S.RotateY(S.Cuboid((0, 0, 0), (165, 165, 165), white), -18.0),
        (130, 0, 65)))
    lights = [S.XZRect(213.0, 343.0, 227.0, 332.0, 554.0,
                       S.DiffuseLight.from_color((15, 15, 15)))]
    cam = _camera((278, -278, -800), (278, -278, 0), 40.0, aspect)
    return S.Scene(camera=cam, world=world, lights=lights,
                   background=(0, 0, 0))


def cornell_triangle(aspect: float, seed: int = 0) -> S.Scene:
    """scene.rs:249-286,520-543 (lamp NOT flipped in this variant)."""
    world, _white = _cornell_walls(light_flipped=False)
    world.append(S.Triangle((250, 0, 400), (100, 150, 400), (400, 150, 400),
                            S.Metal((0.8, 0.85, 0.88), 0.0)))
    lights = [S.XZRect(213.0, 343.0, 227.0, 332.0, 554.0,
                       S.DiffuseLight.from_color((15, 15, 15)))]
    cam = _camera((278, -278, -800), (278, -278, 0), 40.0, aspect)
    return S.Scene(camera=cam, world=world, lights=lights,
                   background=(0, 0, 0))


def final_scene(aspect: float, seed: int = 0) -> S.Scene:
    """scene.rs:288-391,544-562."""
    rng = np.random.default_rng(seed)
    world: list = []
    ground = S.Lambertian.from_rgb(0.48, 0.83, 0.53)
    for i in range(15):
        for j in range(15):
            w = 100.0
            x0, z0 = -1000.0 + i * w, -1000.0 + j * w
            y1 = rng.uniform(1.0, 101.0)
            world.append(S.Cuboid((x0, 0.0, z0), (x0 + w, y1, z0 + w),
                                  ground))
    world.append(S.XZRect(123.0, 423.0, 147.0, 412.0, 554.0,
                          S.DiffuseLight.from_color((7, 7, 7))))
    world.append(S.MovingSphere((400, 400, 200), (430, 400, 200), 0.0, 1.0,
                                50.0, S.Lambertian.from_rgb(0.7, 0.3, 0.1)))
    world.append(S.Sphere((260, 150, 45), 45.0, S.Dielectric(1.5)))
    world.append(S.Sphere((0, 150, 145), 50.0,
                          S.Metal((0.8, 0.8, 0.9), 1.0)))
    boundary = S.Sphere((360, 150, 145), 70.0, S.Dielectric(1.5))
    world.append(boundary)
    world.append(S.ConstantMedium.from_color(boundary, 0.2, (0.2, 0.4, 0.9)))
    fog = S.Sphere((0, 0, 0), 5000.0, S.Dielectric(1.5))
    world.append(S.ConstantMedium(fog, 0.0001, _earth_texture()))
    world.append(S.Sphere((400, 200, 400), 100.0,
                          S.Lambertian(_earth_texture())))
    world.append(S.Sphere((220, 280, 200), 80.0,
                          S.Lambertian(S.Noise(2.0))))
    white = S.Lambertian.from_rgb(0.73, 0.73, 0.73)
    cluster = [S.Sphere(rng.uniform(0.0, 165.0, 3).astype(np.float32), 10.0,
                        white) for _ in range(10)]
    world.append(S.Translate(S.RotateY(cluster, 15.0), (-100, 270, 395)))
    # light list: FlipFace-wrapped rect -> Hittable default pdf/random
    # (LIGHT_NULL; scene.rs:545-553, geometry/mod.rs:56-61)
    lights = [S.FlipFace(S.XZRect(123.0, 423.0, 147.0, 412.0, 554.0,
                                  S.DiffuseLight.from_color((0, 0, 0))))]
    cam = _camera((478, -278, -600), (278, -278, 0), 40.0, aspect)
    return S.Scene(camera=cam, world=world, lights=lights,
                   background=(0, 0, 0))


def _composite(aspect: float, seed: int = 0) -> S.Scene:
    # 9th, non-reference scene (BASELINE config 5); lazy import keeps the
    # glTF machinery out of pure-procedural paths. Needs the reference
    # assets on disk -> raises FileNotFoundError when absent.
    from rust_ray_tracer_tpu.models.composite import composite_scene
    return composite_scene(aspect, seed)


_BUILDERS = {
    "random": random_scene,
    "two_spheres": two_spheres,
    "perlin_spheres": perlin_spheres,
    "earth": earth,
    "rect_light": rect_light,
    "cornell_box": cornell_box,
    "cornell_triangle": cornell_triangle,
    "final_scene": final_scene,
    "composite": _composite,
}


def get_scene(name: str, aspect: float, seed: int = 0) -> S.Scene:
    """Build a named scene (``get_scene``, scene.rs:406)."""
    try:
        builder = _BUILDERS[name]
    except KeyError:
        raise ValueError(
            f"unknown scene {name!r}; one of {sorted(_BUILDERS)}") from None
    return builder(aspect, seed)
