"""Procedural test scenes (no external files needed).

The reference's regression suite ships binary .geo scenes; for unit tests,
the driver entry points, and offline benchmarking we build equivalent
scenes directly from arrays: a Cornell-style box with an area light and an
optional sphere, assembled into the same Scene pytree that
scene.load_scene produces from .nra2 files.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from . import scene as scene_mod
from .io import cam as cam_io
from .ops.trace import make_device_geometry
from .spectral import rgb2spec
from .spectral import fresnel_data


def _quad(p0, p1, p2, p3):
    """Two CCW triangles for the quad p0-p1-p2-p3 (normal by right-hand rule)."""
    return np.array([[p0, p1, p2], [p0, p2, p3]], np.float32)


def assemble_scene(tri_v, tri_sh, mats, cam: cam_io.CameraData,
                   sky_rgb=(0.0, 0.0, 0.0), sph_c=None, sph_r=None,
                   sph_sh=None, line_vtx=None, line_radii=None,
                   line_sh=None) -> scene_mod.Scene:
    """Build a Scene pytree from triangle soup + resolved materials.

    tri_v: [T, 3, 3]; tri_sh: [T] material ids; mats: list of
    scene._ResolvedMat.  Mirrors the device-assembly part of
    scene.load_scene (same light-CDF and spectral-fit semantics).
    """
    tri_v = np.asarray(tri_v, np.float32)
    tri_sh = np.asarray(tri_sh, np.int32)
    e1 = tri_v[:, 1] - tri_v[:, 0]
    e2 = tri_v[:, 2] - tri_v[:, 0]
    gn = np.cross(e1, e2)
    gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    tri_n = np.repeat(gn[:, None, :], 3, axis=1)

    sph_c = np.zeros((0, 3), np.float32) if sph_c is None else np.asarray(sph_c, np.float32)
    sph_r = np.zeros((0,), np.float32) if sph_r is None else np.asarray(sph_r, np.float32)
    sph_sh = np.zeros((0,), np.int32) if sph_sh is None else np.asarray(sph_sh, np.int32)

    line_vtx = (np.zeros((0, 2, 3), np.float32) if line_vtx is None
                else np.asarray(line_vtx, np.float32))
    line_radii = (np.zeros((0, 2), np.float32) if line_radii is None
                  else np.asarray(line_radii, np.float32))
    line_sh = (np.zeros((0,), np.int32) if line_sh is None
               else np.asarray(line_sh, np.int32))
    geom = make_device_geometry(tri_v=tri_v, tri_vn=tri_n, tri_shader=tri_sh,
                                sph_c=sph_c, sph_r=sph_r, sph_shader=sph_sh,
                                line_vtx=line_vtx, line_radii=line_radii,
                                line_shader=line_sh)

    prim_shader = np.concatenate([tri_sh, sph_sh, line_sh])

    d_rgb = np.array([m.d_rgb for m in mats], np.float32)
    g_rgb = np.array([m.g_rgb for m in mats], np.float32)
    e_rgb = np.array([m.e_rgb for m in mats], np.float32)
    mfp = np.array([m.med_mfp_rgb for m in mats], np.float32)
    med_alb = np.array([m.med_albedo_rgb for m in mats], np.float32)
    d_c, d_m = scene_mod._fit(d_rgb)
    g_c, g_m = scene_mod._fit(g_rgb)
    e_c, e_m = scene_mod._fit(e_rgb)
    with np.errstate(divide='ignore'):
        mut = np.where(mfp > 0.0, 1.0 / np.maximum(mfp, 1e-20), 0.0)
    mut_c, mut_m = scene_mod._fit(mut)
    mus_c, mus_m = scene_mod._fit(med_alb)
    checker = np.load(os.path.join(os.path.dirname(__file__), '..',
                                   'data', 'colorchecker_sg.npy'))

    materials = scene_mod.MaterialTable(
        kind=jnp.asarray(np.array([m.kind for m in mats], np.int32)),
        d_coeff=jnp.asarray(d_c), d_mul=jnp.asarray(d_m),
        g_coeff=jnp.asarray(g_c), g_mul=jnp.asarray(g_m),
        e_coeff=jnp.asarray(e_c), e_mul=jnp.asarray(e_m),
        roughness=jnp.asarray(np.array([m.roughness for m in mats], np.float32)),
        ior_nd=jnp.asarray(np.array([m.ior_nd for m in mats], np.float32)),
        ior_abbe=jnp.asarray(np.array([m.ior_abbe for m in mats], np.float32)),
        use_checker=jnp.asarray(np.array([m.use_checker for m in mats], bool)),
        checker_spectra=jnp.asarray(checker),
        med_mut_coeff=jnp.asarray(mut_c), med_mut_mul=jnp.asarray(mut_m),
        med_mus_coeff=jnp.asarray(mus_c), med_mus_mul=jnp.asarray(mus_m),
        med_g=jnp.asarray(np.array([m.med_g for m in mats], np.float32)),
        med_enabled=jnp.asarray(np.array([m.med_enabled for m in mats], bool)),
        tex_idx=jnp.full((len(mats),), -1, jnp.int32),
        tex_slot=jnp.zeros((len(mats),), jnp.int32),
        tex_mul=jnp.ones((len(mats),), jnp.float32),
        fres_n=jnp.asarray(np.stack(
            [fresnel_data.get_conductor(getattr(m, 'metal_name', 'default'))[0]
             for m in mats])),
        fres_k=jnp.asarray(np.stack(
            [fresnel_data.get_conductor(getattr(m, 'metal_name', 'default'))[1]
             for m in mats])))

    # light table: weight per prim = L / sum(L*A) (lights.d/list.c:125-128)
    lam4 = np.array([400.0, 480.0, 560.0, 660.0], np.float32)
    import jax as _jax
    with _jax.default_device(_jax.devices('cpu')[0]):
        e_eval = np.asarray(rgb2spec.eval_coeff(jnp.asarray(e_c)[:, None, :],
                                                jnp.asarray(lam4)[None, :]))
    L_mat = e_m * e_eval.mean(axis=1)
    areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    sel = np.nonzero(L_mat[tri_sh] > 0.0)[0]
    if len(sel):
        lw = L_mat[tri_sh[sel]]
        la = areas[sel]
        wa = lw * la
        cdf = np.cumsum(wa) / wa.sum()
        weight = lw / wa.sum()
        prim_weight = np.zeros(max(len(prim_shader), 1), np.float32)
        prim_weight[sel] = weight
        lights = scene_mod.LightTable(
            prim=jnp.asarray(sel.astype(np.int32)),
            cdf=jnp.asarray(cdf.astype(np.float32)),
            weight=jnp.asarray(weight.astype(np.float32)),
            area=jnp.asarray(la.astype(np.float32)),
            prim_weight=jnp.asarray(prim_weight))
    else:
        lights = scene_mod.LightTable(
            prim=jnp.zeros((0,), jnp.int32), cdf=jnp.zeros((0,)),
            weight=jnp.zeros((0,)), area=jnp.zeros((0,)),
            prim_weight=jnp.zeros((max(len(prim_shader), 1),)))

    camera = scene_mod.CameraP(
        pos=jnp.asarray(cam.pos), pos_t1=jnp.asarray(cam.pos_t1),
        orient=jnp.asarray(cam.orient), orient_t1=jnp.asarray(cam.orient_t1),
        focus=jnp.float32(cam.focus), focal_length=jnp.float32(cam.focal_length),
        film_width=jnp.float32(cam.film_width),
        film_height=jnp.float32(cam.film_height),
        f_stop=jnp.float32(cam.f_stop),
        exposure_time=jnp.float32(cam.exposure_time),
        iso=jnp.float32(cam.iso))

    sky_rgb = np.asarray(sky_rgb, np.float32)
    sc, sm = scene_mod._fit(sky_rgb[None])
    sky_kind = scene_mod.SKY_CONST if sky_rgb.max() > 0 else scene_mod.SKY_BLACK

    return scene_mod.Scene(
        geom=geom, materials=materials, lights=lights, camera=camera,
        prim_shader=jnp.asarray(prim_shader), sky_kind=jnp.int32(sky_kind),
        sky_coeff=jnp.asarray(sc[0]), sky_mul=jnp.asarray(sm[0]),
        kinds_used=tuple(sorted({m.kind for m in mats})))


def cornell_scene(sphere: str | None = 'diffuse', light=40.0,
                  albedo=(0.7, 0.7, 0.7)) -> scene_mod.Scene:
    """Cornell-style box, 10 units (= 1 m) wide, centered 15 units down +z
    from the camera at the origin.  ``sphere``: None | 'diffuse' |
    'dielectric' | 'metal' | 'mirror'."""
    s = 5.0    # half box width
    z0, z1 = 10.0, 20.0
    # outward-facing walls seen from inside: wind so normals point inward
    tris = []
    shs = []

    def add(quad, sh):
        tris.append(quad)
        shs.extend([sh, sh])

    # material ids: 0 white, 1 red, 2 green, 3 light, 4 sphere
    # floor y=-s (normal +y)
    add(_quad((-s, -s, z0), (s, -s, z0), (s, -s, z1), (-s, -s, z1)), 0)
    # ceiling y=+s (normal -y)
    add(_quad((-s, s, z0), (-s, s, z1), (s, s, z1), (s, s, z0)), 0)
    # back z=z1 (normal -z)
    add(_quad((-s, -s, z1), (s, -s, z1), (s, s, z1), (-s, s, z1)), 0)
    # left x=-s (normal +x)
    add(_quad((-s, -s, z0), (-s, -s, z1), (-s, s, z1), (-s, s, z0)), 1)
    # right x=+s (normal -x)
    add(_quad((s, -s, z0), (s, s, z0), (s, s, z1), (s, -s, z1)), 2)
    # light: small quad just below the ceiling, facing down (-y)
    ls = 1.5
    zl = 0.5 * (z0 + z1)
    add(_quad((-ls, s - 0.01, zl - ls), (ls, s - 0.01, zl - ls),
              (ls, s - 0.01, zl + ls), (-ls, s - 0.01, zl + ls)), 3)
    tri_v = np.concatenate(tris)
    # fix light winding: want normal -y
    gn = np.cross(tri_v[:, 1] - tri_v[:, 0], tri_v[:, 2] - tri_v[:, 0])
    for i, sh in enumerate(shs):
        if sh == 3 and gn[i, 1] > 0:
            tri_v[i] = tri_v[i, ::-1]

    M = scene_mod._ResolvedMat
    mats = [
        M(d_rgb=tuple(albedo)),
        M(d_rgb=(0.6, 0.1, 0.1)),
        M(d_rgb=(0.1, 0.6, 0.1)),
        M(e_rgb=(light, light, light)),
    ]
    sph_c = sph_r = sph_sh = None
    if sphere is not None:
        sph_c = np.array([[0.0, -s + 2.0, 15.0]], np.float32)
        sph_r = np.array([2.0], np.float32)
        sph_sh = np.array([4], np.int32)
        if sphere == 'diffuse':
            mats.append(M(d_rgb=(0.6, 0.5, 0.3)))
        elif sphere == 'dielectric':
            mats.append(M(kind=scene_mod.DIELECTRIC, g_rgb=(1, 1, 1),
                          roughness=0.0, ior_nd=1.5, ior_abbe=40.0))
        elif sphere == 'rough_dielectric':
            mats.append(M(kind=scene_mod.DIELECTRIC, g_rgb=(1, 1, 1),
                          roughness=0.3, ior_nd=1.5, ior_abbe=40.0))
        elif sphere == 'metal':
            mats.append(M(kind=scene_mod.METAL, g_rgb=(0.9, 0.9, 0.9),
                          roughness=0.2))
        elif sphere == 'mirror':
            mats.append(M(kind=scene_mod.METAL, g_rgb=(1, 1, 1),
                          roughness=0.0))
        elif sphere == 'subsurf':
            # dielectric shell with a scattering interior (0030_subsurf)
            mats.append(M(kind=scene_mod.DIELECTRIC, g_rgb=(1, 1, 1),
                          roughness=0.0, ior_nd=1.3, ior_abbe=40.0,
                          med_mfp_rgb=(0.5, 0.7, 0.9),
                          med_albedo_rgb=(0.95, 0.9, 0.85), med_g=0.3,
                          med_enabled=True))
        elif sphere == 'absorb':
            # dielectric with purely absorbing interior
            mats.append(M(kind=scene_mod.DIELECTRIC, g_rgb=(1, 1, 1),
                          roughness=0.0, ior_nd=1.3, ior_abbe=40.0,
                          med_mfp_rgb=(1.0, 1.0, 1.0),
                          med_albedo_rgb=(0.0, 0.0, 0.0),
                          med_enabled=True))
        else:
            raise ValueError(sphere)

    cam = cam_io.CameraData(
        pos=np.zeros(3, np.float32), pos_t1=np.zeros(3, np.float32),
        orient=np.array([1, 0, 0, 0], np.float32),
        orient_t1=np.array([1, 0, 0, 0], np.float32),
        focus=15.0)
    return assemble_scene(tri_v, np.asarray(shs), mats, cam,
                          sph_c=sph_c, sph_r=sph_r, sph_sh=sph_sh)


def furnace_scene(albedo=0.5, emission=1.0, sphere=True) -> scene_mod.Scene:
    """White-furnace: camera inside a big emissive sphere shell made of
    triangles... simpler: constant sky + a diffuse sphere.  With sky
    radiance L and albedo a, every path vertex chain converges to
    L * a^k terms -> pixel radiance L/(1-a) in the limit; the test uses
    few bounces and checks against the truncated geometric sum."""
    M = scene_mod._ResolvedMat
    mats = [M(d_rgb=(albedo, albedo, albedo))]
    if sphere:
        sph_c = np.array([[0.0, 0.0, 15.0]], np.float32)
        sph_r = np.array([4.0], np.float32)
        sph_sh = np.array([0], np.int32)
    else:
        sph_c = np.zeros((0, 3), np.float32)
        sph_r = np.zeros((0,), np.float32)
        sph_sh = np.zeros((0,), np.int32)
    cam = cam_io.CameraData(
        pos=np.zeros(3, np.float32), pos_t1=np.zeros(3, np.float32),
        orient=np.array([1, 0, 0, 0], np.float32),
        orient_t1=np.array([1, 0, 0, 0], np.float32), focus=15.0)
    # one faraway dummy tri so the tri BVH is non-degenerate
    tri_v = np.array([[[1e4, 1e4, 1e4], [1e4 + 1, 1e4, 1e4],
                       [1e4, 1e4 + 1, 1e4]]], np.float32)
    return assemble_scene(tri_v, np.array([0], np.int32), mats, cam,
                          sky_rgb=(emission, emission, emission),
                          sph_c=sph_c, sph_r=sph_r, sph_sh=sph_sh)
