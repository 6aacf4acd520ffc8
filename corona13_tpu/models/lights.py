"""Emitter sampling and evaluation (flat CDF light list).

Faithful to the reference list lights module (corona-13
src/lights.d/list.c): emissive prims are importance-sampled by area*L with
a flat CDF; the NEE vertex-area pdf of a prim is L/sum(L*A) (list.c:125),
and geometric emitters carry a Phong EDF driven by shading roughness
(diffuse 1/pi when roughness ~ 1, else cos^k (k+2)/2pi with
k = 2/r^2 - 2, list.c:160-173).  Emission is one-sided along the
geometric normal (lights_eval_vertex, list.c:258-262).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.math import dot, normalize, cross


def phong_edf(roughness, cos_gn):
    """EDF lobe value for outgoing cosine against the geometric normal.

    The power base is clamped away from 0: pow(0, k)'s derivative is
    0^(k-1) = inf, which leaks NaN into gradients through masked lanes."""
    diffuse = roughness > 1.0 - 1e-4
    r2 = jnp.maximum(roughness * roughness, 1e-8)
    k = 2.0 / r2 - 2.0
    glossy = (jnp.power(jnp.maximum(cos_gn, 1e-6), k) * (k + 2.0)
              / (2.0 * jnp.pi)) * (cos_gn > 0.0)
    return jnp.where(diffuse, 1.0 / jnp.pi, glossy)


def eval_vertex(em, roughness, gn, omega_in):
    """Emitted radiance toward -omega_in for a path-traced emitter hit.

    em: [N, MF], gn: [N, 3], omega_in: [N, 3] propagation direction into
    the vertex.  One-sided: emits only where dot(gn, omega_in) < 0
    (reference lights_eval_vertex path-tracing branch)."""
    cos_gn = -dot(gn, omega_in)
    edf = phong_edf(roughness, cos_gn)
    ok = (cos_gn > 0.0) & jnp.isfinite(edf)
    edf = jnp.where(ok, edf, 0.0)  # finite factor: keeps grads of em clean
    return em * edf[..., None]


def sky_eval(scene, direction, lam):
    """Environment radiance for escaped rays (reference shader_sky_eval:
    constant sky_const.c or image-based sky_envmap.c).
    direction: [N, 3]; lam: [N, MF]."""
    from ..spectral import rgb2spec
    if scene.has_envmap:
        from . import envmap as envmap_mod
        return envmap_mod.eval_radiance(scene.envmap, direction, lam)
    if scene.has_daylight:
        from . import daylight as daylight_mod
        return daylight_mod.eval_radiance(scene.daylight, direction, lam)
    base = scene.sky_mul * rgb2spec.eval_coeff(scene.sky_coeff[None, None, :], lam)
    return jnp.where(scene.sky_kind > 0, base, 0.0)


def sample_nee(lights, geom, from_pos, r1, r2, r3):
    """Sample a point on an emissive triangle (the regression emitters are
    quads, pre-split to tris at load).

    Returns dict with: pos, gn (geometric normal), prim (global id),
    pdf_area ( = L/sum(L*A) ), valid.
    Triangle warp matches prims_sample (src/prims.c:337-350):
    a=sqrt(r0); u=r1*a; v=(1-r1)*a as reference-convention (u,v).
    """
    k = jnp.clip(jnp.searchsorted(lights.cdf, r1, side='left'), 0,
                 lights.n_lights - 1)
    prim = lights.prim[k]
    pdf_area = lights.weight[k]
    v0 = geom.tri_v0[prim]
    e1 = geom.tri_e1[prim]
    e2 = geom.tri_e2[prim]
    a = jnp.sqrt(r2)
    u = r3 * a          # weight of vertex 2 (reference hit->u)
    v = (1.0 - r3) * a  # weight of vertex 1 (reference hit->v)
    pos = v0 + v[..., None] * e1 + u[..., None] * e2
    gn = normalize(cross(e1, e2))
    return {'pos': pos, 'gn': gn, 'prim': prim, 'pdf_area': pdf_area,
            'u': u, 'v': v}


def sample_emission(lights, geom, materials, prim_shader, lam,
                    r1, r2, r3, r4, r5):
    """Start a light subpath (reference lights_sample, list.c:177-240):
    pick an emissive prim by the area*L CDF, a uniform point on it, and a
    cosine (diffuse-EDF) direction.

    Returns dict(pos, gn, dir, prim, thr [N, MF]) with
    thr = Le * cos / (pdf_pos * pdf_dir) — the full light-vertex
    throughput (for diffuse EDF: em * sum(L*A) / L)."""
    from ..spectral import rgb2spec
    from ..utils.math import sample_cos_hemisphere, from_frame, build_onb
    ls = sample_nee(lights, geom, None, r1, r2, r3)
    pos, gn, prim = ls['pos'], ls['gn'], ls['prim']
    pdf_pos = ls['pdf_area']                     # L / sum(L*A)
    mat = prim_shader[jnp.maximum(prim, 0)]
    em = (materials.e_mul[mat, None]
          * rgb2spec.eval_coeff(materials.e_coeff[mat][..., None, :], lam))
    # cosine direction about the geometric normal (diffuse Phong EDF)
    d_local, pdf_dir_cos = sample_cos_hemisphere(r4, r5)
    u, v = build_onb(gn)
    wo = from_frame(u, v, gn, d_local)
    cos_t = d_local[..., 2]
    edf = phong_edf(materials.roughness[mat], cos_t)
    le = em * edf[..., None]
    pdf_pos_safe = jnp.where(pdf_pos > 0.0, pdf_pos, 1.0)
    thr = le * (cos_t / (pdf_pos_safe * jnp.maximum(pdf_dir_cos, 1e-12)))[..., None]
    thr = jnp.where(jnp.isfinite(thr), thr, 0.0)
    return dict(pos=pos, gn=gn, dir=wo, prim=prim, thr=thr,
                pdf_pos=pdf_pos, le=le)


def nee_pdf_area(lights, prim):
    """Vertex-area NEE pdf of having sampled global prim ``prim``
    (reference nee_pdf -> lights_pdf_next_event: L/sum(L*A));
    0 for non-emissive prims."""
    p = jnp.maximum(prim, 0)
    w = lights.prim_weight[jnp.minimum(p, lights.prim_weight.shape[0] - 1)]
    return jnp.where(prim >= 0, w, 0.0)
