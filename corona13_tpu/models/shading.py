"""Hit-point shading preparation.

The wavefront analogue of the reference's shader_prepare
(corona-13 src/shader.c:462-541) + prims_get_normal_time
(src/prims.c:254-368): given a Hit wavefront, gather the primitive data,
compute geometric/shading normals and texture coordinates, fetch the
material row and evaluate all spectral slots at the path wavelengths.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.math import dot, normalize, cross, build_onb
from ..spectral import rgb2spec, cie
from .bsdf import ShadingPoint
from . import lights as lights_mod


def _tri_geo(geom, slot, u, v):
    """Geometric + shading normal, st coords, and material id for triangle
    hits, fetched as TWO contiguous leaf-major row gathers (leaf_data 9 +
    leaf_shade 17 floats) instead of five scattered per-triangle gathers.

    (u, v) use the reference's stored convention; for quad halves they are
    remapped to the sub-triangle barycentrics first (prims.c:310-345):
    half 1 stores (u, v+u) -> bary (u, v); half 2 stores (u+v, v) ->
    bary (u-v, v)."""
    sl = jnp.maximum(slot, 0)
    rows = geom.tri_bvh.leaf_data[sl]     # [N, 9]  v0, e1, e2
    shade = geom.tri_bvh.leaf_shade[sl]   # [N, 17] vn9, uv6, shader, half
    e1 = rows[..., 3:6]
    e2 = rows[..., 6:9]
    gn = normalize(cross(e1, e2))
    half = shade[..., 16].astype(jnp.int32)
    bu = jnp.where(half == 2, u - v, u)   # weight of corner 2
    bv = jnp.where(half == 1, v - u, v)   # weight of corner 1
    w0 = 1.0 - bu - bv
    vn = shade[..., 0:9].reshape(shade.shape[:-1] + (3, 3))
    n = normalize(w0[..., None] * vn[..., 0, :] + bv[..., None] * vn[..., 1, :]
                  + bu[..., None] * vn[..., 2, :])
    uvs = shade[..., 9:15].reshape(shade.shape[:-1] + (3, 2))
    st = (w0[..., None] * uvs[..., 0, :] + bv[..., None] * uvs[..., 1, :]
          + bu[..., None] * uvs[..., 2, :])
    # no-uv convention: encoded uv word 0 decodes to (0,0) on every corner ->
    # fall back to raw (u, v) like prims.c:305-308
    has_uv = jnp.any(jnp.abs(uvs) > 0.0, axis=(-2, -1))
    st = jnp.where(has_uv[..., None], st, jnp.stack([u, v], axis=-1))
    mat = shade[..., 15].astype(jnp.int32)
    return gn, n, st, mat


def _sphere_geo(geom, local, x):
    c = geom.sph_c[local]
    r = jnp.maximum(geom.sph_r[local], 1e-20)
    n = (x - c) / r[..., None]
    # reference sphere uv (geo/sphere.h:161-162)
    su = jnp.arctan2(n[..., 1], n[..., 0]) / (2.0 * jnp.pi)
    sv = jnp.arccos(jnp.clip(n[..., 2], -1.0, 1.0)) / jnp.pi
    return n, n, jnp.stack([su, sv], axis=-1)


def _line_geo(geom, local, x, y_frac):
    v0 = geom.line_v0[local]
    v1 = geom.line_v1[local]
    r0 = geom.line_r0[local]
    r1 = geom.line_r1[local]
    axis = v1 - v0
    length = jnp.sqrt(jnp.maximum(dot(axis, axis), 1e-20))
    d = axis / length[..., None]
    o = x - v0
    ya = dot(o, d)
    radial = o - ya[..., None] * d
    radial = normalize(radial)
    # tilt to the cone surface (geo/line.h:156-160)
    n = normalize(radial - d * ((r1 - r0) / length)[..., None])
    return n, n, jnp.stack([y_frac, jnp.zeros_like(y_frac)], axis=-1), d


def checker_albedo(spectra, st, lam):
    """IT8 chart reflectance from texture coords at wavelengths lam
    (reference src/shaders/colorcheckersg.c:244-261): 14x10 patches with a
    10% flat-grey border grid."""
    u = st[..., 0]
    v = st[..., 1]
    i = jnp.mod((14.0 * u).astype(jnp.int32), 14)
    j = jnp.mod((10.0 * v).astype(jnp.int32), 10)
    fu = jnp.mod(14.0 * u, 1.0)
    fv = jnp.mod(10.0 * v, 1.0)
    border = (fu < 0.1) | (fu > 0.9) | (fv < 0.1) | (fv > 0.9)
    patch = 14 * j + i
    # sample patch spectrum at lam: table 380..730nm in 10nm steps, nearest
    # bin like get_spectrum (colorcheckersg.c:169-180)
    li = ((lam - 380.0) / 10.0).astype(jnp.int32)
    valid = (li >= 0) & (li < 36)
    li = jnp.clip(li, 0, 35)
    val = spectra[patch[..., None], li]
    val = jnp.where(valid, val, 0.0)
    return jnp.where(border[..., None], 0.3, val)


def prepare(scene, hit, x, wi, lam) -> ShadingPoint:
    """Build the ShadingPoint wavefront for hits.

    x: hit positions [N,3]; wi: propagation direction into the vertex;
    lam: [N, MF] wavelengths.  Invalid hits get absorbing defaults.
    """
    geom = scene.geom
    prim = jnp.maximum(hit.prim, 0)
    n_t = geom.n_tris
    n_s = geom.n_spheres
    is_tri = prim < n_t
    is_sph = (prim >= n_t) & (prim < n_t + n_s)
    is_line = prim >= n_t + n_s

    gn, n, st, mat = _tri_geo(geom, hit.slot, hit.u, hit.v)
    if n_s:
        gn_s, n_s_, st_s = _sphere_geo(geom, jnp.where(is_sph, prim - n_t, 0), x)
        gn = jnp.where(is_sph[..., None], gn_s, gn)
        n = jnp.where(is_sph[..., None], n_s_, n)
        st = jnp.where(is_sph[..., None], st_s, st)
        mat = jnp.where(is_sph, geom.sph_shader[
            jnp.where(is_sph, prim - n_t, 0)], mat)
    tangent = build_onb(n)[0]   # fiber frame fallback for non-line prims
    if geom.n_lines:
        gn_l, n_l, st_l, tan_l = _line_geo(
            geom, jnp.where(is_line, prim - n_t - n_s, 0), x, hit.u)
        gn = jnp.where(is_line[..., None], gn_l, gn)
        n = jnp.where(is_line[..., None], n_l, n)
        st = jnp.where(is_line[..., None], st_l, st)
        tangent = jnp.where(is_line[..., None], tan_l, tangent)
        mat = jnp.where(is_line, geom.line_shader[
            jnp.where(is_line, prim - n_t - n_s, 0)], mat)

    # inside flag: hit from behind the geometric normal (shader_prepare,
    # shader.c:500: s_inside iff dot(omega_in, gn) > 0)
    inside = dot(wi, gn) > 0.0

    mat = jnp.clip(mat, 0, scene.materials.kind.shape[0] - 1)
    m = scene.materials
    rd = (m.d_mul[mat, None]
          * rgb2spec.eval_coeff(m.d_coeff[mat][..., None, :], lam))
    rd = jnp.clip(rd, 0.0, 1.0)
    use_ck = m.use_checker[mat]
    ck = checker_albedo(m.checker_spectra, st, lam)
    # d_mul scales the checker path too: the mult-chain weight lands in
    # d_mul at load (io/nra2.py), and it keeps the diffuse-albedo
    # parameter live for inverse rendering on checker scenes (0010_pt)
    rd = jnp.where(use_ck[..., None], jnp.clip(m.d_mul[mat, None] * ck,
                                               0.0, 1.0), rd)
    rg = jnp.clip(m.g_mul[mat, None]
                  * rgb2spec.eval_coeff(m.g_coeff[mat][..., None, :], lam), 0.0, 1.0)
    em = m.e_mul[mat, None] * rgb2spec.eval_coeff(m.e_coeff[mat][..., None, :], lam)
    rough = m.roughness[mat]

    if scene.has_textures:
        # image texture fetch (src/shaders/texture.c + texture.h): nearest
        # texel of the spectral-coefficient atlas at the st coords,
        # evaluated at the path wavelengths
        ti = m.tex_idx[mat]
        has_t = ti >= 0
        tis = jnp.maximum(ti, 0)
        dims = scene.tex_dims[tis]                    # [N, 2] (h, w)
        tx = jnp.clip((st[..., 0] % 1.0) * dims[..., 1], 0,
                      dims[..., 1] - 1).astype(jnp.int32)
        ty = jnp.clip((st[..., 1] % 1.0) * dims[..., 0], 0,
                      dims[..., 0] - 1).astype(jnp.int32)
        texel = scene.tex_atlas[tis, ty, tx]          # [N, 4] coeffs + mul
        val = (m.tex_mul[mat] * texel[..., 3])[..., None] * \
            rgb2spec.eval_coeff(texel[..., None, :3], lam)
        slot = m.tex_slot[mat]
        rd = jnp.where((has_t & (slot == 0))[..., None],
                       jnp.clip(val, 0.0, 1.0), rd)
        rg = jnp.where((has_t & (slot == 1))[..., None],
                       jnp.clip(val, 0.0, 1.0), rg)
        em = jnp.where((has_t & (slot == 2))[..., None], val, em)

    # dielectric spectral IOR via Cauchy-from-Abbe (spectrum.h:40-63);
    # eta_ratio = n1/n2 along propagation: entering -> 1/eta, exiting -> eta
    # (single-boundary approximation of the reference's nested media stack)
    eta = _eta_from_abbe_batched(m.ior_nd[mat], m.ior_abbe[mat], lam)
    eta_ratio = jnp.where(inside[..., None], eta, 1.0 / eta)

    valid = hit.prim >= 0
    rd = jnp.where(valid[..., None], rd, 0.0)
    rg = jnp.where(valid[..., None], rg, 0.0)
    em = jnp.where(valid[..., None], em, 0.0)

    # conductor spectral complex IOR (metal <name> measured tables,
    # spectral/fresnel_data; the analogue of src/shaders/fresnel.h rows)
    from ..spectral import fresnel_data
    f_n, f_k = fresnel_data.eval_nk(m.fres_n[mat], m.fres_k[mat], lam)

    return ShadingPoint(
        kind=jnp.where(valid, m.kind[mat], -1),
        rd=rd, rg=rg, em=em, roughness=rough,
        eta_ratio=eta_ratio,
        fresnel_eta=f_n, fresnel_k=f_k,
        n=n, gn=gn, inside=inside, tangent=tangent)


def _eta_from_abbe_batched(n_d, v_d, lam):
    """Batched Cauchy IOR (cie.eta_from_abbe with array n_d/v_d)."""
    l_c, l_f, l_d = 0.6563, 0.4861, 0.587561
    c = (l_c * l_c * l_f * l_f) / (l_c * l_c - l_f * l_f)
    safe_v = jnp.where(v_d == 0.0, 1.0, v_d)
    b = jnp.where(v_d == 0.0, 0.0, (n_d - 1.0) / safe_v * c)
    a = n_d - b / (l_d * l_d)
    return a[..., None] + (b[..., None] * 1e6) / (lam * lam)
