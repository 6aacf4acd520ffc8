"""Scene assembly: .nra2 + .geo + .cam -> device pytrees.

Replaces the reference's runtime-plugin shader system (corona-13
src/shader.c dlopen vtables) with static resolution at load time: every
scene material is flattened into one row of a SoA material table (the
``mult`` pre-shader chains of src/shaders/mult.c collapse into slot
assignments, since prepare() chains in the reference only ever fill
vertex_shading_t slots), and the BSDF host becomes an enum dispatched on
device (models/bsdf.py).

Spectral albedos are fitted to sigmoid-polynomial coefficients at load via
spectral/rgb2spec.fit_coeff — equivalent to the reference's LUT fetch in
spectrum_rgb_to_coeff (spectrum.h:29-38) but exact per colour.
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
from flax import struct

from .io import nra2 as nra2_io
from .io import geo as geo_io
from .io import cam as cam_io
from .spectral import fresnel_data
from .ops import bvh as bvh_mod
from .ops.trace import make_device_geometry
from .spectral import rgb2spec

# sky kinds
SKY_BLACK = 0
SKY_CONST = 1
SKY_CLOUDY = 2
SKY_ENVMAP = 3
SKY_DAYLIGHT = 4

from .models.bsdf import DIFFUSE, DIELECTRIC, METAL, NULL, DIFFDIEL, HAIR


@struct.dataclass
class MaterialTable:
    """SoA of resolved materials; one row per scene shader id."""
    kind: jnp.ndarray          # [M] int32 host bsdf
    d_coeff: jnp.ndarray       # [M, 3] sigmoid coeffs for diffuse albedo
    d_mul: jnp.ndarray         # [M]
    g_coeff: jnp.ndarray       # [M, 3] glossy
    g_mul: jnp.ndarray         # [M]
    e_coeff: jnp.ndarray       # [M, 3] emission
    e_mul: jnp.ndarray         # [M]
    roughness: jnp.ndarray     # [M]
    ior_nd: jnp.ndarray        # [M] dielectric n_d
    ior_abbe: jnp.ndarray      # [M] dielectric Abbe number
    use_checker: jnp.ndarray   # [M] bool: diffuse albedo from the IT8 chart
    checker_spectra: jnp.ndarray  # [140, 36] measured patch reflectances
    # homogeneous interior medium (medium_rgb), consumed by samplers w/ media
    med_mut_coeff: jnp.ndarray # [M, 3]
    med_mut_mul: jnp.ndarray   # [M]
    med_mus_coeff: jnp.ndarray # [M, 3] volume albedo ('color v' slot)
    med_mus_mul: jnp.ndarray   # [M]
    med_g: jnp.ndarray         # [M] HG mean cosine
    med_enabled: jnp.ndarray   # [M] bool
    # image textures (the `texture <slot> <file.fb|.pfm> [mul]` shader,
    # src/shaders/texture.c): index into the scene texture atlas, -1 = none
    tex_idx: jnp.ndarray       # [M] int32
    tex_slot: jnp.ndarray      # [M] int32: 0=d 1=g 2=e
    tex_mul: jnp.ndarray       # [M]
    # measured conductor ior rows (spectral/fresnel_data, metal <name>)
    fres_n: jnp.ndarray        # [M, 7]
    fres_k: jnp.ndarray        # [M, 7]


@struct.dataclass
class LightTable:
    """Flat emitter CDF over prims, area*L weighted — the analogue of
    src/lights.d/list.c:56-105."""
    prim: jnp.ndarray       # [K] global prim id of each emissive prim
    cdf: jnp.ndarray        # [K] inclusive normalized CDF
    weight: jnp.ndarray     # [K] L / sum(L*A): NEE area pdf of each prim
    area: jnp.ndarray       # [K] prim area
    # per-prim reverse lookup: global prim -> light weight (0 if not a light)
    prim_weight: jnp.ndarray  # [P]

    @property
    def n_lights(self):
        return self.prim.shape[0]


@struct.dataclass
class CameraP:
    """Device camera pytree (thinlens parameters, models/camera.py)."""
    pos: jnp.ndarray
    pos_t1: jnp.ndarray
    orient: jnp.ndarray
    orient_t1: jnp.ndarray
    focus: jnp.ndarray
    focal_length: jnp.ndarray
    film_width: jnp.ndarray
    film_height: jnp.ndarray
    f_stop: jnp.ndarray
    exposure_time: jnp.ndarray
    iso: jnp.ndarray
    crop_factor: jnp.ndarray = None


@struct.dataclass
class Scene:
    geom: DeviceGeometry
    materials: MaterialTable
    lights: LightTable
    camera: CameraP
    prim_shader: jnp.ndarray   # [P] global prim -> material id
    sky_kind: jnp.ndarray      # int32
    sky_coeff: jnp.ndarray     # [3] emission spectrum coeffs (const sky)
    sky_mul: jnp.ndarray
    envmap: 'EnvMap' = None    # lat-long IBL (models/envmap.py)
    daylight: 'DaylightSky' = None  # Preetham sky (models/daylight.py)
    has_daylight: bool = struct.field(pytree_node=False, default=False)
    vol: 'VolGrid' = None      # heterogeneous medium grid (medium_hete)
    # texture atlas: spectral coefficient images [n_tex, TH, TW, 3]
    # (uniform padded size) + per-texture true dims
    tex_atlas: jnp.ndarray = None
    tex_dims: jnp.ndarray = None   # [n_tex, 2] (h, w)
    # static: BSDF kinds present — absent branches compile away (the
    # runtime analogue of the reference's compile-time module selection)
    kinds_used: tuple = struct.field(pytree_node=False, default=(0, 1, 2))
    has_envmap: bool = struct.field(pytree_node=False, default=False)
    has_hete: bool = struct.field(pytree_node=False, default=False)
    # grid medium emits (sigma_e > 0): samplers add the analytic
    # T-weighted blackbody integral per segment (vol/trace.h
    # SEGMENT_EMISSION)
    has_vol_emission: bool = struct.field(pytree_node=False, default=False)
    # global exterior medium material id (`exterior <shader>` scene line,
    # reference shader_exterior_medium, src/shader.c:544-562): camera and
    # light paths start inside this medium (-1 = vacuum)
    exterior_med: int = struct.field(pytree_node=False, default=-1)
    has_textures: bool = struct.field(pytree_node=False, default=False)

    def with_envmap(self, rgb):
        """Attach a lat-long RGB radiance image as the environment."""
        from .models import envmap as envmap_mod
        return self.replace(envmap=envmap_mod.build(rgb), has_envmap=True,
                            sky_kind=jnp.int32(SKY_ENVMAP))


@dataclasses.dataclass
class _ResolvedMat:
    kind: int = DIFFUSE
    d_rgb: tuple = (0.0, 0.0, 0.0)
    g_rgb: tuple = (0.0, 0.0, 0.0)
    e_rgb: tuple = (0.0, 0.0, 0.0)
    roughness: float = 1.0
    ior_nd: float = 1.5
    ior_abbe: float = 50.0
    use_checker: bool = False
    med_mfp_rgb: tuple = (0.0, 0.0, 0.0)
    med_albedo_rgb: tuple = (0.0, 0.0, 0.0)
    med_g: float = 0.0
    med_enabled: bool = False
    emissive_L: float = 0.0    # scalar brightness for the light CDF
    # heterogeneous medium (medium_hete <g0> <g1> <s_s> <s_t> <s_e> <file>)
    hete_file: str = ''
    hete_params: tuple = ()    # (g0, g1, sigma_s, sigma_t, sigma_e)
    # image texture (texture <slot> <file> [mul])
    tex_file: str = ''
    tex_slot: int = 0
    tex_mul: float = 1.0
    # conductor ior table name (metal <name>, src/shaders/metal.c)
    metal_name: str = 'default'


def _exterior_med(desc: nra2_io.SceneDesc) -> int:
    """Material id of the `exterior <shader>` line's target (-1 none)."""
    for sh in desc.shaders:
        if sh.name == 'exterior' and sh.args:
            return int(sh.args[0])
    return -1


def _resolve_materials(desc: nra2_io.SceneDesc) -> list[_ResolvedMat]:
    """Flatten shader descriptions incl. mult chains into material rows."""
    out = []
    for idx, sh in enumerate(desc.shaders):
        m = _ResolvedMat()
        _apply_shader(desc, idx, sh, m, is_host=True)
        out.append(m)
    return out


def _apply_shader(desc, idx, sh, m: _ResolvedMat, is_host: bool):
    name = sh.name
    a = sh.args
    if name == 'diffuse':
        m.kind = DIFFUSE
    elif name == 'color':
        slot = a[0]
        rgb = tuple(float(x) for x in a[1:4])
        rough = float(a[4]) if len(a) > 4 else None
        if slot == 'd':
            m.d_rgb = rgb
        elif slot == 'g':
            m.g_rgb = rgb
            if rough is not None:
                m.roughness = rough
        elif slot == 's':
            m.g_rgb = rgb  # specular slot feeds rs; we fold into rg for now
        elif slot == 'e':
            m.e_rgb = rgb
            if rough is not None and rough != 1.0:
                m.roughness = rough
            m.emissive_L = max(rgb)  # refined below with spectrum avg
        elif slot == 'v':
            m.med_albedo_rgb = rgb
        if slot == 'd' and rough is not None:
            m.roughness = rough
    elif name == 'colorcheckersg':
        m.use_checker = True
        # neutral diffuse base: rd = d_mul * chart reflectance, so d_mul
        # fits to 1 and stays a live albedo multiplier for inverse
        # rendering (a black d slot would zero the chart)
        if m.d_rgb == (0.0, 0.0, 0.0):
            m.d_rgb = (1.0, 1.0, 1.0)
    elif name == 'dielectric':
        m.kind = DIELECTRIC
        m.ior_nd = float(a[0])
        m.ior_abbe = float(a[1]) if len(a) > 1 else 50.0
        if m.g_rgb == (0.0, 0.0, 0.0):
            m.g_rgb = (1.0, 1.0, 1.0)
        if is_host:
            pass
    elif name == 'hair':
        # hair <eumelanin> <pheomelanin> (src/shaders/hair.c:650): melanin
        # concentrations set the fiber absorption; map them to a fiber
        # albedo via the standard eumelanin/pheomelanin absorption-at-550nm
        # ratios (darker with concentration), keep rg as the specular lobe
        m.kind = HAIR
        eu = float(a[0]) if len(a) > 0 else 0.1
        ph = float(a[1]) if len(a) > 1 else 0.5
        absorb = np.array([0.419, 0.697, 1.37]) * eu + \
            np.array([0.187, 0.4, 1.05]) * ph
        alb = np.exp(-absorb).clip(0.0, 1.0)
        m.d_rgb = tuple(float(x) for x in alb)
        if m.g_rgb == (0.0, 0.0, 0.0):
            m.g_rgb = (0.35, 0.35, 0.35)
        if m.roughness == 1.0:
            m.roughness = 0.15
    elif name == 'diffdiel':
        # diffdiel <n_d> [abbe]: diffuse-coated dielectric
        # (src/shaders/diffdiel.c init)
        m.kind = DIFFDIEL
        m.ior_nd = float(a[0]) if a else 1.5
        m.ior_abbe = float(a[1]) if len(a) > 1 else 50.0
        if m.g_rgb == (0.0, 0.0, 0.0):
            m.g_rgb = (1.0, 1.0, 1.0)
    elif name == 'metal' or name == 'mmetal':
        m.kind = METAL
        if a:
            m.metal_name = a[0]
        if m.g_rgb == (0.0, 0.0, 0.0):
            m.g_rgb = (1.0, 1.0, 1.0)
    elif name in ('medium_rgb', 'medium_poe'):
        m.med_mfp_rgb = tuple(float(x) for x in a[0:3])
        m.med_g = float(a[3]) if len(a) > 3 else 0.0
        m.med_enabled = True
    elif name == 'medium_hete':
        # medium_hete <g0> <g1> <sigma_s> <sigma_t> <sigma_e> <vol file>
        # (src/shaders/medium_hete.c init); used directly as a shape
        # shader it is a pass-through volume proxy boundary
        if is_host:
            m.kind = NULL
        m.hete_params = tuple(float(x) for x in a[0:5])
        m.hete_file = a[5] if len(a) > 5 else ''
        m.med_g = float(a[0]) if a else 0.0
        m.med_enabled = True
    elif name == 'exterior':
        # exterior <medium shader id> [light]: sets the scene's global
        # exterior medium (shader.c:699-708); picked up scene-wide by
        # _exterior_med, and the medium props also resolve into this row
        if a:
            pi = int(a[0])
            _apply_shader(desc, pi, desc.shaders[pi], m, is_host=False)
    elif name == 'texture':
        # texture <slot char d/g/e/...> <file.fb|.pfm> [mul]
        # (src/shaders/texture.c init)
        if len(a) >= 2:
            m.tex_slot = {'d': 0, 'g': 1, 'e': 2}.get(a[0], 0)
            m.tex_file = a[1]
            m.tex_mul = float(a[2]) if len(a) > 2 else 1.0
    elif name == 'mult':
        # mult <num> <pre...> <host> (src/shaders/mult.c:81-113)
        num = int(a[0])
        pres = [int(x) for x in a[1:1 + num]]
        host = int(a[1 + num])
        if host < 0:
            host = idx + host
        for k, p in enumerate(pres):
            pi = idx + p if p < 0 else p
            _apply_shader(desc, pi, desc.shaders[pi], m, is_host=False)
        _apply_shader(desc, host, desc.shaders[host], m, is_host=True)
    elif name == 'interior':
        # interior <medium shader id>
        if a:
            pi = int(a[0])
            _apply_shader(desc, pi, desc.shaders[pi], m, is_host=False)
    # unknown shaders: keep defaults (diffuse grey would be safer than crash)


def _fit(rgbs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    coeff, mul = rgb2spec.fit_coeff_scaled(rgbs, space='ergb')
    # exact zero for black inputs (the sigmoid floor is ~1e-3, which would
    # otherwise make every surface an emitter in the light CDF)
    mul = np.where(rgbs.max(axis=-1) <= 0.0, 0.0, mul)
    return coeff.astype(np.float32), mul.astype(np.float32)


def load_scene(nra2_path: str, cam_path: str | None = None,
               searchpath: str | None = None) -> tuple[Scene, cam_io.CameraData]:
    desc = nra2_io.parse_nra2(nra2_path, searchpath)
    mats = _resolve_materials(desc)

    # --- geometry: concatenate all shapes into global prim arrays
    tri_v, tri_n, tri_uvs, tri_half, tri_sh = [], [], [], [], []
    tri_v1, sph_c1 = [], []
    any_motion = False
    sph_c, sph_r, sph_sh = [], [], []
    lin_v0, lin_v1, lin_r0, lin_r1, lin_sh = [], [], [], [], []
    # remember per-shape prim spans for the light table
    shape_tri_spans = []  # (shader, start, count, areas)
    for shp in desc.shapes:
        if not os.path.exists(shp.geo_path):
            # the reference discards shapes whose .geo is missing with a
            # warning (prims_load, src/prims.c:784-788) — regression scenes
            # reference optional geometry
            print(f"[scene] could not load geo `{shp.geo_path}', skipping shape")
            continue
        g = geo_io.load_geo(shp.geo_path)
        t0 = sum(len(x) for x in tri_v)
        tri_v.append(g.tri_vtx)
        tri_v1.append(g.tri_vtx_t1)
        any_motion = any_motion or g.has_motion
        tri_n.append(g.tri_ns)
        tri_uvs.append(g.tri_uv)
        tri_half.append(g.tri_quad_half)
        tri_sh.append(np.full(len(g.tri_vtx), shp.shader, np.int32))
        shape_tri_spans.append((shp.shader, t0, len(g.tri_vtx)))
        sph_c.append(g.sph_center)
        sph_c1.append(g.sph_center_t1)
        sph_r.append(g.sph_radius)
        sph_sh.append(np.full(len(g.sph_radius), shp.shader, np.int32))
        lin_v0.append(g.line_vtx[:, 0])
        lin_v1.append(g.line_vtx[:, 1])
        lin_r0.append(g.line_radii[:, 0])
        lin_r1.append(g.line_radii[:, 1])
        lin_sh.append(np.full(len(g.line_radii), shp.shader, np.int32))

    tri_v = np.concatenate(tri_v) if tri_v else np.zeros((0, 3, 3), np.float32)
    tri_v1 = np.concatenate(tri_v1) if tri_v1 else np.zeros((0, 3, 3), np.float32)
    tri_n = np.concatenate(tri_n) if tri_n else np.zeros((0, 3, 3), np.float32)
    tri_uvs = np.concatenate(tri_uvs) if tri_uvs else np.zeros((0, 3, 2), np.float32)
    tri_half = np.concatenate(tri_half) if tri_half else np.zeros((0,), np.uint8)
    tri_sh = np.concatenate(tri_sh) if tri_sh else np.zeros((0,), np.int32)
    sph_c = np.concatenate(sph_c) if sph_c else np.zeros((0, 3), np.float32)
    sph_c1 = np.concatenate(sph_c1) if sph_c1 else np.zeros((0, 3), np.float32)
    sph_r = np.concatenate(sph_r) if sph_r else np.zeros((0,), np.float32)
    sph_sh = np.concatenate(sph_sh) if sph_sh else np.zeros((0,), np.int32)
    lin_v0 = np.concatenate(lin_v0) if lin_v0 else np.zeros((0, 3), np.float32)
    lin_v1 = np.concatenate(lin_v1) if lin_v1 else np.zeros((0, 3), np.float32)
    lin_r0 = np.concatenate(lin_r0) if lin_r0 else np.zeros((0,), np.float32)
    lin_r1 = np.concatenate(lin_r1) if lin_r1 else np.zeros((0,), np.float32)
    lin_sh = np.concatenate(lin_sh) if lin_sh else np.zeros((0,), np.int32)

    lvtx = np.stack([lin_v0, lin_v1], axis=1) if len(lin_v0) else np.zeros((0, 2, 3), np.float32)
    lrad = np.stack([lin_r0, lin_r1], axis=1) if len(lin_r0) else np.zeros((0, 2), np.float32)

    geom = make_device_geometry(
        tri_v=tri_v, tri_vn=tri_n, tri_uv=tri_uvs,
        tri_quad_half=tri_half.astype(np.int32), tri_shader=tri_sh,
        sph_c=sph_c, sph_r=sph_r, sph_shader=sph_sh,
        line_vtx=lvtx, line_radii=lrad, line_shader=lin_sh,
        tri_v_t1=tri_v1 if any_motion else None,
        sph_c_t1=sph_c1 if any_motion else None)
    prim_shader = np.concatenate([tri_sh, sph_sh, lin_sh]) if (
        len(tri_sh) + len(sph_sh) + len(lin_sh)) else np.zeros((0,), np.int32)

    # --- material table (spectral fits on device)
    M = len(mats)
    d_rgb = np.array([m.d_rgb for m in mats], np.float32)
    g_rgb = np.array([m.g_rgb for m in mats], np.float32)
    e_rgb = np.array([m.e_rgb for m in mats], np.float32)
    mfp = np.array([m.med_mfp_rgb for m in mats], np.float32)
    med_alb = np.array([m.med_albedo_rgb for m in mats], np.float32)
    d_c, d_m = _fit(d_rgb)
    g_c, g_m = _fit(g_rgb)
    e_c, e_m = _fit(e_rgb)
    with np.errstate(divide='ignore'):
        mut = np.where(mfp > 0.0, 1.0 / np.maximum(mfp, 1e-20), 0.0)
    mut_c, mut_m = _fit(mut)
    mus_c, mus_m = _fit(med_alb)

    checker = np.load(os.path.join(os.path.dirname(__file__), '..',
                                   'data', 'colorchecker_sg.npy'))

    # --- texture atlas: load .pfm (RGB, fitted to coefficients) or .fb
    # (already-fitted coefficient framebuffers, like the reference's
    # pfm2fb output) into one padded array
    tex_files = []
    tex_idx_arr = np.full(M, -1, np.int32)
    for mi, m in enumerate(mats):
        if not m.tex_file:
            continue
        tp = m.tex_file
        if not os.path.isabs(tp):
            tp = os.path.join(os.path.dirname(nra2_path), tp)
        if not os.path.exists(tp):
            print(f"[scene] could not load texture `{m.tex_file}'")
            continue
        if tp not in tex_files:
            tex_files.append(tp)
        tex_idx_arr[mi] = tex_files.index(tp)
    tex_imgs = []
    for tp in tex_files:
        if tp.endswith('.fb'):
            from .io import fb as fb_io
            c3 = fb_io.Framebuffer.load(tp).data.astype(np.float32)
            img = np.concatenate([c3[..., :3],
                                  np.ones(c3.shape[:2] + (1,), np.float32)],
                                 axis=-1)
        else:
            from .io import pfm as pfm_io
            rgb = pfm_io.read_pfm(tp).astype(np.float32)
            c, mul = _fit(rgb.reshape(-1, 3))
            img = np.concatenate([c, mul[:, None]],
                                 axis=-1).reshape(rgb.shape[:2] + (4,))
        tex_imgs.append(img)
    if tex_imgs:
        th = max(i.shape[0] for i in tex_imgs)
        tw = max(i.shape[1] for i in tex_imgs)
        atlas = np.zeros((len(tex_imgs), th, tw, 4), np.float32)
        dims = np.zeros((len(tex_imgs), 2), np.int32)
        for k, img in enumerate(tex_imgs):
            atlas[k, :img.shape[0], :img.shape[1]] = img
            dims[k] = img.shape[:2]
        tex_atlas = jnp.asarray(atlas)
        tex_dims = jnp.asarray(dims)
        has_textures = True
    else:
        tex_atlas = None
        tex_dims = None
        has_textures = False

    materials = MaterialTable(
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
        tex_idx=jnp.asarray(tex_idx_arr),
        tex_slot=jnp.asarray(np.array([m.tex_slot for m in mats], np.int32)),
        tex_mul=jnp.asarray(np.array([m.tex_mul for m in mats], np.float32)),
        fres_n=jnp.asarray(np.stack(
            [fresnel_data.get_conductor(m.metal_name)[0] for m in mats])),
        fres_k=jnp.asarray(np.stack(
            [fresnel_data.get_conductor(m.metal_name)[1] for m in mats])),
    )

    # --- light table: per emissive prim, weight = area * L_avg
    # L_avg matches color.c shape_init: mul * mean(sigmoid at 400/480/560/660)
    lam4 = np.array([400.0, 480.0, 560.0, 660.0], np.float32)
    import jax as _jax
    with _jax.default_device(_jax.devices('cpu')[0]):
        e_eval = np.asarray(rgb2spec.eval_coeff(jnp.asarray(e_c)[:, None, :],
                                                jnp.asarray(lam4)[None, :]))
    L_mat = e_m * e_eval.mean(axis=1)           # [M]

    def tri_area(v):
        return 0.5 * np.linalg.norm(
            np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1)

    areas_all = tri_area(tri_v) if len(tri_v) else np.zeros((0,), np.float32)
    light_sel = np.nonzero(L_mat[tri_sh] > 0.0)[0] if len(tri_sh) else np.zeros((0,), np.int64)
    if len(light_sel):
        lw = L_mat[tri_sh[light_sel]]
        la = areas_all[light_sel]
        wa = lw * la
        sum_wa = wa.sum()
        cdf = np.cumsum(wa) / sum_wa
        weight = lw / sum_wa   # NEE area pdf contribution L/sum(L*A), list.c:125-128
        prim_weight = np.zeros(len(prim_shader), np.float32)
        prim_weight[light_sel] = weight
        lights = LightTable(
            prim=jnp.asarray(light_sel.astype(np.int32)),
            cdf=jnp.asarray(cdf.astype(np.float32)),
            weight=jnp.asarray(weight.astype(np.float32)),
            area=jnp.asarray(la.astype(np.float32)),
            prim_weight=jnp.asarray(prim_weight),
        )
    else:
        lights = LightTable(prim=jnp.zeros((0,), jnp.int32),
                            cdf=jnp.zeros((0,)), weight=jnp.zeros((0,)),
                            area=jnp.zeros((0,)),
                            prim_weight=jnp.zeros((max(len(prim_shader), 1),)))

    # --- camera
    if cam_path is None:
        guess = os.path.splitext(nra2_path)[0][:-len('test') or None]
        cand = os.path.join(os.path.dirname(nra2_path), 'test01.cam')
        cam_path = cand if os.path.exists(cand) else None
    cd = cam_io.read_cam(cam_path) if cam_path else cam_io.CameraData(
        pos=np.zeros(3, np.float32), pos_t1=np.zeros(3, np.float32),
        orient=np.array([1, 0, 0, 0], np.float32),
        orient_t1=np.array([1, 0, 0, 0], np.float32))
    camera = CameraP(
        pos=jnp.asarray(cd.pos), pos_t1=jnp.asarray(cd.pos_t1),
        orient=jnp.asarray(cd.orient), orient_t1=jnp.asarray(cd.orient_t1),
        focus=jnp.float32(cd.focus), focal_length=jnp.float32(cd.focal_length),
        film_width=jnp.float32(cd.film_width),
        film_height=jnp.float32(cd.film_height),
        f_stop=jnp.float32(cd.f_stop),
        exposure_time=jnp.float32(cd.exposure_time),
        iso=jnp.float32(cd.iso),
        crop_factor=jnp.float32(cd.crop_factor))

    # --- sky
    sky_kind = {'black': SKY_BLACK, 'sky_const': SKY_CONST,
                'const': SKY_CONST, 'cloudy': SKY_CLOUDY,
                'cloudy_sky': SKY_CLOUDY, 'clear_sky': SKY_CLOUDY,
                'daylight': SKY_DAYLIGHT}.get(desc.sky.name, SKY_BLACK)
    sky_rgb = np.zeros(3, np.float32)
    daylight_sky = None
    if sky_kind == SKY_CONST and len(desc.sky.args) >= 3:
        sky_rgb = np.array([float(x) for x in desc.sky.args[:3]], np.float32)
    elif sky_kind == SKY_CLOUDY:
        sky_rgb = np.array([0.5, 0.6, 0.8], np.float32)
    elif sky_kind == SKY_DAYLIGHT:
        # `daylight <sundir x y z> <turbidity>` (daylight.h:103-111; the
        # reference's file direction points from the sun into the scene)
        from .models import daylight as daylight_mod
        a = [float(x) for x in desc.sky.args[:4]] if len(desc.sky.args) >= 4 \
            else [-1.0, -1.0, -1.0, 2.0]
        daylight_sky = daylight_mod.build(-np.asarray(a[:3]), a[3])
    sc, sm = _fit(sky_rgb[None])

    # --- heterogeneous medium grid (at most one medium_hete per scene,
    # like the single vol tree per shader in the reference)
    vol_grid = None
    has_hete = False
    has_vol_emission = False
    for mi, m in enumerate(mats):
        if not m.hete_file:
            continue
        vp = m.hete_file
        if not os.path.isabs(vp):
            vp = os.path.join(os.path.dirname(nra2_path), vp)
        if not os.path.exists(vp):
            print(f"[scene] could not open volume data `{m.hete_file}'"
                  " — shape renders as empty boundary")
            continue
        from .io import vol as vol_io
        from .models import medium_hete as hete_mod
        g0, _g1, s_s, s_t, s_e = (tuple(m.hete_params) + (0.,) * 5)[:5]
        vol_grid = hete_mod.from_volfile(vol_io.read_vol(vp), s_s, s_t, s_e,
                                         g0, mat_id=mi)
        has_hete = True
        has_vol_emission = s_e > 0.0
        break

    scene = Scene(geom=geom, materials=materials, lights=lights,
                  camera=camera, prim_shader=jnp.asarray(prim_shader),
                  sky_kind=jnp.int32(sky_kind),
                  sky_coeff=jnp.asarray(sc[0]), sky_mul=jnp.asarray(sm[0]),
                  vol=vol_grid, has_hete=has_hete,
                  has_vol_emission=has_vol_emission,
                  daylight=daylight_sky,
                  has_daylight=daylight_sky is not None,
                  exterior_med=_exterior_med(desc),
                  tex_atlas=tex_atlas, tex_dims=tex_dims,
                  has_textures=has_textures,
                  kinds_used=tuple(sorted({m.kind for m in mats})))
    return scene, cd


def align32(n: int) -> int:
    """Round a view dimension up to a multiple of 32 like view_init
    (reference src/view.c:295-297) — regression renders must use the same
    aligned dims as the reference binary or the film aspect diverges."""
    return (n + 31) & ~31


def fit_film(scene: Scene, width: int, height: int) -> Scene:
    """Refit the camera film back to the render aspect.

    The reference recomputes film_width/film_height from the (32-aligned)
    view dims on every camera load (view_cam_read, src/view.c:938-947):
    the 35mm-wide full-frame back is scaled by 1/crop_factor and the other
    film dimension follows the pixel aspect — the .cam-stored film size is
    only advisory.  Rendering with the stored dims at a different aspect
    shifts the vertical framing (the round-2 RMSE-20 bug vs reference
    renders).  Call once per render with the final pixel dims.
    """
    cam = scene.camera
    crop = cam.crop_factor if cam.crop_factor is not None else jnp.float32(1.0)
    full = jnp.float32(cam_io.FULL_FRAME_WIDTH) / crop
    if width > height:
        fw = full
        fh = full * (height / width)
    else:
        fh = full
        fw = full * (width / height)
    return scene.replace(camera=cam.replace(film_width=jnp.float32(fw),
                                            film_height=jnp.float32(fh)))
