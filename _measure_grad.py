import functools
import jax, jax.numpy as jnp
import numpy as np
from corona13_tpu import testing, scene as scene_mod
from corona13_tpu.samplers import pt as pt_mod
P = functools.partial(print, flush=True)

CFG = pt_mod.PTConfig(width=24, height=16, max_verts=4, mf=2, use_nee=True)
CFG_MED = pt_mod.PTConfig(width=24, height=16, max_verts=5, mf=2,
                          use_nee=True, media=True)

def fd_vs_ad(f, eps=1e-3, navg=2):
    def favg(t):
        return sum(float(f(jnp.float32(t), jnp.uint32(i))) for i in range(navg)) / navg
    g = sum(float(jax.grad(lambda t: f(t, jnp.uint32(i)))(jnp.float32(1.0)))
            for i in range(navg)) / navg
    fd = (favg(1.0 + eps) - favg(1.0 - eps)) / (2 * eps)
    rel = abs(g - fd) / max(abs(fd), 1e-9)
    return g, fd, rel

sc_glossy = testing.cornell_scene(sphere='metal')
def f_rough(t, s):
    sc = sc_glossy.replace(materials=sc_glossy.materials.replace(
        roughness=sc_glossy.materials.roughness * t))
    return jnp.mean(pt_mod.render_sample(sc, CFG, s))
P('roughness:', fd_vs_ad(f_rough))

sc_diel = testing.cornell_scene(sphere='dielectric')
def f_ior(t, s):
    sc = sc_diel.replace(materials=sc_diel.materials.replace(
        ior_nd=sc_diel.materials.ior_nd * t))
    return jnp.mean(pt_mod.render_sample(sc, CFG, s))
P('ior_nd:', fd_vs_ad(f_ior))

sc_fog = testing.cornell_scene(sphere='subsurf')
def f_sigt(t, s):
    sc = sc_fog.replace(materials=sc_fog.materials.replace(
        med_mut_mul=sc_fog.materials.med_mut_mul * t))
    return jnp.mean(pt_mod.render_sample(sc, CFG_MED, s))
P('med sigma_t:', fd_vs_ad(f_sigt, eps=5e-3))

def f_g(t, s):
    sc = sc_fog.replace(materials=sc_fog.materials.replace(
        med_g=sc_fog.materials.med_g * t))
    return jnp.mean(pt_mod.render_sample(sc, CFG_MED, s))
P('med hg g:', fd_vs_ad(f_g, eps=5e-3))

base = testing.cornell_scene()
off = jnp.array([0.3, 0.2, 0.5])
def f_campos(t, s):
    cam = base.camera
    sc = base.replace(camera=cam.replace(pos=cam.pos + (t - 1.0) * off))
    return jnp.mean(pt_mod.render_sample(sc, CFG, s))
P('camera pos:', fd_vs_ad(f_campos, eps=3e-3))

def f_focus(t, s):
    cam = base.camera
    sc = base.replace(camera=cam.replace(focus=cam.focus * t))
    return jnp.mean(pt_mod.render_sample(sc, CFG, s))
P('camera focus:', fd_vs_ad(f_focus, eps=3e-3))
