import time, os
os.environ['CORONA13_NO_PALLAS'] = '1'
import jax, jax.numpy as jnp
from corona13_tpu import scene as scene_mod
from corona13_tpu.ops.trace import intersect, occluded
sc, _ = scene_mod.load_scene('/root/reference/regression/0010_pt/test.nra2')
N = 589824
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
org = jax.random.uniform(k1, (N,3), minval=-20., maxval=20.)
d = jax.random.normal(k2, (N,3)); d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

def timeit(f, *a, reps=5):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(reps): o = f(*a)
    jax.block_until_ready(o); return (time.time()-t0)/reps

@jax.jit
def isect(o, dd):
    h = intersect(sc.geom, o, dd)
    return h.t.sum()
print(f'XLA while-while incoherent intersect: {timeit(isect, org, d)*1e3:.2f} ms')

# coherent primary-ish rays: one origin, small cone
org2 = jnp.zeros((N,3)) + jnp.array([0.,0.,0.])
d2 = jax.random.normal(k2, (N,3))*0.2 + jnp.array([0.,0.,1.])
d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
@jax.jit
def isect2(o, dd):
    h = intersect(sc.geom, o, dd)
    return h.t.sum()
print(f'XLA while-while coherent intersect: {timeit(isect2, org2, d2)*1e3:.2f} ms')
