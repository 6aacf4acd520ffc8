import time, os
import jax, jax.numpy as jnp
import numpy as np
from corona13_tpu import scene as scene_mod
from corona13_tpu.ops.trace import intersect
sc, _ = scene_mod.load_scene('/root/reference/regression/0010_pt/test.nra2')
N = 589824
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
# incoherent rays: random origins in the scene box, random dirs
org = jax.random.uniform(k1, (N,3), minval=-20., maxval=20.)
d = jax.random.normal(k2, (N,3)); d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

def timeit(f, *a, reps=5):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(reps): o = f(*a)
    jax.block_until_ready(o); return (time.time()-t0)/reps

@jax.jit
def sort_only(o):
    keys = (o[:,0]*1000).astype(jnp.uint32)
    _, perm = jax.lax.sort_key_val(keys, jnp.arange(N, dtype=jnp.int32))
    return perm

print(f'sort 590k keys: {timeit(sort_only, org)*1e3:.2f} ms')

@jax.jit
def isect(o, dd):
    h = intersect(sc.geom, o, dd)
    return h.t.sum()
print(f'incoherent intersect WITH sort: {timeit(isect, org, d)*1e3:.2f} ms')
os.environ['CORONA13_NO_SORT'] = '1'
@jax.jit
def isect2(o, dd):
    h = intersect(sc.geom, o, dd)
    return h.t.sum()
print(f'incoherent intersect NO sort: {timeit(isect2, org, d)*1e3:.2f} ms')
