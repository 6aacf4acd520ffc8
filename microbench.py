"""Microbenchmarks: sort / gather / dense Pallas tri-test throughput."""
import time, functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *args, reps=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


N = 589824  # 1024x576
key = jax.random.PRNGKey(0)
keys32 = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)
payload = jax.random.normal(key, (N, 12), jnp.float32)

# 1. sort_key_val with an index payload, then gather columns
@jax.jit
def sort_idx(k):
    idx = jnp.arange(N, dtype=jnp.int32)
    sk, si = jax.lax.sort_key_val(k, idx)
    return sk, si

t = timeit(sort_idx, keys32)
print(f'sort 589k keys+idx: {t*1e3:.2f} ms')

@jax.jit
def sort_then_gather(k, p):
    _, si = sort_idx(k)
    return p[si]

t = timeit(sort_then_gather, keys32, payload)
print(f'sort + gather [589k,12]: {t*1e3:.2f} ms')

@jax.jit
def gather_only(p, si):
    return p[si]

_, si = sort_idx(keys32)
t = timeit(gather_only, payload, si)
print(f'gather [589k,12] by index: {t*1e3:.2f} ms')

@jax.jit
def scatter_back(p, si):
    return jnp.zeros_like(p).at[si].set(p)

t = timeit(scatter_back, payload, si)
print(f'scatter [589k,12] by index: {t*1e3:.2f} ms')

# smaller wavefront
M = 131072
km = keys32[:M]
pm = payload[:M]
@jax.jit
def sort_m(k, p):
    idx = jnp.arange(M, dtype=jnp.int32)
    _, si = jax.lax.sort_key_val(k, idx)
    return p[si]
t = timeit(sort_m, km, pm)
print(f'sort+gather 131k: {t*1e3:.2f} ms')

# 3. dense Pallas tri-test calibration: T tris vs tile of rays, no control flow
TILE = 1024
SUB, LANE = 8, 128
TRIS = 512

def dense_kernel(tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 t_out):
    ox = ox_ref[:].reshape(SUB, LANE); oy = oy_ref[:].reshape(SUB, LANE)
    oz = oz_ref[:].reshape(SUB, LANE)
    dx = dx_ref[:].reshape(SUB, LANE); dy = dy_ref[:].reshape(SUB, LANE)
    dz = dz_ref[:].reshape(SUB, LANE)
    t = jnp.full((SUB, LANE), 3.4e38, jnp.float32)

    def body(k, t):
        rows = tri_ref[k]
        v0x, v0y, v0z = rows[0], rows[1], rows[2]
        e1x, e1y, e1z = rows[3], rows[4], rows[5]
        e2x, e2y, e2z = rows[6], rows[7], rows[8]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) < 1e-20, 0.0, 1.0 / det)
        tx = ox - v0x; ty = oy - v0y; tz = oz - v0z
        bv = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        bu = (dx * qx + dy * qy + dz * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = (bv >= 0.) & (bv <= 1.) & (bu >= 0.) & (bu + bv <= 1.) & (tt > 0.) & (tt < t)
        return jnp.where(ok, tt, t)

    t = jax.lax.fori_loop(0, TRIS, body, t)
    t_out[:] = t.reshape(TILE)


@jax.jit
def dense_test(tris, org, d):
    n = org.shape[0]
    n_tiles = n // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)
           for _ in range(6)],
        out_specs=[pl.BlockSpec((TILE,), lambda i: (i,),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[],
    )
    return pl.pallas_call(
        dense_kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n,), jnp.float32)],
    )(tris, org[:, 0], org[:, 1], org[:, 2], d[:, 0], d[:, 1], d[:, 2])

tris = jax.random.normal(key, (TRIS, 9), jnp.float32)
org = jax.random.normal(key, (N, 3), jnp.float32)
d = jax.random.normal(key, (N, 3), jnp.float32)
t = timeit(dense_test, tris, org, d)
tests = N * TRIS
print(f'dense pallas {TRIS} tris x 589k rays: {t*1e3:.2f} ms '
      f'-> {tests/t/1e9:.1f} Gtests/s, {t/ (N//TILE) *1e6:.2f} us/tile, '
      f'{t/(N//TILE)*940e3/TRIS:.1f} cyc/tri/tile')

# same but with fori over 64-tri chunks guarded by lax.cond always-true
def cond_kernel(tri_ref, flag_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
                dz_ref, t_out):
    ox = ox_ref[:].reshape(SUB, LANE); oy = oy_ref[:].reshape(SUB, LANE)
    oz = oz_ref[:].reshape(SUB, LANE)
    dx = dx_ref[:].reshape(SUB, LANE); dy = dy_ref[:].reshape(SUB, LANE)
    dz = dz_ref[:].reshape(SUB, LANE)
    t = jnp.full((SUB, LANE), 3.4e38, jnp.float32)
    K = 64

    def chunk(c, t):
        def tri_body(k, t):
            rows = tri_ref[c * K + k]
            v0x, v0y, v0z = rows[0], rows[1], rows[2]
            e1x, e1y, e1z = rows[3], rows[4], rows[5]
            e2x, e2y, e2z = rows[6], rows[7], rows[8]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) < 1e-20, 0.0, 1.0 / det)
            tx = ox - v0x; ty = oy - v0y; tz = oz - v0z
            bv = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            bu = (dx * qx + dy * qy + dz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = (bv >= 0.) & (bv <= 1.) & (bu >= 0.) & (bu + bv <= 1.) & (tt > 0.) & (tt < t)
            return jnp.where(ok, tt, t)
        return jax.lax.cond(flag_ref[c] > 0,
                            lambda t: jax.lax.fori_loop(0, K, tri_body, t),
                            lambda t: t, t)

    t = jax.lax.fori_loop(0, TRIS // K, chunk, t)
    t_out[:] = t.reshape(TILE)


@jax.jit
def cond_test(tris, flags, org, d):
    n = org.shape[0]
    n_tiles = n // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)
           for _ in range(6)],
        out_specs=[pl.BlockSpec((TILE,), lambda i: (i,),
                                memory_space=pltpu.VMEM)],
    )
    return pl.pallas_call(
        cond_kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n,), jnp.float32)],
    )(tris, flags, org[:, 0], org[:, 1], org[:, 2],
      d[:, 0], d[:, 1], d[:, 2])

flags = jnp.ones((TRIS // 64,), jnp.int32)
t = timeit(cond_test, tris, flags, org, d)
print(f'cond pallas all-chunks-on: {t*1e3:.2f} ms ({t/(N//TILE)*1e6:.2f} us/tile)')
flags0 = jnp.zeros((TRIS // 64,), jnp.int32)
t = timeit(cond_test, tris, flags0, org, d)
print(f'cond pallas all-chunks-off: {t*1e3:.2f} ms ({t/(N//TILE)*1e6:.2f} us/tile)')
