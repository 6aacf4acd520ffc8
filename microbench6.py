"""Optimized octet-block: Baldwin-Weber tri rep, unrolled W, no division.

Tri rep (12 rows): n(3), nd(1), pu(4), pv(4):
  den = dot(n, d); num = nd - dot(n, o); t = num/den
  p = o + t*d;  u = dot4(pu, (p,1));  v = dot4(pv, (p,1))
Division-free compare: valid t in (0, tbest): num*den > 0 and |num| < tbest*|den|
But u,v need p which needs t... trick: scale by den: P = o*den + num*d
  u_s = dot(pu.xyz, P) + pu.w*den ; valid iff 0 <= u_s/den <= ...
  sign problems: multiply conditions by sign(den)^k consistently.
Simpler: compute rcp = approx reciprocal of den (1 op), t = num*rcp.
"""
import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.PRNGKey(0)

def timeit_graph(make_step, init, reps=20):
    @jax.jit
    def once(x):
        return make_step(x)
    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, reps, lambda i, x: make_step(x), x)
    r = float(jnp.sum(once(init)))
    r = float(jnp.sum(many(init)))
    t0 = time.time(); r = float(jnp.sum(once(init))); t1 = time.time()
    t0b = time.time(); r = float(jnp.sum(many(init))); t1b = time.time()
    return ((t1b - t0b) - (t1 - t0)) / (reps - 1)

N = 589824
TILE = 1024
OCT = TILE // 8
W = 3
C = 64

tri_slab = jax.random.normal(key, (C, 16, 128), jnp.float32)
rays = jax.random.normal(key, (N, 8), jnp.float32)  # ox oy oz dx dy dz pad pad
wl = jax.random.randint(key, (N // 8, W), 0, C, dtype=jnp.int32)


def kernel(wl_ref, tri_ref, r_ref, t_out):
    tile = pl.program_id(0)

    def octet(r, acc_t):
        rd = r_ref[pl.ds(r * 8, 8), :]   # (8, 8)
        b = lambda col: jax.lax.broadcast_in_dim(rd[:, col], (8, 128), (0,))
        ox, oy, oz, dx, dy, dz = b(0), b(1), b(2), b(3), b(4), b(5)
        t = jnp.full((8, 128), 3.4e38, jnp.float32)
        base = (tile * OCT + r) * W

        for w in range(W):  # static unroll
            c = wl_ref[base + w]
            slab = tri_ref[c]
            s = lambda row: jax.lax.broadcast_in_dim(slab[row], (8, 128), (1,))
            nx, ny, nz, nd = s(0), s(1), s(2), s(3)
            den = nx * dx + ny * dy + nz * dz
            num = nd - (nx * ox + ny * oy + nz * oz)
            rcp = pl.reciprocal(jnp.where(den == 0.0, 1e-20, den), approx=True)
            tt = num * rcp
            # hit point
            px = ox + tt * dx
            py = oy + tt * dy
            pz = oz + tt * dz
            u = s(4) * px + s(5) * py + s(6) * pz + s(7)
            v = s(8) * px + s(9) * py + s(10) * pz + s(11)
            ok = ((u >= 0.) & (v >= 0.) & (u + v <= 1.)
                  & (tt > 0.) & (tt < t))
            t = jnp.where(ok, tt, t)

        tmin = jnp.min(t, axis=1, keepdims=True)
        return jnp.concatenate([acc_t[:, 1:], tmin], axis=1)

    acc_t = jnp.zeros((8, 128), jnp.float32)
    acc_t = jax.lax.fori_loop(0, OCT, octet, acc_t)
    t_out[:, :] = acc_t


def call(wl, tri_slab, rays):
    n = rays.shape[0]
    n_tiles = n // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, 8), lambda i, wl: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((8, 128), lambda i, wl: (i, 0),
                                memory_space=pltpu.VMEM)],
    )
    (t,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8 * n_tiles, 128), jnp.float32)],
    )(wl.reshape(-1), tri_slab, rays)
    return t.reshape(n_tiles, 8, 128).transpose(0, 2, 1).reshape(n)


def step(rays):
    tt = call(wl, tri_slab, rays)
    return rays + tt[:, None] * 1e-30

t = timeit_graph(step, rays)
blocks = (N // 8) * W
print(f'BW octet kernel W={W}: {t*1e3:.3f} ms; per block {t/blocks*1e9:.1f} ns;'
      f' per ray {t/N*1e9:.1f} ns; {N*W*128/t/1e9:.0f} Gtests/s')
