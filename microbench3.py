import time, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.PRNGKey(0)
REPS = 20

def timeit_graph(make_step, init, reps=REPS):
    """Time reps iterations of step inside one jit (avoids tunnel RTT)."""
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
    # device time per step = (T_many - T_once)/(reps-1)
    return ((t1b - t0b) - (t1 - t0)) / (reps - 1)

# matmul calibration
a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
t = timeit_graph(lambda x: (x @ x) * 1e-3, a)
print(f'4096^3 bf16 matmul: {t*1e3:.3f} ms -> {2*4096**3/t/1e12:.0f} TFLOPs')

af = a.astype(jnp.float32)
t = timeit_graph(lambda x: (x @ x) * 1e-3, af)
print(f'4096^3 f32 matmul: {t*1e3:.3f} ms -> {2*4096**3/t/1e12:.0f} TFLOPs')

x = jax.random.normal(key, (64 * 1024 * 1024,), jnp.float32)
t = timeit_graph(lambda x: ((x * 1.5 + 2.0) * x - x * x * 0.3) * (x + 1.0), x)
print(f'elementwise 64M: {t*1e3:.3f} ms -> {4*64e6*4/t/1e9:.0f} GB/s eff bw')

N = 589824
keys32 = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)
def sort_step(k):
    idx = jnp.arange(N, dtype=jnp.int32)
    sk, si = jax.lax.sort_key_val(k, idx)
    return sk ^ si
t = timeit_graph(sort_step, keys32)
print(f'sort 589k keys+idx: {t*1e3:.3f} ms')

payload = jax.random.normal(key, (N, 12), jnp.float32)
idx = jax.random.randint(key, (N,), 0, N, dtype=jnp.int32)
def gather_step(p):
    return p[idx] + 1.0
t = timeit_graph(gather_step, payload)
print(f'gather 589k x 12: {t*1e3:.3f} ms')

# dense pallas tri test
TILE, SUB, LANE, TRIS = 1024, 8, 128, 512
def dense_kernel(tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_out):
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

def dense_call(tris, org, d):
    n = org.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(n // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)
           for _ in range(6)],
        out_specs=[pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)],
    )
    return pl.pallas_call(dense_kernel, grid_spec=grid_spec,
                          out_shape=[jax.ShapeDtypeStruct((n,), jnp.float32)])(
        tris, org[:, 0], org[:, 1], org[:, 2], d[:, 0], d[:, 1], d[:, 2])

tris = jax.random.normal(key, (TRIS, 9), jnp.float32)
org = jax.random.normal(key, (N, 3), jnp.float32)
d = jax.random.normal(key, (N, 3), jnp.float32)
def dense_step(org):
    (tt,) = dense_call(tris, org, d)
    return org + tt[:, None] * 1e-30
t = timeit_graph(dense_step, org)
n_tiles = N // TILE
print(f'dense pallas {TRIS} tris: {t*1e3:.3f} ms, {t/n_tiles*1e6:.2f} us/tile, '
      f'{t/n_tiles*940e3/TRIS:.2f} cyc/tri/tile, {N*TRIS/t/1e9:.0f} Gtests/s')

# existing packet traversal kernel on the real scene for comparison
from corona13_tpu import scene as scene_mod
from corona13_tpu.ops.trace import intersect, MAX_DIST
sc, _ = scene_mod.load_scene('/root/reference/regression/0010_pt/test.nra2')
org_s = jnp.zeros((N, 3)) + jnp.array([0., 1., 0.])
dd = jax.random.normal(key, (N, 3))
dd = dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)
def isect_step(o):
    h = intersect(sc.geom, o, dd)
    return o + h.t[:, None] * 1e-30
t = timeit_graph(isect_step, org_s)
print(f'current kernel, incoherent dirs from center: {t*1e3:.2f} ms '
      f'({N/t/1e6:.1f} Mrays/s)')
