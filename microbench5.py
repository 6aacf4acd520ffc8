"""Raw VPU throughput: chain of FMAs on (8,128) vregs, P parallel chains."""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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

ITERS = 100000
P = 8  # independent chains for ILP

def kernel(x_ref, o_ref):
    xs = [x_ref[i * 8:(i + 1) * 8, :] for i in range(P)]

    def body(i, xs):
        return tuple(x * 1.000001 + 0.3 for x in xs)

    xs = jax.lax.fori_loop(0, ITERS, body, tuple(xs))
    for i in range(P):
        o_ref[i * 8:(i + 1) * 8, :] = xs[i]

def call(x):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * P, 128), jnp.float32),
    )(x)

x = jax.random.normal(jax.random.PRNGKey(0), (8 * P, 128), jnp.float32)
t = timeit_graph(call, x)
total_vops = ITERS * P  # one fused multiply-add per chain per iter (maybe 2 ops)
print(f'{t*1e3:.3f} ms for {total_vops} vreg-FMAs -> '
      f'{t/total_vops*1e9:.2f} ns per (8,128) FMA, '
      f'{total_vops*1024*2/t/1e12:.2f} TFLOPs')
