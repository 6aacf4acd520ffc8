import time
import jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)

def timeit_sync(f, *args, reps=5):
    r = float(jnp.sum(f(*args)))  # warm
    t0 = time.time()
    for _ in range(reps):
        r = f(*args)
    r = float(jnp.sum(r))  # force full fetch
    return (time.time() - t0) / reps, r

# calibrate: 4096^3 matmul = 137 GFLOP; expect ~1-3 ms on v5e
a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
mm = jax.jit(lambda a: a @ a)
t, _ = timeit_sync(mm, a)
print(f'4096^3 bf16 matmul: {t*1e3:.2f} ms -> {2*4096**3/t/1e12:.1f} TFLOPs')

af = a.astype(jnp.float32)
mmf = jax.jit(lambda a: a @ a)
t, _ = timeit_sync(mmf, af)
print(f'4096^3 f32 matmul: {t*1e3:.2f} ms -> {2*4096**3/t/1e12:.1f} TFLOPs')

# elementwise VPU throughput
x = jax.random.normal(key, (64 * 1024 * 1024,), jnp.float32)
ew = jax.jit(lambda x: ((x * 1.5 + 2.0) * x - x * x * 0.3) * (x + 1.0))
t, _ = timeit_sync(ew, x)
print(f'elementwise 64M x ~6 flops: {t*1e3:.2f} ms -> {6*64e6/t/1e12:.2f} TFLOPs eff')

# sort again with sync
N = 589824
keys32 = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)
payload = jax.random.normal(key, (N, 12), jnp.float32)
@jax.jit
def sort_then_gather(k, p):
    idx = jnp.arange(N, dtype=jnp.int32)
    _, si = jax.lax.sort_key_val(k, idx)
    return p[si]
t, _ = timeit_sync(sort_then_gather, keys32, payload, reps=5)
print(f'sort+gather 589k x12 (sync): {t*1e3:.2f} ms')

# HBM bandwidth
big = jax.random.normal(key, (256 * 1024 * 1024 // 4,), jnp.float32)
cp = jax.jit(lambda x: x + 1.0)
t, _ = timeit_sync(cp, big)
print(f'copy 256MB: {t*1e3:.2f} ms -> {2*256e6/t/1e9:.0f} GB/s')
