import time, jax, jax.numpy as jnp, numpy as np
# pure read bandwidth: sum over a big bf16 buffer
for gb in (2,):
    n = int(gb * 2**30 // 2)
    x = jax.block_until_ready(jax.jit(lambda k: (jax.random.normal(k, (n,), jnp.float32)*0.1).astype(jnp.bfloat16))(jax.random.PRNGKey(0)))
    f = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    np.asarray(f(x))
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(x)
    np.asarray(r)
    dt = (time.perf_counter() - t0)/10
    print(f"{gb}GB bf16 sum: {dt*1e3:.2f} ms -> {gb*2**30/dt/1e9:.0f} GB/s")
# int8 same
n = int(2 * 2**30)
xi = jax.block_until_ready(jax.jit(lambda k: jax.random.randint(k, (n,), -127, 128, jnp.int8))(jax.random.PRNGKey(1)))
f = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))
np.asarray(f(xi))
t0 = time.perf_counter()
for _ in range(10):
    r = f(xi)
np.asarray(r)
dt = (time.perf_counter() - t0)/10
print(f"2GB int8 sum: {dt*1e3:.2f} ms -> {2*2**30/dt/1e9:.0f} GB/s")
