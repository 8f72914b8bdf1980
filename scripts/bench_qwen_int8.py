"""Decode-step microbench: Qwen-7B shapes, int8 weight-streaming, 3 packed
branch rows (the qwen POPE VDD config)."""
import time
import jax, jax.numpy as jnp
import numpy as np
from llava_align_tpu.models import qwen
from llava_align_tpu.models.qwen import QwenConfig

cfg = QwenConfig()  # 7B: D=4096, L=32, F=22016 (w12), V=151936
L, D, V, QD, F2 = cfg.num_layers, cfg.hidden_size, cfg.vocab_size, cfg.q_dim, cfg.ff_dim
key = jax.random.PRNGKey(0)

def rand_q(k, shape):
    def gen(kk):
        q = jax.random.randint(kk, shape, -127, 128, jnp.int8)
        s = jnp.full(shape[:-1], 0.01, jnp.float32) / (shape[-1] ** 0.5)
        return {"q": q, "s": s}
    return jax.block_until_ready(jax.jit(gen)(k))

shapes = {
    "c_attn_w": (L, 3 * QD, D), "attn_proj": (L, D, QD),
    "w12": (L, 2 * F2, D), "mlp_proj": (L, D, F2),
}
ks = jax.random.split(key, len(shapes) + 4)
layers = {n: rand_q(ks[i], sh) for i, (n, sh) in enumerate(shapes.items())}
layers["ln_1"] = jnp.ones((L, D), jnp.bfloat16)
layers["ln_2"] = jnp.ones((L, D), jnp.bfloat16)
layers["c_attn_b"] = jnp.zeros((L, 3 * QD), jnp.bfloat16)
n = len(shapes)
params = {
    "wte": jax.block_until_ready(jax.jit(lambda k: (jax.random.normal(k, (V, D), jnp.float32) * 0.02).astype(jnp.bfloat16))(ks[n])),
    "layers": layers,
    "ln_f": jnp.ones((D,), jnp.bfloat16),
    "lm_head": rand_q(ks[n + 1], (V, D)),
}
int8_bytes = sum(np.prod(s[1:]) for s in shapes.values()) * L / 1e9
print(f"int8 weight GB/step: {int8_bytes:.2f} + lm_head {V*D/1e9:.2f}")

B, PAD = 3, 384  # 3 VDD branch rows, qwen POPE prompt ~270+T
cache = qwen.init_cache(cfg, B, PAD + 32)
emb = jax.random.normal(ks[n + 2], (B, 1, D), jnp.bfloat16)
lengths = jnp.full((B,), PAD, jnp.int32)

@jax.jit
def step(params, cache, emb, lengths):
    h, cache = qwen.forward(params, cfg, emb, lengths[:, None], cache, lengths, attn_impl="xla")
    return qwen.logits_from_hidden(params, h[:, 0]), cache

logits, cache = step(params, cache, emb, lengths)
np.asarray(logits[0, :8])
t0 = time.perf_counter()
iters = 30
for i in range(iters):
    logits, cache = step(params, cache, emb, lengths)
out = np.asarray(logits[0, :8])
dt = (time.perf_counter() - t0) / iters
print(f"qwen-7B int8 dual-dd decode step: {dt*1e3:.2f} ms -> {1/dt:.1f} tok/s (3 branch rows)")
