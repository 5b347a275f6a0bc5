"""Decompose DIEN step time: gru, augru, aux net, attention, rest."""
import numpy as np
import jax, jax.numpy as jnp
from recommender_system_tpu.utils.benchmark import bench_fn
from recommender_system_tpu.ops.rnn import gru, augru, init_gru_params

B, T, D, H = 8192, 50, 32, 32
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
att = jnp.asarray(rng.random((B, T)).astype(np.float32))
lengths = rng.integers(5, T + 1, size=B)
mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])
params = init_gru_params(jax.random.PRNGKey(0), D, H)

@jax.jit
def gru_fwd(p, x, m):
    return gru(p, x, mask=m)[0]

@jax.jit
def gru_fwdbwd(p, x, m):
    def loss(p, x):
        outs, h = gru(p, x, mask=m)
        return jnp.sum(outs) + jnp.sum(h)
    return jax.grad(loss, argnums=(0, 1))(p, x)

@jax.jit
def augru_fwdbwd(p, x, a, m):
    def loss(p, x, a):
        outs, h = augru(p, x, a, mask=m)
        return jnp.sum(h)
    return jax.grad(loss, argnums=(0, 1, 2))(p, x, a)

t = bench_fn(gru_fwd, params, x, mask)
print(f"gru fwd:        {t*1e3:8.3f} ms")
t = bench_fn(gru_fwdbwd, params, x, mask)
print(f"gru fwd+bwd:    {t*1e3:8.3f} ms")
t = bench_fn(augru_fwdbwd, params, x, att, mask)
print(f"augru fwd+bwd:  {t*1e3:8.3f} ms")

# aux net: two towers over [B, T-1, 2D]
w0 = jnp.asarray(rng.normal(size=(2 * D, 100)).astype(np.float32) * 0.1)
w1 = jnp.asarray(rng.normal(size=(100, 50)).astype(np.float32) * 0.1)
w2 = jnp.asarray(rng.normal(size=(50, 1)).astype(np.float32) * 0.1)
hstates = jnp.asarray(rng.normal(size=(B, T - 1, H)).astype(np.float32))
pos = jnp.asarray(rng.normal(size=(B, T - 1, D)).astype(np.float32))
neg = jnp.asarray(rng.normal(size=(B, T - 1, D)).astype(np.float32))

@jax.jit
def aux_fwdbwd(w0, w1, w2, h, pos, neg):
    def loss(w0, w1, w2, h):
        def net(e):
            z = jnp.concatenate([h, e], -1)
            z = jax.nn.sigmoid(z @ w0)
            z = jax.nn.sigmoid(z @ w1)
            return (z @ w2)[..., 0]
        ce = jax.nn.softplus(-net(pos)) + jax.nn.softplus(net(neg))
        return jnp.sum(ce)
    return jax.grad(loss, argnums=(0, 1, 2, 3))(w0, w1, w2, h)

t = bench_fn(aux_fwdbwd, w0, w1, w2, hstates, pos, neg)
print(f"aux fwd+bwd:    {t*1e3:8.3f} ms")

# DIN attention scorer (concat-folded path) over [B, T, H]
from recommender_system_tpu.layers.sequence import DinAttention
q = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
attn = DinAttention(return_score=True)
avars = attn.init(jax.random.PRNGKey(0), q, hstates[:, :T - 1], mask[:, :T - 1])

@jax.jit
def att_fwdbwd(v, q, k):
    def loss(v, q, k):
        return jnp.sum(attn.apply(v, q, k, mask[:, :T - 1]))
    return jax.grad(loss, argnums=(0, 1, 2))(v, q, k)

t = bench_fn(att_fwdbwd, avars, q, hstates[:, :T - 1])
print(f"att fwd+bwd:    {t*1e3:8.3f} ms")

# embedding path: 2x [B,T] + 2x [B] lookups from a 200k x 128 packed stack,
# fwd+bwd through the Trainer's packed path is complex; approximate with
# raw gathers
V = 200_000
table = jnp.asarray(rng.normal(size=(V, 128)).astype(np.float32))
ids = jnp.asarray(rng.integers(0, V // 4, size=(B * T * 2 + B * 2,)))

@jax.jit
def emb_fwd(tab, ids):
    return jnp.take(tab, ids, axis=0)

t = bench_fn(emb_fwd, table, ids)
print(f"raw gather {ids.shape[0]} rows: {t*1e3:8.3f} ms")
