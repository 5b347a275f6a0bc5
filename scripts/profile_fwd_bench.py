"""Forward-pass decomposition at bench scale (B=16384, DeepFM)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from recommender_system_tpu.models import DeepFM
from recommender_system_tpu.training import FusedAdagrad, Trainer
from recommender_system_tpu.utils.benchmark import bench_fn
from recommender_system_tpu.utils.datasets import synthetic_criteo
from recommender_system_tpu.layers.embedding import packed_take, pack_factor

BATCH, VOCAB, DIM, HIDDEN = 16384, 100_000, 8, (256, 128, 64)

cols, X, y = synthetic_criteo(n_rows=BATCH, vocab=VOCAB,
                              embedding_dim=DIM, seed=0)
batch = {k: jnp.asarray(v) for k, v in X.items()}
model = DeepFM(tuple(cols), hidden_units=HIDDEN)
trainer = Trainer(model, optimizer=optax.adagrad(0.05),
                  fused_embedding=FusedAdagrad(0.05))
state = trainer.init(batch)
params = state.params

stack = None
for p, v in jax.tree_util.tree_leaves_with_path(params):
    if "table_d" in jax.tree_util.keystr(p):
        stack = v
print("stack", stack.shape)

dim = 9
pack = pack_factor(dim)
N = 26 * BATCH
rng = np.random.default_rng(0)
rows = jnp.asarray(rng.integers(0, stack.shape[0] * pack, N, dtype=np.int32))

g1 = jax.jit(lambda s, r: jnp.take(s, r // pack, axis=0).sum())
print(f"wide row gather [N,128]->sum : {bench_fn(g1, stack, rows)*1e3:7.3f} ms")

g2 = jax.jit(lambda s, r: packed_take(s, r, dim).sum())
print(f"packed_take (gather+select)  : {bench_fn(g2, stack, rows)*1e3:7.3f} ms")

g3 = jax.jit(lambda s, r: packed_take(s, r, dim))
# materialize full output [N, 9]
print(f"packed_take materialized     : {bench_fn(g3, stack, rows)*1e3:7.3f} ms")

# full model forward
f = jax.jit(lambda p, b: model.apply({"params": p}, b, train=False).sum())
print(f"model fwd (train=False)      : {bench_fn(f, params, batch)*1e3:7.3f} ms")

# embedding front-end only
from recommender_system_tpu.layers.embedding import UnifiedEmbedding
ue = UnifiedEmbedding(tuple(cols), name="unified")
uparams = {"unified": params["unified"]}
fe = jax.jit(lambda p, b: jax.tree.map(
    lambda x: x.sum(), UnifiedEmbedding(tuple(cols)).apply(
        {"params": p["unified"]}, b)[1]).sum())
print(f"unified embedding fwd        : {bench_fn(fe, uparams, batch)*1e3:7.3f} ms")

# DNN alone on a [B, 26*8+13] input
deep_in = jnp.asarray(rng.normal(size=(BATCH, 26 * 8 + 13)).astype(np.float32))
from recommender_system_tpu.layers.core import DNN
dnn = DNN(HIDDEN, output_dim=1)
dp = dnn.init(jax.random.PRNGKey(0), deep_in, train=False)
fd = jax.jit(lambda p, x: dnn.apply(p, x, train=False).sum())
print(f"DNN tower fwd                : {bench_fn(fd, dp, deep_in)*1e3:7.3f} ms")
