"""Decompose the fused train step at bench scale."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import optax

from recommender_system_tpu.models import DeepFM
from recommender_system_tpu.training import FusedAdagrad, Trainer
from recommender_system_tpu.utils.datasets import synthetic_criteo

BATCH, VOCAB, DIM, HIDDEN = 8192, 100_000, 8, (256, 128, 64)

def timeit_state(step, state, batch, labels, n=30):
    state, loss = step(state, batch, labels)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, batch, labels)
    float(loss)
    return (time.perf_counter() - t0) / n, state

cols, X, y = synthetic_criteo(n_rows=BATCH, vocab=VOCAB, embedding_dim=DIM, seed=0)
batch = {k: jnp.asarray(v) for k, v in X.items()}
labels = jnp.asarray(y)
model = DeepFM(tuple(cols), hidden_units=HIDDEN)

floor = jax.jit(lambda b: b[list(b)[0]].sum())
def t_floor(n=30):
    floor(batch); 
    import numpy as np
    float(np.asarray(floor(batch)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = floor(batch)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / n
print(f"dispatch floor:   {t_floor()*1e3:8.3f} ms")

tr_d = Trainer(model, optimizer=optax.adagrad(0.05))
sd = tr_d.init(batch)
t, _ = timeit_state(tr_d._make_train_step(), sd, batch, labels)
print(f"dense step:       {t*1e3:8.3f} ms  ({BATCH/t:,.0f} ex/s)")

tr_f = Trainer(model, optimizer=optax.adagrad(0.05),
               fused_embedding=FusedAdagrad(0.05))
sf = tr_f.init(batch)
t, _ = timeit_state(tr_f._make_train_step(), sf, batch, labels)
print(f"fused step:       {t*1e3:8.3f} ms  ({BATCH/t:,.0f} ex/s)")

# fwd-only under fused mode (perturb zeros present? eval path, no perturbs)
@jax.jit
def fwd(p, b):
    return model.apply({"params": p}, b, train=False).sum()
fwd(sf.params, batch)
import numpy as np
float(np.asarray(fwd(sf.params, batch)))
t0 = time.perf_counter()
for _ in range(30):
    out = fwd(sf.params, batch)
float(np.asarray(out))
print(f"fwd only:         {(time.perf_counter()-t0)/30*1e3:8.3f} ms")
