"""Decompose the bench-scale fused multi-step: where do 7.2ms/step go?

Pieces timed separately (all differential + fetch-forced, utils/benchmark.py):
  - full 8-step scan (the bench config)
  - single fused step (no scan)
  - forward only (train=False)
  - forward + backward (value_and_grad, no optimizer application)
  - fused_adagrad_apply alone at the step's real N for each stack
  - sort + lane-shift prep alone (the XLA prologue of the fused kernel)
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from recommender_system_tpu.models import DeepFM
from recommender_system_tpu.training import FusedAdagrad, Trainer
from recommender_system_tpu.training.harness import _split_stack_params
from recommender_system_tpu.utils.benchmark import bench_fn, bench_train_step, time_iterations
from recommender_system_tpu.utils.datasets import synthetic_criteo
from recommender_system_tpu.layers.embedding import pack_factor
from recommender_system_tpu.ops.fused_adagrad import fused_adagrad_apply, _lane_shift_matmul, _build_queue_sparse

BATCH, VOCAB, DIM, HIDDEN, K = 16384, 100_000, 8, (256, 128, 64), 8

stacked, labels_list = [], []
for k in range(K):
    cols, X, y = synthetic_criteo(n_rows=BATCH, vocab=VOCAB,
                                  embedding_dim=DIM, seed=k)
    stacked.append(X)
    labels_list.append(y)
batches = {key: jnp.asarray(np.stack([X[key] for X in stacked]))
           for key in stacked[0]}
labels = jnp.asarray(np.stack(labels_list))
batch0 = {k: v[0] for k, v in batches.items()}
y0 = labels[0]

model = DeepFM(tuple(cols), hidden_units=HIDDEN)
trainer = Trainer(model, optimizer=optax.adagrad(0.05),
                  fused_embedding=FusedAdagrad(0.05))
state = trainer.init(batch0)

multi = trainer.make_multi_step()
holder = {"s": state}
def run_multi(n):
    s, loss = holder["s"], None
    for _ in range(n):
        s, loss = multi(s, batches, labels)
    holder["s"] = s
    return loss
sec = time_iterations(run_multi, 3, 12)
print(f"multi-step scan : {sec/K*1e3:8.3f} ms/step ({BATCH*K/sec:,.0f} ex/s)")

sec1, state1 = bench_train_step(trainer._make_train_step(), holder["s"],
                                batch0, y0)
print(f"single step     : {sec1*1e3:8.3f} ms/step ({BATCH/sec1:,.0f} ex/s)")

params = state1.params
@jax.jit
def fwd(p, b):
    return model.apply({"params": p}, b, train=False).sum()
print(f"fwd only        : {bench_fn(fwd, params, batch0)*1e3:8.3f} ms")

# fwd+bwd through the fused path (perturb grads) but drop optimizer work
stacks, rest = _split_stack_params(params)
from recommender_system_tpu.ops import dispatch
from recommender_system_tpu.training.harness import _merge_stack_params

def make_vag():
    def fwd_pert(rest_p, perturbs):
        variables = {"params": _merge_stack_params(rest_p, stacks),
                     "perturbations": perturbs}
        outputs, mutated = model.apply(
            variables, batch0, train=True, mutable=["embed_ids"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        from recommender_system_tpu.training.losses import bce_with_logits
        return bce_with_logits(outputs, y0), mutated["embed_ids"]

    def shapes(rest_p):
        variables = {"params": _merge_stack_params(rest_p, stacks)}
        return model.apply(variables, batch0, train=True,
                           mutable=["embed_ids", "perturbations"],
                           rngs={"dropout": jax.random.PRNGKey(0)}
                           )[1]["perturbations"]
    pert_shapes = jax.eval_shape(shapes, rest)
    p0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), pert_shapes)

    @jax.jit
    def vag(rest_p):
        (loss, ids), (gr, gp) = jax.value_and_grad(
            fwd_pert, argnums=(0, 1), has_aux=True)(rest_p, p0)
        return loss, jax.tree.map(lambda x: x.sum(), (gr, gp))
    return vag

dispatch.set_fused_opt_mode(True)
try:
    vag = make_vag()
    print(f"fwd+bwd (fused) : {bench_fn(vag, rest)*1e3:8.3f} ms")
finally:
    dispatch.set_fused_opt_mode(False)

# fused_adagrad_apply alone per stack, at the step's true N
for path, stack in stacks.items():
    dim = int(path[-1].split("_d")[1])
    pack = pack_factor(dim)
    total_logical = stack.shape[0] * pack
    # 26 sparse features + 13 dense? linear lane: see model; use 26*B ids
    N = 26 * BATCH
    rng = np.random.default_rng(0)
    lids = jnp.asarray(rng.integers(0, total_logical, N, dtype=np.int32))
    ct = jnp.asarray(rng.normal(size=(N, dim)).astype(np.float32))
    acc = jnp.full_like(stack, 0.1)
    f = jax.jit(lambda s, a, i, c: fused_adagrad_apply(
        s, a, i, c, pack=pack, dim=dim, lr=0.05,
        stream_dtype=jnp.bfloat16))
    sec = bench_fn(f, stack, acc, lids, ct)
    print(f"adagrad {str(path[-1]):10s}: {sec*1e3:8.3f} ms  "
          f"(rows={stack.shape[0]}, pack={pack}, N={N})")

    # prep-only: sort + lane shift + queue
    def prep(i, c):
        slid, order = jax.lax.sort([i.astype(jnp.int32),
                                    jnp.arange(N, dtype=jnp.int32)],
                                   num_keys=1)
        sct = jnp.take(c, order, axis=0)
        swid = slid // pack
        sg = _lane_shift_matmul(sct, slid % pack, pack, dim, jnp.bfloat16)
        w_sub, w_chunk, W, n_sub, pc = _build_queue_sparse(
            swid, N, stack.shape[0], 512, 1024)
        return sg.sum(), w_chunk.sum()
    sec = bench_fn(jax.jit(prep), lids, ct)
    print(f"  prep only     : {sec*1e3:8.3f} ms")
