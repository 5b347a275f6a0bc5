"""Bisect up: fwd -> +grad(perturb) -> +dense opt -> +fused kernel."""
import collections, glob, gzip, json, shutil
import numpy as np
import jax, jax.numpy as jnp, optax
from flax import traverse_util
from recommender_system_tpu.models import DeepFM
from recommender_system_tpu.training import FusedAdagrad, Trainer
from recommender_system_tpu.training.harness import (_split_stack_params,
                                                     _merge_stack_params,
                                                     flax_unfreeze)
from recommender_system_tpu.utils.datasets import synthetic_criteo
from recommender_system_tpu.ops import dispatch

BATCH, VOCAB, DIM, HIDDEN = 8192, 100_000, 8, (256, 128, 64)

def trace_device(tag, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    shutil.rmtree(f"/tmp/bis2_{tag}", ignore_errors=True)
    with jax.profiler.trace(f"/tmp/bis2_{tag}"):
        for _ in range(n):
            out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    path = sorted(glob.glob(f"/tmp/bis2_{tag}/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(path) as fh:
        data = json.load(fh)
    evs = [e for e in data["traceEvents"]
           if e.get("pid") == 3 and e.get("ph") == "X" and e.get("tid") == 3]
    agg = collections.Counter()
    for e in evs:
        agg[e["name"]] += e["dur"]
    tot = sum(agg.values()) / n / 1e3
    print(f"{tag:20s} dev={tot:7.3f} ms/call  " + "  ".join(
        f"{k}={v/n/1e3:.3f}" for k, v in agg.most_common(5)))

cols, X, y = synthetic_criteo(n_rows=BATCH, vocab=VOCAB, embedding_dim=DIM, seed=0)
batch = {k: jnp.asarray(v) for k, v in X.items()}
labels = jnp.asarray(y)
model = DeepFM(tuple(cols), hidden_units=HIDDEN)
tr = Trainer(model, optimizer=optax.adagrad(0.05), fused_embedding=FusedAdagrad(0.05))
state = tr.init(batch)
dispatch.set_fused_opt_mode(True)

stacks, rest = _split_stack_params(state.params)

def fwd(rest_p, perturbs, stacks, batch, labels):
    variables = {"params": _merge_stack_params(rest_p, stacks),
                 "perturbations": perturbs}
    outputs, mut = model.apply(variables, batch, train=True,
                               mutable=["embed_ids"],
                               rngs={"dropout": jax.random.PRNGKey(0)})
    return optax.sigmoid_binary_cross_entropy(
        outputs.ravel(), labels).mean(), mut["embed_ids"]

def _shapes(rest_p):
    variables = {"params": _merge_stack_params(rest_p, stacks)}
    return model.apply(variables, batch, train=True,
                       mutable=["embed_ids", "perturbations"],
                       rngs={"dropout": jax.random.PRNGKey(0)})[1]["perturbations"]

pert_shapes = jax.eval_shape(_shapes, rest)
def zeros_pert():
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), pert_shapes)

# a: grad w.r.t. perturbs only
def ga(rest_p, stacks_a, batch_a, labels_a):
    (loss, ids), (gr, gp) = jax.value_and_grad(fwd, (0, 1), has_aux=True)(
        rest_p, zeros_pert(), stacks_a, batch_a, labels_a)
    return loss + jax.tree.reduce(lambda a, x: a + x.sum(), gp, 0.0)
trace_device("a_grad_pert", jax.jit(ga), rest, stacks, batch, labels)

# b: + dense optimizer on rest
tx = optax.adagrad(0.05)
opt0 = tx.init(rest)
def gb(rest_p, opt, stacks_a, batch_a, labels_a):
    (loss, ids), (gr, gp) = jax.value_and_grad(fwd, (0, 1), has_aux=True)(
        rest_p, zeros_pert(), stacks_a, batch_a, labels_a)
    up, new_opt = tx.update(gr, opt, rest_p)
    new_rest = optax.apply_updates(rest_p, up)
    return loss + jax.tree.reduce(lambda a, x: a + x.sum(), gp, 0.0), new_rest, new_opt
trace_device("b_plus_dense_opt", jax.jit(gb), rest, opt0, stacks, batch, labels)

# c: full step (donated)
step = tr._make_train_step()
s = state
s, loss = step(s, batch, labels)
float(loss)
shutil.rmtree("/tmp/bis2_c", ignore_errors=True)
with jax.profiler.trace("/tmp/bis2_c"):
    for _ in range(5):
        s, loss = step(s, batch, labels)
    float(loss)
path = sorted(glob.glob("/tmp/bis2_c/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(path) as fh:
    data = json.load(fh)
evs = [e for e in data["traceEvents"] if e.get("pid")==3 and e.get("ph")=="X" and e.get("tid")==3]
agg = collections.Counter()
for e in evs:
    agg[e["name"]] += e["dur"]
tot = sum(agg.values())/5/1e3
print(f"{'c_full_step':20s} dev={tot:7.3f} ms/call  " + "  ".join(
    f"{k}={v/5e3:.3f}" for k, v in agg.most_common(5)))
