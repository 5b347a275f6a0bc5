"""Differential cost of each fused-step stage, measured IN the real pipeline.

Builds the exact fused train step but with the embedding-optimizer tail
swapped for cheaper variants; stage cost = difference between variants.
  full      : fwd + bwd + dense optax + sort/shift/queue prep + Pallas kernel
  prep_only : ... + prep, no kernel (stack consumed via cheap add)
  no_embed  : ... no prep, no kernel
  fwd_bwd   : no optimizer at all (losses only)
All donated, all at bench scale (B=16384, K-step scan amortizes dispatch).
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp
import optax
from functools import partial

from recommender_system_tpu.models import DeepFM
from recommender_system_tpu.training import FusedAdagrad, Trainer
from recommender_system_tpu.training.harness import (
    _split_stack_params, _merge_stack_params, flax_unfreeze, _STACK_KEY_RE)
from recommender_system_tpu.training.losses import bce_with_logits
from recommender_system_tpu.utils.benchmark import time_iterations
from recommender_system_tpu.utils.datasets import synthetic_criteo
from recommender_system_tpu.layers.embedding import pack_factor
from recommender_system_tpu.ops import dispatch
from recommender_system_tpu.ops.fused_adagrad import (
    fused_adagrad_apply, _lane_shift_matmul, _build_queue_sparse)
from flax import traverse_util

BATCH, VOCAB, DIM, HIDDEN, K = 16384, 100_000, 8, (256, 128, 64), 8

stacked, labels_list = [], []
for k in range(K):
    cols, X, y = synthetic_criteo(n_rows=BATCH, vocab=VOCAB,
                                  embedding_dim=DIM, seed=k)
    stacked.append(X)
    labels_list.append(y)
batches = {key: jnp.asarray(np.stack([Xk[key] for Xk in stacked]))
           for key in stacked[0]}
labels = jnp.asarray(np.stack(labels_list))
batch0 = {k: v[0] for k, v in batches.items()}

model = DeepFM(tuple(cols), hidden_units=HIDDEN)
tx = optax.adagrad(0.05)


def make_step(mode):
    """mode: full | prep_only | no_embed | fwd_bwd"""

    def body(state, batch, lab):
        params, accs, dense_opt, step_i = state
        stacks, rest = _split_stack_params(params)

        def fwd(rest_p, perturbs):
            variables = {"params": _merge_stack_params(rest_p, stacks),
                         "perturbations": perturbs}
            outputs, mutated = model.apply(
                variables, batch, train=True, mutable=["embed_ids"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return bce_with_logits(outputs, lab), mutated["embed_ids"]

        def _shapes(rest_p):
            variables = {"params": _merge_stack_params(rest_p, stacks)}
            return model.apply(
                variables, batch, train=True,
                mutable=["embed_ids", "perturbations"],
                rngs={"dropout": jax.random.PRNGKey(0)})[1]["perturbations"]

        pert_shapes = jax.eval_shape(_shapes, rest)
        perturbs0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                 pert_shapes)
        (loss, ids_tree), (g_rest, g_pert) = jax.value_and_grad(
            fwd, argnums=(0, 1), has_aux=True)(rest, perturbs0)

        updates, new_dense_opt = tx.update(g_rest, dense_opt, rest)
        new_rest = optax.apply_updates(rest, updates)

        flat_ids = traverse_util.flatten_dict(flax_unfreeze(ids_tree))
        flat_ct = traverse_util.flatten_dict(flax_unfreeze(g_pert))
        new_stacks, new_accs = {}, {}
        for path, stack in stacks.items():
            scope, key = path[:-1], path[-1]
            dim = int(_STACK_KEY_RE.match(key).group(1))
            pack = pack_factor(dim)
            ids_list, ct_list = [], []
            for ip, ids in flat_ids.items():
                ct = flat_ct.get(ip)
                if (ip[:len(scope)] == scope and ct is not None
                        and ct.shape[-1] == dim):
                    ids_list.append(ids.reshape(-1))
                    ct_list.append(ct.reshape(-1, dim))
            lids = jnp.concatenate(ids_list)
            ct = jnp.concatenate(ct_list)
            if mode == "full":
                ns, na = fused_adagrad_apply(
                    stack, accs[path], lids, ct, pack=pack, dim=dim,
                    lr=0.05, stream_dtype=jnp.bfloat16)
            elif mode == "prep_only":
                N = lids.shape[0]
                slid, order = jax.lax.sort(
                    [lids.astype(jnp.int32), jnp.arange(N, dtype=jnp.int32)],
                    num_keys=1)
                sct = jnp.take(ct, order, axis=0)
                swid = slid // pack
                sg = _lane_shift_matmul(sct, slid % pack, pack, dim,
                                        jnp.bfloat16)
                w_sub, w_chunk, W, n_sub, pc = _build_queue_sparse(
                    swid, N, stack.shape[0], 512, 1024)
                # consume outputs cheaply, keep stack dependency
                ns = stack + (sg[0, 0].astype(jnp.float32)
                              + w_chunk[0]) * 1e-30
                na = accs[path]
            elif mode == "no_embed":
                ns = stack + (ct[0, 0] + lids[0]) * 1e-30
                na = accs[path]
            else:  # fwd_bwd
                ns = stack
                na = accs[path]
            new_stacks[path] = ns
            new_accs[path] = na

        new_params = _merge_stack_params(new_rest, new_stacks)
        return (new_params, new_accs, new_dense_opt, step_i + 1), loss

    @partial(jax.jit, donate_argnums=(0,))
    def multi(state, bs, ls):
        return jax.lax.scan(lambda st, bl: body(st, bl[0], bl[1]),
                            state, (bs, ls))

    return multi


trainer = Trainer(model, optimizer=tx, fused_embedding=FusedAdagrad(0.05))
state0 = trainer.init(batch0)
dense_opt, accs = state0.opt_state

results = {}
for mode in ["full", "prep_only", "no_embed", "fwd_bwd"]:
    dispatch.set_fused_opt_mode(True)
    try:
        multi = make_step(mode)
        params_c = jax.tree.map(jnp.copy, state0.params)
        accs_c = jax.tree.map(jnp.copy, dict(accs))
        opt_c = jax.tree.map(jnp.copy, dense_opt)
        holder = {"s": (params_c, accs_c, opt_c, jnp.int32(0))}

        def run_n(n):
            s, loss = holder["s"], None
            for _ in range(n):
                s, loss = multi(s, batches, labels)
            holder["s"] = s
            return loss
        sec = time_iterations(run_n, 3, 12) / K
    finally:
        dispatch.set_fused_opt_mode(False)
    results[mode] = sec
    print(f"{mode:10s}: {sec*1e3:7.3f} ms/step ({BATCH/sec:,.0f} ex/s)")

print()
print(f"pallas kernel   : {(results['full']-results['prep_only'])*1e3:7.3f} ms")
print(f"prep (sort+shift): {(results['prep_only']-results['no_embed'])*1e3:7.3f} ms")
print(f"dense opt + misc: {(results['no_embed']-results['fwd_bwd'])*1e3:7.3f} ms")
print(f"fwd+bwd         : {results['fwd_bwd']*1e3:7.3f} ms")
