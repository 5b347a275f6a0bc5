"""Does the donated fused-adagrad kernel alias in-place, or copy?"""
import collections, glob, gzip, json, shutil
import numpy as np
import jax, jax.numpy as jnp
from recommender_system_tpu.ops.fused_adagrad import fused_adagrad_apply

ROWS, PACK, DIM, N = 185856, 14, 9, 212992

rng = np.random.default_rng(0)
stack = jnp.asarray(rng.normal(size=(ROWS, 128)).astype(np.float32))
acc = jnp.full((ROWS, 128), 0.1, jnp.float32)
lids = jnp.asarray(rng.integers(0, ROWS * PACK, size=N, dtype=np.int32))
ct = jnp.asarray(rng.normal(size=(N, DIM)).astype(np.float32))

f = jax.jit(lambda s, a, i, c: fused_adagrad_apply(
    s, a, i, c, pack=PACK, dim=DIM, lr=0.05, stream_dtype=jnp.bfloat16),
    donate_argnums=(0, 1))
s, a = f(stack, acc, lids, ct)
jax.block_until_ready((s, a))
float(np.asarray(s[0, 0]))
shutil.rmtree("/tmp/ktrace", ignore_errors=True)
with jax.profiler.trace("/tmp/ktrace"):
    for _ in range(5):
        s, a = f(s, a, lids, ct)
    float(np.asarray(s[0, 0]))
path = sorted(glob.glob("/tmp/ktrace/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(path) as fh:
    data = json.load(fh)
evs = [e for e in data["traceEvents"] if e.get("pid")==3 and e.get("ph")=="X" and e.get("tid")==3]
agg = collections.Counter()
for e in evs:
    agg[e["name"]] += e["dur"]
print(f"total dev: {sum(agg.values())/5e3:.3f} ms/call")
for k, v in agg.most_common(12):
    print(f"{v/5e3:9.3f} ms  {k}")
