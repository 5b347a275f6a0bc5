"""Generate a large synthetic Criteo-format TSV for the out-of-core streaming
bench (BASELINE.md round 3): ``label \\t I1..I13 \\t C1..C26`` with hex
categorical tokens, zipf-ish id distribution, and ~5% missing fields —
the on-disk format of the real Criteo Terabyte/Kaggle files that
``stream_criteo`` / the C++ chunk parser consume.

Labels carry a learnable signal (dense sign pattern + per-column token
effects) so a training run on the stream reaches AUC well above 0.5 —
the bench checks the model is actually learning, not just moving bytes.

Usage: python -m benchmarks.gen_criteo_tsv --rows 10000000 --out /tmp/criteo_10m.tsv
"""
import argparse

import numpy as np

N_DENSE, N_SPARSE = 13, 26


def gen_chunk(rng, rows: int, pools, effects) -> bytes:
    logits = np.zeros(rows)
    cols = []
    for i in range(N_DENSE):
        v = rng.integers(0, 1000, rows)
        logits += (0.4 if i % 2 == 0 else -0.4) * (v / 1000.0 - 0.5)
        s = v.astype("U4")
        miss = rng.random(rows) < 0.05
        s[miss] = ""
        cols.append(s)
    for i in range(N_SPARSE):
        pool = pools[i]
        # zipf-ish: square a uniform to skew toward low ids
        ids = (rng.random(rows) ** 2 * len(pool)).astype(np.int64)
        logits += effects[i][ids]
        s = pool[ids]
        miss = rng.random(rows) < 0.05
        s[miss] = ""
        cols.append(s)
    y = (rng.random(rows) < 1.0 / (1.0 + np.exp(-logits))).astype(np.int64)
    rows_arr = np.empty((rows, 1 + N_DENSE + N_SPARSE), dtype=object)
    rows_arr[:, 0] = y.astype("U1")
    for j, c in enumerate(cols):
        rows_arr[:, 1 + j] = c
    lines = ["\t".join(r) for r in rows_arr]
    return ("\n".join(lines) + "\n").encode()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--out", default="/tmp/criteo_10m.tsv")
    ap.add_argument("--chunk", type=int, default=250_000)
    ap.add_argument("--seed", type=int, default=0,
                    help="seeds the token pools + per-token label effects; "
                         "an eval file must share the TRAIN seed or its "
                         "categorical signal will not transfer")
    ap.add_argument("--row-seed", type=int, default=None,
                    help="separate seed for the row stream (default: "
                         "--seed). Use a fresh value to generate a held-out "
                         "eval file over the SAME pools/effects")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    # per-column token pools (vocab 50k/200k/350k/500k cycling) of
    # 8-hex-char tokens
    pools, effects = [], []
    for i in range(N_SPARSE):
        vocab = int(50_000 * (1 + 3 * (i % 4)))
        raw = rng.integers(0, 2**32, vocab, dtype=np.uint64)
        pools.append(np.array([f"{v:08x}" for v in raw], dtype="U8"))
        effects.append(0.25 * np.sin(np.arange(vocab) * (i + 1) * 0.37))

    if args.row_seed is not None:
        rng = np.random.default_rng(args.row_seed)
    written = 0
    milestone = 0
    with open(args.out, "wb") as f:
        while written < args.rows:
            n = min(args.chunk, args.rows - written)
            f.write(gen_chunk(rng, n, pools, effects))
            written += n
            if written // 2_000_000 > milestone:
                milestone = written // 2_000_000
                print(f"{written:,} rows", flush=True)
    print(f"wrote {written:,} rows to {args.out}")


if __name__ == "__main__":
    main()
