"""DCN/PNN/NFM AUC convergence on a >=1M-row Avazu-format dataset.

BASELINE.json config 3 names DCN + PNN + NFM on Criteo/Avazu; this runs the
full ``load_avazu`` pipeline (21 hashed categoricals + derived hour
features) on the deterministic 1.25M-row synthetic fixture
(``utils.datasets.synthetic_avazu``: additive site/app quality + a
multiplicative category-cross term only interaction models express) and
records per-epoch train loss + held-out AUC for BASELINE.md. Pass a real
kaggle ``--csv train.csv`` to run the actual Avazu config instead.

Reference counterparts: ``model/dcn.py:37-50``, ``model/pnn.py:56-89``,
``model/nfm.py:15-34`` (drivers that train on the bundled Criteo sample
and print accuracy without recording it).

Usage: python -m benchmarks.avazu_parity [--models dcn pnn nfm] [--epochs 2]
"""
import argparse
import json
import os
import tempfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["dcn", "pnn", "nfm"],
                    choices=["dcn", "pnn", "nfm", "deepfm", "wide_deep"])
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--rows", type=int, default=1_250_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--hash-buckets", type=int, default=200_000)
    ap.add_argument("--csv", default=None, help="real kaggle train.csv")
    ap.add_argument("--out", default=None, help="write summary json here")
    args = ap.parse_args()

    import numpy as np
    import optax

    from recommender_system_tpu.models import (DCN, NFM, PNN, DeepFM,
                                               WideDeep)
    from recommender_system_tpu.training import FusedAdagrad, Trainer
    from recommender_system_tpu.utils.datasets import (iter_batches,
                                                       load_avazu,
                                                       synthetic_avazu)

    if args.csv:
        csv = args.csv
    else:
        csv = os.path.join(tempfile.mkdtemp(prefix="avazu_synth_"),
                           "train.csv")
        n = synthetic_avazu(csv, n_rows=args.rows)
        print(f"synthetic avazu written: {n} rows")

    cols, Xtr, ytr, Xte, yte = load_avazu(
        csv, embedding_dim=8, hash_buckets=args.hash_buckets,
        max_rows=args.rows)
    print(f"train rows: {len(ytr)}  test rows: {len(yte)}  "
          f"ctr {float(np.mean(ytr)):.4f}")

    makers = {
        "dcn": lambda c: DCN(c, cross_layers=6, hidden_units=(256, 128, 64)),
        "pnn": lambda c: PNN(c, mode="inner", hidden_units=(256, 128, 64)),
        "nfm": lambda c: NFM(c, hidden_units=(256, 128, 64)),
        "deepfm": lambda c: DeepFM(c, hidden_units=(256, 128, 64)),
        "wide_deep": lambda c: WideDeep(c, hidden_units=(256, 128, 64)),
    }
    summary = {}
    for name in args.models:
        model = makers[name](tuple(cols))
        tr = Trainer(model, optimizer=optax.adagrad(0.05),
                     fused_embedding=FusedAdagrad(0.05))
        state = tr.init(next(iter_batches(Xtr, ytr, args.batch))[0])
        curve = []
        for epoch in range(args.epochs):
            state, hist = tr.fit(state, Xtr, ytr, batch_size=args.batch,
                                 epochs=1)
            m = tr.evaluate(state, Xte, yte, streaming=True)
            curve.append({"epoch": epoch + 1,
                          "train_loss": round(hist["loss"][0], 4),
                          "test_auc": round(m["auc"], 4),
                          "test_logloss": round(m["logloss"], 4),
                          "examples_per_sec": round(
                              hist["examples_per_sec"][0], 1)})
            print(json.dumps({"model": name, **curve[-1]}))
        summary[name] = curve
    out = {"rows": len(ytr), "hash_buckets": args.hash_buckets,
           "source": "synthetic" if not args.csv else args.csv,
           "curves": summary}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
