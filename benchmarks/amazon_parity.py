"""DIN/DIEN AUC convergence on a >=100k-row Amazon-format behavior dataset.

The reference's DIN/DIEN parity configs (BASELINE.json config 4) name Amazon
Electronics, which is not fetchable here (zero egress). This runs the full
``load_amazon_reviews -> build_amazon_behavior_dataset`` pipeline on the
deterministic synthetic fixture (``synthetic_amazon_reviews``: users with
2 preferred categories, 85% in-preference reviews) at meaningful scale and
records per-epoch train loss + test AUC for BASELINE.md. Pass real
``--reviews/--meta`` files to run the actual Amazon config instead.

Usage: python -m benchmarks.amazon_parity [--model din|dien] [--epochs 3]
"""
import argparse
import json
import os
import tempfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="din", choices=["din", "dien"])
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--users", type=int, default=40_000)
    ap.add_argument("--items", type=int, default=20_000)
    ap.add_argument("--seq-len", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reviews", default=None, help="real reviews json[.gz]")
    ap.add_argument("--meta", default=None)
    args = ap.parse_args()

    import optax

    from recommender_system_tpu.models import DIEN, DIN
    from recommender_system_tpu.training import Trainer
    from recommender_system_tpu.utils.datasets import (
        build_amazon_behavior_dataset, iter_batches, synthetic_amazon_reviews)

    if args.reviews:
        rp, mp = args.reviews, args.meta
    else:
        d = tempfile.mkdtemp(prefix="amzn_synth_")
        rp, mp = os.path.join(d, "reviews.json"), os.path.join(d, "meta.json")
        n = synthetic_amazon_reviews(rp, mp, n_users=args.users,
                                     n_items=args.items, n_cates=50, seed=0)
        print(f"synthetic reviews written: {n}")

    cols, Xtr, ytr, Xte, yte = build_amazon_behavior_dataset(
        rp, mp, seq_len=args.seq_len, embedding_dim=16,
        negsample_hist=args.model == "dien")
    print(f"train rows: {len(ytr)}  test rows: {len(yte)}")

    if args.model == "din":
        model = DIN(tuple(cols), behavior_feature_list=("item_id", "cate_id"),
                    hidden_units=(200, 80))
    else:
        model = DIEN(tuple(cols),
                     behavior_feature_list=("item_id", "cate_id"),
                     hidden_units=(200, 80), use_negsampling=True)
    tr = Trainer(model, optimizer=optax.adam(1e-3))
    state = tr.init(next(iter_batches(Xtr, ytr, args.batch))[0])
    curve = []
    for epoch in range(args.epochs):
        state, hist = tr.fit(state, Xtr, ytr, batch_size=args.batch, epochs=1)
        m = tr.evaluate(state, Xte, yte)
        curve.append({"epoch": epoch + 1,
                      "train_loss": round(hist["loss"][0], 4),
                      "test_auc": round(m["auc"], 4),
                      "test_logloss": round(m["logloss"], 4),
                      "examples_per_sec": round(
                          hist["examples_per_sec"][0], 1)})
        print(json.dumps(curve[-1]))
    print(json.dumps({"model": args.model, "rows": len(ytr),
                      "curve": curve}))


if __name__ == "__main__":
    main()
