"""Run the REFERENCE (TF) models on their own pipeline and report real AUC/logloss.

Imports the reference modules unmodified (read-only); only the evaluation is
wrapped so we get AUC/logloss instead of the mislabeled accuracy prints.
"""
import sys, os, json, time
import numpy as np
ref = "/root/reference/algorithm/deep_learning"
sys.path.insert(0, ref)
os.chdir(ref + "/model")  # drivers use relative data paths
from sklearn.metrics import roc_auc_score, log_loss, accuracy_score

# --- TF 2.21 compat shims for the 2022-era reference code ---
from tensorflow.python.distribute import input_lib
if not hasattr(input_lib, "DistributedDatasetInterface"):
    class _DummyDDI:  # legacy keras only isinstance-checks this
        pass
    input_lib.DistributedDatasetInterface = _DummyDDI
from tensorflow.python.keras import layers as _lk
if not hasattr(_lk, "GRUCell") and hasattr(_lk, "GRUCellV1"):
    _lk.GRUCell = _lk.GRUCellV1

import tensorflow as tf

def manual_fit(model, X, y, batch_size=32, epochs=10, lr=0.01):
    """compile_fit's exact recipe (utils/compile_fit.py:9-15: SGD(0.01), bce,
    batch 32, 10 epochs) as a GradientTape loop — legacy keras Model.fit is
    broken on TF 2.21, but the reference models' forward passes still work."""
    ds = tf.data.Dataset.from_tensor_slices((np.asarray(X, np.float32),
                                             np.asarray(y, np.float32)))
    ds = ds.batch(batch_size)
    opt = tf.keras.optimizers.SGD(lr)
    bce = tf.keras.losses.BinaryCrossentropy()
    @tf.function
    def step(xb, yb):
        with tf.GradientTape() as tape:
            pred = tf.reshape(model(xb), [-1])
            loss = bce(yb, pred)
        grads = tape.gradient(loss, model.trainable_variables)
        opt.apply_gradients(zip(grads, model.trainable_variables))
        return loss
    for epoch in range(epochs):
        last = None
        for xb, yb in ds:
            last = step(xb, yb)
        print(f"epoch {epoch} loss {float(last):.4f}", flush=True)
    return model

results = {}

def evaluate(name, model, X_test, y_test, t0):
    pre = np.asarray(model(X_test)).ravel()
    results[name] = {
        "auc": round(float(roc_auc_score(y_test, pre)), 4),
        "logloss": round(float(log_loss(y_test, np.clip(pre, 1e-7, 1-1e-7))), 4),
        "accuracy": round(float(accuracy_score(y_test, pre > 0.5)), 4),
        "train_seconds": round(time.time() - t0, 1),
    }
    print(name, results[name], flush=True)

which = sys.argv[1]

if which == "fm":
    from utils.dataset import create_criteo_dataset
    from utils.compile_fit import compile_fit
    from model.fm import FM
    (X_train, y_train), (X_test, y_test) = create_criteo_dataset('fm', '../../data/criteo/train_1w.txt', test_size=0.2)
    X_train = np.asarray(X_train, np.float32); X_test = np.asarray(X_test, np.float32)
    t0 = time.time()
    model = FM(8)
    model = manual_fit(model, X_train, y_train)
    evaluate("fm", model, X_test, y_test, t0)

elif which == "deepfm":
    from utils.dataset import create_criteo_dataset, features_dict
    from utils.compile_fit import compile_fit
    from model.deepFM import DeepFM
    (X_train, y_train), (X_test, y_test) = create_criteo_dataset('DeepFM', '../../data/criteo/train_1w.txt', test_size=0.3)
    X_train = np.asarray(X_train, np.float32); X_test = np.asarray(X_test, np.float32)
    fd = features_dict('../../data/criteo/train_1w.txt')
    t0 = time.time()
    model = DeepFM(fd, 10, 1e-4, 1e-4, [256,128,64], 1, 'relu')
    model = manual_fit(model, X_train, y_train)
    evaluate("deepfm", model, X_test, y_test, t0)

elif which == "dcn":
    from utils.dataset import create_criteo_dataset, features_dict
    from utils.compile_fit import compile_fit
    from model.dcn import DCN
    (X_train, y_train), (X_test, y_test) = create_criteo_dataset('dcn', '../../data/criteo/train_1w.txt', test_size=0.3)
    X_train = np.asarray(X_train, np.float32); X_test = np.asarray(X_test, np.float32)
    fd = features_dict('../../data/criteo/train_1w.txt')
    t0 = time.time()
    model = DCN(fd, [256,128,64], 1, activation="relu", layer_num=6)
    model = manual_fit(model, X_train, y_train)
    evaluate("dcn", model, X_test, y_test, t0)

json.dump(results, open(f"/tmp/refrun/{which}.json", "w"))
