"""Retrain the upcycled selector with a stratified holdout split and save
weights (with their class menu) + an honest accuracy report."""
import json
import sys

import numpy as np

sys.path.insert(0, ".")
from ia_spgemm_tpu.cli.main import enable_compilation_cache
enable_compilation_cache()
from ia_spgemm_tpu.models import upcycle, weights

MENU = ("csr", "dia", "ell", "coo", "bitonic")
samples = upcycle.load_samples("weights/tpu_samples.npz")
rng = np.random.default_rng(0)
by_class = {}
for s in samples:
    by_class.setdefault(s.label, []).append(s)
train, hold = [], []
for lbl, group in by_class.items():
    idx = rng.permutation(len(group))
    n_hold = max(1, len(group) // 5) if len(group) >= 3 else 0
    for t, i in enumerate(idx):
        (hold if t < n_hold else train).append(group[i])
print(f"train={len(train)} hold={len(hold)}", flush=True)

params, history, menu = upcycle.upcycle(
    train, menu=MENU, init_from="Intel", steps=300, batch_size=16)
acc_train = upcycle.evaluate_pick_accuracy(params, train, menu=MENU)
acc_hold = upcycle.evaluate_pick_accuracy(params, hold, menu=MENU)
weights.save_params_npz("weights/TPU_upcycled.npz", params, menu=MENU)
counts = {a: sum(1 for s in samples if s.winner == a) for a in MENU}
report = {
    "menu": list(MENU), "n_samples": len(samples),
    "class_counts": counts,
    "pick_accuracy_train": round(acc_train, 4),
    "pick_accuracy_holdout": round(acc_hold, 4),
    "majority_baseline": round(max(counts.values()) / len(samples), 4),
    "n_train": len(train), "n_holdout": len(hold),
    "train_steps": 300, "init_from": "Intel(warm-start)",
}
with open("weights/upcycle_report.json", "w") as f:
    json.dump(report, f, indent=2)
print(json.dumps(report), flush=True)
