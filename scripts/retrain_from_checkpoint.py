"""Retrain + evaluate the selector from a saved harvest checkpoint,
without touching the TPU (MatNet is small enough to train on CPU in
minutes) — lets training run while the chip harvests or benchmarks.

Usage: python scripts/retrain_from_checkpoint.py [samples.npz]
"""

from __future__ import annotations

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

MENU_V1 = ("csr", "dia", "ell", "coo", "bitonic")


def main():
    from ia_spgemm_tpu.models import upcycle, weights

    if len(sys.argv) > 1:
        path = sys.argv[1]
    elif os.path.exists("weights/tpu_samples_v2.npz"):
        path = "weights/tpu_samples_v2.npz"
    else:
        path = "weights/tpu_samples.npz"
    # round-3 checkpoints record the menu their labels index; the round-2
    # checkpoint predates that and used MENU_V1
    MENU = tuple(upcycle.load_samples_menu(path) or MENU_V1)
    print(f"checkpoint {path} menu={MENU}", flush=True)
    samples = upcycle.load_samples(path)
    # --menu a,b,c: RELABEL the stored per-algorithm times against a
    # winnowed menu (VERDICT r4 #1: a class that provably never wins —
    # hash in r4, dia in the r5 device-time harvest — does not belong in
    # the selector; the v3 checkpoint stores times so menu changes are
    # offline)
    if "--menu" in sys.argv:
        MENU = tuple(sys.argv[sys.argv.index("--menu") + 1].split(","))
        samples = upcycle.relabel(samples, MENU)
        print(f"relabeled to menu={MENU}: {len(samples)} samples",
              flush=True)
    counts = {algo: sum(1 for s in samples if s.winner == algo)
              for algo in MENU}
    print(f"{len(samples)} samples {counts}", flush=True)

    # v2 checkpoints write version-suffixed artifacts until the corpus
    # is mature: the SHIPPED weights/TPU_upcycled.npz + upcycle_report
    # hold the v1 181-sample evidence (k-fold 0.80 vs 0.60 majority) and
    # must not be clobbered by a partial harvest. Promote explicitly
    # (--promote) once the v2 corpus covers its menu.
    promote = "--promote" in sys.argv
    if promote or path.endswith("tpu_samples.npz"):
        suf = ""
    else:  # version-suffixed artifacts: tpu_samples_v3.npz -> _v3
        stem = os.path.splitext(os.path.basename(path))[0]
        suf = "_" + stem.rsplit("_", 1)[-1] if "_v" in stem else "_v2"

    params, _, _ = upcycle.upcycle(samples, menu=MENU, init_from="Intel",
                                   steps=400, batch_size=16)
    acc = upcycle.evaluate_pick_accuracy(params, samples, menu=MENU)
    weights.save_params_npz(f"weights/TPU_upcycled{suf}.npz", params,
                            menu=MENU)
    print(f"in-sample accuracy {acc:.4f}", flush=True)

    kfold_acc, folds, majority = upcycle.stratified_kfold_accuracy(
        samples, menu=MENU, k=5, steps=400)
    report = {
        "menu": list(MENU),
        "n_samples": len(samples),
        "class_counts": counts,
        "min_class_count": min(counts.values()),
        "pick_accuracy_in_sample": round(acc, 4),
        "kfold_accuracy": round(kfold_acc, 4),
        "kfold_per_fold": folds,
        "majority_baseline": round(majority, 4),
        "train_steps": 400,
    }
    with open(f"weights/upcycle_report{suf}.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
