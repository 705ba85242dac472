"""Harvest TPU timings over a structured matrix corpus, retrain MatNet on
the framework's own algorithm menu, and record pick accuracy.

This is the end-to-end "upcycle" the BASELINE.md north star asks for: the
reference ships only pretrained weights for its MKL/CSR/DIA/ELL/COO menu;
here the labels come from measured winners on THIS hardware over THIS
menu (including the bitonic flagship kernel).

Outputs (under weights/):
  tpu_samples.npz    — harvested (img1, img2, feats, winner) dataset
  TPU_upcycled.npz   — retrained MatNet parameters (len(MENU) classes)
  upcycle_report.json — corpus, per-class counts, pick accuracy

Usage:  python scripts/upcycle_tpu.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# TPU algorithms only: the host scipy baseline stays in reports but is not
# a deployable TPU choice, and under the dev tunnel's ~26ms dispatch
# overhead it degenerately wins every small case. Five classes — the same
# count as the reference's menu, so its shipped weights can warm-start.
MENU = ("csr", "dia", "ell", "coo", "bitonic")


def corpus(quick: bool):
    from ia_spgemm_tpu.io import mmio, suitesparse

    sizes = (1024,) if quick else (4096, 16384, 32768)
    seeds = (0, 1) if quick else (0, 1, 2, 3, 4, 5)
    for m in sizes:
        for name, a in suitesparse.synthetic_suite(m=m, seeds=seeds):
            yield name, a
    if not quick:
        # the headline structure class: band + random off-band entries
        from bench import build_matrix
        for m in (16384, 32768):
            for seed in seeds:
                yield (f"bandrand_{m}_{seed}",
                       build_matrix(m=m, band=2 + seed, extra_per_row=8,
                                    seed=seed))
    # the 9 reference fixture matrices (tiny; exercise symmetric/pattern)
    for name, path in sorted(suitesparse.local_collection().items()):
        try:
            A = mmio.read_mtx_to_csr(path)
        except Exception:
            continue
        if A.nrows == A.ncols:
            yield f"ref_{name}", A.to_scipy()


def main():
    quick = "--quick" in sys.argv
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    enable_compilation_cache()
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.models import upcycle, weights

    os.makedirs("weights", exist_ok=True)
    # resume: skip matrices already harvested (incremental checkpoint)
    samples = []
    done = set()
    ckpt = "weights/tpu_samples.npz"
    if os.path.exists(ckpt):
        try:
            samples = upcycle.load_samples(ckpt)
            done = {s.matrix_name for s in samples}
            print(f"resuming with {len(samples)} saved samples", flush=True)
        except Exception:
            samples, done = [], set()
    t_start = time.time()
    for name, a in corpus(quick):
        if name in done:
            continue
        A = CSR.from_scipy(a.tocsr().astype(np.float32))
        t0 = time.time()
        try:
            s = upcycle.harvest_sample(A, A, menu=MENU, name=name, iters=2)
        except Exception as e:  # noqa: BLE001 — skip broken cases, keep going
            print(f"{name}: harvest failed: {e}", flush=True)
            continue
        if s is None:
            print(f"{name}: no winner", flush=True)
            continue
        samples.append(s)
        upcycle.save_samples(ckpt, samples)   # checkpoint every matrix
        print(f"{name}: winner={s.winner} ({time.time() - t0:.1f}s)",
              flush=True)
    counts = {algo: sum(1 for s in samples if s.winner == algo)
              for algo in MENU}
    print("harvest done:", len(samples), "samples", counts, flush=True)

    steps = 120 if quick else 400
    params, history, menu = upcycle.upcycle(
        samples, menu=MENU, init_from="Intel", steps=steps, batch_size=16)
    acc = upcycle.evaluate_pick_accuracy(params, samples, menu=MENU)
    weights.save_params_npz("weights/TPU_upcycled.npz", params, menu=MENU)

    report = {
        "menu": list(MENU),
        "n_samples": len(samples),
        "class_counts": counts,
        "pick_accuracy_in_sample": round(acc, 4),
        "majority_baseline": round(max(counts.values())
                                   / max(len(samples), 1), 4),
        "train_steps": steps,
        "harvest_seconds": round(time.time() - t_start, 1),
    }
    with open("weights/upcycle_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
