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

The driver is PROCESS-ISOLATED per matrix: the parent pins itself to the
CPU backend (never claims the single-tenant TPU) and harvests each matrix
in its own subprocess/process group, killed by exact pgid on timeout —
the reference's pthread_cancel watchdog (main.cpp:770-775) at matrix
granularity. A pathological matrix (or a wedged device claim) costs one
timeout, not the harvest. Internal flags: --worker NAME --out FILE.
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
#
# Round 3 (NOTES 5b): STRATEGY-DISTINCT classes. After the tiled csr
# route landed, 'csr' and 'bitonic' became near-ties (both run the
# width-class Pallas sorters when viable), as did 'coo'/'csr' in round 2
# — label noise, not signal. The menu names one representative per
# accumulation strategy.
#
# Round 5 (VERDICT r4 #1): 'hash' dropped — reports/hash_win.json proves
# it cannot win even in its engineered best-case regime (3.90 s vs ESC's
# 1.02 s, ~46 ns/insert scalar probing), so it occupied a permanently
# empty class. Its slot goes to 'dense' (full MXU densify), the natural
# winner for small/dense inputs where every sort pipeline is overhead.
# v3 classes: tiled width-class sort (bitonic), slab/global ESC (esc),
# diagonal algebra (dia), ELL x dense-B MXU accumulation (dense_row),
# full dense MXU (dense).
MENU = ("bitonic", "esc", "dia", "dense_row", "dense")
# (Prior menus live where they're read back:
# retrain_from_checkpoint.MENU_V1; the v2 checkpoint records its own.)


def corpus(quick: bool):
    """Yields (name, A, B_or_None); B=None means the A@A default
    (README.md:10). v4 adds two-matrix pairs (the CPU driver's real
    signature, main.cpp:97-101), B=A^T (the GPU driver's workload,
    main.cu:260-269), more seeds, and structure classes aimed at the
    winner classes the v3 harvest left empty (dia/csr)."""
    import scipy.sparse as sp

    from ia_spgemm_tpu.io import mmio, suitesparse

    sizes = (1024,) if quick else (4096, 16384, 32768)
    seeds = (0, 1) if quick else (0, 1, 2, 3, 4, 5)
    for m in sizes:
        for name, a in suitesparse.synthetic_suite(m=m, seeds=seeds):
            yield name, a, None
    if not quick:
        # the headline structure class: band + random off-band entries
        from bench import build_matrix
        for m in (16384, 32768):
            for seed in seeds:
                yield (f"bandrand_{m}_{seed}",
                       build_matrix(m=m, band=2 + seed, extra_per_row=8,
                                    seed=seed), None)
        # --- v4 ---
        for m in sizes:
            for name, a in suitesparse.synthetic_suite(m=m,
                                                       seeds=(6, 7, 8)):
                yield name, a, None
        # mixed-structure (A, B) pairs
        g = suitesparse
        for m in (4096, 16384):
            for seed in (0, 1, 2):
                yield (f"pair_band_uni_{m}_{seed}",
                       g.gen_banded(m, 2 + seed, seed),
                       g.gen_uniform(m, nnz_per_row=6 + seed, seed=seed))
                yield (f"pair_uni_pow_{m}_{seed}",
                       g.gen_uniform(m, nnz_per_row=6 + seed, seed=seed),
                       g.gen_powerlaw(m, seed=seed))
                yield (f"pair_pow_band_{m}_{seed}",
                       g.gen_powerlaw(m, seed=seed),
                       g.gen_banded(m, 2 + seed, seed))
        # B = A^T (GPU driver workload)
        for m in (16384, 32768):
            for seed in (0, 1, 2):
                a = build_matrix(m=m, band=2 + seed, extra_per_row=8,
                                 seed=seed)
                yield f"transpose_{m}_{seed}", a, a.T.tocsr()
        # wide pure bands / scattered diagonals (DIA-algebra territory)
        for m in (4096, 16384):
            for seed in (0, 1):
                yield (f"wideband_{m}_{seed}",
                       g.gen_banded(m, bandwidth=12 + 4 * seed, seed=seed),
                       None)
                rng = __import__("numpy").random.default_rng(seed)
                offs = sorted({0, 1, -1, 63, -63, 128 + seed, -(128 + seed),
                               511, -511})
                diags = [rng.standard_normal(m) for _ in offs]
                yield (f"scatdiag_{m}_{seed}",
                       sp.diags(diags, offs, shape=(m, m)).tocsr(), None)
        # heavy-skew rows (bitonic non-viable; ESC/csr territory)
        for m in (8192, 16384):
            for seed in (0, 1):
                yield (f"heavyskew_{m}_{seed}",
                       g.gen_powerlaw(m, mean_nnz=64, alpha=1.1, seed=seed),
                       None)
        # --- v5 (round 2): class coverage for dia/csr + scale ---
        # scattered-diagonal families (DIA-algebra territory): varied
        # diagonal counts, offsets and sizes
        for m in (4096, 8192, 16384):
            for seed in (2, 3, 4, 5):
                rng = np.random.default_rng(100 + seed)
                nd = 7 + 4 * seed
                offs = sorted(set(
                    [0] + list(rng.integers(-m // 4, m // 4, nd))))
                diags = [rng.standard_normal(m) for _ in offs]
                yield (f"scatdiag5_{m}_{seed}",
                       sp.diags(diags, offs, shape=(m, m)).tocsr(), None)
        # huge-row skew beyond the width-class lane budget: the ESC
        # (csr/coo) engines are the only viable path
        for m in (8192, 16384):
            for seed in (0, 1, 2):
                rng = np.random.default_rng(200 + seed)
                lens = rng.integers(2, 10, m)
                lens[rng.integers(0, m, 3)] = 6000
                rows = np.repeat(np.arange(m), lens)
                cols = rng.integers(0, m, rows.shape[0])
                yield (f"hugerow_{m}_{seed}", sp.coo_matrix(
                    (rng.standard_normal(rows.shape[0]), (rows, cols)),
                    shape=(m, m)).tocsr(), None)
        # large-expansion uniforms (bitonic product-budget territory)
        for m in (32768, 65536):
            for seed in (0, 1):
                yield (f"largeE_{m}_{seed}",
                       g.gen_uniform(m, nnz_per_row=40 + 16 * seed,
                                     seed=seed), None)
        # moderate B-skew pairs (ragged-fragment territory)
        for m in (8192, 16384):
            for seed in (0, 1):
                rng = np.random.default_rng(300 + seed)
                lens = np.where(rng.random(m) < 0.004, 300,
                                rng.integers(4, 16, m))
                rows = np.repeat(np.arange(m), lens)
                cols = rng.integers(0, m, rows.shape[0])
                yield (f"bskew_{m}_{seed}", sp.coo_matrix(
                    (rng.standard_normal(rows.shape[0]), (rows, cols)),
                    shape=(m, m)).tocsr(), None)
        # extra seeds of the structure suite
        for m in sizes:
            for name, a in suitesparse.synthetic_suite(m=m,
                                                       seeds=(9, 10, 11)):
                yield name, a, None
        # dia-favoring pairs: band x scattered diagonals
        for m in (4096, 8192):
            for seed in (0, 1):
                rng = np.random.default_rng(400 + seed)
                offs = sorted(set([0] + list(rng.integers(-64, 64, 8))))
                diags = [rng.standard_normal(m) for _ in offs]
                yield (f"pair_band_scat_{m}_{seed}",
                       g.gen_banded(m, 3 + seed, seed),
                       sp.diags(diags, offs, shape=(m, m)).tocsr())
        # --- v5b: dense wide bands (dia-algebra's home turf: nd^2 FMAs
        # per row vs a pow2(nd * run)-wide sort) + extra huge-row cases
        for m in (4096, 8192, 16384):
            for bw in (32, 48):
                for seed in (0, 1):
                    yield (f"denseband_{m}_{bw}_{seed}",
                           g.gen_banded(m, bandwidth=bw, seed=seed), None)
        for m in (8192, 16384):
            for seed in (3, 4):
                rng = np.random.default_rng(200 + seed)
                lens = rng.integers(2, 10, m)
                lens[rng.integers(0, m, 3)] = 6000
                rows = np.repeat(np.arange(m), lens)
                cols = rng.integers(0, m, rows.shape[0])
                yield (f"hugerow_{m}_{seed}", sp.coo_matrix(
                    (rng.standard_normal(rows.shape[0]), (rows, cols)),
                    shape=(m, m)).tocsr(), None)
        # --- v6 (round 5, menu v3) ---
        # dense-class niche: small but dense inputs where a single MXU
        # matmul beats every sort pipeline (density 3-12%)
        for m in (1024, 2048, 4096):
            for div in (8, 16, 32):
                for seed in (0, 1):
                    if m // div < 8:
                        continue
                    yield (f"smalldense_{m}_{div}_{seed}",
                           g.gen_uniform(m, nnz_per_row=m // div,
                                         seed=seed), None)
        # dense_row niche: SpMM-shaped pairs — sparse A, dense-ish B
        # (C densifies; the ELL x dense-B MXU route's home turf)
        for m in (2048, 4096, 8192):
            for seed in (0, 1):
                yield (f"pair_sp_dense_{m}_{seed}",
                       g.gen_uniform(m, nnz_per_row=6 + seed, seed=seed),
                       g.gen_uniform(m, nnz_per_row=max(8, m // 12),
                                     seed=seed + 1))
        # named SuiteSparse structure replicas (VERDICT r4 #9): the
        # mid-size subset whose A@A expansion fits the 900 s worker
        # budget; heavyweights (pwtk/hood/web-*/consph/cant) are bench
        # workloads, not harvest samples
        for nm in ("poisson3Da", "m133-b3", "mac_econ_fwd500", "scircuit",
                   "cage12", "2cubes_sphere", "mc2depi", "majorbasis",
                   "mario002", "filter3D", "cop20k_A", "patents_main",
                   "offshore", "rma10", "shipsec1"):
            for seed in (0, 1):
                yield (f"named_{nm}_{seed}",
                       suitesparse.gen_named(nm, seed=seed), None)
    # the 9 reference fixture matrices (tiny; exercise symmetric/pattern)
    for name, path in sorted(suitesparse.local_collection().items()):
        try:
            A = mmio.read_mtx_to_csr(path)
        except Exception:
            continue
        if A.nrows == A.ncols:
            yield f"ref_{name}", A.to_scipy(), None


WORKER_TIMEOUT_S = float(os.environ.get("IA_HARVEST_TIMEOUT", "900"))


def worker_main(name: str, out: str, quick: bool) -> None:
    """Harvest ONE matrix (runs on the TPU in its own process group)."""
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    enable_compilation_cache()
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.models import upcycle

    for nm, a, b in corpus(quick):
        if nm != name:
            continue
        A = CSR.from_scipy(a.tocsr().astype(np.float32))
        B = A if b is None else CSR.from_scipy(b.tocsr().astype(np.float32))
        s = upcycle.harvest_sample(
            A, B, menu=MENU, name=name, iters=2,
            progress=lambda alg: print(f"  [{name}] {alg}", flush=True))
        if s is not None:
            upcycle.save_samples(out, [s], menu=MENU)
        return
    print(f"{name}: not in corpus", flush=True)
    sys.exit(3)


def _probe_tpu_recovered(max_wait_s: float = 1500.0) -> bool:
    """After a pgid kill mid-claim, the single-tenant device claim can
    stay wedged for ~10-20 min; poll with a trivial device op until a
    fresh process can claim again."""
    import signal
    import subprocess
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        p = subprocess.Popen(
            [sys.executable, "-c",
             "import jax; jax.numpy.zeros(8).block_until_ready()"],
            env=env, start_new_session=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        try:
            if p.wait(timeout=60) == 0:
                return True
        except subprocess.TimeoutExpired:
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
        time.sleep(30)
    return False


def main():
    argv = sys.argv[1:]
    quick = "--quick" in argv
    if "--worker" in argv:
        worker_main(argv[argv.index("--worker") + 1],
                    argv[argv.index("--out") + 1], quick)
        return
    # --max-seconds S: stop launching new matrices once the budget is
    # spent (the per-matrix checkpoint makes the harvest resumable, so a
    # bounded slice of chip time is still pure progress).
    # --harvest-only: skip the in-script retrain (use
    # scripts/retrain_from_checkpoint.py on the checkpoint instead).
    max_seconds = float("inf")
    if "--max-seconds" in argv:
        max_seconds = float(argv[argv.index("--max-seconds") + 1])
    harvest_only = "--harvest-only" in argv
    # --first p1,p2,...: harvest matrices whose names start with these
    # prefixes BEFORE the rest of the corpus. Ordering is resume-safe
    # (the checkpoint keys on names); used to front-load the class-niche
    # families (dia/dense/dense_row/named replicas) so a time-bounded
    # slice feeds the starved selector classes instead of piling more
    # esc/bitonic labels (VERDICT r4 #1: every class >= 10 samples).
    first_prefixes = ()
    if "--first" in argv:
        first_prefixes = tuple(
            p for p in argv[argv.index("--first") + 1].split(",") if p)

    # Parent: CPU backend only — the worker owns the single TPU claim.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import signal
    import subprocess

    from ia_spgemm_tpu.models import upcycle, weights

    os.makedirs("weights", exist_ok=True)
    # resume: skip matrices already harvested (incremental checkpoint)
    samples = []
    done = set()
    # v3: device-time labels + per-algorithm times stored in each sample
    # (so future menu changes RELABEL offline instead of re-harvesting).
    # Neither earlier checkpoint is reusable: v1/v2 stored winner-only
    # labels, and v2's wall-time labels were measured to be tunnel-RTT
    # noise (kfold 0.588 < 0.661 majority, upcycle_report_v2.json).
    ckpt = "weights/tpu_samples_v3.npz"
    if os.path.exists(ckpt):
        # do NOT silently restart on a bad checkpoint — that throws away
        # hours of chip time. A non-finite-features ValueError names the
        # poisoned samples; repair or delete the checkpoint explicitly.
        samples = upcycle.load_samples(ckpt)
        done = {s.matrix_name for s in samples}
        print(f"resuming with {len(samples)} saved samples", flush=True)
    # no-winner/failed matrices are also checkpointed (names only) so a
    # resumed slice doesn't re-burn ~10 min re-failing the same inputs
    nowin_path = "weights/.harvest_nowinner.json"
    try:
        with open(nowin_path) as f:
            nowinner = set(json.load(f))
    except (OSError, ValueError):
        nowinner = set()
    done |= nowinner

    def mark_nowinner(nm):
        nowinner.add(nm)
        with open(nowin_path, "w") as f:
            json.dump(sorted(nowinner), f)
    t_start = time.time()
    child_env = {k: v for k, v in os.environ.items()
                 if k != "JAX_PLATFORMS"}
    tmp_out = "weights/.harvest_one.npz"
    if not _probe_tpu_recovered(max_wait_s=600.0):
        print("TPU claim not available; aborting harvest", flush=True)
        return

    def ordered():
        if first_prefixes:
            for item in corpus(quick):
                if item[0].startswith(first_prefixes):
                    yield item
        for item in corpus(quick):
            if not item[0].startswith(first_prefixes):
                yield item

    for name, _a, _b in ordered():
        if time.time() - t_start > max_seconds:
            print(f"--max-seconds {max_seconds:.0f} budget spent; "
                  f"stopping with {len(samples)} samples", flush=True)
            break
        if name in done:
            continue
        done.add(name)  # corpus can repeat fixture names; harvest once
        if os.path.exists(tmp_out):
            os.remove(tmp_out)
        t0 = time.time()
        cmd = [sys.executable, os.path.abspath(__file__),
               "--worker", name, "--out", tmp_out]
        if quick:
            cmd.append("--quick")
        p = subprocess.Popen(cmd, env=child_env, start_new_session=True)
        try:
            rc = p.wait(timeout=WORKER_TIMEOUT_S)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            p.wait()
            print(f"{name}: TIMEOUT after {WORKER_TIMEOUT_S:.0f}s (killed);"
                  " waiting for the device claim to clear", flush=True)
            if not _probe_tpu_recovered():
                print("device claim did not recover; aborting harvest",
                      flush=True)
                break
            continue
        if rc != 0:
            print(f"{name}: worker failed rc={rc}", flush=True)
            mark_nowinner(name)
            continue
        if not os.path.exists(tmp_out):
            print(f"{name}: no winner", flush=True)
            mark_nowinner(name)
            continue
        try:
            samples.extend(upcycle.load_samples(tmp_out))
        finally:
            os.remove(tmp_out)
        upcycle.save_samples(ckpt, samples, menu=MENU)  # ckpt every matrix
        print(f"{name}: winner={samples[-1].winner} "
              f"({time.time() - t0:.1f}s)", flush=True)
    counts = {algo: sum(1 for s in samples if s.winner == algo)
              for algo in MENU}
    print("harvest done:", len(samples), "samples", counts, flush=True)
    if harvest_only:
        return

    steps = 120 if quick else 400
    params, history, menu = upcycle.upcycle(
        samples, menu=MENU, init_from="Intel", steps=steps, batch_size=16)
    acc = upcycle.evaluate_pick_accuracy(params, samples, menu=MENU)
    weights.save_params_npz("weights/TPU_upcycled.npz", params, menu=MENU)
    kfold_acc, kfold_folds, majority = upcycle.stratified_kfold_accuracy(
        samples, menu=MENU, k=3 if quick else 5,
        steps=steps if not quick else 60)

    report = {
        "menu": list(MENU),
        "n_samples": len(samples),
        "class_counts": counts,
        "min_class_count": min(counts.values()),
        "pick_accuracy_in_sample": round(acc, 4),
        "kfold_accuracy": round(kfold_acc, 4),
        "kfold_per_fold": kfold_folds,
        "majority_baseline": round(majority, 4),
        "train_steps": steps,
        "harvest_seconds": round(time.time() - t_start, 1),
    }
    with open("weights/upcycle_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
