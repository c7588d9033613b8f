"""Multi-process FULL-Trainer validation (VERDICT r3 #5, r4 #5/#6).

Where ``multihost_smoke.py`` proves one train *step* across processes, this
drives the real train CLI — folds, epochs, plateau scheduler, metrics.csv,
best/last checkpoints — as 2 jax.distributed processes x 4 virtual CPU
devices each, and asserts the artifacts match a single-process run over the
same 8-device global mesh. Three phases:

1. **sequential Trainer, training regime (lr 1e-3)** — the two runs execute
   genuinely different compiled programs (local all-reduces vs cross-process
   gloo collectives), so bit-equality ends where AdamW's near-zero-gradient
   sign flips begin (NOTES_ROUND3: param maxdiff ~lr within 2 steps on tiny
   models). ASSERTED: epoch-1 train loss to rtol 1e-4 (the first step's
   forward is identical work), row counts, and best/last checkpoint DECISIONS
   (epochs). Later-epoch VALUES are reported, not asserted — the per-epoch
   drift printed next to each fold is expected training chaos.
2. **sequential Trainer, contraction regime (lr 1e-6)** — with updates ~1e-6
   the trajectories cannot meaningfully separate in 3 epochs, so here VALUES
   are asserted too: every epoch's train loss and the best/last measures to
   rtol 1e-3. This is the value-parity evidence phase 1 cannot honestly give.
3. **fold-parallel trainer** (``--fold-parallel True``) — all folds as one
   vmapped program, fold axis sharded over the mesh: single process x 8
   devices vs 2 processes x 4 devices (each fold's device group lives inside
   one process). Same assertions as phase 1 per fold, plus single-writer
   artifact hygiene.

Usage:  python tools/multihost_trainer_check.py [--epochs 3 --folds 2]
        [--skip-phase 2] [--skip-phase 3 ...]
"""
import argparse
import csv
import json
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _train_cmd(save, data, epochs, folds, lr="1e-3", extra=()):
    return [
        sys.executable, "-m",
        "restrictive_hierarchical_semantic_segmentation_tpu.cli.train",
        "--save-path", save, "--data-root", data,
        "--tree-root", os.path.join(HERE, "assets/class_tree_tl.json"),
        "--class-map", os.path.join(HERE, "assets/class_map.csv"),
        "--model-select", "0", "--model-type", "1", "--img-size", "32",
        "--epochs", str(epochs), "--batch-size", "4",
        "--folds", str(folds), "--inc-cross-val", "True",
        "--learning-rate", f"[{lr}]", "--seed", "3",
        *extra,
    ]


def _env(n_local_devices):
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE
    # in-process config override (cli/train.py): the env var alone does not
    # stop an installed TPU plugin from claiming the backend
    env["RHSS_PLATFORM"] = "cpu"
    env["RHSS_CPU_DEVICES"] = str(n_local_devices)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def read_csv(path):
    with open(path) as f:
        return list(csv.reader(f))


def run_single(save, data, epochs, folds, lr="1e-3", extra=()):
    r = subprocess.run(_train_cmd(save, data, epochs, folds, lr, extra),
                       env=_env(8), capture_output=True, text=True,
                       timeout=3600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]


def run_multi(save, data, epochs, folds, port, workdir, tag,
              lr="1e-3", extra=()):
    coord = f"127.0.0.1:{port}"
    procs, logs = [], []
    for pid in range(2):
        log = open(os.path.join(workdir, f"{tag}_proc{pid}.log"), "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            _train_cmd(save, data, epochs, folds, lr, extra=(
                *extra, "--dist-coordinator", coord, "--dist-procs", "2",
                "--dist-proc-id", str(pid))),
            env=_env(4), stdout=log, stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=3600) for p in procs]
    for log in logs:
        log.close()
    if any(rcs):
        for pid in range(2):
            with open(os.path.join(workdir, f"{tag}_proc{pid}.log")) as f:
                print(f"--- {tag} proc{pid} log tail ---\n", f.read()[-4000:])
        raise SystemExit(f"{tag}: multi-process run failed: rcs={rcs}")


def compare(single, multi, folds, epochs, value_rtol=None):
    """Assert artifact parity. ``value_rtol=None`` = decision parity only
    (epoch-1 loss + best/last epochs asserted; later values REPORTED);
    ``value_rtol=x`` additionally asserts every epoch's train loss and the
    best/last measures to rtol x (contraction-regime value parity)."""
    import numpy as np

    for fold in range(1, folds + 1):
        s_csv = read_csv(os.path.join(single, f"fold_{fold}", "metrics.csv"))
        m_csv = read_csv(os.path.join(multi, f"fold_{fold}", "metrics.csv"))
        # header row + one row per epoch
        assert len(s_csv) == len(m_csv) == epochs + 1, (
            fold, len(s_csv), len(m_csv))
        assert s_csv[0] == m_csv[0], "header rows differ"
        # epoch-1 train loss: the very first optimizer step's forward is
        # identical work in both programs — reduction-order noise only
        s_loss1, m_loss1 = float(s_csv[1][1]), float(m_csv[1][1])
        np.testing.assert_allclose(
            s_loss1, m_loss1, rtol=1e-4,
            err_msg=f"fold {fold} epoch-1 train loss diverges beyond "
                    "fp-reduction noise — suspect batch assembly")
        drift = max(
            abs(float(rs[1]) - float(rm[1]))
            for rs, rm in zip(s_csv[1:], m_csv[1:]))
        if value_rtol is not None:
            for e, (rs, rm) in enumerate(zip(s_csv[1:], m_csv[1:]), 1):
                np.testing.assert_allclose(
                    float(rs[1]), float(rm[1]), rtol=value_rtol,
                    err_msg=f"fold {fold} epoch {e} train loss VALUE "
                            f"diverges in the contraction regime")
            print(f"fold {fold}: ASSERTED all {epochs} epoch train-loss "
                  f"values to rtol {value_rtol:g} (max drift {drift:.2e})")
        else:
            print(f"fold {fold}: ASSERTED epoch-1 loss rtol 1e-4 "
                  f"({s_loss1:.6f} vs {m_loss1:.6f}) + row counts; "
                  f"later-epoch values REPORTED only — max drift {drift:.2e} "
                  f"is training chaos, NOT asserted")
        for which in ("best", "last"):
            sp = os.path.join(single, f"fold_{fold}", f"{which}.ckpt")
            mp = os.path.join(multi, f"fold_{fold}", f"{which}.ckpt")
            assert os.path.exists(mp), f"multi run missing {mp}"
            with open(os.path.join(sp, "rhss_meta.json")) as f:
                sm = json.load(f)
            with open(os.path.join(mp, "rhss_meta.json")) as f:
                mm = json.load(f)
            assert int(sm["epoch"]) == int(mm["epoch"]), (
                which, sm["epoch"], mm["epoch"])
            if value_rtol is not None:
                np.testing.assert_allclose(
                    sm["test_measure_mean"], mm["test_measure_mean"],
                    rtol=value_rtol,
                    err_msg=f"fold {fold} {which} measure VALUE diverges")
            print(f"fold {fold} {which}: DECISION epoch="
                  f"{int(sm['epoch'])} equal in both; measure "
                  f"{sm['test_measure_mean']:.4f} vs "
                  f"{mm['test_measure_mean']:.4f}"
                  + (f" (asserted rtol {value_rtol:g})"
                     if value_rtol is not None else " (reported)"))
    # stray .tmp dirs would mean a second process also tried to write
    for root, dirs, _ in os.walk(multi):
        for d in dirs:
            assert not d.endswith(".tmp"), os.path.join(root, d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--folds", type=int, default=2)
    ap.add_argument("--port", type=int, default=45991)
    ap.add_argument("--workdir", default="/tmp/mh_trainer_check")
    ap.add_argument("--skip-phase", type=int, action="append", default=[])
    args = ap.parse_args()

    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd)
    data = os.path.join(wd, "data")
    sys.path.insert(0, HERE)
    from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (  # noqa: E501
        write_synth_dataset,
    )

    write_synth_dataset(data, 10, size=64, seed=5, folds=args.folds)

    if 1 not in args.skip_phase:
        print("=== phase 1: sequential Trainer, training regime (lr 1e-3) "
              "— decision parity ===")
        single = os.path.join(wd, "single")
        run_single(single, data, args.epochs, args.folds)
        print("single-process run OK")
        multi = os.path.join(wd, "multi")
        run_multi(multi, data, args.epochs, args.folds, args.port, wd, "seq")
        print("multi-process run OK")
        compare(single, multi, args.folds, args.epochs)

    if 2 not in args.skip_phase:
        print("=== phase 2: sequential Trainer, contraction regime "
              "(lr 1e-6) — VALUE parity ===")
        single_lo = os.path.join(wd, "single_lowlr")
        run_single(single_lo, data, args.epochs, args.folds, lr="1e-6")
        multi_lo = os.path.join(wd, "multi_lowlr")
        run_multi(multi_lo, data, args.epochs, args.folds, args.port + 1,
                  wd, "seq_lowlr", lr="1e-6")
        compare(single_lo, multi_lo, args.folds, args.epochs,
                value_rtol=1e-3)

    if 3 not in args.skip_phase:
        print("=== phase 3: FOLD-PARALLEL trainer (one vmapped program, "
              "fold axis over the mesh) ===")
        fp = ("--fold-parallel", "True")
        single_fp = os.path.join(wd, "single_fp")
        run_single(single_fp, data, args.epochs, args.folds, extra=fp)
        print("single-process fold-parallel run OK")
        multi_fp = os.path.join(wd, "multi_fp")
        run_multi(multi_fp, data, args.epochs, args.folds, args.port + 2,
                  wd, "foldpar", extra=fp)
        print("multi-process fold-parallel run OK")
        compare(single_fp, multi_fp, args.folds, args.epochs)

    print("MULTIHOST TRAINER CHECK: OK — 'OK' here means the assertions "
          "printed above (decision parity in chaotic regimes, value parity "
          "at rtol 1e-3 in the lr=1e-6 contraction regime), not bitwise "
          "value parity of full training trajectories.")


if __name__ == "__main__":
    main()
