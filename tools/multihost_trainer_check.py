"""Multi-process FULL-Trainer validation (VERDICT r3 #5).

Where ``multihost_smoke.py`` proves one train *step* across processes, this
drives the real train CLI — folds, epochs, plateau scheduler, metrics.csv,
best/last checkpoints — as 2 jax.distributed processes x 4 virtual CPU
devices each, and asserts the artifacts match a single-process run over the
same 8-device global mesh:

* per-fold ``metrics.csv`` equal (same global mesh -> same compiled program
  -> numerically identical epochs; compared exactly by default, with an
  rtol fallback reported);
* best/last checkpoint meta (epoch, measures) equal;
* only process 0 wrote artifacts.

Usage:  python tools/multihost_trainer_check.py [--epochs 3 --folds 2]
"""
import argparse
import csv
import json
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _train_cmd(save, data, epochs, folds, extra=()):
    return [
        sys.executable, "-m",
        "restrictive_hierarchical_semantic_segmentation_tpu.cli.train",
        "--save-path", save, "--data-root", data,
        "--tree-root", os.path.join(HERE, "assets/class_tree_tl.json"),
        "--class-map", os.path.join(HERE, "assets/class_map.csv"),
        "--model-select", "0", "--model-type", "1", "--img-size", "32",
        "--epochs", str(epochs), "--batch-size", "4",
        "--folds", str(folds), "--inc-cross-val", "True",
        "--learning-rate", "[1e-3]", "--seed", "3",
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--folds", type=int, default=2)
    ap.add_argument("--port", type=int, default=45991)
    ap.add_argument("--workdir", default="/tmp/mh_trainer_check")
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

    # --- reference run: ONE process, 8 virtual devices --------------------
    single = os.path.join(wd, "single")
    r = subprocess.run(_train_cmd(single, data, args.epochs, args.folds),
                       env=_env(8), capture_output=True, text=True,
                       timeout=3600)
    assert r.returncode == 0, r.stderr[-3000:]
    print("single-process run OK")

    # --- 2 processes x 4 local devices over jax.distributed ----------------
    multi = os.path.join(wd, "multi")
    coord = f"127.0.0.1:{args.port}"
    procs = []
    logs = []
    for pid in range(2):
        log = open(os.path.join(wd, f"proc{pid}.log"), "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            _train_cmd(multi, data, args.epochs, args.folds, extra=(
                "--dist-coordinator", coord, "--dist-procs", "2",
                "--dist-proc-id", str(pid))),
            env=_env(4), stdout=log, stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=3600) for p in procs]
    for log in logs:
        log.close()
    if any(rcs):
        for pid in range(2):
            with open(os.path.join(wd, f"proc{pid}.log")) as f:
                print(f"--- proc{pid} log tail ---\n", f.read()[-3000:])
        raise SystemExit(f"multi-process run failed: rcs={rcs}")
    print("multi-process run OK")

    # --- compare artifacts --------------------------------------------------
    import numpy as np

    for fold in range(1, args.folds + 1):
        s_csv = read_csv(os.path.join(single, f"fold_{fold}", "metrics.csv"))
        m_csv = read_csv(os.path.join(multi, f"fold_{fold}", "metrics.csv"))
        assert len(s_csv) == len(m_csv) == args.epochs, (
            fold, len(s_csv), len(m_csv))
        exact = s_csv == m_csv
        if not exact:
            for rs, rm in zip(s_csv, m_csv):
                np.testing.assert_allclose(
                    [float(v) for v in rs], [float(v) for v in rm],
                    rtol=1e-5, atol=1e-7,
                    err_msg=f"fold {fold} metrics.csv rows differ")
        print(f"fold {fold}: metrics.csv {'EXACTLY' if exact else 'rtol'} "
              "equal across single vs 2-process runs")
        for which in ("best", "last"):
            sp = os.path.join(single, f"fold_{fold}", f"{which}.ckpt")
            mp = os.path.join(multi, f"fold_{fold}", f"{which}.ckpt")
            assert os.path.exists(mp), f"multi run missing {mp}"
            with open(os.path.join(sp, "rhss_meta.json")) as f:
                sm = json.load(f)
            with open(os.path.join(mp, "rhss_meta.json")) as f:
                mm = json.load(f)
            for k in ("epoch", "test_measure_mean", "loss"):
                sv, mv = sm.get(k), mm.get(k)
                if isinstance(sv, float):
                    np.testing.assert_allclose(sv, mv, rtol=1e-5, atol=1e-7,
                                               err_msg=f"{which}.{k}")
                else:
                    assert sv == mv, (which, k, sv, mv)
        print(f"fold {fold}: best/last checkpoint meta equal")
    print("MULTIHOST TRAINER CHECK: OK")


if __name__ == "__main__":
    main()
