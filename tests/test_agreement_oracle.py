"""Agreement CLI vs the ACTUAL reference AgreementModule.py (VERDICT r3 #6).

Runs ``/root/reference/AgreementModule.py`` as a subprocess on a synthetic
prediction/OFR fixture tree and diffs its printed validity-table values
(Agreement / FP% / FN% per modality, full float precision) against
``cli.agreement.run_agreement``'s report dict.

The reference imports skimage (absent in this environment), so the subprocess
runs with a minimal shim on PYTHONPATH providing exactly the two symbols the
active code path uses, with skimage-faithful semantics:

* ``io.imread`` — PIL decode; ``as_gray`` leaves 2-D images untouched
  (skimage doc: images already in gray-scale are not converted);
* ``transform.resize(img, shape, anti_aliasing=False)`` — img_as_float
  (uint8/255) then center-aligned bilinear via scipy map_coordinates
  order=1, mode='mirror' (skimage warp's (i+0.5)*scale-0.5 coordinates with
  skimage's default mode='reflect' == np.pad reflect == scipy 'mirror' —
  edge NOT repeated; matters on upscale where border coords go out of range).

The fixture exercises: casefold slot ordering, Td/Rd series split, per-patient
substring filtering, the 'ofr'-prediction exclusion, the equal-shape path
(patient 3), the DOWNSCALE resize path (patient 5, gt 96x80 vs pred 64x64 —
all coords in range), the UPSCALE resize path (patient 7, gt 48x40 vs pred
64x64 — border band sampled, exercising the mirror-border semantics), and the
fn==fp==0 quirk (one identical pred/gt pair).
"""
import os
import re
import subprocess
import sys
import textwrap

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REF = "/root/reference/AgreementModule.py"

# prediction modality tokens: 15 validity slots + the excluded OFR file
PRED_MODS = ["AP12A", "AP12P", "AP40A", "AP40P", "AP100A", "AP100P",
             "AP200A", "AP200P", "ISO100", "ISO200", "ISO300", "ISO400",
             "OFC40", "TSCAN100A", "TSCAN100B", "OFR200"]

SHIM = textwrap.dedent(
    '''
    """skimage shim for running the reference AgreementModule (io + transform
    only, faithful to the symbols its active code path touches)."""
    '''
)

SHIM_IO = textwrap.dedent(
    """
    import numpy as np
    from PIL import Image

    def imread(path, as_gray=False):
        arr = np.asarray(Image.open(path))
        if as_gray and arr.ndim == 3:
            arr = (arr[..., :3] @ np.array([0.2125, 0.7154, 0.0721])) / 255.0
        return arr

    def imshow(*a, **k):
        raise NotImplementedError
    """
)

SHIM_TRANSFORM = textwrap.dedent(
    """
    import numpy as np
    from scipy.ndimage import map_coordinates

    def resize(image, output_shape, anti_aliasing=None, **kw):
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float64) / 255.0
        oh, ow = int(output_shape[0]), int(output_shape[1])
        ih, iw = img.shape[:2]
        ys = (np.arange(oh) + 0.5) * (ih / oh) - 0.5
        xs = (np.arange(ow) + 0.5) * (iw / ow) - 0.5
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        return map_coordinates(img, [yy, xx], order=1, mode="mirror")
    """
)


def _blob(rng, h, w, full=False):
    m = np.zeros((h, w), np.uint8)
    if full:
        m[:] = 255
        return m
    for _ in range(rng.integers(1, 4)):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        ry, rx = rng.integers(4, h // 3), rng.integers(4, w // 3)
        yy, xx = np.ogrid[:h, :w]
        m[((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0] = 255
    return m


def _write_fixture(root):
    pred_dir = os.path.join(root, "preds")
    gt_dir = os.path.join(root, "gt")
    os.makedirs(pred_dir), os.makedirs(gt_dir)
    rng = np.random.default_rng(42)
    # patient 3: gt 64x64 (equal-shape); patient 5: gt 96x80 (downscale);
    # patient 7: gt 48x40 (UPSCALE -> border band sampled out of range)
    for pat, gt_shape in (("3", (64, 64)), ("5", (96, 80)), ("7", (48, 40))):
        for series in ("Td", "Rd"):
            gt = _blob(rng, *gt_shape)
            cv2.imwrite(os.path.join(gt_dir, f"z{pat}{series}-OFR200.png"), gt)
            for mod in PRED_MODS:
                if pat == "3" and series == "Td" and mod == "AP12A":
                    # identical-mask quirk: pred == gt -> fn==fp==0 -> agr 0
                    pm = gt.copy()
                else:
                    pm = _blob(rng, 64, 64)
                cv2.imwrite(
                    os.path.join(pred_dir, f"z{pat}{series}-{mod}.png"), pm)
    return pred_dir, gt_dir


def _parse_reference_stdout(out):
    """{'agreement'|'fp'|'fn': {MODALITY: mean_float}} from the printed
    tables (first full-precision occurrence per section; 'ROUND' re-prints
    are %.3f-formatted and skipped by first-wins)."""
    sections = {"Agreement": "agreement", "FP %": "fp", "FN %": "fn"}
    cur, vals = None, {"agreement": {}, "fp": {}, "fn": {}}
    for line in out.splitlines():
        m = re.match(r"###### (.+?) ######", line.strip())
        if m:
            cur = sections.get(m.group(1))
            continue
        if cur is None:
            continue
        m = re.match(r"([A-Z0-9]+):\s+([-\d.eE]+)\s", line.strip() + " ")
        if m and m.group(1) not in vals[cur]:
            try:
                vals[cur][m.group(1)] = float(m.group(2))
            except ValueError:
                pass
    return vals


@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference repo not mounted")
def test_agreement_matches_reference_module(tmp_path):
    pred_dir, gt_dir = _write_fixture(str(tmp_path))

    shim = tmp_path / "shim" / "skimage"
    shim.mkdir(parents=True)
    (shim / "__init__.py").write_text(SHIM)
    (shim / "io.py").write_text(SHIM_IO)
    (shim / "transform.py").write_text(SHIM_TRANSFORM)

    env = dict(os.environ)
    env["PYTHONPATH"] = str(tmp_path / "shim")
    env["MPLBACKEND"] = "Agg"
    proc = subprocess.run(
        [sys.executable, REF, "--mask-root", pred_dir,
         "--ofr-gt-masks", gt_dir, "--list-of-ofr", "['OFR200']",
         "--ap-only", "False"],
        capture_output=True, text=True, env=env, timeout=300,
        cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-2000:]
    ref = _parse_reference_stdout(proc.stdout)
    assert ref["agreement"], proc.stdout[-2000:]

    from restrictive_hierarchical_semantic_segmentation_tpu.cli.agreement import (
        run_agreement,
    )

    rep = run_agreement(pred_dir, gt_dir, ["OFR200"], ap_only=False)
    ours = rep["OFR200"]
    # our report keys: 'agreement', 'fn' (printed under FP%, the reference's
    # deliberate swap at AgreementModule.py:355), 'fp' (printed under FN%)
    key_map = {"agreement": "agreement", "fp": "fn", "fn": "fp"}
    checked = 0
    for section, ours_key in key_map.items():
        for mod, ref_mean in ref[section].items():
            assert mod in ours[ours_key], (section, mod, ours[ours_key].keys())
            np.testing.assert_allclose(
                ours[ours_key][mod][0], ref_mean, rtol=1e-9,
                err_msg=f"{section}/{mod}")
            checked += 1
    # full table: 3 sections x 10 modalities
    assert checked == 30, checked


@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference repo not mounted")
def test_agreement_matches_reference_ap_only(tmp_path):
    """--ap-only True path: reference skips ISO/OFC/TSCAN appends entirely."""
    pred_dir, gt_dir = _write_fixture(str(tmp_path))
    shim = tmp_path / "shim" / "skimage"
    shim.mkdir(parents=True)
    (shim / "__init__.py").write_text(SHIM)
    (shim / "io.py").write_text(SHIM_IO)
    (shim / "transform.py").write_text(SHIM_TRANSFORM)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(tmp_path / "shim")
    env["MPLBACKEND"] = "Agg"
    proc = subprocess.run(
        [sys.executable, REF, "--mask-root", pred_dir,
         "--ofr-gt-masks", gt_dir, "--list-of-ofr", "['OFR200']",
         "--ap-only", "True"],
        capture_output=True, text=True, env=env, timeout=300,
        cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-2000:]
    ref = _parse_reference_stdout(proc.stdout)

    from restrictive_hierarchical_semantic_segmentation_tpu.cli.agreement import (
        run_agreement,
    )

    ours = run_agreement(pred_dir, gt_dir, ["OFR200"], ap_only=True)["OFR200"]
    assert set(ref["agreement"]) == {"AP12", "AP40", "AP100", "AP200"}
    for mod, ref_mean in ref["agreement"].items():
        np.testing.assert_allclose(ours["agreement"][mod][0], ref_mean,
                                   rtol=1e-9, err_msg=mod)
