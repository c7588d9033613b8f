"""Build a TL-pano-scale synthetic dataset in PROPER 5-fold cross-validation
layout: ONE pool of N images (default 194, the real dataset's size —
reference README.md:10), split so each image is in exactly one fold's val
set and in the other folds' train sets (the reference's root/fold_N/{train,
val} layout, train.py:796-803).

``data/synthetic.write_synth_dataset`` draws fresh images per fold (fine for
smoke tests); the full-recipe accuracy table (VERDICT r2 "Next round" #2)
needs real CV statistics — fold variance from the SPLIT, not from different
data.

Usage:
    python tools/make_synth_tlpano.py --out /tmp/tlpano_synth \
        [--n 194] [--size 620] [--folds 5] [--seed 0]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2  # noqa: E402
import numpy as np  # noqa: E402

from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (  # noqa: E402
    synth_sample,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=194)
    ap.add_argument("--size", type=int, default=620)
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--easy", action="store_true",
                    help="disable hard mode (hard mode — the default here — "
                         "adds tooth-interior-lookalike distractor blobs "
                         "outside the tooth classes + per-image luminance "
                         "jitter, so fine-class appearance is ambiguous "
                         "without parent context; that is the failure mode "
                         "the restrictive hierarchy suppresses, i.e. the "
                         "capability the accuracy table is meant to probe)")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    pool = [synth_sample(rng, args.size, hard=not args.easy)
            for _ in range(args.n)]
    perm = rng.permutation(args.n)
    fold_of = np.empty(args.n, np.int64)
    for rank, idx in enumerate(perm):
        fold_of[idx] = rank % args.folds  # balanced val assignment

    def link_or_write(d, i, img, mask):
        os.makedirs(os.path.join(d, "images"), exist_ok=True)
        os.makedirs(os.path.join(d, "labels"), exist_ok=True)
        cv2.imwrite(os.path.join(d, "images", f"{i:04d}.png"), img)
        cv2.imwrite(os.path.join(d, "labels", f"{i:04d}.png"), mask)

    for f in range(args.folds):
        fd = os.path.join(args.out, f"fold_{f + 1}")
        n_val = 0
        for i, (img, mask) in enumerate(pool):
            split = "val" if fold_of[i] == f else "train"
            n_val += split == "val"
            link_or_write(os.path.join(fd, split), i, img, mask)
        print(f"fold_{f + 1}: train={args.n - n_val} val={n_val}")
    print(f"wrote {args.n} images x {args.folds} folds at {args.size}px "
          f"under {args.out}")


if __name__ == "__main__":
    main()
