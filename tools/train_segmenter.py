#!/usr/bin/env python
"""Train the BLLA-style segmentation net from random init (pure numpy) and
write the learned weights asset used by the reference-vectorizer path.

    python tools/train_segmenter.py [--steps N] [--out PATH]

Fully seeded — rerunning reproduces the committed asset bit-for-bit.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kraken_spark.kernels import seg_train  # noqa: E402


def main() -> None:
    # defaults = the exact recipe that produced the committed asset
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--out", default=seg_train.ASSET)
    ap.add_argument("--log-every", type=int, default=100)
    args = ap.parse_args()
    W = seg_train.train(steps=args.steps, batch=args.batch, log_every=args.log_every)
    seg_train.save_weights(W, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
