#!/usr/bin/env python
"""Train the neural reading-order MLP from random init (pure numpy) and
write the learned weights asset (kraken_spark/assets/ro_learned.safetensors).

    python tools/train_ro.py [--steps N] [--out PATH]

Fully seeded — rerunning reproduces the committed asset bit-for-bit.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kraken_spark.kernels import ro_train  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--out", default=ro_train.ASSET)
    ap.add_argument("--log-every", type=int, default=500)
    args = ap.parse_args()
    mlp = ro_train.train_ro(steps=args.steps, log_every=args.log_every)
    ro_train.save_mlp(mlp, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
