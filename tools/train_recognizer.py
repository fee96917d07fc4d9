#!/usr/bin/env python
"""Train the VGSL CNN+BiLSTM CTC recognizer from random init (pure numpy,
five-phase curriculum incl. two hard-example-mining rounds —
kernels/rec_train.train_full) and write the
learned model asset in kraken's safetensors layout:

    python tools/train_recognizer.py [--out PATH] [--quick]

Fully seeded — rerunning reproduces the committed asset bit-for-bit (BLAS
thread count is pinned below, before numpy loads, because GEMM reduction
order depends on it). Ends with the acceptance evaluation: held-out pages
recognized through the PRODUCTION loaded-model path
(rpred_parity.LoadedRecognizer) — committed-recipe result 136/150 lines
byte-exact / corpus CER 0.0103 (the pinned band lives in
tests/test_rec_train.py; byte-exact everywhere is unreachable at the
pinned kraken topology).
"""

from __future__ import annotations

import os
import sys

# pin the GEMM thread count BEFORE numpy import: reproducibility contract
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = os.environ.get("KRAKEN_SPARK_TRAIN_THREADS", "16")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="tiny smoke run (NOT the committed recipe)")
    ap.add_argument("--log-every", type=int, default=100)
    args = ap.parse_args()

    from kraken_spark.kernels import rec_train as rt

    out = args.out or rt.ASSET
    if args.quick:
        W = rt.train_full(n_synth=200, n_docs=8, steps_warm=200,
                          steps_synth=100, steps_real=150,
                          mine_docs=8, mine_synth=200,
                          steps_hard=50, steps_hard2=30,
                          log_every=args.log_every)
    else:
        W = rt.train_full(log_every=args.log_every)
    rt.save_asset(W, out)
    print(f"wrote {out}")

    # acceptance: held-out pages through the production recognizer
    import numpy as np

    from kraken_spark.kernels import binarize, blla
    from kraken_spark.kernels.metrics import cer
    from kraken_spark.kernels.modelio import load_kraken_model
    from kraken_spark.kernels.render import render_document
    from kraken_spark.kernels.rpred_parity import LoadedRecognizer

    rec = LoadedRecognizer(load_kraken_model(out)[0])
    bad = tot = 0
    num = den = 0.0
    for di in range(8):
        d = render_document(4242, di)
        if d["oversized"]:
            continue
        mask = binarize.nlbin(d["img"])
        td = "horizontal-rl" if d["base_dir"] == "R" else "horizontal-lr"
        vec = "analog" if di % 2 == 0 else "reference"
        seg = blla.segment_blla(mask, url=f"eval-{di}", text_direction=td,
                                vectorizer=vec)
        for l in seg["lines"]:
            g = rt._match_gt_line(l, d["lines"])
            if g is None:
                continue
            r = rec.recognize_baseline(d["img"], l["baseline"], l["boundary"])
            tot += 1
            c = cer(g["text"], r["prediction"])
            num += c * len(g["text"])
            den += len(g["text"])
            if r["prediction"] != g["text"]:
                bad += 1
                if bad <= 5:
                    print(f"MISMATCH {d['lang']}: {r['prediction']!r} != {g['text']!r}")
    print(f"held-out: {tot - bad}/{tot} lines byte-exact, cer {num / max(1, den):.5f}")


if __name__ == "__main__":
    main()
