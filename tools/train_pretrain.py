#!/usr/bin/env python
"""Pretrain the recognizer backbone with the wav2vec2-style
masked-contrastive surrogate task (kernels/rec_pretrain.py — the ketos
pretrain analog) and write the checkpoint asset:

    python tools/train_pretrain.py [--out PATH] [--quick]

Fully seeded — rerunning reproduces the committed asset bit-for-bit (BLAS
threads pinned below, before numpy loads). The unlabeled pretraining lines
(seed 884501) are DISJOINT from every rec_train train/eval seed (883xxx,
4242) and from the transfer test's fine-tune set (884801). Ends with the
acceptance evaluation: fixed-budget CTC fine-tune from the pretrained
backbone vs random init.
"""

from __future__ import annotations

import os
import sys

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

    import numpy as np

    from kraken_spark.kernels import rec_pretrain as rp
    from kraken_spark.kernels import rec_train as rt

    out = args.out or rp.ASSET
    lines = rt.synth_line_samples(884501, 40 if args.quick else 200,
                                  max_words=2)
    samples = [(i, ts) for i, (ts, _l, _g) in enumerate(lines)]
    W = rp.pretrain(samples, steps=60 if args.quick else 800, batch=16,
                    lr=2e-3, num_negatives=30, log_every=args.log_every)
    rp.save_pretrain_checkpoint(W, out)
    print(f"wrote {out}")

    # acceptance: fixed-budget transfer comparison on a disjoint seed
    ft = rt.synth_line_samples(884801, 96, max_words=2)

    def ctc_budget(W_init):
        Wl = {k: v.copy() for k, v in W_init.items()}
        rng = np.random.Generator(np.random.PCG64(884601))
        opt = rt.Adam(Wl)
        rt._ctc_phase(Wl, opt, ft, rng, steps=150, batch=16, lr=1e-3,
                      decay=False)
        loss, _g, n = rt.dataset_gradient(ft, Wl, batch=16)
        return loss / max(1, n)

    rand = ctc_budget(rt.init_weights(
        np.random.Generator(np.random.PCG64(rp.PRETRAIN_SEED + 7))))
    pre = ctc_budget(rp.to_recognizer_weights(rp.load_pretrain_checkpoint(out)))
    print(f"fixed-budget CTC loss/line: random {rand:.3f}  pretrained {pre:.3f}")


if __name__ == "__main__":
    main()
