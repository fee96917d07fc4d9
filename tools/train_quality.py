#!/usr/bin/env python
"""Regenerate kraken_spark/assets/quality_clf.json bit-for-bit.

Trains the hashed-bag-of-words logistic-regression quality classifier
(kernels/quality_train.py) on the seeded synthetic prose/junk corpus and
writes the integer-quantized weights asset used by
functions/webfilter.quality_classifier.  Training seed 771001 is disjoint
from every evaluation seed in tests/test_quality_clf.py.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kraken_spark.kernels import quality_train as qt


def main() -> None:
    model = qt.train()
    qt.save_model(model)
    print(f"wrote {qt.ASSET} (d={model['d']}, bias_q={model['bias_q']})")


if __name__ == "__main__":
    main()
