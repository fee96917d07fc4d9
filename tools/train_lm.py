"""Regenerate the character-trigram LM asset bit-for-bit (seeded synthetic
prose, no external data — see kernels/lm_train.py).

    python tools/train_lm.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kraken_spark.kernels.lm_train import ASSET, save_lm, train_lm  # noqa: E402

if __name__ == "__main__":
    save_lm(train_lm())
    print(f"wrote {ASSET}")
