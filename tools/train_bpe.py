"""Train the in-repo BPE merge table on the sf0.001 documents text and
write kraken_spark/assets/bpe_merges.json (bit-for-bit reproducible: the
input parquet is deterministic driver testdata, rows are sorted by doc_id
before training, and merge selection is deterministic — see kernels/bpe.py).

    python tools/train_bpe.py [n_merges]
"""

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kraken_spark.kernels.bpe import save_merges, train_bpe  # noqa: E402

SF = "/root/testdata/sf0.001/documents.parquet"
OUT = Path(__file__).resolve().parent.parent / "kraken_spark" / "assets" / "bpe_merges.json"


def main(n_merges: int = 512) -> None:
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('{SF}') ORDER BY doc_id"
        ).fetchall()
    ]
    merges = train_bpe(texts, n_merges=n_merges)
    save_merges(str(OUT), merges)
    print(f"wrote {OUT} ({len(merges)} merges)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
