"""Build the spark-submit --py-files artifact: a deterministic zip of the
kraken_spark package (sources + trained assets, no tests/caches).

    python tools/build_pyfiles.py [out.zip]      # default: dist/kraken_spark.zip
    spark-submit --py-files dist/kraken_spark.zip \
        --files mymodel.mlmodel \
        your_driver.py  # or: python -m kraken_spark.job ... on the driver

Determinism: entries are added in sorted order with a fixed timestamp, so
the same tree always produces byte-identical artifacts (reproducible
deploys; the zip hash is the deploy fingerprint).
"""

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "kraken_spark"
FIXED_TS = (2020, 1, 1, 0, 0, 0)


def build(out: Path) -> list[str]:
    out.parent.mkdir(parents=True, exist_ok=True)
    names = []
    files = sorted(
        p
        for p in PKG.rglob("*")
        if p.is_file()
        and "__pycache__" not in p.parts
        and p.suffix in {".py", ".json", ".safetensors", ".mlmodel"}
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in files:
            arc = str(p.relative_to(ROOT))
            info = zipfile.ZipInfo(arc, date_time=FIXED_TS)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, p.read_bytes())
            names.append(arc)
    return names


if __name__ == "__main__":
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else ROOT / "dist" / "kraken_spark.zip"
    names = build(out)
    print(f"wrote {out} ({len(names)} entries)")
