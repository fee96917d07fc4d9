"""Zip-safe access to the package's trained assets (bpe_merges.json,
blla_learned.safetensors, ro_learned.safetensors, quality_clf.json).

A source checkout reads them as plain files next to the package; a
spark-submit --py-files deploy imports kraken_spark from a zip, where
`__file__`-relative paths don't exist on disk — there the bytes come from
importlib.resources, which reads through the zipimporter. Every asset
reader in the package goes through `asset_bytes` so both layouts work
identically (exercised by tests/test_pyfiles.py in a clean subprocess
with only the zip on sys.path).
"""

from __future__ import annotations

import os

_ASSET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


def asset_path(name: str) -> str:
    """Filesystem path of an asset in a source checkout (write target for
    the tools/train_*.py regeneration scripts)."""
    return os.path.join(_ASSET_DIR, name)


def asset_bytes(name: str) -> bytes | None:
    """Asset contents, or None if the asset doesn't exist in either
    layout (callers treat None as 'fall back to the constructed net')."""
    p = asset_path(name)
    if os.path.exists(p):
        with open(p, "rb") as f:
            return f.read()
    try:
        from importlib import resources

        trav = resources.files("kraken_spark").joinpath("assets", name)
        if trav.is_file():
            return trav.read_bytes()
    except Exception:
        pass
    return None
