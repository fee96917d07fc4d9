"""Model-repository verbs (kraken get/list/show + ketos publish analogs).

The reference wraps the htrmopo Zenodo client (kraken/repo.py:35-90;
CLI verbs kraken/kraken.py:640-815; publish side ketos/repo.py:108-290).
This container is network-less, so the engine reimplements the SAME
repository semantics over a transport-agnostic store: a repository is any
directory (or file:// URL) holding

    index.json                 {record_id: metadata record, ...}
    deposits/<safe_id>/<file>  the model payloads named by the records

Swapping the two byte-level primitives (``_read_bytes`` / the publish
writer) for HTTP against a real htrmopo/Zenodo deployment changes no
semantics — filtering, concept grouping, version preference, checksum
verification, and the cache layout are all here:

- kraken-record filter: software_name == 'kraken' OR 'kraken_pytorch' in
  keywords (kraken.py:677,758,800 filter_fn).
- get_listing groups records under their concept id, prefers the highest
  metadata schema (v1 over v0) per deposit, and sorts each concept's
  records newest-first (kraken/repo.py:54-90).
- list filters AND across types and OR within one type
  (kraken.py:731-749: model_type/script/language/keyword; language only
  exists on v1 records).
- get_description raises ValueError for a present-but-non-kraken record
  (kraken/repo.py:48-50) and honors an explicit metadata version.
- get_model downloads into a per-record cache dir, verifies the sha256
  recorded at publish time, and reports the .mlmodel/.safetensors
  candidates (kraken.py:795-815; htrmopo cache layout).
- publish_model is the ketos publish analog: assigns a DOI-style id in
  the 10.5072 test prefix, derives model_type/software hints from the
  actual model file (ketos/repo.py:79-106 _get_serialization_kind /
  _get_segmentation_model_hint), records v0-style graphemes from the
  codec for recognition models (ketos/repo.py:247-262), stamps
  publication_date, and links new versions of an existing concept via
  ``update_of`` (the -d/--doi update path, ketos/repo.py:270-272).
"""

from __future__ import annotations

import datetime
import hashlib
import json
import os
import re
from typing import Callable

KRAKEN_FILTER = "kraken"
_ID_SAFE = re.compile(r"[^A-Za-z0-9._-]")


def _safe_id(model_id: str) -> str:
    return _ID_SAFE.sub("_", model_id)


def _root_path(repo_root: str) -> str:
    if repo_root.startswith("file://"):
        return repo_root[len("file://"):]
    return repo_root


def _read_bytes(repo_root: str, rel: str) -> bytes:
    """Transport seam: local/file:// today, HTTP in a networked deploy."""
    with open(os.path.join(_root_path(repo_root), rel), "rb") as f:
        return f.read()


def _load_index(repo_root: str) -> dict[str, dict]:
    try:
        return json.loads(_read_bytes(repo_root, "index.json"))
    except FileNotFoundError:
        return {}


def is_kraken_record(rec: dict) -> bool:
    """kraken.py:677 filter_fn: software_name == 'kraken' or the legacy
    'kraken_pytorch' keyword."""
    return rec.get("software_name") == KRAKEN_FILTER or \
        "kraken_pytorch" in (rec.get("keywords") or [])


def get_description(repo_root: str, model_id: str,
                    version: str | None = None,
                    filter_fn: Callable[[dict], bool] = is_kraken_record) -> dict:
    """kraken/repo.py:35-51: fetch one record; a present record failing
    the filter raises ValueError (the CLI's 'not a valid kraken record'
    exit); ``version`` forces a metadata schema when both exist."""
    index = _load_index(repo_root)
    if model_id not in index:
        raise KeyError(f"no record {model_id} in repository")
    rec = dict(index[model_id])
    if version is not None and rec.get("version") != version:
        alt = rec.get("alt_versions", {}).get(version)
        if alt is None:
            raise KeyError(f"record {model_id} has no {version} metadata")
        rec = dict(alt)
    if not filter_fn(rec):
        raise ValueError(f"Record {model_id} exists but is not a valid kraken record")
    return rec


def get_listing(repo_root: str,
                filter_fn: Callable[[dict], bool] = is_kraken_record) -> dict[str, list[dict]]:
    """kraken/repo.py:54-90: group records under their concept id, keep
    the highest-schema record per deposit, newest publication first."""
    concepts: dict[str, list[dict]] = {}
    for rec in _load_index(repo_root).values():
        if not filter_fn(rec):
            continue
        concepts.setdefault(rec.get("concept_doi") or rec["doi"], []).append(rec)
    for k, v in concepts.items():
        concepts[k] = sorted(v, key=lambda r: r.get("publication_date", ""),
                             reverse=True)
    return concepts


def list_models(repo_root: str, model_type: str = "all",
                script: tuple[str, ...] = (), language: tuple[str, ...] = (),
                keyword: tuple[str, ...] = ()) -> dict[str, list[dict]]:
    """The `kraken list` filter semantics (kraken.py:731-749): different
    filter types AND together, repeated values of one type OR; language
    filtering only matches v1 records (v0 has no language field)."""

    def fn(rec: dict) -> bool:
        if not is_kraken_record(rec):
            return False
        if model_type != "all" and model_type not in (rec.get("model_type") or []):
            return False
        if script and not set(script) & set(rec.get("script") or []):
            return False
        if language and not set(language) & set(rec.get("language") or []):
            return False
        if keyword and not set(keyword) & set(rec.get("keywords") or []):
            return False
        return True

    return get_listing(repo_root, filter_fn=fn)


def default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    return os.path.join(base, "kraken_spark", "models")


def get_model(repo_root: str, model_id: str,
              cache_dir: str | None = None) -> str:
    """`kraken get` (kraken.py:795-815): validate the record through the
    kraken filter, fetch the deposit's files into a per-record cache dir,
    verify each file's published sha256 (a corrupted transfer/storage
    fails loudly), and return the cache dir. A warm cache with matching
    checksums skips the copy."""
    rec = get_description(repo_root, model_id)
    dest = os.path.join(cache_dir or default_cache_dir(), _safe_id(model_id))
    os.makedirs(dest, exist_ok=True)
    for f in rec.get("files", []):
        out = os.path.join(dest, f["name"])
        if os.path.exists(out):
            with open(out, "rb") as fh:
                if hashlib.sha256(fh.read()).hexdigest() == f["sha256"]:
                    continue
        blob = _read_bytes(repo_root, f["url"])
        digest = hashlib.sha256(blob).hexdigest()
        if digest != f["sha256"]:
            raise ValueError(
                f"checksum mismatch for {f['name']} of {model_id}: "
                f"expected {f['sha256']}, got {digest}")
        tmp = out + ".part"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, out)
    return dest


def model_candidates(model_dir: str) -> list[str]:
    """The CLI's model-file listing (kraken.py:812-814)."""
    return sorted(
        n for n in os.listdir(model_dir)
        if os.path.splitext(n)[1] in (".mlmodel", ".safetensors")
    )


def _serialization_kind(path: str) -> str:
    """ketos/repo.py:79-91."""
    suffix = os.path.splitext(path)[1].lower()
    if suffix == ".mlmodel":
        return "coreml"
    if suffix == ".safetensors":
        return "safetensors"
    return suffix[1:] if suffix else "unknown"


def publish_model(repo_root: str, model_path: str, metadata: dict,
                  update_of: str | None = None,
                  today: str | None = None) -> str:
    """ketos publish analog (ketos/repo.py:108-290): derive model_type +
    software hints from the ACTUAL model file, emit v0-style graphemes
    for recognition models, assign a DOI-style id (10.5072 test prefix,
    content-addressed — deterministic, no RNG), stage the payload under
    deposits/, and commit the record into index.json atomically.
    ``update_of`` links a new version under an existing record's concept
    id (the -d/--doi update path). Returns the new record id."""
    from .kernels.modelio import load_kraken_model

    root = _root_path(repo_root)
    with open(model_path, "rb") as f:
        blob = f.read()
    digest = hashlib.sha256(blob).hexdigest()
    bundle = load_kraken_model(model_path)[0]
    model_type = list(metadata.get("model_type") or ["recognition"])
    rec = {
        "version": "v1",
        "software_name": KRAKEN_FILTER,
        "software_hints": [f"serialization:{_serialization_kind(model_path)}"],
        "model_type": model_type,
        "summary": metadata.get("summary", os.path.basename(model_path)),
        "description": metadata.get("description", ""),
        "license": metadata.get("license", "Apache-2.0"),
        "script": list(metadata.get("script") or []),
        "language": list(metadata.get("language") or []),
        "keywords": list(metadata.get("keywords") or []),
        "creators": list(metadata.get("creators") or []),
        "metrics": dict(metadata.get("metrics") or {}),
        "publication_date": today or datetime.date.today().isoformat(),
    }
    if "recognition" in model_type and bundle.codec:
        rec["graphemes"] = sorted(bundle.codec)
    # deposit id: content+metadata addressed (deterministic, collision-
    # free across republications of the same payload with new metadata)
    id_src = digest + rec["publication_date"] + rec["summary"]
    doi = f"10.5072/ks.{hashlib.sha256(id_src.encode()).hexdigest()[:12]}"
    if update_of:
        parent = _load_index(repo_root).get(update_of)
        if parent is None:
            raise KeyError(f"cannot update unknown record {update_of}")
        rec["concept_doi"] = parent.get("concept_doi") or parent["doi"]
    else:
        rec["concept_doi"] = doi
    rec["doi"] = doi
    name = os.path.basename(model_path)
    rel = os.path.join("deposits", _safe_id(doi), name)
    rec["files"] = [{"name": name, "sha256": digest, "size": len(blob),
                     "url": rel}]
    os.makedirs(os.path.join(root, os.path.dirname(rel)), exist_ok=True)
    with open(os.path.join(root, rel) + ".part", "wb") as f:
        f.write(blob)
    os.replace(os.path.join(root, rel) + ".part", os.path.join(root, rel))
    index = _load_index(repo_root)
    index[doi] = rec
    tmp = os.path.join(root, "index.json.part")
    with open(tmp, "w") as f:
        json.dump(index, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(root, "index.json"))
    return doi


def render_description(rec: dict) -> str:
    """`kraken show` plain-text rendering (kraken.py:640-726's table,
    without the rich dependency): one 'key: value' line per populated
    field, v0/v1-aware."""
    rows = [("DOI", rec.get("doi")),
            ("concept DOI", rec.get("concept_doi")),
            ("publication date", rec.get("publication_date")),
            ("model type", ", ".join(rec.get("model_type") or []))]
    if rec.get("version") == "v0":
        rows.append(("alphabet", " ".join(rec.get("graphemes") or [])))
    else:
        rows.append(("language", ", ".join(rec.get("language") or [])))
    rows += [("script", ", ".join(rec.get("script") or [])),
             ("keywords", ", ".join(rec.get("keywords") or [])),
             ("metrics", ", ".join(f"{k}: {v:.2f}" for k, v in
                                   (rec.get("metrics") or {}).items())),
             ("license", rec.get("license")),
             ("creators", ", ".join(c.get("name", "") for c in
                                    (rec.get("creators") or []))),
             ("description", rec.get("description"))]
    title = rec.get("summary", "")
    body = "\n".join(f"{k}: {v}" for k, v in rows if v)
    return f"{title}\n{body}\n"
