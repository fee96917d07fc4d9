"""Pure-numpy readers for the reference's trained-model formats.

Loads REAL kraken model files — no torch/safetensors/coremltools/protobuf
packages required:

- safetensors: the trivial container (8-byte LE header length + JSON header
  + raw little-endian tensor bytes); kraken stores the model map (VGSL spec,
  codec, seg_type, legacy_polygons, ...) as JSON under
  ``__metadata__.kraken_meta`` keyed by a per-model UUID prefix, with
  weights named ``<uuid>.nn.<layer>.<param>``
  (/root/reference/kraken/models/loaders.py:46-152 ``load_safetensors``,
  writers.py for the metadata layout).
- CoreML ``.mlmodel``: a protobuf ``Model`` message parsed here with a
  minimal wire-format reader. Field numbers verified against the bundled
  ``tests/resources/overfit.mlmodel``: Model.description=2 /
  Model.neuralNetwork=500; ModelDescription.metadata=100;
  Metadata.userDefined=100 (map); NeuralNetwork.layers=1;
  NeuralNetworkLayer.name=1 with oneof convolution=100, activation=130,
  innerProduct=140, softmax=175, custom=500. Weight extraction mirrors
  /root/reference/kraken/models/_coreml.py:10-90 and loaders.py:155-254
  ``load_coreml`` (VGSL spec + codec live in the userDefined metadata).

Both loaders return a :class:`KrakenModelBundle` whose ``weights`` dict is
keyed with the layer-local names the reference's torch modules use
(``C_0.co.weight``, ``Gn_1.layer.bias``, ``O_5.lin.weight``, ...) so the
numpy VGSL interpreter in kernels/torchvgsl.py can bind them directly.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field

import numpy as np

_ST_DTYPES = {
    "F64": np.dtype("<f8"),
    "F32": np.dtype("<f4"),
    "F16": np.dtype("<f2"),
    "I64": np.dtype("<i8"),
    "I32": np.dtype("<i4"),
    "I16": np.dtype("<i2"),
    "I8": np.dtype("<i1"),
    "U8": np.dtype("<u1"),
    "BOOL": np.dtype("?"),
}


@dataclass
class KrakenModelBundle:
    """One recognition/segmentation model deserialized from a kraken file."""

    vgsl: str
    codec: dict[str, list[int]] | None
    weights: dict[str, np.ndarray]
    metadata: dict = field(default_factory=dict)

    @property
    def legacy_polygons(self) -> bool:
        # models predating the flag used the legacy extractor
        # (reference default in rpred._choose_legacy_polygon_extractor)
        return bool(self.metadata.get("legacy_polygons", True))

    @property
    def one_channel_mode(self) -> str | None:
        return self.metadata.get("one_channel_mode")

    @property
    def seg_type(self) -> str | None:
        return self.metadata.get("seg_type")


# --------------------------------------------------------------- safetensors
def read_safetensors(path: str) -> tuple[dict[str, np.ndarray], dict]:
    """Raw safetensors parse: (tensors, metadata)."""
    with open(path, "rb") as f:
        blob = f.read()
    return parse_safetensors(blob, path)


def parse_safetensors(blob: bytes, path: str = "<bytes>") -> tuple[dict[str, np.ndarray], dict]:
    """Parse safetensors bytes (the zip-deploy asset path has no file)."""
    if len(blob) < 8:
        raise ValueError(f"{path}: not a safetensors file (too short)")
    (hlen,) = struct.unpack("<Q", blob[:8])
    if hlen > len(blob) - 8:
        raise ValueError(f"{path}: header length {hlen} exceeds file size")
    header = json.loads(blob[8 : 8 + hlen])
    meta = header.pop("__metadata__", {})
    base = 8 + hlen
    tensors: dict[str, np.ndarray] = {}
    for name, info in header.items():
        dt = _ST_DTYPES.get(info["dtype"])
        if dt is None:
            raise ValueError(f"{path}: unsupported dtype {info['dtype']} for {name}")
        b0, b1 = info["data_offsets"]
        arr = np.frombuffer(blob, dtype=dt, count=(b1 - b0) // dt.itemsize, offset=base + b0)
        tensors[name] = arr.reshape(info["shape"]).astype(np.float32) if dt.kind == "f" else arr.reshape(info["shape"])
    return tensors, meta


def load_safetensors(path: str) -> list[KrakenModelBundle]:
    """Kraken-semantics safetensors load: one bundle per model prefix in
    kraken_meta, weights renamed '<uuid>.nn.X' -> 'X'
    (loaders.py:46-152)."""
    tensors, meta = read_safetensors(path)
    model_map = json.loads(meta.get("kraken_meta", "null"))
    if not isinstance(model_map, dict):
        raise ValueError(f"{path}: missing/invalid kraken_meta model map")
    out = []
    for prefix, model_data in model_map.items():
        weights = {
            k[len(prefix) + 4 :]: v
            for k, v in tensors.items()
            if k.startswith(prefix + ".nn.")
        }
        md = dict(model_data)
        vgsl = md.pop("vgsl", None)
        codec = md.pop("codec", None)
        if not vgsl:
            raise ValueError(f"{path}: model {prefix} has no VGSL spec")
        out.append(KrakenModelBundle(vgsl=vgsl, codec=codec, weights=weights, metadata=md))
    return out


# --------------------------------------------------------------- protobuf
def _pb_fields(buf: bytes):
    """Iterate (field_number, wire_type, value) over a protobuf message.
    varint -> int, length-delimited -> bytes, 32/64-bit -> raw bytes."""
    i, n = 0, len(buf)
    while i < n:
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield fno, wt, v
        elif wt == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield fno, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:
            yield fno, wt, buf[i : i + 4]
            i += 4
        elif wt == 1:
            yield fno, wt, buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")


def _pb_map(buf: bytes) -> dict[int, list]:
    out: dict[int, list] = {}
    for fno, _wt, v in _pb_fields(buf):
        out.setdefault(fno, []).append(v)
    return out


def _pb_varints(v) -> list[int]:
    """Decode a packed-or-single repeated varint field value."""
    if isinstance(v, int):
        return [v]
    out = []
    i = 0
    while i < len(v):
        x = 0
        shift = 0
        while True:
            b = v[i]
            i += 1
            x |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        out.append(x)
    return out


def _weight_floats(wp: bytes) -> np.ndarray:
    """WeightParams message -> float32 array (floatValue packed = field 1;
    float16Value raw = field 2)."""
    m = _pb_map(wp)
    if 1 in m:
        return np.frombuffer(b"".join(m[1]), dtype="<f4").copy()
    if 2 in m:
        return np.frombuffer(b"".join(m[2]), dtype="<f2").astype(np.float32)
    return np.zeros(0, dtype=np.float32)


def _custom_params(m: dict[int, list]) -> dict[str, int]:
    """CustomLayerParams.parameters (field 30 map entries) -> {name: intValue}.
    The value message stores intValue at field 30 (varint)."""
    out = {}
    for entry in m.get(30, []):
        em = _pb_map(entry)
        key = em[1][0].decode()
        vm = _pb_map(em[2][0])
        if 30 in vm:
            iv = vm[30][0]
            # negative intValues are 64-bit two's-complement varints
            if iv >= 1 << 63:
                iv -= 1 << 64
            out[key] = iv
    return out


def load_coreml(path: str) -> list[KrakenModelBundle]:
    """CoreML .mlmodel load (models/loaders.py:155-254 + _coreml.py).

    Extracts the VGSL spec + codec from the userDefined metadata and the
    conv / groupnorm / linear / LSTM weights from the NeuralNetwork
    layers (uni/biDirectionalLSTM per the reference's gate layout,
    models/_coreml.py:21-58 — no reference asset exercises them since the
    bundled LSTM .mlmodels are LFS stubs, so the golden is a
    save_coreml->load_coreml round-trip with forward equivalence)."""
    with open(path, "rb") as f:
        blob = f.read()
    top = _pb_map(blob)
    if 2 not in top or 500 not in top:
        raise ValueError(f"{path}: not a CoreML NeuralNetwork model")
    desc = _pb_map(top[2][0])
    user_defined: dict[str, str] = {}
    for meta in desc.get(100, []):
        for fno, _wt, v in _pb_fields(meta):
            if fno == 100:
                em = _pb_map(v)
                user_defined[em[1][0].decode()] = em[2][0].decode() if 2 in em else ""
    try:
        kraken_meta = json.loads(user_defined.get("kraken_meta", "{}"))
    except json.JSONDecodeError as e:
        raise ValueError(f"{path}: invalid kraken_meta JSON: {e}") from e
    vgsl = user_defined.get("vgsl") or kraken_meta.get("vgsl")
    if not vgsl:
        raise ValueError(f"{path}: no VGSL spec in model metadata")
    codec = None
    if "codec" in user_defined:
        codec = json.loads(user_defined["codec"])
    elif "codec" in kraken_meta:
        codec = kraken_meta.get("codec")
    kraken_meta.pop("codec", None)
    kraken_meta.pop("vgsl", None)
    # pre-kraken_meta models are always recognizers (loaders.py:199-205)
    if not kraken_meta.get("model_type"):
        kraken_meta["model_type"] = ["recognition"]

    weights: dict[str, np.ndarray] = {}
    for layer_buf in _pb_map(top[500][0]).get(1, []):
        lm = _pb_map(layer_buf)
        name = lm[1][0].decode()
        if 100 in lm:  # convolution (_coreml.py:62-77)
            cm = _pb_map(lm[100][0])
            out_c = cm[1][0]
            in_c = cm[2][0]
            ksize = _pb_varints(cm[20][0])
            base = name.removesuffix("_conv")
            w = _weight_floats(cm[90][0])
            if cm.get(60, [0])[0]:  # isDeconvolution
                weights[f"{base}.co.weight"] = w.reshape(in_c, out_c, *ksize)
            else:
                weights[f"{base}.co.weight"] = w.reshape(out_c, in_c, *ksize)
            weights[f"{base}.co.bias"] = _weight_floats(cm[91][0])
        elif 140 in lm:  # innerProduct (_coreml.py:10-18)
            im = _pb_map(lm[140][0])
            in_c, out_c = im[1][0], im[2][0]
            base = name.removesuffix("_lin")
            weights[f"{base}.lin.weight"] = _weight_floats(im[20][0]).reshape(out_c, in_c)
            weights[f"{base}.lin.bias"] = _weight_floats(im[21][0])
        elif 500 in lm:  # custom (_coreml.py:80-88 groupnorm; reshape is a noop)
            cm = _pb_map(lm[500][0])
            cls = cm.get(10, [b""])[0].decode()
            if cls == "groupnorm":
                in_c = _custom_params(cm)["in_channels"]
                wp = cm.get(20, [])
                weights[f"{name}.layer.weight"] = _weight_floats(wp[0]).reshape(in_c)
                weights[f"{name}.layer.bias"] = _weight_floats(wp[1]).reshape(in_c)
        elif 420 in lm or 430 in lm:
            # uni/biDirectionalLSTM (models/_coreml.py:21-58 semantics):
            # gate matrices (input, forget, blockInput, output) stack into
            # torch weight_ih/weight_hh; gate biases land in bias_hh with
            # bias_ih zeroed
            rm = _pb_map(lm.get(420, lm.get(430))[0])
            base = name.removesuffix("_transposed")
            hidden = rm[2][0]
            for di, wp_buf in enumerate(rm.get(20, [])):
                sfx = "_reverse" if di else ""
                pm = _pb_map(wp_buf)

                def gates(fnos):
                    return np.concatenate(
                        [_weight_floats(pm[f][0]) for f in fnos])

                weights[f"{base}.layer.weight_ih_l0{sfx}"] = \
                    gates((1, 2, 3, 4)).reshape(4 * hidden, -1)
                weights[f"{base}.layer.weight_hh_l0{sfx}"] = \
                    gates((20, 21, 22, 23)).reshape(4 * hidden, hidden)
                bias = gates((40, 41, 42, 43)).reshape(-1)
                weights[f"{base}.layer.bias_hh_l0{sfx}"] = bias
                weights[f"{base}.layer.bias_ih_l0{sfx}"] = \
                    np.zeros_like(bias)
        # activation (130) / softmax (175) / pooling carry no weights; the
        # VGSL spec is authoritative for the activation functions.
    return [KrakenModelBundle(vgsl=vgsl, codec=codec, weights=weights, metadata=kraken_meta)]


def load_kraken_model(path: str) -> list[KrakenModelBundle]:
    """Format-sniffing loader (the reference's load_models entry-point
    chain, loaders.py:27-43): safetensors first, then CoreML protobuf.
    Any malformed payload raises ValueError — a corrupt model file on an
    executor must fail the task with a diagnosable message, never an
    arbitrary decode crash."""
    try:
        with open(path, "rb") as f:
            head = f.read(16)
        if len(head) >= 9:
            (hlen,) = struct.unpack("<Q", head[:8])
            if head[8:9] == b"{" and hlen < 100_000_000:
                return load_safetensors(path)
        return load_coreml(path)
    except ValueError:
        raise
    except Exception as e:
        raise ValueError(f"{path}: not a parseable kraken model file: {e}") from e


_ST_NAMES = {v: k for k, v in _ST_DTYPES.items()}


def write_safetensors(path: str, tensors: dict[str, np.ndarray],
                      metadata: dict[str, str] | None = None) -> None:
    """Serialize tensors to the safetensors container format (8-byte LE
    header length + JSON header + contiguous little-endian tensor data) —
    the write twin of read_safetensors, producing files the reference's
    safetensors loader (loaders.py:46-152) reads back unchanged."""
    header: dict = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    payloads = []
    offset = 0
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        le = arr.astype(arr.dtype.newbyteorder("<"), copy=False)
        dt_name = _ST_NAMES.get(np.dtype(le.dtype.str))
        if dt_name is None:
            raise ValueError(f"unsupported dtype {arr.dtype} for {name}")
        raw = le.tobytes()
        header[name] = {"dtype": dt_name, "shape": list(arr.shape),
                        "data_offsets": [offset, offset + len(raw)]}
        payloads.append(raw)
        offset += len(raw)
    hjson = json.dumps(header, sort_keys=True).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for raw in payloads:
            f.write(raw)


def save_kraken_model(path: str, bundle: KrakenModelBundle,
                      prefix: str = "model_0",
                      dtype: str | None = None) -> None:
    """Write a model bundle as a kraken-layout safetensors file: weights
    under '<prefix>.nn.<name>', VGSL/codec/metadata in the kraken_meta
    model map — loadable by load_safetensors (and the reference's loader).
    ``dtype``: optional 'F16'/'F32' cast for the float weights."""
    tensors = {}
    for name, w in bundle.weights.items():
        arr = np.asarray(w)
        if dtype and arr.dtype.kind == "f":
            arr = arr.astype(_ST_DTYPES[dtype])
        tensors[f"{prefix}.nn.{name}"] = arr
    model_data = dict(bundle.metadata or {})
    model_data["vgsl"] = bundle.vgsl
    if bundle.codec is not None:
        model_data["codec"] = bundle.codec
    meta = {"kraken_meta": json.dumps({prefix: model_data})}
    write_safetensors(path, tensors, meta)


def save_kraken_models(path: str, bundles: list[KrakenModelBundle],
                       prefixes: list[str] | None = None,
                       dtype: str | None = None) -> None:
    """Write SEVERAL model bundles into ONE kraken-layout safetensors file
    (the reference's multi-model weights files, models/writers.py:44-91 —
    e.g. a line and a region segmenter combined for joint inference).
    Prefixes default to deterministic 'model_<i>' (the reference draws
    random uuid4 prefixes; its loader only iterates the map, and a seeded
    build must be byte-reproducible)."""
    if prefixes is None:
        prefixes = [f"model_{i}" for i in range(len(bundles))]
    if len(prefixes) != len(set(prefixes)) or len(prefixes) != len(bundles):
        raise ValueError("one unique prefix per bundle required")
    tensors: dict[str, np.ndarray] = {}
    model_map: dict[str, dict] = {}
    for prefix, bundle in zip(prefixes, bundles):
        for name, w in bundle.weights.items():
            arr = np.asarray(w)
            if dtype and arr.dtype.kind == "f":
                arr = arr.astype(_ST_DTYPES[dtype])
            tensors[f"{prefix}.nn.{name}"] = arr
        model_data = dict(bundle.metadata or {})
        model_data["vgsl"] = bundle.vgsl
        if bundle.codec is not None:
            model_data["codec"] = bundle.codec
        model_map[prefix] = model_data
    write_safetensors(path, tensors, {"kraken_meta": json.dumps(model_map)})


def convert_models(paths: list[str], output: str,
                   weights_format: str = "safetensors") -> str:
    """The ketos-convert analog (reference ketos/weights.py:26-60 over
    models/convert.py:44-92 + models/writers.py): load every model from
    each input weights file (safetensors or CoreML, sniffed) and write
    them combined into ONE output file in ``weights_format``.

    Reference behaviors kept: an existing output path refuses; the CoreML
    writer takes exactly one model and coerces the suffix to '.mlmodel';
    torch-lightning '.ckpt' checkpoints are out of scope in this
    torch-free engine and raise a diagnosable error. Returns the path
    actually written (suffix coercion may change it)."""
    import os

    if not paths:
        raise ValueError("no models to convert were provided")
    bundles: list[KrakenModelBundle] = []
    for p in paths:
        if p.endswith(".ckpt"):
            raise ValueError(
                f"{p}: torch-lightning checkpoints need torch; convert "
                "them to weights with the reference's ketos convert first")
        bundles.extend(load_kraken_model(p))
    if weights_format == "safetensors":
        out = output
    elif weights_format == "coreml":
        if len(bundles) != 1:
            raise ValueError(
                "CoreML writer only supports writing one model at a time")
        out = output if output.endswith(".mlmodel") else \
            os.path.splitext(output)[0] + ".mlmodel"
    else:
        raise ValueError(f"no writer for format {weights_format} found")
    if os.path.exists(out):
        raise ValueError(f"{out} already exists")
    if weights_format == "safetensors":
        save_kraken_models(out, bundles)
    else:
        save_coreml(out, bundles[0])
    return out


def set_model_metadata(path: str, output: str, updates: dict,
                       weights_format: str = "safetensors") -> str:
    """Model-metadata surgery — the reference's contrib
    set_seg_options.py capability generalized: load every model in a
    weights file, merge ``updates`` into each bundle's metadata (None
    values DELETE keys; nested dicts merge one level deep, covering the
    class_mapping/hyper_params update shapes), and rewrite the container
    in ``weights_format``. Weights bytes are untouched. Returns the path
    written."""
    import os

    bundles = load_kraken_model(path)
    for b in bundles:
        md = dict(b.metadata or {})
        for k, v in updates.items():
            if v is None:
                md.pop(k, None)
            elif isinstance(v, dict) and isinstance(md.get(k), dict):
                merged = dict(md[k])
                merged.update(v)
                md[k] = merged
            else:
                md[k] = v
        b.metadata = md
    if weights_format == "coreml":
        if len(bundles) != 1:
            raise ValueError(
                "CoreML writer only supports writing one model at a time")
        out = output if output.endswith(".mlmodel") else \
            os.path.splitext(output)[0] + ".mlmodel"
        if os.path.exists(out):
            raise ValueError(f"{out} already exists")
        save_coreml(out, bundles[0])
        return out
    if os.path.exists(output):
        raise ValueError(f"{output} already exists")
    save_kraken_models(output, bundles)
    return output


# ---------------------------------------------------------------------------
# CoreML protobuf WRITER (+ LSTM layer support)
# ---------------------------------------------------------------------------
# Wire-format emit helpers. Field numbers follow the public coremltools
# Model.proto / NeuralNetwork.proto (Model.description=2/.neuralNetwork=500;
# Metadata.userDefined=100; NeuralNetworkLayer.convolution=100/
# innerProduct=140/uniDirectionalLSTM=420/biDirectionalLSTM=430/custom=500;
# LSTMWeightParams gate matrices 1-4, recursion 20-23, biases 40-43;
# WeightParams.floatValue=1) — the same map the reader above consumes.

def _pb_emit_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_field_varint(fno: int, v: int) -> bytes:
    return _pb_emit_varint(fno << 3) + _pb_emit_varint(v)


def _pb_field_len(fno: int, payload: bytes) -> bytes:
    return (_pb_emit_varint((fno << 3) | 2)
            + _pb_emit_varint(len(payload)) + payload)


def _pb_weightparams(arr: np.ndarray) -> bytes:
    return _pb_field_len(1, np.ascontiguousarray(
        arr, dtype="<f4").tobytes())


def _coreml_lstm_weightparams(weights: dict, name: str,
                              suffix: str) -> bytes:
    """One LSTMWeightParams message from torch-layout tensors. Gate order
    in torch weight_ih/hh is (i, f, g, o); CoreML stores them as separate
    matrices with biases merged into the recursion-side vector (the
    reference's deserializer reads them back into bias_hh with bias_ih
    zeroed, models/_coreml.py:30-43 — summing ih+hh biases preserves the
    forward function)."""
    wih = weights[f"{name}.layer.weight_ih_l0{suffix}"]
    whh = weights[f"{name}.layer.weight_hh_l0{suffix}"]
    bih = weights.get(f"{name}.layer.bias_ih_l0{suffix}")
    bhh = weights.get(f"{name}.layer.bias_hh_l0{suffix}")
    hidden = whh.shape[1]
    bias = np.zeros(4 * hidden, np.float32)
    if bih is not None:
        bias = bias + np.asarray(bih, np.float32)
    if bhh is not None:
        bias = bias + np.asarray(bhh, np.float32)
    gates_ih = np.asarray(wih, np.float32).reshape(4, hidden, -1)
    gates_hh = np.asarray(whh, np.float32).reshape(4, hidden, hidden)
    gates_b = bias.reshape(4, hidden)
    out = b""
    for fno, g in zip((1, 2, 3, 4), gates_ih):
        out += _pb_field_len(fno, _pb_weightparams(g))
    for fno, g in zip((20, 21, 22, 23), gates_hh):
        out += _pb_field_len(fno, _pb_weightparams(g))
    for fno, g in zip((40, 41, 42, 43), gates_b):
        out += _pb_field_len(fno, _pb_weightparams(g))
    return out


def save_coreml(path: str, bundle: KrakenModelBundle) -> None:
    """Serialize a model bundle as a CoreML .mlmodel the reader above (and
    the reference's loader layout) understands: VGSL/codec/metadata in the
    userDefined metadata, conv/innerProduct/groupnorm-custom/LSTM layers
    carrying the weights (reference models/_coreml.py layer conventions)."""
    layers = b""
    names = sorted({k.split(".")[0] for k in bundle.weights})
    for name in names:
        w = bundle.weights
        if f"{name}.co.weight" in w:
            cw = np.asarray(w[f"{name}.co.weight"], np.float32)
            out_c, in_c, ky, kx = cw.shape
            body = (_pb_field_varint(1, out_c) + _pb_field_varint(2, in_c)
                    + _pb_field_len(20, _pb_emit_varint(ky) + _pb_emit_varint(kx))
                    + _pb_field_len(90, _pb_weightparams(cw))
                    + _pb_field_len(91, _pb_weightparams(
                        np.asarray(w[f"{name}.co.bias"], np.float32))))
            layers += _pb_field_len(1, _pb_field_len(
                1, f"{name}_conv".encode()) + _pb_field_len(100, body))
        elif f"{name}.lin.weight" in w:
            lw = np.asarray(w[f"{name}.lin.weight"], np.float32)
            out_c, in_c = lw.shape
            body = (_pb_field_varint(1, in_c) + _pb_field_varint(2, out_c)
                    + _pb_field_len(20, _pb_weightparams(lw))
                    + _pb_field_len(21, _pb_weightparams(
                        np.asarray(w[f"{name}.lin.bias"], np.float32))))
            layers += _pb_field_len(1, _pb_field_len(
                1, f"{name}_lin".encode()) + _pb_field_len(140, body))
        elif f"{name}.layer.weight_ih_l0" in w:
            in_c = np.asarray(w[f"{name}.layer.weight_ih_l0"]).shape[1]
            hidden = np.asarray(w[f"{name}.layer.weight_hh_l0"]).shape[1]
            bidi = f"{name}.layer.weight_ih_l0_reverse" in w
            body = _pb_field_varint(1, in_c) + _pb_field_varint(2, hidden)
            body += _pb_field_len(
                20, _coreml_lstm_weightparams(w, name, ""))
            if bidi:
                body += _pb_field_len(
                    20, _coreml_lstm_weightparams(w, name, "_reverse"))
            layers += _pb_field_len(1, _pb_field_len(
                1, name.encode())
                + _pb_field_len(430 if bidi else 420, body))
        elif f"{name}.layer.weight" in w:
            gw = np.asarray(w[f"{name}.layer.weight"], np.float32)
            param = _pb_field_len(1, b"in_channels") + _pb_field_len(
                2, _pb_field_varint(30, gw.shape[0]))
            body = (_pb_field_len(10, b"groupnorm")
                    + _pb_field_len(20, _pb_weightparams(gw))
                    + _pb_field_len(20, _pb_weightparams(
                        np.asarray(w[f"{name}.layer.bias"], np.float32)))
                    + _pb_field_len(30, param))
            layers += _pb_field_len(1, _pb_field_len(
                1, name.encode()) + _pb_field_len(500, body))

    kraken_meta = dict(bundle.metadata or {})
    kraken_meta["vgsl"] = bundle.vgsl
    if bundle.codec is not None:
        kraken_meta["codec"] = bundle.codec
    user = {"vgsl": bundle.vgsl,
            "kraken_meta": json.dumps(kraken_meta)}
    if bundle.codec is not None:
        user["codec"] = json.dumps(bundle.codec)
    meta = b""
    for k, v in user.items():
        meta += _pb_field_len(100, _pb_field_len(1, k.encode())
                              + _pb_field_len(2, v.encode()))
    desc = _pb_field_len(100, meta)
    blob = (_pb_field_varint(1, 1)
            + _pb_field_len(2, desc)
            + _pb_field_len(500, layers))
    with open(path, "wb") as f:
        f.write(blob)
