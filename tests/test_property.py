"""Property-based tests (hypothesis) for the invariant-heavy kernels.

The reference's suite is golden-fixture-only (SURVEY.md §5); these add the
randomized coverage it lacks: codec round-trips, PNG codec bijectivity,
BiDi permutation validity, reading-order totality, filter/percentile
equivalences against the naive definitions.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kraken_spark.kernels import png
from kraken_spark.kernels.codec import Codec
from kraken_spark.kernels.ctc import greedy_decoder
from kraken_spark.kernels.filters import (
    box_filter_1d,
    moving_max_1d,
    percentile_nearest,
)
from kraken_spark.kernels.glyphs import ALPHABET
from kraken_spark.kernels.order import reading_order, topsort
from kraken_spark.kernels.ro import neural_reading_order

CODEC = Codec({chr(cp): [i + 1] for i, cp in enumerate(ALPHABET)})
ALPHA_TEXT = st.text(alphabet=[chr(cp) for cp in ALPHABET], min_size=0, max_size=60)


@settings(max_examples=60, deadline=None)
@given(ALPHA_TEXT)
def test_codec_encode_decode_roundtrip(s):
    labels = CODEC.encode(s)
    decoded = CODEC.decode([(l, i, i + 1, 1.0) for i, l in enumerate(labels)])
    assert "".join(ch for ch, *_ in decoded) == s


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_random(h, w, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert (png.decode_png(png.encode_png(img)) == img).all()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=50),
)
def test_greedy_decoder_no_blanks_no_repeats(labels):
    # build logits realizing the frame-label sequence exactly
    T = len(labels)
    logits = np.full((T, 7), -10.0, dtype=np.float32)
    logits[np.arange(T), labels] = 10.0
    out = greedy_decoder(logits)
    seq = [l for l, *_ in out]
    assert 0 not in seq  # blanks dropped
    for a, b, in zip(seq, seq[1:]):
        pass  # repeats ARE allowed post-collapse if separated by blank
    # collapse definition: no two adjacent equal labels without a blank gap
    collapsed = []
    prev = None
    for l in labels:
        if l != prev:
            collapsed.append(l)
            prev = l
    assert seq == [l for l in collapsed if l != 0]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 500), st.integers(0, 500),
            st.integers(1, 80), st.integers(1, 20),
        ),
        min_size=1,
        max_size=12,
    ),
    st.booleans(),
)
def test_reading_order_is_permutation(raw, rl):
    boxes = [(x, y, x + w, y + h) for x, y, w, h in raw]
    perm = reading_order(boxes, rl=rl)
    assert sorted(perm) == list(range(len(boxes)))
    nperm = neural_reading_order(boxes, w=600, h=540)
    assert sorted(nperm) == list(range(len(boxes)))


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=9), st.integers(min_value=0, max_value=2**32 - 1))
def test_topsort_of_total_order(n, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    perm = rng.permutation(n)
    order = np.zeros((n, n), dtype=np.int64)
    for i in range(n):
        for j in range(i + 1, n):
            order[perm[i], perm[j]] = 1
    assert list(topsort(order)) == [int(p) for p in perm]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=15),
)
def test_moving_max_matches_naive(vals, k):
    a = np.array([vals], dtype=np.uint8)
    got = moving_max_1d(a, k, axis=1)[0]
    n = len(vals)
    left, right = k // 2, k - 1 - k // 2
    padded = [vals[0]] * left + vals + [vals[-1]] * right
    naive = [max(padded[i : i + k]) for i in range(n)]
    assert got.tolist() == naive


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.floats(min_value=-1e3, max_value=1e3, allow_nan=False), min_size=1, max_size=80),
    st.floats(min_value=0.0, max_value=100.0),
)
def test_percentile_nearest_is_order_statistic(vals, q):
    a = np.array(vals, dtype=np.float32)
    v = float(percentile_nearest(a, q))
    assert v in set(a.tolist())  # nearest-rank always returns a sample
    k = min(len(vals) - 1, max(0, int(round(q / 100.0 * (len(vals) - 1)))))
    assert v == float(np.sort(a)[k])


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.floats(min_value=0, max_value=255, allow_nan=False), min_size=2, max_size=50),
    st.integers(min_value=1, max_value=9),
)
def test_box_filter_preserves_constant(vals, k):
    c = float(np.float32(vals[0]))
    a = np.full((1, len(vals)), c, dtype=np.float32)
    out = box_filter_1d(a, k, axis=1)
    assert np.allclose(out, c, atol=1e-3)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_extract_document_never_crashes_on_garbage(payload):
    """The extraction stage must degrade to guard_tripped rows on ANY
    byte payload (the 100 TB corpus contains arbitrary junk)."""
    from kraken_spark.stages import extract_document

    out = extract_document(bytes(payload), "u", "en", "gt")
    assert out["url"] == "u"
    assert isinstance(out["guard_tripped"], bool)
    assert out["n_lines"] == len(out["lines"])
    # valid-PNG-signature-but-corrupt payloads must also be caught
    out = extract_document(b"\x89PNG\r\n\x1a\n" + bytes(payload), "u", "en", None)
    assert out["guard_tripped"] or out["n_lines"] >= 0


BIDI_TEXT = st.text(
    alphabet="abXY 12.()אבاب⁦⁧⁩‫‬",
    max_size=24,
)


@settings(max_examples=120, deadline=None)
@given(BIDI_TEXT, st.sampled_from([None, "L", "R"]))
def test_bidi_uax9_invariants(s, base):
    """Structural invariants of the full UAX#9 implementation: the display
    map is a bijection onto the non-removed characters, levels of surviving
    characters are >= 0, pure-LTR text is identity, and the output never
    contains explicit directional formatting characters."""
    from kraken_spark.kernels.bidi import bidi_class, get_display

    disp, order = get_display(s, base)
    assert len(disp) == len(order)
    assert len(set(order)) == len(order)
    removed = {"RLE", "LRE", "RLO", "LRO", "PDF", "BN", "LRI", "RLI", "FSI", "PDI"}
    for ch in disp:
        assert bidi_class(ord(ch)) not in removed
    kept = [i for i, ch in enumerate(s) if bidi_class(ord(ch)) not in removed]
    assert sorted(order) == kept
    if all(bidi_class(ord(c)) in ("L", "WS", "EN", "ON", "ES", "CS", "ET") for c in s) and base != "R":
        assert disp == s


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=512))
def test_model_loader_rejects_garbage(payload):
    """load_kraken_model must raise a clean ValueError (or parse) on ANY
    byte payload — never crash with an unhandled decode error (a corrupt
    model file on an executor must fail the task with a diagnosable
    message)."""
    import tempfile

    from kraken_spark.kernels.modelio import load_kraken_model

    with tempfile.NamedTemporaryFile(suffix=".bin") as f:
        f.write(payload)
        f.flush()
        try:
            load_kraken_model(f.name)
        except ValueError:
            pass


@settings(max_examples=40, deadline=None)
@given(ALPHA_TEXT)
def test_bidi_display_logical_involution(s):
    """display_to_logical is a permutation of the input, up to L4 bracket
    mirroring on odd embedding levels (full UAX#9 semantics)."""
    from kraken_spark.kernels.bidi import MIRRORED, display_to_logical

    logical, perm = display_to_logical(s, "R")
    assert sorted(perm) == list(range(len(s)))
    for k, i in enumerate(perm):
        src = s[i]
        allowed = {src, chr(MIRRORED[ord(src)])} if ord(src) in MIRRORED else {src}
        assert logical[k] in allowed


@given(
    st.text(alphabet="abcXY .", max_size=40),
    st.text(alphabet="abcXY .", max_size=40),
)
def test_align_counts_consistent_with_levenshtein(a, b):
    """Backtraced edit-operation counts must sum to the edit distance and
    partition both strings (matches+dels+subs == len(ref), matches+ins+subs
    == len(hyp)); confusion multiset size equals the edit count."""
    from kraken_spark.kernels.metrics import align_counts, levenshtein

    c = align_counts(a, b)
    edits = c["insertions"] + c["deletions"] + c["substitutions"]
    assert edits == levenshtein(a, b)
    assert c["matches"] + c["deletions"] + c["substitutions"] == len(a)
    assert c["matches"] + c["insertions"] + c["substitutions"] == len(b)
    assert sum(n for _, _, n in c["confusions"]) == edits


@given(
    st.integers(min_value=2, max_value=20),
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_column_seam_is_connected_and_optimalish(h, w, seed):
    """Seam DP invariants: every column gets a row in bounds, adjacent
    columns differ by at most 1 (the 3-neighbor transition set), and the
    seam's total energy never exceeds any constant-row path's."""
    import numpy as np

    from kraken_spark.kernels.seamcarve import column_seam

    rng = np.random.default_rng(seed)
    energy = rng.random((h, w)).astype(np.float32)
    ys = column_seam(energy)
    assert len(ys) == w
    assert all(0 <= y < h for y in ys)
    assert all(abs(int(ys[i + 1]) - int(ys[i])) <= 1 for i in range(w - 1))
    seam_cost = float(sum(energy[y, x] for x, y in enumerate(ys)))
    best_row = float(energy.sum(axis=1).min())
    assert seam_cost <= best_row + 1e-4


@given(
    st.integers(1, 400).map(lambda n: n),
    st.sampled_from([8, 16, 32, -32]),
    st.sampled_from([1, 2]),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_random(n, bits, channels, seed):
    """WAV codec: any PCM payload round-trips within the depth's
    quantization bound; stereo averages to the channel mean."""
    from kraken_spark.kernels.wav import read_wav, write_wav

    rng = np.random.default_rng(seed)
    x = np.clip(rng.standard_normal(n * channels) * 0.4, -1, 1)
    sr, y = read_wav(write_wav(x, 8000, bits=bits, channels=channels))
    assert sr == 8000
    frames = x[: len(x) // channels * channels].reshape(-1, channels)
    want = frames.mean(axis=1)
    tol = {8: 1 / 64, 16: 1 / 16384, 32: 1e-8, -32: 1e-6}[bits]
    assert len(y) == len(want)
    assert np.max(np.abs(y - want)) <= tol


@given(
    st.integers(1, 6),
    st.integers(4, 40),
    st.integers(4, 40),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_apng_roundtrip_random(n_frames, h, w, seed):
    """APNG: same-size frame stacks round-trip exactly."""
    from kraken_spark.kernels.png import decode_apng, encode_apng

    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w), dtype=np.uint8)
              for _ in range(n_frames)]
    out, delays = decode_apng(encode_apng(frames))
    assert len(out) == n_frames and len(delays) == n_frames
    assert all(np.array_equal(a, b) for a, b in zip(out, frames))


@given(st.data())
@settings(max_examples=25, deadline=None)
def test_record_slice_invariants(data):
    """BaselineOCRRecord slicing: any slice's prediction equals the string
    slice, confidence is the slice mean, and the polygon-section cut stays
    inside the boundary's bounding box."""
    from kraken_spark.kernels.records import BaselineOCRRecord

    n = data.draw(st.integers(1, 12))
    text = data.draw(st.text(
        alphabet=st.characters(min_codepoint=97, max_codepoint=122),
        min_size=n, max_size=n))
    w = 40 + 20 * n
    step = w // (n + 1)
    cuts = [[step * (i + 1), step * (i + 1) + max(step - 2, 1)]
            for i in range(n)]
    confs = [round(data.draw(st.floats(0.01, 1.0)), 4) for _ in range(n)]
    rec = BaselineOCRRecord(
        prediction=text, cuts=cuts, confidences=confs,
        line={"type": "baselines", "id": "l", "text": None,
              "base_dir": None, "imagename": None, "tags": None,
              "split": None, "regions": [], "language": None,
              "baseline": [[0, 20], [w, 20]],
              "boundary": [[0, 0], [w, 0], [w, 40], [0, 40]]})
    lo = data.draw(st.integers(0, n - 1))
    hi = data.draw(st.integers(lo + 1, n))
    pred, cut, conf = rec[lo:hi]
    assert pred == text[lo:hi]
    assert abs(conf - np.mean(confs[lo:hi])) < 1e-9
    assert all(-1 <= x <= w + 1 and -1 <= y <= 41 for x, y in cut)
    assert len(rec.cuts) == n


@given(st.binary(max_size=400))
@settings(max_examples=60, deadline=None)
def test_parse_segmentation_only_raises_valueerror(payload):
    """Any byte payload either parses or raises ValueError — never an
    arbitrary crash (the guard-row contract for XML ingestion)."""
    from kraken_spark.kernels.xmlparse import parse_segmentation

    try:
        parse_segmentation(payload)
    except ValueError:
        pass


@given(st.data())
@settings(max_examples=50, deadline=None)
def test_parse_segmentation_xmlish_fuzz(data):
    """Attribute-mangled but well-formed documents run the full parser
    bodies (region/line loops, points parsers, title parsers) without
    non-ValueError crashes."""
    from kraken_spark.kernels.xmlparse import parse_segmentation

    attr = data.draw(st.text(
        alphabet="0123456789,.- eNanxyz", max_size=18).filter(
        lambda t: '"' not in t))
    alto = f"""<alto><Description><MeasurementUnit>pixel</MeasurementUnit>
      <sourceImageInformation><fileName>x.png</fileName></sourceImageInformation>
      </Description><Layout><Page WIDTH="10" HEIGHT="10"><PrintSpace>
      <TextBlock ID="b" HPOS="{attr}" VPOS="0" WIDTH="5" HEIGHT="5">
      <TextLine ID="l" BASELINE="{attr}" HPOS="0" VPOS="0" WIDTH="5" HEIGHT="5">
      <String CONTENT="a"/></TextLine></TextBlock>
      </PrintSpace></Page></Layout></alto>"""
    page = f"""<PcGts><Page imageFilename="x" imageWidth="10" imageHeight="10">
      <TextRegion id="r" custom="structure {{type:{attr};}}"><Coords points="{attr}"/>
      <TextLine id="l"><Coords points="0,0 5,0 5,5 0,5"/>
      <Baseline points="{attr}"/><TextEquiv><Unicode>t</Unicode></TextEquiv>
      </TextLine></TextRegion></Page></PcGts>"""
    hocr = f"""<html><body><div class="ocr_page" title="bbox 0 0 10 10">
      <span class="ocr_line" title="bbox 0 0 5 5; baseline {attr}">
      <span class="ocrx_word" title="bbox 0 0 5 5; x_confs {attr}">w</span>
      </span></div></body></html>"""
    abbyy = ('<document xmlns="http://www.abbyy.com/FineReader_xml/'
             'FineReader10-schema-v1.xml"><page width="10" height="10">'
             f'<block blockType="Text"><text><par><line l="0" t="0" r="5" '
             f'b="5" baseline="{attr or 0}"><charParams l="0" r="1" '
             'wordStart="1" charConfidence="90">a</charParams>'
             "</line></par></text></block></page></document>")
    for doc in (alto, page, hocr, abbyy):
        try:
            parse_segmentation(doc.encode())
        except ValueError:
            pass


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=600))
def test_htmlparse_never_crashes_on_garbage(data):
    """The HTML pipeline's total-function contract: arbitrary bytes either
    parse (possibly to zero blocks) or raise ValueError — never any other
    exception (stages.extract_document maps ValueError to guard_tripped)."""
    from kraken_spark.kernels.htmlparse import extract_main_text, seg_from_html

    main, blks = extract_main_text(data, "en")
    assert isinstance(main, str)
    try:
        seg = seg_from_html(data, "en")
        assert seg["lines"]
    except ValueError:
        pass


@settings(max_examples=40, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",), exclude_characters="\r"
        ),
        min_size=1,
        max_size=120,
    ).filter(lambda t: all(l.strip() == l and l for l in t.split("\n")))
)
def test_htmlparse_roundtrip_arbitrary_text(text):
    """write_boilerplate_page -> extract_main_text is byte-identical for ANY
    gt text whose lines are nonempty and already whitespace-normal (the
    corpus invariant) — including markup metacharacters and entities."""
    import re as _re

    from kraken_spark.kernels.htmlparse import (
        extract_main_text,
        write_boilerplate_page,
    )

    norm = "\n".join(_re.sub(r"[ \t\f]+", " ", l) for l in text.split("\n"))
    page = write_boilerplate_page(norm, "en", "u://fuzz", seed=3)
    assert extract_main_text(page, "en")[0] == norm


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=400))
def test_codec_total_functions_on_garbage(data):
    """Every ingestion codec is a total function over bytes: ValueError on
    junk, never any other exception (the pipeline's guard-row contract)."""
    from kraken_spark.kernels.imgio import decode_image, read_dimensions
    from kraken_spark.kernels.jpeg import decode_jpeg
    from kraken_spark.kernels.tiff import decode_tiff
    from kraken_spark.sources.warc import warc_to_documents

    for fn in (decode_image, read_dimensions, decode_jpeg, decode_tiff):
        try:
            fn(data)
        except ValueError:
            pass
    try:
        rows = warc_to_documents(data)
        assert isinstance(rows, list)
    except ValueError:
        pass


@settings(max_examples=25, deadline=None)
@given(st.binary(max_size=300))
def test_codec_total_functions_on_valid_prefixes(data):
    """Magic-prefixed garbage (the adversarial case: right container, wrong
    body) must still only ValueError."""
    from kraken_spark.kernels.imgio import decode_image
    from kraken_spark.kernels.pdfraster import rasterize_pdf

    for prefix in (b"\xff\xd8", b"II\x2a\x00", b"MM\x00\x2a", b"\x89PNG\r\n\x1a\n"):
        try:
            decode_image(prefix + data)
        except ValueError:
            pass
    try:
        rasterize_pdf(b"%PDF-1.4\n" + data)
    except ValueError:  # PdfError subclasses ValueError
        pass


@given(
    st.text(alphabet="abcde ابت中é", max_size=60),
    st.text(alphabet="abcde ابت中é", max_size=60),
)
def test_myers_levenshtein_equals_row_dp(a, b):
    """The bit-parallel levenshtein (Myers/Hyyrö big-int bitvectors) must
    equal the classic row DP on arbitrary unicode inputs — the exactness
    pin for the round-5 replacement of the numpy scan-min recurrence."""
    from kraken_spark.kernels.metrics import levenshtein

    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    assert levenshtein(a, b) == prev[lb]
