"""Property-based spot checks (SURVEY.md §5 item 5): random filler with
PLANTED anchor+value -> the kernel recovers a value AND agrees with the
actual reference function on the same random text. Deterministic
(derandomize) so CI is stable."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from structured_data_entity_extraction_spark import refsem
from tests.ref_loader import load_reference

REF = load_reference()

pytestmark = pytest.mark.skipif(REF is None, reason="reference repo not present")

# consonant-only filler: cannot collide with any anchor (all anchors
# contain vowels) nor with '$', digits, or '33'
_FILLER_WORD = st.text(alphabet="bcdfghjklmnpqrstvwxz", min_size=1, max_size=8)
_FILLER = st.lists(_FILLER_WORD, min_size=0, max_size=30).map(" ".join)

_SETTINGS = dict(
    max_examples=60,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(
    pre=_FILLER,
    post=_FILLER,
    whole=st.integers(min_value=1, max_value=99_999_999),
    cents=st.integers(min_value=0, max_value=99),
)
def test_planted_money_recovered(pre, post, whole, cents):
    text = f"{pre} VALOR CONCLUIDO ${whole:,}.{cents:02d} {post}"
    got = refsem.valor(text)
    want = REF["valor"](text)
    assert tuple(got) == tuple(want)
    assert got[1] == "SI"
    assert got[0].endswith(f".{cents:02d}")


@settings(**_SETTINGS)
@given(
    pre=_FILLER,
    post=_FILLER,
    day=st.integers(min_value=1, max_value=28),
    month=st.integers(min_value=1, max_value=12),
    year=st.integers(min_value=1990, max_value=2030),
)
def test_planted_date_recovered(pre, post, day, month, year):
    text = f"{pre} fecha del {day:02d}/{month:02d}/{year} {post}"
    got = refsem.fecha(text)
    want = REF["fecha"](text)
    assert got == want
    assert got == f"{year}-{month:02d}-{day:02d}"


_PREFIXES = sorted(refsem.geo_dims()["state_prefix_map"].items())


@settings(**_SETTINGS)
@given(
    pre=_FILLER,
    post=_FILLER,
    idx=st.integers(min_value=0, max_value=len(_PREFIXES) - 1),
)
def test_planted_estado_recovered(pre, post, idx):
    prefix, canonical = _PREFIXES[idx]
    text = f"{pre} ENTIDAD FEDERATIVA {prefix} {post}"
    got = refsem.estado(text)
    want = REF["estado"](text)
    assert got == want
    # window is 100 chars past the anchor; the prefix always fits,
    # and consonant filler can't introduce a competing keyword
    assert got == refsem.fold_tildes(canonical)


@settings(**_SETTINGS)
@given(texts=st.lists(st.text(max_size=200), min_size=1, max_size=8))
def test_never_raises_and_matches_reference(texts):
    """Arbitrary unicode garbage: kernels must not raise and must agree
    with the reference on every field."""
    for t in texts:
        for fn in ("validez", "opcion_de_firma", "estado", "colonia", "calle", "fecha"):
            assert getattr(refsem, fn)(t) == REF[fn](t), (fn, repr(t))
        assert tuple(refsem.valor(t)) == tuple(REF["valor"](t)), repr(t)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    channels=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
def test_png_codec_roundtrip_property(w, h, channels, data):
    """encode->decode recovers arbitrary pixel buffers for every
    supported channel count and geometry (pure stdlib codec)."""
    from structured_data_entity_extraction_spark.ops import modal_codecs as mc

    n = w * h * channels
    pixels = bytes(data.draw(st.binary(min_size=n, max_size=n)))
    img = mc.decode_png(mc.encode_png(w, h, pixels, channels=channels))
    assert (img["width"], img["height"], img["channels"]) == (w, h, channels)
    assert bytes(img["pixels"]) == pixels


@settings(**_SETTINGS)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=64),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_codec_roundtrip_property(samples, rate):
    import struct

    from structured_data_entity_extraction_spark.ops import modal_codecs as mc

    wav = mc.decode_wav(mc.encode_wav(samples, sample_rate=rate))
    assert wav["sample_rate"] == rate and wav["n_frames"] == len(samples)
    got = list(struct.unpack(f"<{len(samples)}h", wav["pcm"])) if samples else []
    assert got == samples


@settings(**_SETTINGS)
@given(
    tokens=st.lists(
        st.text(alphabet=st.characters(codec="utf-8", exclude_categories=["Z", "C"]), max_size=8),
        max_size=60,
    )
)
def test_simhash_numpy_kernel_matches_scalar(tokens):
    """The vectorized simhash kernel is bit-identical to the scalar
    reference on arbitrary token streams (incl. empty)."""
    from structured_data_entity_extraction_spark.ops.dedup import _simhash_np, _simhash_one

    assert _simhash_np(tokens) == _simhash_one(tokens)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 10),
    h=st.integers(1, 8),
    n_frames=st.integers(0, 6),
    cspace=st.sampled_from(["420", "422", "444", "mono"]),
    data=st.data(),
)
def test_y4m_codec_roundtrip_property(w, h, n_frames, cspace, data):
    """encode->decode recovers arbitrary luma planes for every
    supported chroma layout and geometry (pure stdlib codec)."""
    from structured_data_entity_extraction_spark.ops import modal_codecs as mc

    n = w * h
    frames = [
        bytes(data.draw(st.binary(min_size=n, max_size=n))) for _ in range(n_frames)
    ]
    vid = mc.decode_y4m(mc.encode_y4m(w, h, frames, cspace=cspace))
    assert (vid["width"], vid["height"], vid["n_frames"]) == (w, h, n_frames)
    assert [bytes(p) for p in vid["y_planes"]] == frames


@settings(**_SETTINGS)
@given(
    sim=st.integers(0, (1 << 64) - 1),
    flips=st.lists(st.integers(0, 63), min_size=0, max_size=3, unique=True),
)
def test_manku_block_agreement_property(sim, flips):
    """The pigeonhole behind simhash_candidates: ANY pair within
    hamming 3 of a 64-bit hash agrees exactly on >= 3 of the 6 blocks
    _simhash_blocks(6) defines -- validated on the same offsets/widths
    the Spark bit-slicing uses, so an off-by-one in the block layout
    cannot silently cost recall."""
    from structured_data_entity_extraction_spark.ops.dedup import _simhash_blocks

    other = sim
    for b in flips:
        other ^= 1 << b
    blocks = _simhash_blocks(6)
    agree = sum(
        1
        for off, w in blocks
        if (sim >> off) & ((1 << w) - 1) == (other >> off) & ((1 << w) - 1)
    )
    assert agree >= 6 - 3


def test_simhash_oracle_block_layout_matches_engine():
    """The DuckDB oracle hardcodes the 6-block layout (four 11-bit then
    two 10-bit); it must be the SAME layout _simhash_blocks(6) gives
    the engine, or the two sides generate candidates from different
    block boundaries (recall stays exact either way, but the mirrored
    condition would be a lie)."""
    from structured_data_entity_extraction_spark.ops.dedup import _simhash_blocks

    oracle_layout, off = [], 0
    for i in range(6):
        w = 11 if i < 4 else 10
        oracle_layout.append((off, w))
        off += w
    assert _simhash_blocks(6) == oracle_layout
    assert off == 64
