"""Real byte-format decoders behind the multimodal plumbing (r04):
PPM P6 and RIFF/WAVE PCM16, parsed in pure numpy, plus the Spark-side
decode pipeline against hand-computed goldens.
"""

import io
import wave

import numpy as np
import pytest

from tinybrain_spark.multimodal import (
    decode_images,
    decode_payload,
    parse_ppm,
    parse_wav,
    synth_ppm_payloads,
)


def _ppm_bytes(w, h, body=None, comment=True):
    hdr = b"P6\n"
    if comment:
        hdr += b"# a comment line\n"
    hdr += f"{w} {h}\n255\n".encode()
    if body is None:
        body = bytes(range(w * h * 3 % 256)) * 0 + bytes(
            (i * 7) % 256 for i in range(w * h * 3)
        )
    return hdr + body


def test_parse_ppm_golden():
    w, h = 3, 2
    body = bytes((i * 7) % 256 for i in range(w * h * 3))
    gw, gh, pix = parse_ppm(_ppm_bytes(w, h, body))
    assert (gw, gh) == (w, h)
    assert pix.shape == (2, 3, 3)
    assert pix[0, 0, 0] == 0 and pix[0, 0, 1] == 7 and pix[0, 1, 0] == 21
    # red channel = every 3rd byte starting at 0
    assert pix[:, :, 0].ravel().tolist() == [
        (i * 7) % 256 for i in range(0, 18, 3)
    ]


def test_parse_ppm_header_variants_and_rejections():
    # multiple comments + arbitrary whitespace between header fields
    body = bytes(12)
    hdr = b"P6 # trailing\n# two\n 2\t1 \n255 " + body
    w, h, pix = parse_ppm(hdr)
    assert (w, h) == (2, 1) and pix.sum() == 0
    with pytest.raises(NotImplementedError, match="magic"):
        parse_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(NotImplementedError, match="16-bit"):
        parse_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        parse_ppm(b"P6\n4 4\n255\n\x00\x00")


def test_parse_wav_roundtrip_stdlib_writer():
    """Files produced by python's own wave module must parse."""
    rng = np.random.default_rng(9)
    samples = rng.integers(-30000, 30000, size=(441, 2), dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(samples.tobytes())
    rate, n_ch, got = parse_wav(buf.getvalue())
    assert (rate, n_ch) == (8000, 2)
    assert np.array_equal(got, samples)


def test_parse_wav_rejections():
    with pytest.raises(NotImplementedError, match="magic"):
        parse_wav(b"OggS" + bytes(40))
    # non-PCM format tag
    fmt = (
        b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (3).to_bytes(2, "little")  # IEEE float
        + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little")
        + (32000).to_bytes(4, "little")
        + (4).to_bytes(2, "little")
        + (32).to_bytes(2, "little")
    )
    with pytest.raises(NotImplementedError, match="non-PCM"):
        parse_wav(fmt)


def test_decode_payload_dispatches_real_ppm():
    w, h = 5, 3
    meta = decode_payload(_ppm_bytes(w, h))
    assert (meta["fake_width"], meta["fake_height"]) == (w, h)
    # non-image payloads keep the legacy deterministic fallback
    meta2 = decode_payload(b"hello world")
    assert meta2["n_bytes"] == 11


def test_decode_images_spark_pipeline_golden(spark):
    """synth -> Arrow binary -> real parse: stats must equal the
    arithmetic definition byte for byte."""
    docs = spark.createDataFrame([(0,), (5,), (17,)], "doc_id long")
    out = {
        r["doc_id"]: r.asDict()
        for r in decode_images(synth_ppm_payloads(docs)).collect()
    }
    for did in (0, 5, 17):
        w, h = did % 13 + 4, did % 7 + 4
        b = (did * 31 + np.arange(w * h * 3, dtype=np.int64)) % 251
        assert out[did]["width"] == w and out[did]["height"] == h
        assert out[did]["n_pix"] == w * h
        assert out[did]["pix_sum"] == int(b.sum())
        assert out[did]["r_sum"] == int(b[0::3].sum())


def test_parse_pgm_known_bytes_and_magic_guard():
    """3x2 grayscale with bytes 0..5: row-major reshape puts 0 and 4 on
    the diagonal; P4 (bitmap) raises like any unsupported codec."""
    import numpy as np
    import pytest

    from tinybrain_spark.multimodal import parse_pgm

    payload = b"P5\n# comment\n3 2\n255\n" + bytes(range(6))
    w, h, pix = parse_pgm(payload)
    assert (w, h) == (3, 2)
    assert pix.shape == (2, 3)
    assert int(np.diagonal(pix).sum()) == 0 + 4
    with pytest.raises(NotImplementedError):
        parse_pgm(b"P4\n3 2\n255\n" + bytes(6))
    with pytest.raises(ValueError):
        parse_pgm(b"P5\n3 2\n255\n" + bytes(3))  # truncated body
