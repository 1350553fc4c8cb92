"""Round-9 operator invariants (beyond the DuckDB oracles)."""

from __future__ import annotations

import pytest

from realestate_engine.registry import QUERIES, load_all

load_all()

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from realestate_engine.session import create_session

    return create_session()


@pytest.fixture(scope="module")
def sf_dir():
    return SF_DIR


def test_flac_audit_plants_are_independent_and_exact(spark, sf_dir):
    rows = QUERIES["mm_flac_crc_audit"](spark, sf_dir).collect()
    assert len(rows) == 70
    for r in rows:
        d = r.doc_id
        assert r.n_frames == 2 + d % 4
        assert r.n_samples == (1 + d % 2) * 64 * (2 + d % 4)
        assert r.n_crc8_bad == (1 if d % 11 == 4 else 0), d
        # the CRC-16 covers the stored CRC-8 byte, so a CRC-8 plant
        # also breaks exactly that frame's CRC-16
        assert r.n_crc16_bad == (d % 11 == 4) + (d % 7 == 2), d
        assert r.md5_ok == (d % 5 != 1), d


def test_flac_audit_walk_is_structural_not_checksum_gated():
    """A checksum flip must not derail the walk (unlike decode_flac,
    which raises) — and a residual-byte flip is a structural error."""
    from realestate_engine.flac import audit_flac_frames, decode_flac, encode_flac

    samples = [((i * 31) % 128) - 64 for i in range(3 * 64)]
    blob = encode_flac(8000, 1, samples, blocksize=64)
    clean = audit_flac_frames(blob)
    assert len(clean["frames"]) == 3 and clean["md5_ok"]
    assert all(f["crc8_ok"] and f["crc16_ok"] for f in clean["frames"])

    flipped = bytearray(blob)
    flipped[-1] ^= 0xFF  # last frame's stored CRC-16 low byte
    audited = audit_flac_frames(bytes(flipped))
    assert [f["crc16_ok"] for f in audited["frames"]] == [True, True, False]
    assert audited["md5_ok"]  # samples untouched
    with pytest.raises(ValueError):
        decode_flac(bytes(flipped))  # the strict decoder still refuses
