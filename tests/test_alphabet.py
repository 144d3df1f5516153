import numpy as np

from hisat2_tpu.utils import alphabet as ab


def test_encode_decode_roundtrip():
    s = "ACGTNacgtn"
    codes = ab.encode(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert ab.decode(codes) == "ACGTNACGTN"


def test_iupac_maps_to_n():
    assert all(c == 4 for c in ab.encode("RYKMSWBDHV"))


def test_revcomp():
    assert ab.decode(ab.revcomp(ab.encode("AACGT"))) == "ACGTT"
    assert ab.decode(ab.revcomp(ab.encode("AN"))) == "NT"


def test_pack_unpack_roundtrip(rng):
    for n in [0, 1, 15, 16, 17, 100, 1000]:
        codes = rng.integers(0, 4, size=n).astype(np.uint8)
        packed = ab.pack_2bit(codes)
        assert packed.dtype == np.uint32
        out = ab.unpack_2bit(packed, n)
        np.testing.assert_array_equal(out, codes)


def test_pack_rejects_n():
    import pytest
    with pytest.raises(ValueError):
        ab.pack_2bit(np.array([0, 4], dtype=np.uint8))
