import numpy as np

from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.utils import alphabet as ab


def test_single_seq_no_ns():
    ref = reference_from_seqs({"c1": "ACGTACGT"})
    assert ref.names == ["c1"]
    assert ref.n == 8
    assert ab.decode(ref.joined) == "ACGTACGT"
    assert ref.joined_to_text(0) == (0, 0)
    assert ref.joined_to_text(7) == (0, 7)
    assert ref.joined_to_text(5, 3) == (0, 5)
    assert ref.joined_to_text(5, 4) is None  # runs off the end


def test_ambiguous_runs_excluded():
    #            0123456789012345
    ref = reference_from_seqs({"c1": "NNACGTNNNCCGGNN"})
    assert ref.n == 8
    assert ab.decode(ref.joined) == "ACGTCCGG"
    # fragment records
    np.testing.assert_array_equal(ref.frag_joined, [0, 4])
    np.testing.assert_array_equal(ref.frag_toff, [2, 9])
    np.testing.assert_array_equal(ref.frag_len, [4, 4])
    # joined offset 4 is chromosome offset 9
    assert ref.joined_to_text(4) == (0, 9)
    # alignment crossing the N gap is invalid
    assert ref.joined_to_text(2, 4) is None
    assert ref.joined_to_text(4, 4) == (0, 9)
    # text_to_joined inverse
    assert ref.text_to_joined(0, 9) == 4
    assert ref.text_to_joined(0, 6) is None


def test_multi_chromosome():
    ref = reference_from_seqs({"c1": "ACGT", "c2": "GGGG"})
    assert ref.names == ["c1", "c2"]
    assert ref.joined_to_text(4) == (1, 0)
    assert ref.joined_to_text(2, 4) is None  # crosses chromosome boundary
    np.testing.assert_array_equal(ref.tlens, [4, 4])


def test_get_stretch_pads_n():
    ref = reference_from_seqs({"c1": "ACGT"})
    w = ref.get_stretch(-2, 8)
    assert ab.decode(w) == "NNACGTNN"
