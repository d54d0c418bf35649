"""Native C++ edit-distance kernel vs pure-python reference."""

import numpy as np

from espnet_tpu.utils.metrics import (
    EditStats, batch_edit_stats, edit_distance,
)


def test_native_matches_python():
    rng = np.random.RandomState(0)
    refs, hyps = [], []
    for _ in range(50):
        n, m = rng.randint(0, 20, 2)
        refs.append([str(x) for x in rng.randint(0, 8, n)])
        hyps.append([str(x) for x in rng.randint(0, 8, m)])
    native = batch_edit_stats(refs, hyps)
    for r, h, st in zip(refs, hyps, native):
        ref_st = edit_distance(r, h)
        assert (st.hits, st.substitutions, st.deletions, st.insertions) == (
            ref_st.hits, ref_st.substitutions, ref_st.deletions,
            ref_st.insertions,
        ), (r, h)


def test_native_library_builds():
    from espnet_tpu.native import load_library

    lib = load_library("editdist", ["edit_distance.cpp"])
    assert lib is not None, "g++ is available in this image; build must work"


def test_known_counts():
    [st] = batch_edit_stats([["a", "b", "c"]], [["a", "x", "c", "d"]])
    assert st.hits == 2 and st.substitutions == 1
    assert st.deletions == 0 and st.insertions == 1
    assert st.errors == 2
