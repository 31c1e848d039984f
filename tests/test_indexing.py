import numpy as np
import pytest

from icebin_tpu.utils.indexing import Domain, Indexing


def test_c_order_round_trip():
    ix = Indexing.c_order((3, 4, 5))
    flat = ix.tuple_to_index(1, 2, 3)
    assert flat == (1 * 20 + 2 * 5 + 3)
    assert ix.index_to_tuple(flat) == (1, 2, 3)


def test_f_order_matches_modele_layout():
    # ModelE (im, jm) with i varying fastest: flat = j*im + i.
    ix = Indexing.f_order((144, 90), names=("lon", "lat"))
    assert ix.tuple_to_index(7, 3) == 3 * 144 + 7
    i, j = ix.index_to_tuple(3 * 144 + 7)
    assert (i, j) == (7, 3)


def test_vectorized_round_trip():
    ix = Indexing.f_order((11, 7))
    flat = np.arange(ix.size)
    i, j = ix.index_to_tuple(flat)
    back = ix.tuple_to_index(i, j)
    np.testing.assert_array_equal(back, flat)
    # Fortran-order flattening of an arr[j, i] C-array matches flat order.
    arr = np.arange(7 * 11).reshape(7, 11)
    np.testing.assert_array_equal(arr.reshape(-1)[flat], arr[j, i])


def test_base_offset():
    ix = Indexing(shape=(10, 10), base=(1, 1),
                  major_to_minor=(1, 0))
    assert ix.tuple_to_index(1, 1) == 0
    assert ix.index_to_tuple(0) == (1, 1)


def test_bad_permutation():
    with pytest.raises(ValueError):
        Indexing(shape=(2, 2), major_to_minor=(0, 0))


def test_domain():
    d = Domain(low=(2, 3), high=(5, 9))
    assert d.shape == (3, 6)
    assert d.size == 18
    ok = d.in_domain(np.array([2, 4, 5]), np.array([3, 8, 3]))
    np.testing.assert_array_equal(ok, [True, True, False])
