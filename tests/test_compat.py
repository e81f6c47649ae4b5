"""MATLAB-compat utils vs reference `misc` semantics (SURVEY.md §2.3 row 12)."""
import numpy as np
import pytest

from eaqhm_tpu.utils import compat


def test_constants():
    assert compat.normalize == 32768
    assert compat.min_interp_size == 4


def test_transpose1d_array():
    out = compat.transpose1d_array([1, 2, 3])
    assert out.shape == (3, 1)
    np.testing.assert_array_equal(out.ravel(), [1, 2, 3])


def test_mytranspose():
    assert compat.mytranspose([5]).shape == (1, 1)
    a = np.arange(6).reshape(2, 3)
    np.testing.assert_array_equal(compat.mytranspose(a), a.T)


def test_end_nested():
    assert compat.end(np.asarray([1, 2, 3, 4, 5])) == 5
    assert compat.end([[1, 2, 3], [4, 5, 6]]) == 6
    assert compat.end(7) == 7


def test_array_by_index():
    # reference docstring example (misc.py:71-73)
    out = compat.array_by_index(np.asarray([0, 2, 4, 6]), [1, 2, 3, 4])
    np.testing.assert_array_equal(out, [1, 0, 2, 0, 3, 0, 4])


def test_array_by_index_scalar_broadcast():
    out = compat.array_by_index(np.asarray([1, 3]), 9)
    np.testing.assert_array_equal(out, [0, 9, 0, 9])


def test_singlelize():
    assert compat.singlelize([1]) == 1
    assert compat.singlelize([[1]]) == 1
    np.testing.assert_array_equal(compat.singlelize([[1, 2, 3]]), [1, 2, 3])
    assert compat.singlelize(4.5) == 4.5


def test_apply_fn_nested():
    out = compat.apply_fn([[1, 2], [3, 4]], lambda v: v * 2)
    np.testing.assert_array_equal(out, [[2, 4], [6, 8]])
    with pytest.raises(TypeError):
        compat.apply_fn("nope", lambda v: v)


def test_predicates():
    assert compat.is_num(3) and compat.is_num(3.5) and compat.is_num(np.float32(1))
    assert compat.is_complex(1 + 2j) and compat.is_num(1 + 2j)
    assert not compat.is_num([1])
    assert compat.is_container([1]) and compat.is_container(np.zeros(2))
    assert not compat.is_container((1, 2))
    assert compat.is_empty([]) and not compat.is_empty([1])
    assert not compat.is_empty(0)


def test_reference_name_aliases():
    assert compat.transpose1dArray is compat.transpose1d_array
    assert compat.arrayByIndex is compat.array_by_index
    assert compat.isNum is compat.is_num
    assert compat.ellipFilter is compat.ellip_filter


def test_medfilt_vs_reference_semantics():
    """Order-p edge-replicated median == the reference's toeplitz+median."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=50)
    p = 5
    ad = (p - 1) // 2
    xp = np.concatenate([x[0] * np.ones(ad), x, x[-1] * np.ones(ad)])
    expected = np.asarray([np.median(xp[i:i + p]) for i in range(len(x))])
    got = np.asarray(compat.medfilt(x, p))
    # f64 exact; the f32 TPU tier casts the inputs (median is an order
    # statistic, so the only error is the input rounding itself)
    import jax
    atol = 1e-12 if jax.config.jax_enable_x64 else 1e-6
    np.testing.assert_allclose(got, expected, rtol=0, atol=atol)
