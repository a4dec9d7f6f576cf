"""Native C++ collator vs the numpy fallback (bit-identical results)."""
import numpy as np
import pytest

from timewarp_tpu.data import native_collate as nc


def test_native_extension_builds():
    """g++ is in the image; the extension must build and load."""
    assert nc.native_available()


@pytest.mark.parametrize("dtype", [np.float32, np.int32, np.float64])
def test_pad_stack_matches_numpy(rng, dtype):
    arrays = [
        (rng.normal(size=(n, 3)) * 10).astype(dtype) for n in (3, 7, 5, 1, 8)
    ]
    v_pad = 11
    out = nc.pad_stack(arrays, v_pad)
    assert out.shape == (5, 11, 3) and out.dtype == dtype
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(out[i, : a.shape[0]], a)
        assert (out[i, a.shape[0] :] == 0).all()


def test_pad_stack_1d(rng):
    arrays = [rng.integers(0, 5, size=(n,)).astype(np.int32) for n in (2, 6)]
    out = nc.pad_stack(arrays, 8)
    assert out.shape == (2, 8)
    np.testing.assert_array_equal(out[1, :6], arrays[1])
    assert (out[0, 2:] == 0).all()


def test_pad_stack_noncontiguous_falls_back(rng):
    """Non-C-contiguous inputs still collate correctly (numpy fallback)."""
    base = rng.normal(size=(6, 6)).astype(np.float32)
    arrays = [base[:4, ::2], base[:2, ::2]]  # strided views
    out = nc.pad_stack(arrays, 5)
    assert out.shape == (2, 5, 3)
    np.testing.assert_array_equal(out[0, :4], arrays[0])
    assert (out[1, 2:] == 0).all()


def test_pad_stack_oversized_row_raises():
    """A row longer than v_pad must not silently truncate or overflow."""
    arrays = [np.ones((4, 3), np.float32), np.ones((2, 3), np.float32)]
    with pytest.raises(ValueError):
        out = np.zeros((2, 3, 3), np.float32)
        ext = nc._load()
        if ext is None:
            raise ValueError("no extension")  # fallback parity
        ext.pad_stack_into(arrays, out)


def test_lengths_to_mask():
    lengths = np.array([3, 8, 1, 5], dtype=np.int32)
    got = nc.lengths_to_mask(lengths, 8)
    want = np.arange(8)[None, :] >= lengths[:, None]
    np.testing.assert_array_equal(got, want)


def test_collate_dense_uses_native(rng, dummy_datapoints):
    """The DenseBatch collation path produces identical batches with the
    native pad_stack engaged."""
    from timewarp_tpu.data.batch import collate_dense

    b = collate_dense(dummy_datapoints)
    assert b.atom_coords.shape[0] == 2
    np.testing.assert_allclose(
        np.asarray(b.atom_coords[0, :3]), dummy_datapoints[0].atom_coords
    )
    assert bool(np.asarray(b.masked_elements[0, 3:]).all())


def test_pad_stack_mixed_dtypes_falls_back(rng):
    """An off-dtype row must not be reinterpreted as raw bytes."""
    arrays = [
        np.ones((2, 3), np.float32),
        (rng.normal(size=(3, 3))).astype(np.float64),
    ]
    out = nc.pad_stack(arrays, 4)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out[1, :3], arrays[1].astype(np.float32))
