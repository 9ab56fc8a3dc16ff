"""Length regulator / segment-op tests vs numpy repeat/loop references."""

import jax.numpy as jnp
import numpy as np

from emotts.nn.length_regulator import (
    average_over_durations,
    length_regulate,
    phone_index_map,
    segment_mean,
)


def test_phone_index_map():
    durs = jnp.array([[2, 3, 1], [1, 0, 2]])
    idx = np.asarray(phone_index_map(durs, 8))
    np.testing.assert_array_equal(idx[0], [0, 0, 1, 1, 1, 2, 2, 2])  # tail clamps
    # zero-duration phone 1 is skipped
    np.testing.assert_array_equal(idx[1][:3], [0, 2, 2])


def test_length_regulate_matches_repeat():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 3)).astype(np.float32)
    durs = np.array([[2, 0, 3, 1], [1, 2, 0, 0]])
    out, lens = length_regulate(jnp.asarray(x), jnp.asarray(durs), max_len=8)
    out, lens = np.asarray(out), np.asarray(lens)
    np.testing.assert_array_equal(lens, [6, 3])
    for b in range(2):
        expect = np.repeat(x[b], durs[b], axis=0)
        np.testing.assert_allclose(out[b, : lens[b]], expect, rtol=1e-6)
        assert (out[b, lens[b]:] == 0).all()


def test_length_regulate_overflow_clips():
    x = np.ones((1, 2, 1), np.float32)
    durs = np.array([[5, 5]])
    out, lens = length_regulate(jnp.asarray(x), jnp.asarray(durs), max_len=6)
    assert int(lens[0]) == 6
    assert np.asarray(out).sum() == 6


def test_average_over_durations_matches_loop():
    rng = np.random.default_rng(1)
    t = 12
    values = rng.standard_normal((2, t)).astype(np.float32)
    durs = np.array([[3, 4, 5, 0], [2, 2, 2, 6]])
    avg = np.asarray(average_over_durations(jnp.asarray(values), jnp.asarray(durs)))
    for b in range(2):
        pos = 0
        for p, d in enumerate(durs[b]):
            if d == 0:
                assert avg[b, p] == 0.0
            else:
                np.testing.assert_allclose(
                    avg[b, p], values[b, pos : pos + d].mean(), rtol=1e-5
                )
            pos += d


def test_segment_mean_matches_loop():
    rng = np.random.default_rng(2)
    frames = rng.standard_normal((2, 10, 5)).astype(np.float32)
    durs = np.array([[4, 6, 0], [3, 3, 4]])
    got = np.asarray(segment_mean(jnp.asarray(frames), jnp.asarray(durs)))
    for b in range(2):
        pos = 0
        for p, d in enumerate(durs[b]):
            if d == 0:
                np.testing.assert_array_equal(got[b, p], 0.0)
            else:
                np.testing.assert_allclose(
                    got[b, p], frames[b, pos : pos + d].mean(axis=0), rtol=1e-5
                )
            pos += d


def test_segment_mean_is_intensity_bridge():
    """The FS2 train-time intensity bridge (frame I → phone-level rep) is a
    segment mean over ground-truth durations (fastspeech2/train.py:34-49)."""
    rng = np.random.default_rng(3)
    i_frames = rng.standard_normal((1, 8, 5)).astype(np.float32)
    durs = np.array([[2, 3, 3]])
    rep = np.asarray(segment_mean(jnp.asarray(i_frames), jnp.asarray(durs)))
    assert rep.shape == (1, 3, 5)
    np.testing.assert_allclose(rep[0, 0], i_frames[0, :2].mean(axis=0), rtol=1e-5)
    np.testing.assert_allclose(rep[0, 2], i_frames[0, 5:8].mean(axis=0), rtol=1e-5)
