"""True-height (non-parametric) inversion: ionogram → Ne(h) lamination.

Capability beyond the reference (its inversion is parametric-only,
``/root/reference/PyRayHF/library.py:672-825``); validated here by
round-tripping through this package's own forward operator, the same
internal-consistency strategy the reference's cross-solver tests use
(``tests/test_core.py:771-840``).
"""

import numpy as np
import pytest

from pyrayhf_tpu import (retrieve_profile, retrieve_profile_batch,
                         vertical_forward_operator)
from pyrayhf_tpu.magnetoionic import freq2den


@pytest.fixture(scope="module")
def chapman():
    alt = np.arange(80.0, 600.0, 0.5)
    nm = freq2den(9e6)
    z = (alt - 300.0) / 45.0
    den = np.asarray(nm * np.exp(0.5 * (1 - z - np.exp(-z))))
    bmag = np.full_like(alt, 4.5e-5)
    bpsi = np.full_like(alt, 35.0)
    freq = np.linspace(2.0, 8.8, 16)
    return alt, den, bmag, bpsi, freq


def _invert(chapman, mode):
    alt, den, bmag, bpsi, freq = chapman
    vh = np.asarray(vertical_forward_operator(freq, den, bmag, bpsi, alt,
                                              mode=mode))
    assert np.all(np.isfinite(vh))
    out = retrieve_profile(freq, vh, alt, bmag, bpsi, mode=mode)
    return vh, out


@pytest.mark.parametrize("mode", ["O", "X"])
def test_chapman_roundtrip(chapman, mode):
    """Inverting a Chapman-layer ionogram refits it to sub-km rms and
    recovers near-peak true heights to ~km accuracy."""
    alt, den, bmag, bpsi, freq = chapman
    vh, out = _invert(chapman, mode)
    assert float(out["rms_km"]) < 0.2

    h = np.asarray(out["h_knots_km"])
    ne = np.asarray(out["ne_knots_m3"])
    # physical ordering: higher frequency reflects higher, denser
    assert np.all(np.diff(h) > 0)
    assert np.all(np.diff(ne) > 0)
    # true height below virtual height (group index >= 1)
    assert np.all(h < vh + 1e-9)

    # true reflection heights from the known profile (bottomside branch)
    below = alt <= 300.0
    h_true = np.interp(ne, den[below], alt[below])
    err = h - h_true
    # start-model bias (classical): largest at the lowest knot, decaying
    # upward; near-peak knots are accurate
    assert abs(err[-1]) < (1.0 if mode == "O" else 5.0)
    assert np.max(np.abs(err)) < 25.0


def test_in_model_class_identity(chapman):
    """An ionogram whose truth IS a lamination profile refits tightly."""
    alt, den, bmag, bpsi, freq = chapman
    _, out0 = _invert(chapman, "O")
    den_fit = np.asarray(out0["den_fit"])
    vh2 = np.asarray(vertical_forward_operator(freq, den_fit, bmag, bpsi,
                                               alt, mode="O"))
    out2 = retrieve_profile(freq, vh2, alt, bmag, bpsi, mode="O")
    assert float(out2["rms_km"]) < 0.15
    dh = np.abs(np.asarray(out2["h_knots_km"])
                - np.asarray(out0["h_knots_km"]))
    # |dvh/dh| is smallest at the lowest knots, so height identity is
    # loosest there; the near-peak knots pin tightly
    assert np.max(dh) < 2.0
    assert np.max(dh[-2:]) < 0.2


def test_batch_matches_single(chapman):
    alt, den, bmag, bpsi, freq = chapman
    vh, out1 = _invert(chapman, "O")
    batch = np.stack([vh, vh + 1.0])
    outb = retrieve_profile_batch(freq, batch, alt, bmag, bpsi, mode="O")
    np.testing.assert_allclose(np.asarray(outb["h_knots_km"][0]),
                               np.asarray(out1["h_knots_km"]),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(outb["den_fit"][0]),
                               np.asarray(out1["den_fit"]),
                               rtol=0, atol=1e-6)
    # the +1 km trace retrieves different (higher) knots
    assert np.all(np.asarray(outb["h_knots_km"][1])
                  >= np.asarray(outb["h_knots_km"][0]) - 1e-9)


def test_nan_samples_dropped(chapman):
    alt, den, bmag, bpsi, freq = chapman
    vh, out1 = _invert(chapman, "O")
    f_aug = np.concatenate([freq, [9.7, 10.4]])
    vh_aug = np.concatenate([vh, [np.nan, np.nan]])
    out = retrieve_profile(f_aug, vh_aug, alt, bmag, bpsi, mode="O")
    assert out["h_knots_km"].shape[0] == freq.shape[0]
    np.testing.assert_allclose(np.asarray(out["h_knots_km"]),
                               np.asarray(out1["h_knots_km"]),
                               rtol=0, atol=1e-9)


def test_too_few_samples_raises(chapman):
    alt, den, bmag, bpsi, _ = chapman
    with pytest.raises(ValueError, match="at least 2"):
        retrieve_profile([5.0], [250.0], alt, bmag, bpsi)
    with pytest.raises(ValueError, match="at least 2"):
        retrieve_profile_batch([5.0], [[250.0]], alt, bmag, bpsi)


def test_input_guards(chapman):
    alt, den, bmag, bpsi, _ = chapman
    with pytest.raises(ValueError, match="n_passes"):
        retrieve_profile([3.0, 5.0], [150.0, 250.0], alt, bmag, bpsi,
                         n_passes=0)
    with pytest.raises(ValueError, match="all-finite"):
        retrieve_profile_batch([3.0, 5.0], [[150.0, np.nan]], alt,
                               bmag, bpsi)
    # X-mode knot relation fN^2 = f(f - fH) needs f above the
    # gyrofrequency (fH ~ 1.26 MHz for |B| = 4.5e-5 T)
    with pytest.raises(ValueError, match="gyrofrequency"):
        retrieve_profile([1.0, 5.0], [120.0, 250.0], alt, bmag, bpsi,
                         mode="X")


def test_saturated_trace_stays_sorted(chapman):
    """Observed vh beyond what the model can reach within the grid must
    not corrupt the profile assembly (knots saturate at the ceiling and
    stack, den_fit stays monotone-interpolable)."""
    alt, den, bmag, bpsi, freq = chapman
    vh = np.asarray(vertical_forward_operator(freq, den, bmag, bpsi, alt,
                                              mode="O"))
    vh_bad = vh.copy()
    vh_bad[-3:] = 2000.0            # unreachable spike near foF2
    out = retrieve_profile(freq, vh_bad, alt, bmag, bpsi)
    h = np.asarray(out["h_knots_km"])
    assert np.all(np.diff(h) > 0)
    assert np.all(np.isfinite(np.asarray(out["den_fit"])))
    # the untouched lower trace still fits
    resid = np.asarray(out["vh_fit"])[:-3] - vh[:-3]
    assert np.nanmax(np.abs(resid)) < 1.0
