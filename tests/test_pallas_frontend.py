"""Pallas fused frontend kernel vs the pure-XLA reference path (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from orbslam2commentedbyxcm_tpu.ops import orb as orbm
from orbslam2commentedbyxcm_tpu.ops.pallas_frontend import fused_frontend


def test_fused_frontend_matches_xla(rng):
    img = jnp.asarray(rng.uniform(0, 255, (96, 128)).astype(np.float32))
    blur, shi, slo = fused_frontend(img, 20.0, 7.0, interpret=True)

    blur_ref = orbm._separable_blur(img, orbm._gauss_kernel(9, 3.0))
    s_hi, s_lo, _ = orbm._fast_maps(img, 20.0, 7.0)
    nhi, nlo = orbm._nms3(s_hi), orbm._nms3(s_lo)

    interior = np.zeros((96, 128), bool)
    interior[40:-40, 40:-40] = True
    np.testing.assert_allclose(
        np.asarray(blur)[interior], np.asarray(blur_ref)[interior], atol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(shi)[interior], np.asarray(nhi)[interior])
    np.testing.assert_array_equal(np.asarray(slo)[interior], np.asarray(nlo)[interior])
    assert (np.asarray(shi)[interior] > 0).sum() > 20  # found real corners


def test_extractor_pallas_interpret_equals_xla(rng):
    """Full extraction pipeline through both frontend paths."""
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    ext_xla = orbm.ORBExtractor(n_features=200, use_pallas=False)
    fx = ext_xla(img)

    ext_pl = orbm.ORBExtractor(n_features=200, use_pallas=True)
    # interpret-mode monkeypatch for CPU test
    import orbslam2commentedbyxcm_tpu.ops.pallas_frontend as pf
    import functools

    orig = pf.fused_frontend
    pf.fused_frontend = functools.partial(orig, interpret=True)
    try:
        fp = ext_pl(img)
    finally:
        pf.fused_frontend = orig

    vx, vp = np.asarray(fx.valid), np.asarray(fp.valid)
    assert vx.sum() == vp.sum()
    # same keypoints (possibly different order is not expected — same selection)
    np.testing.assert_allclose(np.asarray(fx.uv)[vx], np.asarray(fp.uv)[vp], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(fx.desc)[vx], np.asarray(fp.desc)[vp])
