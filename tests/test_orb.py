import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2commentedbyxcm_tpu.ops import matching
from orbslam2commentedbyxcm_tpu.ops.orb import ORBExtractor, _fast_maps, _nms3


def make_texture(rng, h=240, w=320, n_blobs=400):
    """Synthetic textured image with strong corners (random rectangles)."""
    img = np.full((h, w), 64.0, np.float32)
    for _ in range(n_blobs):
        y, x = rng.integers(0, h - 12), rng.integers(0, w - 12)
        hh, ww = rng.integers(3, 10), rng.integers(3, 10)
        img[y : y + hh, x : x + ww] = rng.uniform(0, 255)
    return img


def test_hamming_matrix_vs_numpy(rng):
    a = rng.integers(0, 2**32, size=(64, 8), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(96, 8), dtype=np.uint32)
    ours = np.asarray(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    bits_a = np.unpackbits(a.view(np.uint8), axis=1)
    bits_b = np.unpackbits(b.view(np.uint8), axis=1)
    ref = (bits_a[:, None, :] != bits_b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(ours.astype(np.int32), ref)


def test_hamming_pairs(rng):
    a = rng.integers(0, 2**32, size=(32, 8), dtype=np.uint32)
    b = a.copy()
    b[:, 0] ^= 0b1011  # flip 3 bits in each row
    d = np.asarray(matching.hamming_pairs(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(d, np.full(32, 3.0))


def test_fast_corner_mask_vs_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    img = make_texture(rng)
    _, _, corner_hi = _fast_maps(jnp.asarray(img), 20.0, 7.0)
    ours = np.asarray(corner_hi)
    det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=False)
    kps = det.detect(img.astype(np.uint8), None)
    pts = np.array([k.pt for k in kps])  # (x, y)
    assert len(pts) > 100
    hit = ours[pts[:, 1].astype(int), pts[:, 0].astype(int)]
    # uint8 rounding vs float thresholds cause a small boundary disagreement
    assert hit.mean() > 0.93, f"only {hit.mean():.2%} of OpenCV FAST corners detected"
    # and we should not massively over-detect relative to cv2
    assert ours.sum() < 2.0 * len(pts)


def test_extractor_shapes_and_validity(rng):
    img = make_texture(rng, 480, 640, 1500)
    ext = ORBExtractor(n_features=500)
    f = ext(img)
    n = int(f.n)
    assert f.uv.shape[0] == ext.capacity
    assert n > 350, f"only {n} valid features"
    uv = np.asarray(f.uv)[np.asarray(f.valid)]
    assert uv[:, 0].min() >= 0 and uv[:, 0].max() < 640
    assert uv[:, 1].min() >= 0 and uv[:, 1].max() < 480
    levels = np.asarray(f.level)[np.asarray(f.valid)]
    assert levels.min() == 0 and levels.max() >= 2  # multiscale
    # descriptors should be diverse
    desc = np.asarray(f.desc)[np.asarray(f.valid)]
    assert len(np.unique(desc, axis=0)) > 0.9 * n


def test_extractor_spatial_uniformity(rng):
    img = make_texture(rng, 480, 640, 2000)
    ext = ORBExtractor(n_features=400)
    f = ext(img)
    uv = np.asarray(f.uv)[np.asarray(f.valid)]
    # quadrant occupancy: every quadrant gets a reasonable share
    qx = (uv[:, 0] > 320).astype(int)
    qy = (uv[:, 1] > 240).astype(int)
    counts = np.bincount(qy * 2 + qx, minlength=4)
    assert counts.min() > 0.1 * counts.sum() / 4


def rotate_image(cv2, img, deg):
    h, w = img.shape
    m = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
    return cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_LINEAR), m


def test_descriptor_rotation_invariance(rng):
    cv2 = pytest.importorskip("cv2")
    img = make_texture(rng, 320, 416, 800)
    deg = 25.0
    rot, m = rotate_image(cv2, img, deg)
    ext = ORBExtractor(n_features=600)
    fa, fb = ext(img), ext(rot)
    idx, dist, ok = matching.search_for_initialization(fa, fb, window=1e6)
    ok_np = np.asarray(ok)
    assert ok_np.sum() > 30, f"only {ok_np.sum()} matches under rotation"
    # verify geometric consistency: rotated position of A ~ position of B
    uva = np.asarray(fa.uv)[ok_np]
    uvb = np.asarray(fb.uv)[np.asarray(idx)[ok_np]]
    pred = uva @ m[:, :2].T + m[:, 2]
    err = np.linalg.norm(pred - uvb, axis=-1)
    inlier = (err < 3.0).mean()
    assert inlier > 0.7, f"only {inlier:.2%} of matches geometrically consistent"


def test_orientation_follows_image_rotation(rng):
    cv2 = pytest.importorskip("cv2")
    img = make_texture(rng, 320, 416, 800)
    deg = 40.0
    rot, m = rotate_image(cv2, img, deg)
    ext = ORBExtractor(n_features=600)
    fa, fb = ext(img), ext(rot)
    idx, dist, ok = matching.search_for_initialization(fa, fb, window=1e6)
    ok_np = np.asarray(ok)
    assert ok_np.sum() > 20
    da = np.asarray(fa.angle)[ok_np]
    db = np.asarray(fb.angle)[np.asarray(idx)[ok_np]]
    # image rotated by -deg in pixel space -> keypoint orientations shift
    delta = np.rad2deg(np.mod(db - da + np.pi, 2 * np.pi) - np.pi)
    med = np.median(delta)
    assert abs(abs(med) - deg) < 6.0, f"median angle delta {med} vs expected ±{deg}"


def test_nms_isolates_peaks():
    score = jnp.zeros((32, 32)).at[10, 10].set(5.0).at[10, 11].set(4.0).at[20, 20].set(3.0)
    out = np.asarray(_nms3(score))
    assert out[10, 10] == 5.0 and out[10, 11] == 0.0 and out[20, 20] == 3.0


def test_match_nn_ratio_and_mutual():
    d = jnp.asarray(
        np.array([[10.0, 100.0, 11.0], [50.0, 20.0, 90.0]], np.float32)
    )
    idx, dist, ok = matching.match_nn(d, max_dist=60.0, ratio=0.8)
    assert list(np.asarray(idx)) == [0, 1]
    assert not bool(ok[0])  # 10 vs second-best 11 fails 0.8 ratio
    assert bool(ok[1])


def test_exposure_normalization_survives_low_contrast(rng):
    """FAST's absolute thresholds (20/7) kill detection when scene contrast
    collapses (dusk / auto-exposure failure); normalize_exposure rescales to
    a fixed MAD so the detector stays alive (ops/orb.py).

    At moderate contrast normalization is a near-no-op by design: per-cell
    top-k selection is ordering-based, and ordering is gain-invariant."""
    raw = make_texture(rng, 240, 320, 600)
    # near-flat scene: contrast 5% of nominal, then a 0.7x gain drop
    img = (100.0 + (raw - raw.mean()) * 0.05) * 0.7 + 6.0
    img = img.astype(np.float32)

    plain = ORBExtractor(n_features=300)
    norm = ORBExtractor(n_features=300, normalize_exposure=True)
    n_plain = int(plain(img).n)
    f = norm(img)
    n_norm = int(f.n)
    assert n_plain < 50, n_plain       # absolute thresholds collapse
    assert n_norm == norm.capacity, n_norm  # normalized detector is full

    # and the normalized detections land where full-contrast corners are
    full = norm((100.0 + (raw - raw.mean()) * 1.0).astype(np.float32))
    def keyset(feat):
        v = np.asarray(feat.valid)
        uv = np.round(np.asarray(feat.uv)[v]).astype(int)
        lv = np.asarray(feat.level)[v]
        return {(x, y, int(l)) for (x, y), l in zip(uv, lv)}
    base, low = keyset(full), keyset(f)
    hit = sum(
        any((x + dx, y + dy, l) in low for dx in (-1, 0, 1) for dy in (-1, 0, 1))
        for (x, y, l) in base
    )
    assert hit / max(len(base), 1) > 0.85, hit / max(len(base), 1)


def test_exposure_gain_cap_no_fabrication_on_flat_frames(rng):
    """The normalization gain is capped to [1/8, 8] (ADVICE r4): a near-flat
    frame (MAD well under 1 uint8 step) must stay feature-poor instead of
    having sub-threshold noise amplified past the FAST 20/7 thresholds.
    With noise MAD ~0.2 the uncapped gain (~90x) turns noise into
    full-budget corner detections; the capped gain (8x) leaves responses ~2,
    below the min threshold 7."""
    img = (100.0 + 0.25 * rng.standard_normal((240, 320))).astype(np.float32)
    norm = ORBExtractor(n_features=300, normalize_exposure=True)
    n = int(norm(img).n)
    assert n < 30, n
    # the uncapped gain (simulated by pre-scaling to the target MAD)
    # saturates the budget on the same frame — the failure mode the cap fixes
    mu, mad = img.mean(), np.abs(img - img.mean()).mean()
    img_un = ((img - mu) * (18.0 / mad) + mu).astype(np.float32)
    n_un = int(ORBExtractor(n_features=300)(img_un).n)
    assert n_un > 250, n_un


def test_exposure_normalization_ab_at_nominal_contrast(rng):
    """A/B detection-count check at nominal contrast (ADVICE r4 / PARITY):
    ordering is gain-invariant but the absolute 20/7 thresholds still gate
    candidacy after rescaling, so the normalized detector may lose weak
    near-threshold corners — the A/B bound keeps that loss small."""
    raw = make_texture(rng, 240, 320, 600)
    img = (100.0 + (raw - raw.mean())).astype(np.float32)
    n_plain = int(ORBExtractor(n_features=300)(img).n)
    n_norm = int(ORBExtractor(n_features=300, normalize_exposure=True)(img).n)
    assert n_norm >= 0.9 * n_plain, (n_plain, n_norm)
