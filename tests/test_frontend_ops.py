"""Unit tests for the ORB front-end kernels against pure-NumPy oracles."""

import numpy as np
import jax.numpy as jnp

from jetracer_orbslam2_tpu.ops import fast, nms, orb, patches, preprocess
from jetracer_orbslam2_tpu.ops.fast import RING_OFFSETS


# ---------------------------------------------------------------------------
# preprocess
# ---------------------------------------------------------------------------


def test_rgb_to_gray():
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (16, 24, 3)).astype(np.uint8)
    g = np.asarray(preprocess.rgb_to_gray(jnp.asarray(rgb)))
    ref = 0.21 * rgb[..., 0] + 0.72 * rgb[..., 1] + 0.07 * rgb[..., 2]
    np.testing.assert_allclose(g, ref, atol=1e-3)


def test_gaussian_blur_3x3_interior():
    rng = np.random.RandomState(1)
    img = rng.rand(12, 14).astype(np.float32)
    out = np.asarray(preprocess.gaussian_blur_3x3(jnp.asarray(img)))
    k = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32) / 16.0
    for y in range(1, 11):
        for x in range(1, 13):
            ref = np.sum(img[y - 1:y + 2, x - 1:x + 2] * k)
            assert abs(out[y, x] - ref) < 1e-5


def test_blur_preserves_constant():
    img = jnp.full((8, 8), 3.5, jnp.float32)
    out = np.asarray(preprocess.gaussian_blur_3x3(img))
    np.testing.assert_allclose(out, 3.5, atol=1e-6)


def test_halfsample():
    rng = np.random.RandomState(2)
    img = rng.rand(8, 10).astype(np.float32)
    out = np.asarray(preprocess.halfsample(jnp.asarray(img)))
    assert out.shape == (4, 5)
    ref = img.reshape(4, 2, 5, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_halfsample_odd():
    img = jnp.asarray(np.arange(35, dtype=np.float32).reshape(5, 7))
    out = preprocess.halfsample(img)
    assert out.shape == (3, 4)


def test_pyramid_shapes():
    img = jnp.zeros((480, 640), jnp.float32)
    lv = preprocess.build_pyramid(img, 4)
    assert [x.shape for x in lv] == [(480, 640), (240, 320), (120, 160), (60, 80)]


# ---------------------------------------------------------------------------
# FAST oracle
# ---------------------------------------------------------------------------


def fast_oracle(img, threshold, arc_length):
    """Naive per-pixel FAST with contiguous-arc check and excess-diff score."""
    h, w = img.shape
    score = np.zeros((h, w), np.float32)
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            c = img[y, x]
            ring = np.array(
                [img[y + dy, x + dx] for (dy, dx) in RING_OFFSETS], np.float32
            )
            bright = ring > c + threshold
            dark = ring < c - threshold

            def has_arc(flags):
                f = np.concatenate([flags, flags])
                run = 0
                for v in f:
                    run = run + 1 if v else 0
                    if run >= arc_length:
                        return True
                return False

            if has_arc(bright) or has_arc(dark):
                bs = np.sum((ring - c - threshold)[bright])
                ds = np.sum((c - ring - threshold)[dark])
                score[y, x] = max(bs, ds)
    return score


def test_fast_matches_oracle():
    rng = np.random.RandomState(3)
    img = (rng.rand(32, 40) * 255).astype(np.float32)
    # plant some strong corners
    img[10:14, 10:14] = 250.0
    img[20:22, 30:33] = 0.0
    got = np.asarray(fast.fast_score_map(jnp.asarray(img), 13.0, 12, 3))
    ref = fast_oracle(img, 13.0, 12)
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_fast_arc_lengths():
    rng = np.random.RandomState(4)
    img = (rng.rand(24, 24) * 255).astype(np.float32)
    for arc in (9, 12, 16):
        got = np.asarray(fast.fast_score_map(jnp.asarray(img), 10.0, arc, 3))
        ref = fast_oracle(img, 10.0, arc)
        np.testing.assert_allclose(got, ref, atol=1e-3, err_msg=f"arc={arc}")


def test_fast_flat_image_no_corners():
    img = jnp.full((32, 32), 128.0, jnp.float32)
    got = np.asarray(fast.fast_score_map(img, 13.0, 12, 3))
    assert not got.any()


def test_fast_border_respected():
    rng = np.random.RandomState(5)
    img = (rng.rand(40, 40) * 255).astype(np.float32)
    got = np.asarray(fast.fast_score_map(jnp.asarray(img), 5.0, 9, 8))
    assert not got[:8].any() and not got[-8:].any()
    assert not got[:, :8].any() and not got[:, -8:].any()


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------


def test_local_max_3x3():
    resp = np.zeros((10, 10), np.float32)
    resp[4, 4] = 5.0
    resp[4, 5] = 3.0  # neighbor, suppressed
    resp[8, 1] = 2.0
    out = np.asarray(nms.local_max_3x3(jnp.asarray(resp)))
    assert out[4, 4] == 5.0 and out[4, 5] == 0.0 and out[8, 1] == 2.0


def test_grid_nms_one_winner_per_cell():
    resp = np.zeros((32, 32), np.float32)
    resp[2, 3] = 5.0
    resp[10, 12] = 7.0   # same 16x16 cell as (2,3): higher wins
    resp[20, 25] = 4.0   # different cell
    w = nms.grid_nms(jnp.asarray(resp), 16)
    score = np.asarray(w.score).reshape(2, 2)
    y = np.asarray(w.y).reshape(2, 2)
    x = np.asarray(w.x).reshape(2, 2)
    assert score[0, 0] == 7.0 and y[0, 0] == 10 and x[0, 0] == 12
    assert score[1, 1] == 4.0 and y[1, 1] == 20 and x[1, 1] == 25
    assert score[0, 1] == 0.0 and score[1, 0] == 0.0


def test_grid_nms_nonmultiple_shape():
    resp = np.zeros((33, 47), np.float32)
    resp[32, 46] = 9.0
    w = nms.grid_nms(jnp.asarray(resp), 16)
    assert np.asarray(w.score).max() == 9.0
    i = int(np.asarray(w.score).argmax())
    assert int(np.asarray(w.y)[i]) == 32 and int(np.asarray(w.x)[i]) == 46


def test_select_keypoints_topk_and_scaling():
    w0 = nms.CellWinners(
        score=jnp.asarray([5.0, 0.0, 3.0]),
        y=jnp.asarray([4, 0, 9], jnp.int32),
        x=jnp.asarray([6, 0, 2], jnp.int32),
    )
    w1 = nms.CellWinners(
        score=jnp.asarray([7.0]),
        y=jnp.asarray([3], jnp.int32),
        x=jnp.asarray([5], jnp.int32),
    )
    kp = nms.select_keypoints([w0, w1], [(32, 32), (16, 16)], 4, 1e-3, 3)
    score = np.asarray(kp.score)
    # the 3.0 winner sits at x=2 < border=3 in its own level: dropped
    assert list(score[:2]) == [7.0, 5.0]
    assert np.asarray(kp.valid).tolist() == [True, True, False, False]
    # level-1 winner maps to level-0 coords (x+0.5)*2-0.5
    np.testing.assert_allclose(np.asarray(kp.xy)[0], [10.5, 6.5])
    assert int(np.asarray(kp.level)[0]) == 1


def test_select_keypoints_enforces_level_border():
    """The keep-out is level-LOCAL: the same (y, x) is legal at level 0 but
    inside the border at a level whose image is smaller."""
    w = nms.CellWinners(
        score=jnp.asarray([2.0]),
        y=jnp.asarray([13], jnp.int32),
        x=jnp.asarray([13], jnp.int32),
    )
    # level shape (16, 16), border 5: y=13 >= 16-5 -> dropped
    kp = nms.select_keypoints([w], [(16, 16)], 2, 1e-3, 5)
    assert not np.asarray(kp.valid).any()
    # same winner against a (32, 32) level survives
    kp = nms.select_keypoints([w], [(32, 32)], 2, 1e-3, 5)
    assert np.asarray(kp.valid).tolist() == [True, False]


# ---------------------------------------------------------------------------
# patches / orientation / BRIEF
# ---------------------------------------------------------------------------


def _kp_at(xy_level, levels_of, k_total=4):
    n = len(xy_level)
    xyl = np.zeros((k_total, 2), np.int32)
    lvl = np.zeros((k_total,), np.int32)
    val = np.zeros((k_total,), bool)
    xyl[:n] = xy_level
    lvl[:n] = levels_of
    val[:n] = True
    return nms.Keypoints(
        xy=jnp.zeros((k_total, 2), jnp.float32),
        xy_level=jnp.asarray(xyl),
        level=jnp.asarray(lvl),
        score=jnp.asarray(val, jnp.float32),
        valid=jnp.asarray(val),
    )


def test_extract_patches():
    rng = np.random.RandomState(6)
    l0 = rng.rand(64, 64).astype(np.float32)
    l1 = rng.rand(32, 32).astype(np.float32)
    kp = _kp_at([(30, 25), (16, 16)], [0, 1])
    p = np.asarray(patches.extract_patches([jnp.asarray(l0), jnp.asarray(l1)], kp, 9))
    np.testing.assert_allclose(p[0], l0[25 - 4:25 + 5, 30 - 4:30 + 5])
    np.testing.assert_allclose(p[1], l1[16 - 4:16 + 5, 16 - 4:16 + 5])


def test_orientation_gradient_direction():
    # patch with intensity increasing along +x -> centroid to the right -> angle 0
    p = np.tile(np.arange(37, dtype=np.float32)[None, :], (37, 1))
    ang = float(np.asarray(orb.orientation(jnp.asarray(p)[None]))[0])
    assert abs(ang) < 1e-3
    # increasing along +y -> angle pi/2
    ang = float(np.asarray(orb.orientation(jnp.asarray(p.T)[None]))[0])
    assert abs(ang - np.pi / 2) < 1e-3


def test_descriptor_shape_and_determinism():
    rng = np.random.RandomState(7)
    p = jnp.asarray(rng.rand(5, 37, 37).astype(np.float32))
    a = jnp.zeros(5, jnp.float32)
    d1 = np.asarray(orb.describe(p, a))
    d2 = np.asarray(orb.describe(p, a))
    assert d1.shape == (5, 8) and d1.dtype == np.uint32
    assert (d1 == d2).all()


def test_descriptor_rotation_invariance():
    """A patch rotated by a bin angle, described with the rotated angle,
    should produce a (nearly) identical descriptor."""
    rng = np.random.RandomState(8)
    # smooth random patch (descriptor sampling is nearest-pixel)
    base = rng.rand(9, 9).astype(np.float32)
    patch = np.kron(base, np.ones((8, 8), np.float32))[:37 + 18, :37 + 18]
    big = jnp.asarray(patch)

    def center_crop(img, ang_deg):
        from scipy.ndimage import rotate

        rot = rotate(np.asarray(img), ang_deg, reshape=False, order=1)
        c = rot.shape[0] // 2
        return rot[c - 18:c + 19, c - 18:c + 19]

    p0 = center_crop(big, 0.0)
    d0 = np.asarray(orb.describe(jnp.asarray(p0)[None], jnp.asarray([0.0])))
    # scipy's positive angle is CCW in plot orientation = -theta in our
    # y-down pixel frame: content rotated by scipy(-deg) is described
    # identically when sampled with pattern angle +a
    a_bin = 4 * (2 * np.pi / 32)
    p1 = center_crop(big, -np.degrees(a_bin))
    d1 = np.asarray(orb.describe(jnp.asarray(p1)[None], jnp.asarray([a_bin], np.float32)))
    ham = bin(int(d0[0, 0] ^ d1[0, 0])).count("1")
    total = sum(bin(int(a ^ b)).count("1") for a, b in zip(d0[0], d1[0]))
    assert total < 40, f"rotation changed {total}/256 bits"
    del ham


def test_descriptor_matches_gather_oracle_fractional():
    """The dense row-select/column-select formulation must produce exactly
    the bits of the direct gather formulation I(p1) < I(p2) — on FRACTIONAL
    pixel values (post-blur/halfsample magnitudes), where bf16 operand
    rounding in a default-precision matmul would flip near-tie bits."""
    rng = np.random.RandomState(11)
    k, p, bins = 17, 37, 32
    # fractional values near each other: worst case for precision loss
    pat = (rng.rand(k, p, p).astype(np.float32) * 255.0 / 16.0).astype(
        np.float32)
    pat += rng.rand(k, p, p).astype(np.float32) * 1e-2
    angles = rng.uniform(0, 2 * np.pi, k).astype(np.float32)
    got = np.asarray(orb.describe(jnp.asarray(pat), jnp.asarray(angles)))

    idx = orb.rotated_pattern_indices(256, p, bins)      # (B, 2, N)
    bn = np.asarray(orb.angle_bins(jnp.asarray(angles), bins))
    flat = pat.reshape(k, p * p)
    bits = np.zeros((k, 256), np.uint32)
    for i in range(k):
        v1 = flat[i, idx[bn[i], 0]]
        v2 = flat[i, idx[bn[i], 1]]
        bits[i] = (v1 - v2) < 0          # exact f32 compare
    words = bits.reshape(k, 8, 32)
    ref = np.sum(words << np.arange(32, dtype=np.uint32), axis=-1,
                 dtype=np.uint32)
    np.testing.assert_array_equal(got, ref)


def test_unpack_bits_roundtrip():
    rng = np.random.RandomState(9)
    desc = rng.randint(0, 2 ** 32, (3, 8), dtype=np.uint32)
    bits = np.asarray(orb.unpack_bits(jnp.asarray(desc)))
    ref = np.unpackbits(desc.view(np.uint8), bitorder="little").reshape(3, 256)
    np.testing.assert_array_equal(bits, ref)

def test_adaptive_two_threshold_detection_rescues_low_contrast():
    """FrontendConfig.fast_min_threshold (ORB-SLAM2 minThFAST): a
    low-contrast scene that produces almost nothing at the primary
    epsilon keeps features via the per-cell low-threshold fallback, and
    cells with strong corners are untouched (their winners are identical
    to the single-threshold run)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jetracer_orbslam2_tpu.config import FrontendConfig
    from jetracer_orbslam2_tpu.models.frontend import extract_features

    h, w = 120, 160
    key = jax.random.PRNGKey(3)
    # weak texture: +-4 gray-level noise, below epsilon=13, above 2
    img = 128.0 + 4.0 * jax.random.normal(key, (h, w))
    # one strong blob feature (a 3x3 dot has a full 360-degree dark
    # ring arc; an axis-aligned square corner sits exactly at FAST's
    # 270-degree margin and does not reliably fire)
    img = img.at[30:33, 30:33].set(255.0)
    img = jnp.clip(img, 0, 255)

    base = FrontendConfig(height=h, width=w, num_levels=1,
                          max_keypoints=128)
    kp0, _, _ = extract_features(img, base)
    n0 = int(np.asarray(kp0.valid).sum())

    ada = FrontendConfig(height=h, width=w, num_levels=1,
                         max_keypoints=128, fast_min_threshold=2.0)
    kp1, _, _ = extract_features(img, ada)
    n1 = int(np.asarray(kp1.valid).sum())
    assert n1 > max(4 * n0, 20), (n0, n1)

    # the strong corner survives with identical coords and score: the
    # top-scoring keypoint in both runs matches
    i0 = int(np.argmax(np.asarray(kp0.score)))
    i1 = int(np.argmax(np.asarray(kp1.score)))
    np.testing.assert_allclose(np.asarray(kp0.xy)[i0],
                               np.asarray(kp1.xy)[i1])
    assert float(kp0.score[i0]) == float(kp1.score[i1])
