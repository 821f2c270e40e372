"""The fused Pallas FAST+NMS kernel must be bit-exact vs the XLA path.

Runs in Pallas interpret mode on the CPU test mesh; the same kernel compiles
via Mosaic on real TPU (dispatched in models/frontend.extract_features).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from jetracer_orbslam2_tpu.ops import fast, nms
from jetracer_orbslam2_tpu.ops.pallas_fast import (
    _MAX_PALLAS_PIXELS, fast_nms_response, use_pallas)


def _image(shape, seed=0):
    rng = np.random.default_rng(seed)
    # integer-valued f32 so both formulations round identically
    return jnp.asarray(rng.integers(0, 256, shape).astype(np.float32))


@pytest.mark.parametrize("arc_length", [9, 12, 16])
def test_bit_exact_vs_xla(arc_length):
    img = _image((64, 128))
    ref = nms.local_max_3x3(
        fast.fast_score_map(img, 13.0, arc_length, 3))
    got = fast_nms_response(img, 13.0, arc_length, 3, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    assert int((np.asarray(ref) > 0).sum()) > 0  # non-degenerate fixture


@pytest.mark.parametrize("shape", [(52, 70), (41, 257)])
def test_unaligned_shapes_pad_crop(shape):
    # exercises the (8, 128)-alignment pad + crop path end to end
    img = _image(shape, seed=7)
    ref = nms.local_max_3x3(fast.fast_score_map(img, 13.0, 12, 3))
    got = fast_nms_response(img, 13.0, 12, 3, interpret=True)
    assert got.shape == shape
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_border_and_threshold():
    img = _image((48, 128), seed=3)
    ref = nms.local_max_3x3(fast.fast_score_map(img, 40.0, 12, 8))
    got = fast_nms_response(img, 40.0, 12, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    assert np.asarray(got)[:8].sum() == 0.0  # border respected


def test_dispatch_gate():
    # CPU backend in tests -> compiled-pallas path must be off
    assert not use_pallas((480, 640))
    # and the VMEM working-set cap holds regardless of backend
    assert (4000, 4000)[0] * 4000 > _MAX_PALLAS_PIXELS
