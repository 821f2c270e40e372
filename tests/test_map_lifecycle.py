"""Map lifecycle: landmark culling + observation recycling keep a long run
mapping forever inside fixed-capacity arrays (VERDICT round-1 item 6: the
obs table silently saturated mid-sequence)."""

import numpy as np
import jax.numpy as jnp

from jetracer_orbslam2_tpu.config import (
    FrontendConfig, MapConfig, SystemConfig, TrackingConfig)
from jetracer_orbslam2_tpu.io.synthetic import generate_lap_sequence
from jetracer_orbslam2_tpu.models.backend import map as map_mod
from jetracer_orbslam2_tpu.models.slam import Slam


def _toy_map():
    """4 keyframes, 6 landmarks with observation counts [3,1,3,0,2,3];
    landmark 5 is young (ref_kf = newest)."""
    mcfg = MapConfig(max_keyframes=8, max_landmarks=8, max_obs=16)
    m = map_mod.init_map(mcfg, num_keypoints=4)
    obs_lm = [0, 0, 0, 1, 2, 2, 2, 4, 4, 5, 5, 5]
    obs_kf = [0, 1, 2, 0, 1, 2, 3, 2, 3, 3, 3, 3]
    E = len(obs_lm)
    m = m._replace(
        kf_valid=m.kf_valid.at[:4].set(True),
        lm_pos=m.lm_pos.at[:6].set(jnp.arange(18, dtype=jnp.float32)
                                   .reshape(6, 3)),
        lm_valid=m.lm_valid.at[:6].set(True),
        lm_ref_kf=m.lm_ref_kf.at[:6].set(
            jnp.asarray([0, 0, 0, 0, 0, 3], jnp.int32)),
        obs_kf=m.obs_kf.at[:E].set(jnp.asarray(obs_kf, jnp.int32)),
        obs_lm=m.obs_lm.at[:E].set(jnp.asarray(obs_lm, jnp.int32)),
        obs_uv=m.obs_uv.at[:E].set(1.0),
        obs_valid=m.obs_valid.at[:E].set(True),
        num_kf=jnp.int32(4),
        num_lm=jnp.int32(6),
        num_obs=jnp.int32(E),
    )
    return m


def test_compact_map_culls_and_remaps():
    m = _toy_map()
    # cull: valid, >= 2 keyframes old, < 2 observations -> landmarks 1
    # (1 obs) and 3 (0 obs); landmark 5 is young and survives despite 3 obs
    # ... landmark 4 has 2 obs -> survives at min_obs=2
    m2 = map_mod.compact_map(m, jnp.float32(2.0), jnp.int32(2))
    assert int(m2.num_lm) == 4
    # survivors keep their payloads, packed to the front in order 0,2,4,5
    np.testing.assert_allclose(
        np.asarray(m2.lm_pos[:4]),
        np.asarray(m.lm_pos)[np.asarray([0, 2, 4, 5])])
    assert np.asarray(m2.lm_valid)[:4].all()
    assert not np.asarray(m2.lm_valid)[4:].any()
    # observations of culled landmark 1 are gone; edges remap to new slots
    assert int(m2.num_obs) == 11
    ok = np.asarray(m2.obs_valid)
    assert ok[:11].all() and not ok[11:].any()
    lm_new = np.asarray(m2.obs_lm)[:11]
    # old lm 0 -> 0, 2 -> 1, 4 -> 2, 5 -> 3
    counts = np.bincount(lm_new, minlength=4)
    np.testing.assert_array_equal(counts[:4], [3, 3, 2, 3])
    # freed capacity is reusable: a fresh insert allocates from num_lm up
    assert int(m2.num_lm) < int(m.num_lm)


def test_long_run_never_saturates_fixed_capacity():
    """>= 500 frames through Slam with tiny caps: compaction keeps the obs
    table under budget, mapping continues to the end, and (by construction)
    every array shape is constant."""
    H, W = 120, 160
    n, lap = 510, 120                   # ~4.2 laps
    seq = generate_lap_sequence(n_frames=n, shape=(H, W), lap_frames=lap)
    cfg = SystemConfig(
        frontend=FrontendConfig(height=H, width=W, num_levels=2,
                                max_keypoints=256),
        tracking=TrackingConfig(match_window=16.0),
        map=MapConfig(max_keyframes=256, max_landmarks=1024, max_obs=2048,
                      kf_min_gap=2, kf_max_gap=6, window_size=4),
    )
    slam = Slam(cfg, seq.intrinsics)
    obs_cap = cfg.map.max_obs
    lm_cap = cfg.map.max_landmarks
    high_water = 0
    lm_counts = []
    for i in range(n):
        slam.process_frame(seq.gray[i], seq.depth[i])
        high_water = max(high_water, int(slam.m.num_obs))
        lm_counts.append(int(slam.m.num_lm))
    out = slam.result()
    assert slam.num_compactions >= 1, "compaction never ran"
    assert high_water <= obs_cap, "observation table overflowed"
    assert max(lm_counts) <= lm_cap
    # mapping continued to the very end: landmark/observation turnover in
    # the last tenth of the run (NOT a frozen, saturated map)
    assert lm_counts[-1] != lm_counts[int(0.9 * n)] or (
        int(slam.m.num_obs) < high_water)
    assert int(out.tracked[-50:].sum()) >= 40
    assert out.num_keyframes <= cfg.map.max_keyframes
