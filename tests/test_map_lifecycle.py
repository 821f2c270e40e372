"""Map lifecycle: landmark culling + observation recycling + keyframe
culling/slot recycling keep a long run mapping forever inside
fixed-capacity arrays (VERDICT round-1 item 6: the obs table silently
saturated mid-sequence; round-3 missing item 3: the keyframe table was a
hard wall that froze mapping on long sequences)."""

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


def _kf_toy_map():
    """6 keyframes at x=0..5; landmarks 0/1/3 covisible from 4-5 KFs,
    landmark 2 from only 2 -> KF1 and KF2 are fully redundant, KF3 is not
    (half its observations see the weakly-covered landmark 2)."""
    mcfg = MapConfig(max_keyframes=8, max_landmarks=8, max_obs=32,
                     max_dead_keyframes=16)
    m = map_mod.init_map(mcfg, num_keypoints=4)
    obs = [(0, 0), (1, 0), (2, 0), (3, 0), (4, 0),
           (0, 1), (1, 1), (2, 1), (4, 1),
           (3, 2), (5, 2),
           (2, 3), (0, 3), (1, 3), (4, 3)]
    # production insert order groups observations by keyframe (each
    # insert_keyframe appends a contiguous run of the newest slot) — sort
    # the toy list the same way so the sorted-prefix invariant
    # (_check_obs_prefix / loop._verify_world) holds on the fixture too
    obs = sorted(obs, key=lambda o: o[0])
    E = len(obs)
    kfp = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    for i in range(6):
        kfp[i, 0, 3] = float(i)
    return m._replace(
        kf_valid=m.kf_valid.at[:6].set(True),
        kf_pose=jnp.asarray(kfp),
        kf_frame_id=m.kf_frame_id.at[:6].set(
            jnp.asarray([0, 5, 10, 15, 20, 25])),
        lm_valid=m.lm_valid.at[:4].set(True),
        lm_ref_kf=m.lm_ref_kf.at[:4].set(jnp.asarray([0, 1, 2, 3])),
        obs_kf=m.obs_kf.at[:E].set(jnp.asarray([o[0] for o in obs])),
        obs_lm=m.obs_lm.at[:E].set(jnp.asarray([o[1] for o in obs])),
        obs_valid=m.obs_valid.at[:E].set(True),
        num_kf=jnp.int32(6), num_lm=jnp.int32(4), num_obs=jnp.int32(E))


def test_compact_keyframes_culls_redundant_and_recycles():
    m = _kf_toy_map()
    # protect_recent=2 -> slots 4,5 protected; slot 0 protected (gauge);
    # eligible: 1, 2, 3.  KF1/KF2 are >= 90% redundant, KF3 is 50%.
    m2 = map_mod.compact_keyframes(
        m, jnp.float32(0.9), jnp.int32(3), jnp.int32(2), jnp.int32(8))
    assert int(m2.num_kf) == 4
    # survivors keep temporal order, packed to the front
    np.testing.assert_array_equal(
        np.asarray(m2.kf_frame_id)[:4], [0, 15, 20, 25])
    assert np.asarray(m2.kf_valid)[:4].all()
    assert not np.asarray(m2.kf_valid)[4:].any()
    # retired ring: uids 5 and 10, both anchored to the surviving KF0,
    # with the relative pose capturing their x offsets
    assert int(m2.num_dead) == 2
    assert sorted(np.asarray(m2.dead_uid)[:2].tolist()) == [5, 10]
    np.testing.assert_array_equal(np.asarray(m2.dead_anchor_uid)[:2], [0, 0])
    table = map_mod.resolve_kf_poses(m2)
    assert sorted(table.keys()) == [0, 5, 10, 15, 20, 25]
    assert abs(table[10][0, 3] - 2.0) < 1e-6     # culled KF2 was at x=2
    # observations of culled keyframes dropped; survivors' remapped
    ok = np.asarray(m2.obs_valid)
    kf_new = np.asarray(m2.obs_kf)[ok[: len(ok)].nonzero()[0]]
    assert set(kf_new.tolist()) <= {0, 1, 2, 3}
    # landmarks re-anchor to the nearest surviving earlier keyframe
    np.testing.assert_array_equal(np.asarray(m2.lm_ref_kf)[:4], [0, 0, 0, 1])
    # capacity pressure: force down to 3 keyframes regardless of threshold
    m3 = map_mod.compact_keyframes(
        m, jnp.float32(2.0), jnp.int32(3), jnp.int32(2), jnp.int32(3))
    assert int(m3.num_kf) == 3
    np.testing.assert_array_equal(
        np.asarray(m3.kf_frame_id)[:3], [0, 20, 25])


def _check_obs_prefix(m):
    """Valid observations form a contiguous prefix [0, num_obs) sorted by
    keyframe slot — the invariant _verify_world's contiguous-run gather
    rides on (models/backend/loop.py)."""
    ok = np.asarray(m.obs_valid)
    no = int(m.num_obs)
    assert ok[:no].all(), "hole inside the valid obs prefix"
    assert not ok[no:].any(), "valid obs beyond num_obs"
    kf = np.asarray(m.obs_kf)[:no]
    assert (np.diff(kf) >= 0).all(), "obs_kf prefix not sorted"


def test_obs_kf_sorted_prefix_invariant():
    """Both compactions preserve the sorted contiguous obs prefix; a
    STANDALONE compact_keyframes call packs obs itself and keeps num_obs
    exact (ADVICE round-4 medium #1 — it used to leave holes and a stale
    num_obs, relying on an immediate compact_map)."""
    m = _kf_toy_map()
    _check_obs_prefix(m)
    m2 = map_mod.compact_keyframes(
        m, jnp.float32(0.9), jnp.int32(3), jnp.int32(2), jnp.int32(8))
    _check_obs_prefix(m2)                 # standalone: no compact_map after
    assert int(m2.num_obs) == int(np.asarray(m2.obs_valid).sum())
    m3 = map_mod.compact_map(m2, jnp.float32(1.0), jnp.int32(0))
    _check_obs_prefix(m3)
    # and through a real run: inserts + both compactions interleaved
    H, W = 120, 160
    n, lap = 140, 60
    seq = generate_lap_sequence(n_frames=n, shape=(H, W), lap_frames=lap)
    cfg = SystemConfig(
        frontend=FrontendConfig(height=H, width=W, num_levels=2,
                                max_keypoints=256),
        tracking=TrackingConfig(match_window=16.0),
        map=MapConfig(max_keyframes=16, max_landmarks=1024, max_obs=2048,
                      kf_min_gap=2, kf_max_gap=6, window_size=4,
                      kf_protect_recent=4, max_dead_keyframes=64),
    )
    slam = Slam(cfg, seq.intrinsics)
    for i in range(n):
        slam.process_frame(seq.gray[i], seq.depth[i])
        if i % 10 == 0:
            _check_obs_prefix(slam.m)
    _check_obs_prefix(slam.m)
    assert slam.num_compactions >= 1, "compaction never exercised"


def test_loop_edge_protection_is_windowed():
    """Only the newest kf_protect_loop_recent loop edges protect their
    endpoints; an older edge whose endpoint is culled RETIRES onto the
    endpoint's surviving anchor with the measurement composed through the
    culled->anchor offset, so the constraint survives slot recycling
    (ADVICE round-4 medium #2 — permanent protection re-created the
    capacity hard wall; plain dropping lost multi-lap accuracy, measured
    0.60 -> 0.85 m on the 8.7-lap recycling test)."""
    m = _kf_toy_map()
    # edge A between the two fully-redundant keyframes 1 and 2; edge B
    # from redundant keyframe 1 to the kept keyframe 3
    m = m._replace(
        loop_i=m.loop_i.at[0].set(1).at[1].set(1),
        loop_j=m.loop_j.at[0].set(2).at[1].set(3),
        loop_T=m.loop_T.at[1].set(jnp.eye(4).at[0, 3].set(2.0)),
        loop_valid=m.loop_valid.at[0].set(True).at[1].set(True),
        num_loop=jnp.int32(2))
    # edges inside the protection window: endpoints survive the cull
    m_prot = map_mod.compact_keyframes(
        m, jnp.float32(0.9), jnp.int32(3), jnp.int32(2), jnp.int32(8),
        jnp.int32(8))
    assert int(m_prot.num_kf) == 6        # nothing cullable
    assert bool(m_prot.loop_valid[0]) and bool(m_prot.loop_valid[1])
    # protection window 0: the redundant keyframes 1, 2 are culled.
    # Edge A collapses onto one anchor (degenerate self-edge) -> dropped;
    # edge B retires onto (anchor-of-1 = kf0, kf3) with the measurement
    # composed through the +1x culled->anchor offset: T_03 = +3x.
    m_cull = map_mod.compact_keyframes(
        m, jnp.float32(0.9), jnp.int32(3), jnp.int32(2), jnp.int32(8),
        jnp.int32(0))
    assert int(m_cull.num_kf) == 4
    assert not bool(m_cull.loop_valid[0])
    assert bool(m_cull.loop_valid[1])
    assert int(m_cull.loop_i[1]) == 0
    # kf3 packs to new slot 1 (survivors: 0, 3, 4, 5)
    assert int(m_cull.loop_j[1]) == 1
    np.testing.assert_allclose(
        np.asarray(m_cull.loop_T[1][0, 3]), 3.0, atol=1e-6)
    _check_obs_prefix(m_cull)


def test_zero_obs_keyframe_is_cullable():
    """A keyframe whose observations were all culled (kf_tot == 0) must
    look fully redundant, not maximally informative (ADVICE round-4
    low #3)."""
    m = _kf_toy_map()
    # strip keyframe 3's observations (slots 11-14 in the toy layout)
    ok = np.asarray(m.obs_valid).copy()
    kfs = np.asarray(m.obs_kf)
    ok[(kfs == 3) & ok] = False
    m = m._replace(obs_valid=jnp.asarray(ok),
                   num_obs=jnp.int32(int(ok.sum())))
    # NOTE: stripping mid-prefix rows violates the packed-prefix invariant,
    # so repack first through compact_map (min_obs=0 culls nothing)
    m = map_mod.compact_map(m, jnp.float32(0.0), jnp.int32(0))
    m2 = map_mod.compact_keyframes(
        m, jnp.float32(0.9), jnp.int32(3), jnp.int32(2), jnp.int32(8))
    # keyframes 1, 2 (redundant) AND 3 (zero obs) are culled
    assert int(m2.num_kf) == 3
    np.testing.assert_array_equal(
        np.asarray(m2.kf_frame_id)[:3], [0, 20, 25])


def test_multi_lap_keyframe_recycling_tracks_to_the_end():
    """1000+ frames, ~8.6 laps, max_keyframes=64: the keyframe table
    saturates, redundant slots recycle continuously (num_dead grows), the
    newest keyframe tracks the frame counter to the very end, and the
    composed trajectory (including frames whose reference keyframes were
    culled -> retired-ring resolution) stays accurate.  This is the
    round-3 'capacity is a hard wall' scenario (VERDICT missing item 3)
    run through the whole-system scan."""
    from jetracer_orbslam2_tpu.evaluation import ate
    from jetracer_orbslam2_tpu.models import slam_scan as ss

    H, W = 120, 160
    n, lap = 1040, 120
    seq = generate_lap_sequence(n_frames=n, shape=(H, W), lap_frames=lap)
    cfg = SystemConfig(
        frontend=FrontendConfig(height=H, width=W, num_levels=2,
                                max_keypoints=256),
        tracking=TrackingConfig(match_window=16.0),
        map=MapConfig(max_keyframes=64, max_landmarks=2048, max_obs=4096,
                      kf_min_gap=2, kf_max_gap=6, window_size=4,
                      kf_protect_recent=4, max_dead_keyframes=512),
    )
    st = ss.init_scan_state(seq.gray[0], seq.depth[0], seq.intrinsics, cfg)
    final, out = ss.slam_scan(st, seq.gray[1:], seq.depth[1:],
                              seq.intrinsics, cfg)
    num_kf = int(final.m.num_kf)
    assert num_kf <= cfg.map.max_keyframes
    # recycling actually happened — many generations of it
    assert int(final.m.num_dead) > cfg.map.max_keyframes
    # mapping never froze: the newest keyframe is from the final stretch
    kf_frames = np.asarray(final.m.kf_frame_id)
    assert kf_frames[num_kf - 1] > 0.97 * n
    # tracking healthy at the end of the run
    assert np.asarray(out.tracked)[-100:].mean() > 0.8
    # full composed trajectory: frames anchored to culled keyframes
    # resolve through the retired ring and stay consistent
    poses = np.concatenate([
        np.asarray(final.m.kf_pose)[:1], ss.compose_trajectory(final, out)])
    r = float(ate(jnp.asarray(poses), seq.poses).rmse)
    assert r < 0.60, f"multi-lap ATE {r:.3f} m"
    # the retired ring was actually exercised by composition: some frames
    # reference uids that are no longer live keyframes
    live_uids = set(kf_frames[:num_kf].tolist())
    ref_uids = set(np.asarray(out.ref_uid).tolist())
    assert ref_uids - live_uids, "no frame rode a retired keyframe"


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
