import jax
import jax.numpy as jnp
import numpy as np

from myslam_tpu.engine.camera import Camera
from myslam_tpu.engine.keyframes import (
    KeyframeStore,
    make_overlap_scorer,
    select_window,
)
from myslam_tpu.utils.datasets import look_at

CAM = Camera(H=60, W=80, fx=50.0, fy=50.0, cx=39.5, cy=29.5)


def make_store(n, poses=None):
    store = KeyframeStore(capacity=n + 2, cam=CAM)
    for k in range(n):
        c2w = jnp.asarray(poses[k]) if poses is not None else jnp.eye(4)
        store.add(k * 4, jnp.zeros((CAM.H, CAM.W, 3)),
                  jnp.ones((CAM.H, CAM.W)), c2w, c2w)
    return store


def test_store_add_and_write():
    store = make_store(3)
    assert store.count == 3
    assert store.frame_ids == [0, 4, 8]
    store.write_imagery(4, jnp.full((CAM.H, CAM.W, 3), 0.5),
                        jnp.full((CAM.H, CAM.W), 2.0))
    assert float(store.depths[4, 0, 0]) == 2.0
    assert store.count == 3  # scratch write does not admit a keyframe


def test_overlap_scorer_identifies_covisible_frames():
    center = np.array([2.0, 1.5, 1.2])
    eye = center + np.array([0.9, 0.0, 0.0])
    same = look_at(eye, center)
    # a keyframe looking the opposite way shares no frustum
    opposite = look_at(eye, eye + (eye - center))
    poses = [same, opposite, same, same]  # last two excluded from scoring
    store = make_store(4, poses)
    scorer = make_overlap_scorer(CAM)
    depth = jnp.full((CAM.H, CAM.W), 1.5)
    scores = np.asarray(scorer(
        store.est_c2w, store.count - 2, jnp.asarray(same),
        depth, jax.random.PRNGKey(0)))
    # Same viewpoint: score equals the fraction of the image inside the
    # 20-px edge margin (~1/6 for this tiny camera), well above zero.
    assert scores[0] > 0.1
    assert scores[1] <= 0.0          # opposite viewpoint: none
    assert np.all(scores[2:] == -1)  # slots >= n_scored masked


def test_select_window_policy():
    rng = np.random.default_rng(0)
    center = np.array([2.0, 1.5, 1.2])
    pose = look_at(center + np.array([0.9, 0.0, 0.0]), center)
    scorer = make_overlap_scorer(CAM)
    depth = jnp.full((CAM.H, CAM.W), 1.5)
    key = jax.random.PRNGKey(1)

    # empty store -> empty window (current frame handled by caller)
    assert select_window(rng, scorer, make_store(0), jnp.asarray(pose),
                         depth, 5, key) == []
    # one keyframe -> reference quirk: window stays empty
    assert select_window(rng, scorer, make_store(1, [pose]), jnp.asarray(pose),
                         depth, 5, key) == []
    # two keyframes -> exactly the last two
    assert select_window(rng, scorer, make_store(2, [pose] * 2),
                         jnp.asarray(pose), depth, 5, key) == [0, 1]
    # many covisible keyframes -> capped at window_size+1, sorted, includes
    # the two most recent
    win = select_window(rng, scorer, make_store(8, [pose] * 8),
                        jnp.asarray(pose), depth, 5, key)
    assert win == sorted(win)
    assert len(win) <= 5 + 1
    assert 6 in win and 7 in win


def test_select_window_global_method():
    rng = np.random.default_rng(0)
    pose = np.eye(4)
    win = select_window(rng, None, make_store(10, [pose] * 10),
                        jnp.asarray(pose), None, 4, None, method="global")
    assert 8 in win and 9 in win
    assert len(win) <= 4 + 1
    assert all(0 <= s < 10 for s in win)


def test_device_window_selector_matches_policy():
    """make_window_selector (device-side) enforces the same policy as the
    host select_window: last two keyframes always in, overlap-positive
    older picks, ascending order, scratch slot appended, oldest frozen."""
    from myslam_tpu.engine.keyframes import make_window_selector

    center = np.array([2.0, 1.5, 1.2])
    eye = center + np.array([0.9, 0.0, 0.0])
    same = look_at(eye, center)
    opposite = look_at(eye, eye + (eye - center))
    poses = [same, opposite, same, same, same, same]
    store = make_store(6, poses)
    scratch = store.capacity - 1
    w_max = 6  # window_size 4 -> up to 3 picks + last two + current
    select = make_window_selector(CAM, store.capacity, window_size=4,
                                  w_max=w_max, scratch_slot=scratch)
    depth = jnp.full((CAM.H, CAM.W), 1.5)
    slot_kf, n_slots, pose_mask = jax.tree_util.tree_map(
        np.asarray, select(store.est_c2w, jnp.int32(store.count),
                           jnp.asarray(same), depth, jax.random.PRNGKey(1),
                           jnp.float32(1.0)))
    n = int(n_slots)
    slots = list(slot_kf[:n])
    assert slots[-1] == scratch          # current frame last
    kfs = slots[:-1]
    assert 4 in kfs and 5 in kfs         # last two keyframes always join
    assert kfs == sorted(kfs)            # ascending (oldest first)
    assert 1 not in kfs                  # zero-overlap keyframe excluded
    assert len(kfs) <= 3 + 2
    # pose mask: oldest window frame frozen, rest (incl current) active
    np.testing.assert_array_equal(pose_mask[:n],
                                  [0.0] + [1.0] * (n - 1))
    assert np.all(pose_mask[n:] == 0)

    # count == 0: window is just the current frame, nothing optimized
    empty = KeyframeStore(capacity=store.capacity, cam=CAM)
    slot_kf0, n0, mask0 = jax.tree_util.tree_map(
        np.asarray, select(empty.est_c2w, jnp.int32(0), jnp.asarray(same),
                           depth, jax.random.PRNGKey(2), jnp.float32(0.0)))
    assert int(n0) == 1 and slot_kf0[0] == scratch and np.all(mask0 == 0)
