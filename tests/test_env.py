"""Data/env/eval integration tests with synthetic data over real graphs.

The reference's sanity oracles (Stop/Shortest agents, tasks/R2R/agent.py:
220-294, eval.py:130-143) become proper asserted tests here: the teacher
policy must achieve SR=1.0 and the stop policy must not."""

import numpy as np
import pytest

from dasa_tpu.data.datasets import (
    expand_instructions,
    generate_synthetic_dataset,
    make_synthetic_task,
    load_datasets,
)
from dasa_tpu.data.features import FeatureDB, load_feature_db
from dasa_tpu.env import R2REnv
from dasa_tpu.train import Evaluation
from dasa_tpu.utils import Tokenizer, build_vocab

SCAN = "17DRP5sb8fy"
SCAN2 = "2t7WUuJeko7"


@pytest.fixture(scope="module")
def task(connectivity_dir, tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("task"))
    make_synthetic_task(data_dir, [SCAN], [SCAN2], n_train=12, n_val=6,
                        connectivity_dir=connectivity_dir)
    return data_dir


@pytest.fixture(scope="module")
def feature_db(connectivity_dir):
    return FeatureDB.synthetic([SCAN, SCAN2], connectivity_dir, dim=32)


def _make_env(task, feature_db, connectivity_dir, split="val_seen",
              batch_size=4):
    data = load_datasets([split], task)
    vocab = build_vocab(load_datasets(["train"], task), min_count=1)
    tok = Tokenizer(vocab, encoding_length=40)
    items = expand_instructions(data, tok, max_input=40)
    env = R2REnv(feature_db, items, batch_size=batch_size,
                 connectivity_dir=connectivity_dir, max_input=40,
                 name=split)
    return env, data, tok


def test_synthetic_dataset_format(connectivity_dir):
    data = generate_synthetic_dataset([SCAN], 5,
                                      connectivity_dir=connectivity_dir)
    assert len(data) == 5
    for item in data:
        assert len(item["instructions"]) == 3
        assert 4 <= len(item["path"]) <= 7
        assert item["scan"] == SCAN
    # determinism
    data2 = generate_synthetic_dataset([SCAN], 5,
                                       connectivity_dir=connectivity_dir)
    assert data == data2


def test_feature_db_synthetic_deterministic(connectivity_dir):
    db1 = FeatureDB.synthetic([SCAN], connectivity_dir, dim=16)
    db2 = FeatureDB.synthetic([SCAN], connectivity_dir, dim=16)
    np.testing.assert_array_equal(db1.values, db2.values)
    assert db1.views == 36
    assert (db1.values >= 0).all()


def test_feature_db_npz_roundtrip(connectivity_dir, tmp_path):
    db = FeatureDB.synthetic([SCAN], connectivity_dir, dim=8)
    path = str(tmp_path / "feat.npz")
    db.save(path)
    db2 = load_feature_db(path, [], connectivity_dir)
    np.testing.assert_array_equal(db.values, db2.values)
    assert db.ids == db2.ids


def test_obs_shapes_and_teacher(task, feature_db, connectivity_dir):
    env, _, _ = _make_env(task, feature_db, connectivity_dir)
    obs = env.reset()
    b, k = 4, env.max_candidates
    assert obs.instr.shape == (b, 40)
    assert obs.cand_point_id.shape == (b, k)
    assert obs.cand_mask.shape == (b, k)
    assert (obs.cand_n > 0).all()
    assert (obs.teacher <= obs.cand_n).all()
    assert (obs.view_index >= 0).all() and (obs.view_index < 36).all()
    # at the start nobody is at the goal => teacher is a real move
    assert (obs.teacher < obs.cand_n).all()
    assert np.allclose(obs.progress, 0.0, atol=1e-6)


def test_teacher_policy_reaches_goal_sr1(task, feature_db, connectivity_dir):
    env, data, _ = _make_env(task, feature_db, connectivity_dir)
    ev = Evaluation(data, connectivity_dir, splits=["val_seen"])
    results = {}
    for _ in range(20):  # enough batches to wrap the split
        obs = env.reset()
        trajs = [[t] for t in env.state_tuples()]
        for _t in range(15):
            actions = np.where(obs.teacher < obs.cand_n, obs.teacher, -1)
            if (actions < 0).all():
                break
            obs = env.step(actions, trajs)
        for iid, tr in zip(env.instr_ids(), trajs):
            if iid not in results:
                results[iid] = {"instr_id": iid, "trajectory": tr}
        if len(results) >= len(ev.instr_ids):
            break
    summary, _ = ev.score(list(results.values()))
    assert summary["success_rate"] == 1.0
    assert summary["nav_error"] == pytest.approx(0.0, abs=1e-6)
    assert summary["spl"] == pytest.approx(1.0, abs=1e-6)


def test_stop_policy_fails(task, feature_db, connectivity_dir):
    env, data, _ = _make_env(task, feature_db, connectivity_dir)
    ev = Evaluation(data, connectivity_dir, splits=["val_seen"])
    results = {}
    for _ in range(20):
        env.reset()
        trajs = [[t] for t in env.state_tuples()]
        for iid, tr in zip(env.instr_ids(), trajs):
            results.setdefault(iid, {"instr_id": iid, "trajectory": tr})
        if len(results) >= len(ev.instr_ids):
            break
    summary, _ = ev.score(list(results.values()))
    # synthetic paths are 3-6 hops; staying put can't be a 3m success often
    assert summary["success_rate"] < 0.5
    assert summary["spl"] <= summary["success_rate"] + 1e-9


def test_progress_increases_along_teacher_path(task, feature_db,
                                               connectivity_dir):
    env, _, _ = _make_env(task, feature_db, connectivity_dir, batch_size=2)
    obs = env.reset()
    last = obs.progress.copy()
    for _ in range(10):
        actions = np.where(obs.teacher < obs.cand_n, obs.teacher, -1)
        if (actions < 0).all():
            break
        obs = env.step(actions)
        moved = actions >= 0
        assert (obs.progress[moved] >= last[moved] - 1e-6).all()
        last = obs.progress.copy()
    assert np.allclose(last, 1.0, atol=1e-5)


def test_split_at_n(task):
    full = load_datasets(["train"], task)
    sub = load_datasets(["train@5"], task)
    assert len(sub) == 5
    sub2 = load_datasets(["train@5"], task)
    assert [d["path_id"] for d in sub] == [d["path_id"] for d in sub2]
    assert len(full) > 5


def test_minibatch_wraparound(task, feature_db, connectivity_dir):
    env, _, _ = _make_env(task, feature_db, connectivity_dir, batch_size=4)
    seen = set()
    n = env.size()
    for _ in range((n // 4) + 2):
        env.reset()
        seen.update(env.instr_ids())
    assert len(seen) == n


def test_random_start_reset(task, feature_db, connectivity_dir):
    env, _, _ = _make_env(task, feature_db, connectivity_dir)
    rs = set()
    for trial in range(5):
        obs = env.reset(random_start=True)
        for i, item in enumerate(env.batch):
            vp = env.current_viewpoints()[i]
            assert vp in item["path"]  # random start picks a path node
            rs.add(vp == item["path"][0])
        # progress normalizes by the annotated start (env.py:428-442)
        assert np.isfinite(obs.progress).all()
    assert True in rs  # sometimes starts at path[0]


def test_feature_db_tsv_roundtrip(tmp_path, connectivity_dir):
    """base64 TSV (the reference feature format, utils.py:272-312)."""
    import base64
    import csv

    db = FeatureDB.synthetic([SCAN], connectivity_dir, dim=8)
    path = str(tmp_path / "feat.tsv")
    with open(path, "w") as f:
        w = csv.writer(f, delimiter="\t")
        for lid, block in zip(db.ids[:5], db.values[:5]):
            scan, vp = lid.split("_")
            w.writerow([scan, vp, 640, 480, 60,
                        base64.b64encode(
                            block.astype(np.float32).tobytes()).decode()])
    db2 = FeatureDB.from_tsv(path)
    assert db2.num_rows == 5
    np.testing.assert_allclose(db2.values, db.values[:5], rtol=1e-6)
    assert db2.ids == db.ids[:5]


def test_feature_db_zip_roundtrip(tmp_path, connectivity_dir):
    """Zip-backed store (reference tasks/R2R/zipdata.py): both the
    per-viewpoint-member layout and the ids/values pair layout."""
    import io
    import zipfile

    db = FeatureDB.synthetic([SCAN], connectivity_dir, dim=8)

    def npy_bytes(arr):
        buf = io.BytesIO()
        np.save(buf, arr)
        return buf.getvalue()

    per_vp = str(tmp_path / "per_vp.zip")
    with zipfile.ZipFile(per_vp, "w") as zf:
        for lid, block in zip(db.ids[:4], db.values[:4]):
            zf.writestr(f"feats/{lid}.npy", npy_bytes(block))
    db2 = FeatureDB.from_zip(per_vp)
    assert sorted(db2.ids) == sorted(db.ids[:4])
    for lid in db.ids[:4]:
        scan, vp = lid.split("_")
        np.testing.assert_allclose(db2.get(scan, vp), db.get(scan, vp))

    pair = str(tmp_path / "pair.zip")
    with zipfile.ZipFile(pair, "w") as zf:
        zf.writestr("ids.npy", npy_bytes(np.asarray(db.ids)))
        zf.writestr("values.npy", npy_bytes(db.values))
    db3 = FeatureDB.from_zip(pair)
    assert db3.ids == db.ids
    np.testing.assert_allclose(db3.values, db.values)


def test_feature_db_bottom_up_and_concat(tmp_path, connectivity_dir):
    """Bottom-up h5 store (tasks/R2R/feature.py:89-116: per-view region
    features mean-pooled) and the 'a+b' composite store
    (feature.py:27-46 hstack)."""
    h5py = pytest.importorskip("h5py")

    db = FeatureDB.synthetic([SCAN], connectivity_dir, dim=8, views=4)
    root = tmp_path / "bottom_up"
    rng = np.random.default_rng(0)
    for lid, pooled in zip(db.ids[:3], db.values[:3]):
        scan, vp = lid.split("_")
        (root / scan).mkdir(parents=True, exist_ok=True)
        with h5py.File(root / scan / f"{vp}.h5", "w") as f:
            for v in range(4):
                # boxes whose mean is exactly the pooled row
                boxes = pooled[v][None] + rng.standard_normal((3, 8)) * 0.1
                boxes[2] = 3 * pooled[v] - boxes[0] - boxes[1]
                f.create_group(str(v)).create_dataset(
                    "features", data=boxes.astype(np.float32))
    db2 = FeatureDB.from_bottom_up(str(root), views=4)
    assert sorted(db2.ids) == sorted(db.ids[:3])
    for lid in db.ids[:3]:
        scan, vp = lid.split("_")
        np.testing.assert_allclose(db2.get(scan, vp), db.get(scan, vp),
                                   rtol=1e-4, atol=1e-5)

    # composite "npz+bottom_up" through the dispatcher
    npz = str(tmp_path / "a.npz")
    db.save(npz)
    combo = load_feature_db(f"{npz}+{root}", [SCAN], connectivity_dir,
                            views=4)
    assert combo.dim == 16
    for lid in db.ids[:3]:
        scan, vp = lid.split("_")
        np.testing.assert_allclose(combo.get(scan, vp)[:, :8],
                                   db.get(scan, vp))
        np.testing.assert_allclose(combo.get(scan, vp)[:, 8:],
                                   db2.get(scan, vp), rtol=1e-4,
                                   atol=1e-5)
