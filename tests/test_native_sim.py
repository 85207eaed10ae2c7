"""Native C++ engine vs Python engine equivalence.

The native engine must produce identical graphs, shortest paths,
candidates, and observation streams to the conformance-tested Python
implementation."""

import numpy as np
import pytest

from dasa_tpu.data.datasets import (
    expand_instructions,
    load_datasets,
    make_synthetic_task,
)
from dasa_tpu.data.features import FeatureDB
from dasa_tpu.env import R2REnv
from dasa_tpu.sim import csim
from dasa_tpu.sim.engine import compute_pano_candidates
from dasa_tpu.sim.graph import load_scan_graph
from dasa_tpu.utils import Tokenizer, build_vocab

SCAN = "17DRP5sb8fy"
SCAN2 = "2t7WUuJeko7"

pytestmark = pytest.mark.skipif(not csim.available(),
                                reason="native lib unavailable")


@pytest.fixture(scope="module")
def engine(connectivity_dir):
    eng = csim.NativeEngine(k_max=16)
    eng.load_scan(SCAN, connectivity_dir)
    eng.load_scan(SCAN2, connectivity_dir)
    return eng


def test_graph_and_paths_match(engine, connectivity_dir):
    for si, scan in enumerate([SCAN, SCAN2]):
        g = load_scan_graph(scan, connectivity_dir)
        g.compute_shortest_paths()
        n = engine.num_nodes(si)
        assert n == g.num_nodes
        # ids and index mapping
        for i in [0, 1, n // 2, n - 1]:
            assert engine.node_id(si, i) == g.ids[i]
            assert engine.node_index(si, g.ids[i]) == i
        # distances + next hops on a sample of pairs
        rng = np.random.default_rng(0)
        inc = np.nonzero(g.included)[0]
        for _ in range(60):
            a, b = int(rng.choice(inc)), int(rng.choice(inc))
            d_py = g.dist[a, b]
            d_c = engine.distance(si, a, b)
            if np.isinf(d_py):
                assert np.isinf(d_c)
                continue
            assert d_c == pytest.approx(d_py, rel=1e-5)
            if a != b:
                # first hops may differ only between equal-length paths
                nh_c = engine.next_hop(si, a, b)
                w = g.edge_lengths()
                assert g.nav_adjacency()[a, nh_c]
                assert w[a, nh_c] + g.dist[nh_c, b] == pytest.approx(
                    d_py, rel=1e-5)


def test_candidates_match(engine, connectivity_dir):
    for si, scan in enumerate([SCAN, SCAN2]):
        g = load_scan_graph(scan, connectivity_dir)
        for node in np.nonzero(g.included)[0][::7]:
            node = int(node)
            py = compute_pano_candidates(g, node)
            nbr, point, nh, elev, rd = engine.candidates(si, node)
            np.testing.assert_array_equal(nbr, py.nbr_ix)
            np.testing.assert_array_equal(point, py.point_id)
            np.testing.assert_allclose(nh, py.normalized_heading,
                                       atol=1e-5)
            np.testing.assert_allclose(elev, py.elevation, atol=1e-5)
            np.testing.assert_allclose(rd, py.rel_distance, atol=1e-4)


def test_env_obs_streams_identical(connectivity_dir, tmp_path):
    """Run the same episodes through both backends; every observation
    field and trajectory must match."""
    data_dir = str(tmp_path / "task")
    make_synthetic_task(data_dir, [SCAN], [SCAN2], n_train=8, n_val=4,
                        connectivity_dir=connectivity_dir)
    feature_db = FeatureDB.synthetic([SCAN, SCAN2], connectivity_dir,
                                     dim=16)
    raw = load_datasets(["val_seen"], data_dir)
    vocab = build_vocab(load_datasets(["train"], data_dir), min_count=1)
    tok = Tokenizer(vocab, encoding_length=24)
    items = expand_instructions(raw, tok, max_input=24)

    kw = dict(batch_size=4, connectivity_dir=connectivity_dir,
              max_candidates=16, max_input=24, seed=3)
    env_py = R2REnv(feature_db, items, backend="python", **kw)
    env_c = R2REnv(feature_db, items, backend="native", **kw)
    assert env_py.backend == "python" and env_c.backend == "native"

    obs_p = env_py.reset()
    obs_c = env_c.reset()
    trajs_p = [[t] for t in env_py.state_tuples()]
    trajs_c = [[t] for t in env_c.state_tuples()]
    for step in range(10):
        for f in ("feat_row", "view_index", "cand_point_id",
                  "cand_nbr_ix", "cand_n", "teacher", "back_teacher"):
            np.testing.assert_array_equal(
                getattr(obs_p, f), getattr(obs_c, f), err_msg=f)
        for f in ("heading", "elevation", "cand_heading",
                  "cand_elevation", "distance", "progress"):
            np.testing.assert_allclose(
                getattr(obs_p, f), getattr(obs_c, f), atol=1e-4,
                err_msg=f)
        actions = np.where(obs_p.teacher < obs_p.cand_n, obs_p.teacher,
                           -1)
        if (actions < 0).all():
            break
        obs_p = env_py.step(actions, trajs_p)
        obs_c = env_c.step(actions, trajs_c)
    for tp, tc in zip(trajs_p, trajs_c):
        assert len(tp) == len(tc)
        for (v1, h1, e1), (v2, h2, e2) in zip(tp, tc):
            assert v1 == v2
            assert h1 == pytest.approx(h2, abs=1e-6)
            assert e1 == pytest.approx(e2, abs=1e-6)
