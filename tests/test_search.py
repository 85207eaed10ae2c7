"""Dijkstra/beam search tests."""

import numpy as np
import pytest

from dasa_tpu.agents import Seq2SeqAgent
from dasa_tpu.agents.search import (
    beam_search,
    cal_score,
    dijkstra_search,
    state_factored_search,
    state_factored_search_test,
)
from dasa_tpu.agents.speaker import SpeakerAgent
from dasa_tpu.config import Config
from dasa_tpu.data.datasets import (
    expand_instructions,
    load_datasets,
    make_synthetic_task,
)
from dasa_tpu.data.features import FeatureDB
from dasa_tpu.env import R2REnv
from dasa_tpu.utils import Tokenizer, build_vocab

SCAN = "17DRP5sb8fy"
DIM = 16
L = 20


@pytest.fixture(scope="module")
def setup(connectivity_dir, tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("task"))
    make_synthetic_task(data_dir, [SCAN], [SCAN], n_train=6, n_val=3,
                        connectivity_dir=connectivity_dir)
    feature_db = FeatureDB.synthetic([SCAN], connectivity_dir, dim=DIM)
    raw = load_datasets(["val_seen"], data_dir)
    vocab = build_vocab(load_datasets(["train"], data_dir), min_count=1)
    tok = Tokenizer(vocab, encoding_length=L)
    items = expand_instructions(raw, tok, max_input=L)
    cfg = Config(rnn_dim=32, wemb=16, aemb=8, critic_dim=32,
                 angle_feat_size=8, feature_size=DIM, max_input=L,
                 max_decode=L, max_candidates=16, max_action=6,
                 batch_size=3, candidates=2)
    env = R2REnv(feature_db, items, batch_size=3,
                 connectivity_dir=connectivity_dir, max_candidates=16,
                 max_input=L)
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    speaker = SpeakerAgent(cfg, env, feature_db, vocab_size=len(tok),
                           tok=tok)
    return agent, speaker, env


def test_dijkstra_finds_k_paths(setup):
    agent, speaker, env = setup
    results = dijkstra_search(agent, n_candidates=2, max_expansions=120)
    assert len(results) == 3
    for res in results:
        assert 1 <= len(res["paths"]) <= 2
        for path in res["paths"]:
            # scores: one log-prob per action (incl. stop)
            assert len(path["listener_scores"]) == len(path["action"])
            assert len(path["trajectory"]) == len(path["action"]) + 1
            # log-probs are negative; path score is their sum
            assert all(s <= 1e-6 for s in path["listener_scores"])
            # trajectory starts at the episode start
            assert path["trajectory"][0][0] == res["dijk_path"][0]
        # exploration path returns to the start
        assert res["dijk_path"][-1] == res["dijk_path"][0]


def test_beam_search_speaker_scores(setup):
    agent, speaker, env = setup
    results = beam_search(agent, speaker, n_candidates=2)
    for res in results:
        for path in res["paths"]:
            assert "records" not in path
            assert "speaker_scores" in path
            # speaker scores are negated CEs -> non-positive
            assert (np.asarray(path["speaker_scores"]) <= 1e-6).all()
    # score mixing endpoints
    path = results[0]["paths"][0]
    s_only = cal_score(path, 1.0, True, True)
    l_only = cal_score(path, 0.0, True, True)
    assert s_only == pytest.approx(
        float(np.mean(path["speaker_scores"]))
        if len(path["speaker_scores"]) else 0.0)
    assert l_only == pytest.approx(float(np.mean(path["listener_scores"])))


def test_state_factored_search_contract(setup):
    """Mirrors test_dijkstra_finds_k_paths for the speaker-follower
    search (follower.py:720-980): path counts, score ordering, length
    invariants, at-most-one-completion-per-pose, and a physically valid
    exploration path that closes at the start."""
    agent, speaker, env = setup
    results = state_factored_search(agent, completion_size=2,
                                    successor_size=4, max_expansions=120)
    assert len(results) == 3
    for res in results:
        assert 1 <= len(res["paths"]) <= 2
        # emitted best-first by listener score
        scores = [float(np.sum(p["listener_scores"]))
                  for p in res["paths"]]
        assert scores == sorted(scores, reverse=True)
        endpoints = set()
        for path in res["paths"]:
            assert len(path["listener_scores"]) == len(path["action"])
            assert len(path["listener_actions"]) == len(path["action"])
            assert len(path["trajectory"]) == len(path["action"]) + 1
            assert all(s <= 1e-6 for s in path["listener_scores"])
            assert path["trajectory"][0][0] == res["dijk_path"][0]
            # the emitted endpoint is reached by the exploration path
            assert path["trajectory"][-1][0] in res["dijk_path"]
            endpoints.add(tuple(path["trajectory"][-1]))
        # physical-state factoring: one completion per (vp, pose)
        assert len(endpoints) == len(res["paths"])
        # exploration path is physically walkable and returns to start
        assert res["dijk_path"][-1] == res["dijk_path"][0]
        g = env.graphs[res["scan"]]
        adj = g.nav_adjacency()
        for a, b in zip(res["dijk_path"], res["dijk_path"][1:]):
            if a != b:
                assert adj[g.id2ix[a], g.id2ix[b]], (a, b)


def test_state_factored_budget_exhaust_warns(setup):
    """A too-small expansion budget emits best-effort paths WITH a
    warning instead of silently changing eval results (ADVICE r3)."""
    agent, speaker, env = setup
    with pytest.warns(UserWarning, match="exhausted max_expansions"):
        results = state_factored_search(agent, completion_size=3,
                                        successor_size=1,
                                        max_expansions=1)
    for res in results:
        assert len(res["paths"]) >= 1


def test_state_factored_search_test_covers_split(setup):
    """The beam_valid entry point: every item searched once, speaker
    scores attached (follower.py:987-999 semantics)."""
    agent, speaker, env = setup
    results = state_factored_search_test(agent, speaker, 1, 4,
                                         max_expansions=120)
    assert len(results) == env.size()
    for res in results.values():
        for path in res["paths"]:
            assert "records" not in path
            assert "speaker_scores" in path
            assert (np.asarray(path["speaker_scores"]) <= 1e-6).all()
