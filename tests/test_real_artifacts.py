"""Consume the reference's COMMITTED real-data artifacts.

The licensed R2R assets (split JSONs, image features) are absent from
the container, but the reference tree commits two classes of real-data
artifacts this suite drives through the actual ingestion paths:

- ``tasks/R2R/data/{train,trainval}_vocab.txt`` — the vocab files the
  legacy baseline trained with (built by r2r_src/utils.py:229-256 at
  min_count=5) — read through read_vocab + Tokenizer;
- ``tasks/R2R/results/seq2seq_*_iter_36000.json`` — 2349-item scored
  trajectory submissions — parsed through the submit-format reader and
  scored by Evaluation against GT reconstructed from the trajectories
  themselves over the real connectivity graphs.
"""

import json
import os

import numpy as np
import pytest

from dasa_tpu.train.evaluation import Evaluation
from dasa_tpu.utils import read_vocab
from dasa_tpu.utils.vocab import BASE_VOCAB, Tokenizer, split_sentence

REF = "/root/reference"
VOCAB_TRAIN = os.path.join(REF, "tasks/R2R/data/train_vocab.txt")
VOCAB_TRAINVAL = os.path.join(REF, "tasks/R2R/data/trainval_vocab.txt")
RESULTS = os.path.join(
    REF, "tasks/R2R/results",
    "seq2seq_teacher_imagenet_val_unseen_iter_36000.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VOCAB_TRAIN),
    reason="reference committed artifacts not mounted")


def test_committed_vocab_reads_and_encodes(connectivity_dir):
    """The real train vocab loads with the reference's base-token
    layout, every entry is a fixed point of our sentence splitter
    (both were produced by the same regex semantics,
    r2r_src/utils.py:166-176), and encode/decode round-trips real
    words through the Tokenizer."""
    vocab = read_vocab(VOCAB_TRAIN)
    assert vocab[:3] == BASE_VOCAB == ["<PAD>", "<UNK>", "<EOS>"]
    assert len(vocab) == 991  # committed artifact size
    for w in vocab[3:]:
        assert split_sentence(w) == [w], w

    tok = Tokenizer(vocab, encoding_length=80)
    # <BOS> appended after the vocab (utils.py:147)
    assert tok.word_to_index["<BOS>"] == 991
    enc = tok.encode_sentence(
        "Walk past the bathroom and stop near the stairs.")
    assert enc is not None and len(enc) == 80
    assert enc[0] == tok.word_to_index["<BOS>"]
    # real high-frequency words resolve to non-UNK ids
    unk = tok.word_to_index["<UNK>"]
    for w in ("walk", "the", "and", "stop", "."):
        assert tok.word_to_index.get(w, unk) != unk, w
    dec = tok.decode_sentence(enc)
    assert dec.startswith("<BOS> walk past the bathroom")
    shrunk = tok.shrink(list(enc))
    assert tok.word_to_index["<BOS>"] not in shrunk
    assert tok.word_to_index["<EOS>"] not in shrunk


def test_committed_vocab_min_count_monotonicity():
    """trainval_vocab was built from a SUPERSET of train_vocab's corpus
    at the same min_count=5 (legacy train.py vocab build): word counts
    only grow, so train's words must all survive in trainval."""
    train = read_vocab(VOCAB_TRAIN)
    trainval = read_vocab(VOCAB_TRAINVAL)
    assert trainval[:3] == BASE_VOCAB
    assert len(trainval) > len(train)
    missing = set(train) - set(trainval)
    assert not missing, sorted(missing)[:10]


@pytest.fixture(scope="module")
def vp2scan(connectivity_dir):
    idx = {}
    with open(os.path.join(connectivity_dir, "scans.txt")) as f:
        scans = f.read().split()
    for s in scans:
        with open(os.path.join(connectivity_dir,
                               f"{s}_connectivity.json")) as f:
            for e in json.load(f):
                idx[e["image_id"]] = s
    return idx


def test_committed_results_are_physical_trajectories(connectivity_dir,
                                                     vp2scan):
    """Every committed trajectory stays inside one real scan, hops only
    along connectivity edges, and carries the simulator's discretized
    poses (headings at 30-degree multiples, elevations in
    {-30, 0, +30} degrees)."""
    from dasa_tpu.sim.graph import load_scan_graph

    with open(RESULTS) as f:
        results = json.load(f)
    assert len(results) == 2349  # committed val_unseen coverage
    inc = np.pi / 6
    for item in results[:80]:
        traj = item["trajectory"]
        scan = vp2scan[traj[0][0]]
        g = load_scan_graph(scan, connectivity_dir)
        adj = g.nav_adjacency()
        for (a, ha, ea), (b, hb, eb) in zip(traj, traj[1:]):
            assert vp2scan[b] == scan
            if a != b:
                assert adj[g.id2ix[a], g.id2ix[b]], (scan, a, b)
        for _vp, h, e in traj:
            assert abs(h / inc - round(h / inc)) < 1e-6, h
            assert round(e / inc) in (-1, 0, 1), e


def test_committed_results_score_through_submit_reader(connectivity_dir,
                                                       vp2scan):
    """Feed the committed result JSON (by FILE PATH — the submit-format
    reader, eval.py:74-80 analog) into Evaluation against GT whose goal
    is each trajectory's own endpoint: the full scoring path (reader ->
    nearest/geodesic metrics over real graphs -> SR/SPL) must
    reproduce exactly SR=1, SPL=shortest/taken, nav_error=0."""
    with open(RESULTS) as f:
        results = json.load(f)
    picked = [r for r in results if r["instr_id"].endswith("_0")][:25]
    gt = []
    for r in picked:
        traj = r["trajectory"]
        pid = r["instr_id"].rsplit("_", 1)[0]
        gt.append({
            "scan": vp2scan[traj[0][0]],
            "path_id": pid,
            # goal := the submitted endpoint, so geodesic error is 0
            "path": [traj[0][0], traj[-1][0]],
            "instructions": ["committed"],  # only instr _0 scored
            "heading": traj[0][1],
        })
    ev = Evaluation(gt, connectivity_dir, splits=["committed"])
    summary, scores = ev.score(RESULTS, allow_partial=True)
    assert len(scores["nav_errors"]) == len(picked)
    assert summary["success_rate"] == 1.0
    assert summary["nav_error"] == 0.0
    assert summary["oracle_error"] == 0.0
    # taken >= shortest geodesic => SPL in (0, 1]
    assert 0.0 < summary["spl"] <= 1.0
    for taken, short in zip(scores["trajectory_lengths"],
                            scores["shortest_lengths"]):
        assert taken >= short - 1e-6
