"""NDH adapter tests (CVDN-format items -> R2R schema -> full stack)."""

import numpy as np
import pytest

from dasa_tpu.data.features import FeatureDB
from dasa_tpu.data.ndh import (
    convert_ndh_items,
    dialog_to_instruction,
    select_path,
)
from dasa_tpu.env import R2REnv
from dasa_tpu.sim.graph import load_scan_graph
from dasa_tpu.utils import Tokenizer, build_vocab

SCAN = "17DRP5sb8fy"


def make_cvdn_items(connectivity_dir, n=4):
    g = load_scan_graph(SCAN, connectivity_dir)
    g.compute_shortest_paths()
    inc = np.nonzero(g.included)[0]
    items = []
    rng = np.random.default_rng(0)
    for i in range(n):
        src = int(inc[i * 3])
        ok = np.nonzero(np.isfinite(g.dist[src]) & (g.dist[src] > 2)
                        & g.included)[0]
        dst = int(ok[1])
        planner = [g.ids[k] for k in g.shortest_path(src, dst)]
        player = planner[:-1] + [g.ids[int(ok[0])]] \
            if len(planner) > 2 else planner
        items.append({
            "inst_idx": i,
            "scan": SCAN,
            "target": "a red chair",
            "start_pano": {"pano": planner[0], "heading": 1.0},
            "dialog_history": [
                {"nav_idx": 0, "role": "navigator",
                 "message": "where should i go"},
                {"nav_idx": 0, "role": "oracle",
                 "message": "go through the hallway"},
            ],
            "planner_path": planner,
            "player_path": player,
        })
    return items


def test_dialog_assembly(connectivity_dir):
    item = make_cvdn_items(connectivity_dir, 1)[0]
    assert dialog_to_instruction(item, "none") == ""
    assert dialog_to_instruction(item, "target") == "<TAR> a red chair"
    ora = dialog_to_instruction(item, "oracle_ans")
    assert "<ORA> go through the hallway" in ora and "<TAR>" in ora
    full = dialog_to_instruction(item, "all")
    assert "<NAV> where should i go" in full


def test_path_selection(connectivity_dir):
    item = make_cvdn_items(connectivity_dir, 1)[0]
    assert select_path(item, "planner_path") == item["planner_path"]
    assert select_path(item, "player_path") == item["player_path"]
    trusted = select_path(item, "trusted_path")
    if item["player_path"][-1] == item["planner_path"][-1]:
        assert trusted == item["planner_path"]
    else:
        assert trusted == item["player_path"]


def test_ndh_items_run_through_env(connectivity_dir):
    items = convert_ndh_items(make_cvdn_items(connectivity_dir),
                              path_type="trusted_path", history="all")
    assert all(len(i["instructions"]) == 1 for i in items)
    vocab = build_vocab(items, min_count=1)
    tok = Tokenizer(vocab, encoding_length=30)
    from dasa_tpu.data.datasets import expand_instructions

    expanded = expand_instructions(items, tok, max_input=30)
    db = FeatureDB.synthetic([SCAN], connectivity_dir, dim=8)
    env = R2REnv(db, expanded, batch_size=2,
                 connectivity_dir=connectivity_dir, max_input=30)
    obs = env.reset()
    assert (obs.teacher <= obs.cand_n).all()
    # teacher walk reaches each goal
    for _ in range(12):
        a = np.where(obs.teacher < obs.cand_n, obs.teacher, -1)
        if (a < 0).all():
            break
        obs = env.step(a)
    assert np.allclose(obs.distance, 0.0, atol=1e-5)


def test_ndh_budget_defaults():
    """NDH modes derive max_action/max_input from path_type/history
    (ndhtrain.py:421-444) unless explicitly overridden — an
    `--history all` run must keep full dialogs, not R2R's 80 tokens."""
    from dasa_tpu.config import ndh_budgets, parse_args

    cfg = parse_args(["--train", "ndh"])  # trusted_path + all defaults
    assert (cfg.max_action, cfg.max_input) == (40, 300)
    cfg = parse_args(["--train", "ndh", "--path_type", "planner_path",
                      "--history", "oracle_ans"])
    assert (cfg.max_action, cfg.max_input) == (20, 70)
    for hist, mi in (("none", 1), ("target", 3), ("oracle_ans", 70),
                     ("nav_q_oracle_ans", 80), ("all", 300)):
        assert ndh_budgets("player_path", hist) == (40, mi)
    # explicit flags win, in either spelling
    cfg = parse_args(["--train", "validndh", "--maxAction", "25"])
    assert (cfg.max_action, cfg.max_input) == (25, 300)
    cfg = parse_args(["--train", "ndh", "--max_input=120"])
    assert (cfg.max_action, cfg.max_input) == (40, 120)
    # R2R modes keep their own defaults
    cfg = parse_args(["--train", "listener"])
    assert (cfg.max_action, cfg.max_input) == (20, 80)


def test_ndh_long_dialog_not_truncated(connectivity_dir):
    """Under the derived `all` budget the tokenizer keeps a dialog far
    past R2R's 80 tokens."""
    from dasa_tpu.config import ndh_budgets

    item = make_cvdn_items(connectivity_dir, 1)[0]
    item["dialog_history"] = [
        {"nav_idx": t, "role": ("navigator" if t % 2 == 0 else "oracle"),
         "message": "step " + " ".join(f"word{t}x{j}" for j in range(12))}
        for t in range(12)
    ]
    items = convert_ndh_items([item], path_type="trusted_path",
                              history="all")
    vocab = build_vocab(items, min_count=1)
    _ma, max_input = ndh_budgets("trusted_path", "all")
    tok = Tokenizer(vocab, encoding_length=max_input)
    enc = tok.encode_sentence(items[0]["instructions"][0])
    pad = tok.word_to_index["<PAD>"]
    assert (enc == pad).any(), "derived budget must hold the full dialog"
    length = int((enc != pad).sum())
    assert length > 80, "dialog should exceed the R2R input budget"
