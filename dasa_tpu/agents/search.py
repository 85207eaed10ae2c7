"""Dijkstra ("beam") search inference with speaker rescoring.

Reference: agent_dg.py:1038-1325 (_dijkstra / beam_search) and
train.py:424-517 (beam_valid).  The search expands, per episode, the
highest-score (sum of action log-probs) unvisited state; one batched
jitted decode step scores all episodes' frontier states at once.  Paths
keep *index* records (feat_row / view / chosen candidate geometry), and
speaker rescoring gathers features on device — no host-side feature
blocks.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dasa_tpu.agents.seq2seq import Seq2SeqAgent, make_step_inputs
from dasa_tpu.models import DasaPolicy, DecoderState
from dasa_tpu.models.layers import NEG_INF
from dasa_tpu.utils.angles import ELEVATION_INC, HEADING_COUNT, HEADING_INC

START_ACTION = -95  # sentinel of the root state (agent_dg.py:1096)
STOP_ACTION = -1


def _view_pose(view_index: int) -> Tuple[float, float]:
    return ((view_index % HEADING_COUNT) * HEADING_INC,
            (view_index // HEADING_COUNT - 1) * ELEVATION_INC)


def _search_fn(agent: Seq2SeqAgent):
    if "search" not in agent._jit_cache:
        cfg = agent.cfg
        policy = agent.policy

        @jax.jit
        def run(params, tables, cached, valid, seq_len, state, sobs):
            inputs = make_step_inputs(cfg, tables, sobs)
            new_state, logit, _value, _aux = policy.apply(
                params, cached, valid, seq_len, inputs, state,
                sobs["is_first"], deterministic=True, is_test=True,
                method=DasaPolicy.policy_step)
            masked = jnp.where(sobs["logit_mask"], NEG_INF,
                               logit.astype(jnp.float32))
            return new_state, jax.nn.log_softmax(masked, axis=-1)

        agent._jit_cache["search"] = run
    return agent._jit_cache["search"]


def dijkstra_search(agent: Seq2SeqAgent, n_candidates: int = 1,
                    max_expansions: int = 300) -> List[dict]:
    """Exact top-K min-neg-log-prob paths per episode."""
    env = agent.env
    cfg = agent.cfg
    obs = env.reset()
    batch = obs.batch_size()
    step_fn = _search_fn(agent)

    instr = jnp.asarray(obs.instr)
    valid = jnp.asarray(~obs.pad_mask)
    seq_len = jnp.asarray(obs.seq_len)
    base_rng = jax.random.fold_in(agent._base_rng, agent._rollout_counter)
    agent._rollout_counter += 1
    cached = agent._encode_fn(False)(agent.params, instr, valid, seq_len,
                                     base_rng)

    start_vps = env.current_viewpoints()
    results = [{
        "scan": env.batch[i]["scan"],
        "instr_id": env.batch[i]["instr_id"],
        "instr_encoding": np.asarray(obs.instr[i]),
        "dijk_path": [start_vps[i]],
        "paths": [],
    } for i in range(batch)]

    from dasa_tpu.models.policy import decoder_state_width

    dec_h = decoder_state_width(cfg)
    zero_state = (np.zeros(dec_h, np.float32),) * 3

    def sid(viewpoint, action):
        return f"{viewpoint}_{action}"

    id2state: List[Dict[str, dict]] = [{
        sid(start_vps[i], START_ACTION): {
            "next_viewpoint": start_vps[i],
            "view_index": int(obs.view_index[i]),
            "running_state": zero_state,
            "is_first": True,
            "from": None,
            "score": 0.0,
            "scores": [],
            "actions": [],
            "record": None,
        }} for i in range(batch)]
    visited = [set() for _ in range(batch)]
    finished = [set() for _ in range(batch)]
    ended = np.zeros(batch, bool)

    for _ in range(max_expansions):
        frontier = []
        for i in range(batch):
            if ended[i]:
                frontier.append(next(iter(id2state[i].items())))
                continue
            best = max(
                ((k, s) for k, s in id2state[i].items()
                 if k not in visited[i]),
                key=lambda kv: kv[1]["score"])
            frontier.append(best)
            state_id = best[0]
            visited[i].add(state_id)
            action = int(state_id.rsplit("_", 1)[1])
            if action == STOP_ACTION:
                finished[i].add(state_id)
                if len(finished[i]) >= n_candidates:
                    ended[i] = True

        # teleport envs to the frontier states and refresh obs
        for i, (state_id, st) in enumerate(frontier):
            obs = env.teleport(i, st["next_viewpoint"], st["view_index"])

        # one batched decode step over the frontier
        h = jnp.asarray(np.stack([f[1]["running_state"][0]
                                  for f in frontier]), agent.dtype)
        c = jnp.asarray(np.stack([f[1]["running_state"][1]
                                  for f in frontier]), agent.dtype)
        h1 = jnp.asarray(np.stack([f[1]["running_state"][2]
                                   for f in frontier]), agent.dtype)
        state = DecoderState(h, c, h1)
        sobs = agent._to_sobs(obs, np.zeros(batch, bool), None, False)
        sobs["is_first"] = np.array([f[1]["is_first"] for f in frontier])
        sobs_dev = {k: jnp.asarray(v) for k, v in sobs.items()}
        new_state, log_probs = step_fn(agent.params, agent.tables, cached,
                                       valid, seq_len, state, sobs_dev)
        log_probs = np.asarray(log_probs)
        new_h = np.asarray(new_state.h, np.float32)
        new_c = np.asarray(new_state.c, np.float32)
        new_h1 = np.asarray(new_state.h1, np.float32)

        for i in range(batch):
            state_id, cur = frontier[i]
            from_action = int(state_id.rsplit("_", 1)[1])
            if from_action == STOP_ACTION or ended[i]:
                continue
            vp = env.current_viewpoints()[i]
            # extend the exploration path (reference stitches via an
            # incremental Floyd graph; our full shortest paths give the
            # same-or-shorter connectors)
            g = env.graphs[results[i]["scan"]]
            last = results[i]["dijk_path"][-1]
            if last != vp:
                hop = g.shortest_path(g.id2ix[last], g.id2ix[vp])
                results[i]["dijk_path"].extend(
                    g.ids[n] for n in hop[1:])
            n = int(obs.cand_n[i])
            run_state = (new_h[i], new_c[i], new_h1[i])
            for j in range(n + 1):
                lp = float(log_probs[i, j])
                new_score = cur["score"] + lp
                if j < n:
                    nxt_vp = g.ids[int(obs.cand_nbr_ix[i, j])]
                    next_id = sid(vp, j)
                    view = int(obs.cand_point_id[i, j])
                else:
                    nxt_vp = vp
                    next_id = sid(vp, STOP_ACTION)
                    view = int(obs.view_index[i])
                old = id2state[i].get(next_id)
                if old is None or new_score > old["score"]:
                    id2state[i][next_id] = {
                        "next_viewpoint": nxt_vp,
                        "view_index": view,
                        "running_state": run_state,
                        "is_first": False,
                        "from": state_id,
                        "score": new_score,
                        "scores": cur["scores"] + [lp],
                        "actions": cur["actions"] + [n + 1],
                        "record": {
                            "feat_row": int(obs.feat_row[i]),
                            "view_index": int(obs.view_index[i]),
                            "cand_point_id": int(obs.cand_point_id[i, j])
                            if j < n else 0,
                            "cand_heading": float(obs.cand_heading[i, j])
                            if j < n else 0.0,
                            "cand_elevation": float(
                                obs.cand_elevation[i, j]) if j < n
                            else 0.0,
                            "has_cand": j < n,
                        },
                    }
            if len(visited[i]) == len(id2state[i]):
                ended[i] = True
        if ended.all():
            break

    # walk back from start: close the exploration loop
    for i in range(batch):
        g = env.graphs[results[i]["scan"]]
        last = results[i]["dijk_path"][-1]
        first = results[i]["dijk_path"][0]
        if last != first:
            hop = g.shortest_path(g.id2ix[last], g.id2ix[first])
            results[i]["dijk_path"].extend(g.ids[n] for n in hop[1:])

    # extract finished paths via the from-chains
    for i, result in enumerate(results):
        for state_id in finished[i]:
            path = {"trajectory": [], "action": [], "records": [],
                    "listener_scores": id2state[i][state_id]["scores"],
                    "listener_actions": id2state[i][state_id]["actions"]}
            cur_id = state_id
            while True:
                st = id2state[i][cur_id]
                h_e = _view_pose(st["view_index"])
                path["trajectory"].append(
                    (st["next_viewpoint"], h_e[0], h_e[1]))
                action = int(cur_id.rsplit("_", 1)[1])
                if action == START_ACTION:
                    break
                path["action"].append(action)
                path["records"].append(st["record"])
                cur_id = st["from"]
            for key in ("trajectory", "action", "records"):
                path[key] = path[key][::-1]
            result["paths"].append(path)
    return results


def state_factored_search(agent: Seq2SeqAgent, completion_size: int = 1,
                          successor_size: int = 4,
                          max_expansions: int = 80) -> List[dict]:
    """Physical-state-factored best-first search.

    Reference: the speaker-follower package's ``state_factored_search``
    (tasks/R2R/speaker/follower.py:720-980).  Unlike the Dijkstra search
    above — which keys states by (viewpoint, arriving action) — this
    search keeps at most ONE inference state per physical pose
    ``(viewpoint, view_index)`` (the reference's ``first_n_ws_key=4``
    world-state prefix), always the best-scoring path that reaches it.
    Each round expands the top ``successor_size`` unexpanded poses per
    episode in one batched decode pass per beam rank; successors that
    emit STOP (or hit ``max_action`` steps, follower.py:891) enter a
    completed-holding pool keyed the same way, and a held completion is
    finalized when it is itself selected over the open frontier
    (follower.py:908-924).  Terminates once every episode holds
    ``completion_size`` completions or its frontier empties.

    Output format matches :func:`dijkstra_search` (``paths`` with
    trajectory / action / records / listener_scores, plus the
    ``dijk_path`` exploration stitch — the reference's
    ``traversed_lists``), so speaker rescoring and ``beam_valid``'s
    score mixing work unchanged on top.
    """
    env = agent.env
    cfg = agent.cfg
    obs = env.reset()
    batch = obs.batch_size()
    step_fn = _search_fn(agent)

    instr = jnp.asarray(obs.instr)
    valid = jnp.asarray(~obs.pad_mask)
    seq_len = jnp.asarray(obs.seq_len)
    base_rng = jax.random.fold_in(agent._base_rng, agent._rollout_counter)
    agent._rollout_counter += 1
    cached = agent._encode_fn(False)(agent.params, instr, valid, seq_len,
                                     base_rng)

    start_vps = env.current_viewpoints()
    results = [{
        "scan": env.batch[i]["scan"],
        "instr_id": env.batch[i]["instr_id"],
        "instr_encoding": np.asarray(obs.instr[i]),
        "dijk_path": [start_vps[i]],
        "paths": [],
    } for i in range(batch)]

    from dasa_tpu.models.policy import decoder_state_width

    dec_h = decoder_state_width(cfg)
    zero_state = (np.zeros(dec_h, np.float32),) * 3

    roots = [{
        "next_viewpoint": start_vps[i],
        "view_index": int(obs.view_index[i]),
        "running_state": zero_state,
        "is_first": True,
        "parent": None,
        "action": START_ACTION,
        "lp": 0.0,
        "n_actions": 0,
        "score": 0.0,
        "count": 0,
        "record": None,
    } for i in range(batch)]

    def key_of(st):
        return (st["next_viewpoint"], st["view_index"])

    # per instance: pose -> [state, expanded?]  (follower.py:738-747)
    cache = [{key_of(roots[i]): [roots[i], True]} for i in range(batch)]
    holding: List[Dict[tuple, list]] = [{} for _ in range(batch)]
    completed: List[Dict[tuple, dict]] = [{} for _ in range(batch)]
    beams: List[List[dict]] = [[roots[i]] for i in range(batch)]

    def stitch(i, vp):
        g = env.graphs[results[i]["scan"]]
        last = results[i]["dijk_path"][-1]
        if last != vp:
            hop = g.shortest_path(g.id2ix[last], g.id2ix[vp])
            results[i]["dijk_path"].extend(g.ids[n] for n in hop[1:])

    for _ in range(max_expansions):
        if all(len(completed[i]) >= completion_size or not beams[i]
               for i in range(batch)):
            break
        width = max(len(b) for b in beams)
        # expand the whole beam, one fixed-shape decode per beam rank
        for s in range(width):
            rows = [beams[i][s] if s < len(beams[i]) else None
                    for i in range(batch)]
            if all(r is None for r in rows):
                continue
            for i in range(batch):
                st = rows[i]
                if st is None:
                    # padding row (beam shorter than this rank): leave
                    # the env at its previous pose — the batched decode
                    # still covers the row but its outputs are
                    # discarded, and skipping the teleport avoids both
                    # the host work and mutating env state rollouts
                    # never visited (ADVICE r3)
                    continue
                obs = env.teleport(i, st["next_viewpoint"],
                                   st["view_index"])
                # physical traversal record: the reference extends
                # traversed_lists when a world state is actually
                # teleported to (expanded), not when it is selected
                # (follower.py update_traversed_lists)
                stitch(i, st["next_viewpoint"])
            h = jnp.asarray(np.stack(
                [(rows[i] or roots[i])["running_state"][0]
                 for i in range(batch)]), agent.dtype)
            c = jnp.asarray(np.stack(
                [(rows[i] or roots[i])["running_state"][1]
                 for i in range(batch)]), agent.dtype)
            h1 = jnp.asarray(np.stack(
                [(rows[i] or roots[i])["running_state"][2]
                 for i in range(batch)]), agent.dtype)
            state = DecoderState(h, c, h1)
            sobs = agent._to_sobs(obs, np.zeros(batch, bool), None, False)
            sobs["is_first"] = np.array(
                [(rows[i] or roots[i])["is_first"] for i in range(batch)])
            sobs_dev = {k: jnp.asarray(v) for k, v in sobs.items()}
            new_state, log_probs = step_fn(agent.params, agent.tables,
                                           cached, valid, seq_len, state,
                                           sobs_dev)
            log_probs = np.asarray(log_probs)
            new_h = np.asarray(new_state.h, np.float32)
            new_c = np.asarray(new_state.c, np.float32)
            new_h1 = np.asarray(new_state.h1, np.float32)

            for i in range(batch):
                cur = rows[i]
                if cur is None:
                    continue
                g = env.graphs[results[i]["scan"]]
                vp = cur["next_viewpoint"]
                n = int(obs.cand_n[i])
                run_state = (new_h[i], new_c[i], new_h1[i])
                for j in range(n + 1):
                    lp = float(log_probs[i, j])
                    count = cur["count"] + 1
                    stop = j >= n
                    if stop:
                        nxt_vp, view = vp, int(obs.view_index[i])
                    else:
                        nxt_vp = g.ids[int(obs.cand_nbr_ix[i, j])]
                        view = int(obs.cand_point_id[i, j])
                    succ = {
                        "next_viewpoint": nxt_vp,
                        "view_index": view,
                        "running_state": run_state,
                        "is_first": False,
                        "parent": cur,
                        "action": STOP_ACTION if stop else j,
                        "lp": lp,
                        "n_actions": n + 1,
                        "score": cur["score"] + lp,
                        "count": count,
                        "record": {
                            "feat_row": int(obs.feat_row[i]),
                            "view_index": int(obs.view_index[i]),
                            "cand_point_id": view if not stop else 0,
                            "cand_heading":
                                float(obs.cand_heading[i, j])
                                if not stop else 0.0,
                            "cand_elevation":
                                float(obs.cand_elevation[i, j])
                                if not stop else 0.0,
                            "has_cand": not stop,
                        },
                    }
                    pool = (holding[i]
                            if stop or count >= cfg.max_action
                            else cache[i])
                    old = pool.get(key_of(succ))
                    if old is None or succ["score"] > old[0]["score"]:
                        pool[key_of(succ)] = [succ, False]

        # select the next frontier: best unexpanded poses across the
        # open cache and the completed-holding pool (follower.py:902-931)
        for i in range(batch):
            if len(completed[i]) >= completion_size:
                beams[i] = []
                continue
            consider = ([(k, v, False) for k, v in cache[i].items()
                         if not v[1]]
                        + [(k, v, True) for k, v in holding[i].items()
                           if not v[1]])
            consider.sort(key=lambda kvh: kvh[1][0]["score"], reverse=True)
            new_beam = []
            for k, v, held in consider[:successor_size]:
                v[1] = True
                if held:
                    old = completed[i].get(k)
                    if old is None or v[0]["score"] > old["score"]:
                        completed[i][k] = v[0]
                else:
                    # stitched at expansion time (when teleported to),
                    # not here: frontier poses selected in the same
                    # round a held completion fills completion_size are
                    # never expanded and must not enter dijk_path
                    new_beam.append(v[0])
            beams[i] = ([] if len(completed[i]) >= completion_size
                        else new_beam)

    # fallback: if expansion budget ran out before a STOP, promote the
    # best held (or frontier) state so every episode yields >=1 path.
    # The reference loops until every episode holds completion_size
    # completions (follower.py), so a budget exhaust is a deviation —
    # surface it instead of silently changing eval results (ADVICE r3)
    exhausted = [
        i for i in range(batch)
        if len(completed[i]) < completion_size
        and (beams[i]
             or any(not v[1] for v in cache[i].values())
             or any(not v[1] for v in holding[i].values()))]
    for i in range(batch):
        if not completed[i]:
            pool = holding[i] or cache[i]
            k, v = max(pool.items(), key=lambda kv: kv[1][0]["score"])
            completed[i][k] = v[0]
    if exhausted:
        import warnings

        warnings.warn(
            f"state_factored_search: {len(exhausted)}/{batch} episodes "
            f"exhausted max_expansions={max_expansions} before holding "
            f"{completion_size} completions (best-effort states "
            f"emitted); raise max_expansions", stacklevel=2)

    for i, result in enumerate(results):
        final = sorted(completed[i].values(), key=lambda s: s["score"],
                       reverse=True)[:completion_size]
        # the reference traverses to each emitted completion
        # (update_traversed_lists(completed_list)) so the physical
        # exploration path reaches the endpoints.  The final stitch
        # back to the start viewpoint is NOT in the reference (its
        # traversed list ends at the last completion endpoint) — it is
        # an intentional deviation kept so dijk_path obeys the same
        # starts-and-ends-at-origin output contract as our
        # dijkstra_search, which downstream score/submit code assumes.
        for st in final:
            stitch(i, st["next_viewpoint"])
        stitch(i, result["dijk_path"][0])
        for st in final:
            path = {"trajectory": [], "action": [], "records": [],
                    "listener_scores": [], "listener_actions": []}
            cur = st
            while cur is not None:
                h_e = _view_pose(cur["view_index"])
                path["trajectory"].append(
                    (cur["next_viewpoint"], h_e[0], h_e[1]))
                if cur["parent"] is None:
                    break
                path["action"].append(cur["action"])
                path["records"].append(cur["record"])
                path["listener_scores"].append(cur["lp"])
                path["listener_actions"].append(cur["n_actions"])
                cur = cur["parent"]
            for k in ("trajectory", "action", "records",
                      "listener_scores", "listener_actions"):
                path[k] = path[k][::-1]
            result["paths"].append(path)
    return results


def _speaker_rescore(results: List[dict], speaker) -> List[dict]:
    """Score each candidate path with the speaker (agent_dg.py:1251-1310)."""
    for result in results:
        for path in result["paths"]:
            recs = path.pop("records")
            if not recs:
                path["speaker_scores"] = np.zeros(0, np.float32)
                continue
            stacked = {
                k: np.asarray([r[k] for r in recs])[None]
                for k in recs[0]
            }
            inst = np.asarray(result["instr_encoding"])[None]
            scores = speaker.score_instruction(stacked, inst)
            path["speaker_scores"] = -scores[0]
    return results


def beam_search(agent: Seq2SeqAgent, speaker,
                n_candidates: int = 1) -> List[dict]:
    """Dijkstra search + speaker rescoring (agent_dg.py:1251-1310)."""
    return _speaker_rescore(dijkstra_search(agent, n_candidates), speaker)


def beam_search_test(agent: Seq2SeqAgent, speaker,
                     n_candidates: int = 1) -> Dict[str, dict]:
    """Search every item once (agent_dg.py:1312-1325)."""
    agent.results = {}
    env = agent.env
    env.reset_epoch()
    for _ in range(env.size() // env.batch_size + 2):
        for traj in beam_search(agent, speaker, n_candidates):
            agent.results.setdefault(traj["instr_id"], traj)
        if len(agent.results) >= env.size():
            break
    return agent.results


def state_factored_search_test(agent: Seq2SeqAgent, speaker,
                               completion_size: int = 1,
                               successor_size: int = 4,
                               max_expansions: int = 80
                               ) -> Dict[str, dict]:
    """State-factored search + speaker rescoring over every item
    (the speaker-follower pragmatic-inference eval path,
    tasks/R2R/speaker/follower.py:987-999 test with beam_size>1)."""
    agent.results = {}
    env = agent.env
    env.reset_epoch()
    for _ in range(env.size() // env.batch_size + 2):
        results = _speaker_rescore(
            state_factored_search(agent, completion_size, successor_size,
                                  max_expansions=max_expansions),
            speaker)
        for traj in results:
            agent.results.setdefault(traj["instr_id"], traj)
        if len(agent.results) >= env.size():
            break
    return agent.results


def cal_score(path: dict, alpha: float, avg_speaker: bool,
              avg_listener: bool) -> float:
    """Score mixing (train.py:442-451)."""
    sp = float(np.sum(path["speaker_scores"])) * alpha
    if avg_speaker and len(path["speaker_scores"]):
        sp /= len(path["speaker_scores"])
    li = float(np.sum(path["listener_scores"])) * (1 - alpha)
    if avg_listener and len(path["listener_scores"]):
        li /= len(path["listener_scores"])
    return sp + li
