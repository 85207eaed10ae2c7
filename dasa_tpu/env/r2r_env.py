"""R2R navigation environment with dense observations.

Replaces the reference's EnvBatch + R2RBatch (r2r_src/env.py:33-504).
Episodic control (graphs, shortest paths, candidate geometry, minibatch
iteration) stays on host; observations are fixed-shape numpy structs whose
feature content is gathered on device.  Candidate geometry per
(scan, viewpoint) is cached once — the reference proves this is sound with
its buffered_state_dict (env.py:291-297).
"""

from __future__ import annotations

import math
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from dasa_tpu.data.features import FeatureDB
from dasa_tpu.env.obs import Obs
from dasa_tpu.sim.engine import BatchSim, PanoCandidates
from dasa_tpu.sim.graph import ScanGraph, load_scan_graph
from dasa_tpu.utils.angles import HEADING_COUNT, HEADING_INC


class R2REnv:
    """Batched R2R task environment.

    Actions per step are candidate indices into the obs' K slots; the
    STOP action is index ``cand_n`` (or -1, both accepted).  Trajectories
    (with reference-equivalent micro-steps) are recorded into caller-owned
    lists for evaluation.
    """

    def __init__(
        self,
        feature_db: FeatureDB,
        data: List[dict],
        batch_size: int = 64,
        seed: int = 10,
        name: Optional[str] = None,
        connectivity_dir: str = "/root/reference/connectivity",
        max_candidates: int = 16,
        max_input: int = 80,
        depth_db: Optional[FeatureDB] = None,
    ):
        self.feature_db = feature_db
        self.depth_db = depth_db
        featurized = feature_db.scans
        self.data = [d for d in data if d["scan"] in featurized]
        self.name = name or "env"
        self.batch_size = batch_size
        self.connectivity_dir = connectivity_dir
        self.max_candidates = max_candidates
        self.max_input = max_input
        self.scans = sorted({d["scan"] for d in self.data})
        self.sim = BatchSim(batch_size, connectivity_dir, seed=seed)
        self.graphs: Dict[str, ScanGraph] = {}
        for scan in self.scans:
            g = load_scan_graph(scan, connectivity_dir)
            g.compute_shortest_paths()
            self.graphs[scan] = g
        self._rng = random.Random(seed)
        self._rng.shuffle(self.data)
        self.ix = 0
        self.batch: List[dict] = []
        # per-episode goal/start node indices
        self._goal_ix = np.zeros(batch_size, dtype=np.int64)
        self._start_ix = np.zeros(batch_size, dtype=np.int64)
        self._total_dist = np.zeros(batch_size, dtype=np.float64)

    def size(self) -> int:
        return len(self.data)

    # -- minibatch iteration (env.py:201-223) --
    def _next_minibatch(self, tile_one: bool = False,
                        batch_size: Optional[int] = None) -> None:
        if batch_size is None:
            batch_size = self.batch_size
        if tile_one:
            batch = [self.data[self.ix]] * batch_size
            self.ix += 1
            if self.ix >= len(self.data):
                self._rng.shuffle(self.data)
                self.ix -= len(self.data)
        else:
            batch = self.data[self.ix: self.ix + batch_size]
            if len(batch) < batch_size:
                self._rng.shuffle(self.data)
                self.ix = batch_size - len(batch)
                batch += self.data[: self.ix]
            else:
                self.ix += batch_size
        self.batch = batch

    def reset_epoch(self, shuffle: bool = False) -> None:
        if shuffle:
            self._rng.shuffle(self.data)
        self.ix = 0

    # -- episodes --
    def reset(self, batch: Optional[List[dict]] = None, inject: bool = False,
              random_start: bool = False, **kwargs) -> Obs:
        if batch is None:
            self._next_minibatch(**kwargs)
        elif inject:
            self._next_minibatch(**kwargs)
            self.batch[: len(batch)] = batch
        else:
            self.batch = batch
        scans = [item["scan"] for item in self.batch]
        if random_start:
            starts = [self._rng.choice(item["path"]) for item in self.batch]
        else:
            starts = [item["path"][0] for item in self.batch]
        headings = [item["heading"] for item in self.batch]
        self.sim.new_episodes(scans, starts, headings)
        for i, item in enumerate(self.batch):
            g = self.graphs[item["scan"]]
            self._goal_ix[i] = g.id2ix[item["path"][-1]]
            self._start_ix[i] = g.id2ix[item["path"][0]]
            self._total_dist[i] = g.dist[g.id2ix[item["path"][0]],
                                         self._goal_ix[i]]
        return self._get_obs()

    def step(self, actions: Sequence[int],
             trajs: Optional[List[list]] = None) -> Obs:
        """actions: candidate index per episode; -1 or cand_n = STOP."""
        for i, a in enumerate(actions):
            a = int(a)
            st = self.sim.states[i]
            n = len(self.sim.candidates(st.scan, st.ix).nbr_ix)
            if a < 0 or a >= n:
                continue  # STOP / ended: no state change
            self.sim.step_candidate(i, a, None if trajs is None else trajs[i])
        return self._get_obs()

    # -- state access for the agent/evaluator --
    def state_tuples(self) -> List[Tuple[str, float, float]]:
        """(viewpointId, heading, elevation) per episode, the trajectory
        entry format of the submission JSON (eval.py:17)."""
        out = []
        for st in self.sim.states:
            out.append((st.graph.ids[st.ix], st.heading, st.elevation))
        return out

    def current_viewpoints(self) -> List[str]:
        return [st.graph.ids[st.ix] for st in self.sim.states]

    def instr_ids(self) -> List[str]:
        return [item["instr_id"] for item in self.batch]

    # -- observation assembly --
    def _teacher_cand_idx(self, i: int, cands: PanoCandidates,
                          goal_ix: int) -> int:
        """Candidate index of the shortest-path action; n_cand => STOP
        (env.py:232-238 + agent_dg.py:325-345 collapsed)."""
        st = self.sim.states[i]
        if st.ix == goal_ix:
            return len(cands.nbr_ix)
        nxt = st.graph.next_hop[st.ix, goal_ix]
        if nxt < 0:
            return len(cands.nbr_ix)
        k = np.nonzero(cands.nbr_ix == nxt)[0]
        assert len(k) == 1, "teacher next-hop must be a candidate"
        return int(k[0])

    def _get_obs(self) -> Obs:
        b = len(self.batch)
        k = self.max_candidates
        L = self.max_input
        instr = np.zeros((b, L), dtype=np.int32)
        seq_len = np.zeros(b, dtype=np.int32)
        feat_row = np.zeros(b, dtype=np.int32)
        view_index = np.zeros(b, dtype=np.int32)
        heading = np.zeros(b, dtype=np.float32)
        elevation = np.zeros(b, dtype=np.float32)
        cand_point_id = np.zeros((b, k), dtype=np.int32)
        cand_nbr_ix = np.full((b, k), -1, dtype=np.int32)
        cand_heading = np.zeros((b, k), dtype=np.float32)
        cand_elevation = np.zeros((b, k), dtype=np.float32)
        cand_n = np.zeros(b, dtype=np.int32)
        teacher = np.zeros(b, dtype=np.int32)
        back_teacher = np.zeros(b, dtype=np.int32)
        distance = np.zeros(b, dtype=np.float32)
        progress = np.zeros(b, dtype=np.float32)

        for i, item in enumerate(self.batch):
            st = self.sim.states[i]
            enc = item["instr_encoding"]
            n_tok = min(len(enc), L)
            instr[i, :n_tok] = enc[:n_tok]
            nz = np.nonzero(np.asarray(enc) == 0)[0]
            seq_len[i] = int(nz[0]) if len(nz) else len(enc)
            vp = st.graph.ids[st.ix]
            feat_row[i] = self.feature_db.row(st.scan, vp)
            view_index[i] = st.view_index
            heading[i] = st.heading
            elevation[i] = st.elevation

            cands = self.sim.candidates(st.scan, st.ix)
            n = min(len(cands.nbr_ix), k - 1)  # keep a slot for STOP
            cand_n[i] = n
            base_heading = (st.view_index % HEADING_COUNT) * HEADING_INC
            cand_point_id[i, :n] = cands.point_id[:n]
            cand_nbr_ix[i, :n] = cands.nbr_ix[:n]
            cand_heading[i, :n] = cands.normalized_heading[:n] - base_heading
            cand_elevation[i, :n] = cands.elevation[:n]
            teacher[i] = min(self._teacher_cand_idx(i, cands,
                                                    int(self._goal_ix[i])), n)
            back_teacher[i] = min(
                self._teacher_cand_idx(i, cands, int(self._start_ix[i])), n)
            distance[i] = st.graph.dist[st.ix, self._goal_ix[i]]
            progress[i] = 1.0 - distance[i] / (self._total_dist[i] + 1e-10)

        slots = np.arange(k)[None, :]
        cand_mask = slots <= cand_n[:, None]  # real candidates + STOP slot
        pad_mask = instr == 0
        return Obs(
            instr=instr, pad_mask=pad_mask, seq_len=seq_len,
            feat_row=feat_row, view_index=view_index,
            heading=heading, elevation=elevation,
            cand_point_id=cand_point_id, cand_heading=cand_heading,
            cand_elevation=cand_elevation, cand_n=cand_n,
            cand_mask=cand_mask, cand_nbr_ix=cand_nbr_ix,
            teacher=teacher, back_teacher=back_teacher,
            distance=distance, progress=progress,
        )

    def get_statistics(self) -> dict:
        length = sum(len(d["instructions"].split()) for d in self.data)
        path = 0.0
        for d in self.data:
            g = self.graphs[d["scan"]]
            path += g.dist[g.id2ix[d["path"][0]], g.id2ix[d["path"][-1]]]
        n = max(1, len(self.data))
        return {"length": length / n, "path": path / n}
