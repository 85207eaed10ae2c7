"""Simulator conformance tests, ported from the reference C++ suite
(src/test/main.cpp) which runs with rendering disabled against the real
connectivity graphs.  These pin the motion/discretization/candidate
contracts our env and models depend on."""

import json
import math
import os

import numpy as np
import pytest

from dasa_tpu.sim import Simulator
from dasa_tpu.sim.engine import BatchSim, compute_pano_candidates
from dasa_tpu.sim.graph import load_scan_graph

# scripted episode tables (src/test/main.cpp:34-40)
HEADING = [10, 350, 350, 1, 90, 180, 90, 270, 90, 270]
HEADING_CHG = [-20, -360, 371, 89, 90, -90, -180, -180, -180, 0]
DISCRETE_HEADING = [0, 330, 300, 330, 0, 30, 0, 330, 300, 270]
ELEVATION = [10, 10, -26, -40, -40, -40, 50, 50, 40, 0]
ELEVATION_CHG = [0, -36, -30, -10, 0, 90, 5, -10, -40, 0]
DISCRETE_ELEVATION = [0, 0, -30, -30, -30, -30, 0, 30, 0, -30]
VIEW_INDEX = [12, 23, 10, 11, 0, 1, 12, 35, 22, 9]

SCANS = ["2t7WUuJeko7", "17DRP5sb8fy"]
STARTS = ["cc34e9176bfe47ebb23c58c165203134", "5b9b2794954e4694a45fc424a8643081"]


def _make_sim(connectivity_dir, discrete=False):
    sim = Simulator(connectivity_dir)
    sim.setCameraResolution(200, 100)
    sim.setCameraVFOV(math.radians(45))  # 45 deg vfov, 90 deg hfov
    sim.setRenderingEnabled(False)
    if discrete:
        sim.setDiscretizedViewingAngles(True)
    sim.init()
    return sim


def test_continuous_motion(connectivity_dir):
    """src/test/main.cpp:42-74."""
    sim = _make_sim(connectivity_dir)
    assert sim.setElevationLimits(math.radians(-40), math.radians(50))
    for scan, start in zip(SCANS, STARTS):
        vp = start
        sim.newEpisode(scan, vp, math.radians(HEADING[0]), math.radians(ELEVATION[0]))
        for t in range(10):
            st = sim.getState()
            assert st.scanId == scan
            assert st.step == t
            assert st.heading == pytest.approx(math.radians(HEADING[t]))
            assert st.elevation == pytest.approx(math.radians(ELEVATION[t]))
            assert st.location.viewpointId == vp
            assert st.viewIndex == 0  # not active in continuous mode
            actions = st.navigableLocations
            ix = t % len(actions)
            vp = actions[ix].viewpointId
            sim.makeAction(ix, math.radians(HEADING_CHG[t]),
                           math.radians(ELEVATION_CHG[t]))


def test_discrete_motion(connectivity_dir):
    """src/test/main.cpp:76-109: 30-degree snapping and viewIndex tables."""
    sim = _make_sim(connectivity_dir, discrete=True)
    assert sim.setElevationLimits(math.radians(-10), math.radians(10))
    for scan, start in zip(SCANS, STARTS):
        vp = start
        sim.newEpisode(scan, vp, math.radians(HEADING[0]), math.radians(ELEVATION[0]))
        for t in range(10):
            st = sim.getState()
            assert st.step == t
            assert st.heading == pytest.approx(math.radians(DISCRETE_HEADING[t]))
            assert st.elevation == pytest.approx(math.radians(DISCRETE_ELEVATION[t]))
            assert st.location.viewpointId == vp
            assert st.viewIndex == VIEW_INDEX[t]
            actions = st.navigableLocations
            ix = t % len(actions)
            vp = actions[ix].viewpointId
            sim.makeAction(ix, math.radians(HEADING_CHG[t]),
                           math.radians(ELEVATION_CHG[t]))


def test_robot_relative_coords(connectivity_dir):
    """src/test/main.cpp:111-167: candidates sorted by angular distance and
    (rel_heading, rel_elevation, rel_distance) reconstruct world xyz."""
    sim = _make_sim(connectivity_dir)
    assert sim.setElevationLimits(math.radians(-40), math.radians(50))
    for scan, start in zip(SCANS, STARTS):
        sim.newEpisode(scan, start, math.radians(HEADING[0]),
                       math.radians(ELEVATION[0]))
        for t in range(10):
            st = sim.getState()
            curr = np.array(st.location.point)
            last_angle = 0.0
            for k, loc in enumerate(st.navigableLocations):
                if k == 0:
                    assert loc.rel_heading == pytest.approx(0)
                    assert loc.rel_elevation == pytest.approx(0)
                    assert loc.rel_distance == pytest.approx(0)
                    continue
                angle = math.sqrt(loc.rel_heading ** 2 + loc.rel_elevation ** 2)
                assert angle >= last_angle
                last_angle = angle
                h = st.heading + loc.rel_heading
                e = st.elevation + loc.rel_elevation
                offset = np.array([
                    math.sin(h) * math.cos(e) * loc.rel_distance,
                    math.cos(h) * math.cos(e) * loc.rel_distance,
                    math.sin(e) * loc.rel_distance,
                ])
                np.testing.assert_allclose(np.array(loc.point), curr + offset,
                                           rtol=1e-4, atol=1e-4)
            ix = t % len(st.navigableLocations)
            sim.makeAction(ix, math.radians(HEADING_CHG[t]),
                           math.radians(ELEVATION_CHG[t]))


@pytest.mark.parametrize("scan", SCANS + ["ZMojNkEp431"])
def test_navigable_locations_vs_json(connectivity_dir, scan):
    """src/test/main.cpp:169-299: re-derive reachability from the raw JSON
    (visibility cone, unobstructed, included) and require exact equality
    with navigableLocations.  Run on 3 scans (the C++ suite covers all 90;
    test_navigable_all_scans below samples the rest)."""
    _check_navigable(connectivity_dir, scan, steps=10)


def _check_navigable(connectivity_dir, scan, steps=10, seed=1):
    sim = Simulator(connectivity_dir)
    sim.setCameraResolution(20, 20)
    sim.setCameraVFOV(math.radians(90))  # 90 deg vfov => 90 deg hfov
    half_hfov = math.pi / 4
    sim.setRenderingEnabled(False)
    sim.setSeed(seed)
    sim.init()
    sim.newEpisode(scan)  # random (but seeded) start

    with open(os.path.join(connectivity_dir, f"{scan}_connectivity.json")) as f:
        root = json.load(f)
    included = [bool(v["included"]) for v in root]
    st = sim.getState()
    start_ix = next(i for i, v in enumerate(root)
                    if v["image_id"] == st.location.viewpointId)
    assert included[start_ix], "newEpisode must not spawn at excluded viewpoint"

    for t in range(steps):
        st = sim.getState()
        assert st.step == t
        locs = {v.viewpointId: v for v in st.navigableLocations}
        cur = next(v for v in root if v["image_id"] == st.location.viewpointId)
        x, y, z = cur["pose"][3], cur["pose"][7], cur["pose"][11]
        navigable_count = 0
        for i, v in enumerate(root):
            target = v["image_id"]
            tx, ty, tz = v["pose"][3], v["pose"][7], v["pose"][11]
            if cur["image_id"] == target:
                assert target in locs
                assert included[i]
                navigable_count += 1
            elif not cur["unobstructed"][i]:
                assert target not in locs
            elif not included[i]:
                assert target not in locs
            else:
                vph = math.pi / 2 - math.atan2(ty - y, tx - x)
                if vph < 0:
                    vph += 2 * math.pi
                visible = (
                    abs(st.heading - vph) <= half_hfov
                    or abs(st.heading + 2 * math.pi - vph) <= half_hfov
                    or abs(st.heading - (vph + 2 * math.pi)) <= half_hfov
                )
                if visible:
                    assert target in locs, f"{target} should be reachable"
                    p = locs[target].point
                    np.testing.assert_allclose(p, (tx, ty, tz), rtol=1e-5)
                    navigable_count += 1
                else:
                    assert target not in locs
        assert navigable_count == len(st.navigableLocations)
        ix = t % len(st.navigableLocations)
        sim.makeAction(ix, math.radians(HEADING_CHG[t % 10]),
                       math.radians(ELEVATION_CHG[t % 10]))


@pytest.mark.slow
def test_navigable_all_scans(connectivity_dir):
    """Full 90-scan sweep like the C++ suite (opt-in: -m slow)."""
    with open(os.path.join(connectivity_dir, "scans.txt")) as f:
        scans = f.read().split()
    for scan in scans:
        _check_navigable(connectivity_dir, scan, steps=3)


def test_pano_candidates_match_36_view_sweep(connectivity_dir):
    """compute_pano_candidates (closed form) must agree with actually
    sweeping a discretized simulator through all 36 views, keeping the
    closest-view representation per neighbor — the reference's
    make_candidate procedure (r2r_src/env.py:240-315)."""
    for scan, start in zip(SCANS, STARTS):
        g = load_scan_graph(scan, connectivity_dir)
        sim = Simulator(connectivity_dir)
        sim.setRenderingEnabled(False)
        sim.setDiscretizedViewingAngles(True)
        sim.setCameraResolution(640, 480)
        sim.setCameraVFOV(math.radians(60))
        sim.init()

        for vp in [start, g.ids[int(np.nonzero(g.included)[0][5])]]:
            adj = {}
            for ix in range(36):
                if ix == 0:
                    sim.newEpisode(scan, vp, 0, math.radians(-30))
                elif ix % 12 == 0:
                    sim.makeAction(0, 1.0, 1.0)
                else:
                    sim.makeAction(0, 1.0, 0)
                st = sim.getState()
                assert st.viewIndex == ix
                for loc in st.navigableLocations[1:]:
                    d = math.sqrt(loc.rel_heading ** 2 + loc.rel_elevation ** 2)
                    if loc.viewpointId not in adj or d < adj[loc.viewpointId][1]:
                        adj[loc.viewpointId] = (
                            ix,
                            d,
                            st.heading + loc.rel_heading,
                            st.elevation + loc.rel_elevation,
                            loc.rel_distance,
                        )
            cands = compute_pano_candidates(g, g.id2ix[vp])
            got = {
                g.ids[int(n)]: (
                    int(p), float(a), float(h), float(e), float(rd))
                for n, p, a, h, e, rd in zip(
                    cands.nbr_ix, cands.point_id, cands.ang_distance,
                    cands.normalized_heading, cands.elevation,
                    cands.rel_distance)
            }
            assert set(got) == set(adj)
            for vid, (pix, d, nh, el, rd) in adj.items():
                gp, ga, gh, ge, grd = got[vid]
                assert gp == pix, (vid, gp, pix)
                assert ga == pytest.approx(d, abs=1e-5)
                # headings equal modulo 2*pi (both feed sin/cos)
                assert math.cos(gh - nh) == pytest.approx(1.0, abs=1e-9)
                assert ge == pytest.approx(el, abs=1e-5)
                assert grd == pytest.approx(rd, abs=1e-4)


def test_shortest_paths_match_networkx(connectivity_dir):
    """Distances and first hops vs a reference Dijkstra implementation."""
    import heapq

    g = load_scan_graph("17DRP5sb8fy", connectivity_dir)
    g.compute_shortest_paths()
    adj = g.nav_adjacency()
    w = g.edge_lengths()
    n = g.num_nodes
    src = int(np.nonzero(g.included)[0][0])
    # plain Dijkstra from src
    dist = np.full(n, np.inf)
    dist[src] = 0.0
    heap = [(0.0, src)]
    seen = set()
    while heap:
        d, u = heapq.heappop(heap)
        if u in seen:
            continue
        seen.add(u)
        for v in np.nonzero(adj[u])[0]:
            nd = d + w[u, v]
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(heap, (nd, int(v)))
    np.testing.assert_allclose(g.dist[src], dist, rtol=1e-9, atol=1e-9)
    # first hops yield consistent path lengths
    for dst in np.nonzero(np.isfinite(dist))[0][:50]:
        dst = int(dst)
        if dst == src:
            continue
        path = g.shortest_path(src, dst)
        total = sum(w[a, b] for a, b in zip(path, path[1:]))
        assert total == pytest.approx(dist[dst], rel=1e-9)


def test_batchsim_step_records_micro_trajectory(connectivity_dir):
    bs = BatchSim(2, connectivity_dir)
    bs.new_episodes(SCANS, STARTS, [0.0, math.radians(90)])
    st = bs.states[1]
    assert st.view_index == 12 + 3  # heading 90deg -> heading_step 3, horizon
    cands = bs.candidates(st.scan, st.ix)
    assert len(cands.nbr_ix) > 0
    traj = [(st.graph.ids[st.ix], st.heading, st.elevation)]
    bs.step_candidate(1, 0, traj)
    st = bs.states[1]
    assert st.view_index == int(cands.point_id[0])
    assert st.ix == int(cands.nbr_ix[0])
    assert traj[-1][0] == st.graph.ids[st.ix]
    # micro-steps before the move stay at the source viewpoint
    for vp, _, _ in traj[:-1]:
        assert vp == traj[0][0]
