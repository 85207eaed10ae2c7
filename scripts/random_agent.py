#!/usr/bin/env python
"""Random-agent demo driver over the graph simulator (reference analog:
src/driver/random_agent.cpp — a seeded random policy smoke loop).

    python scripts/random_agent.py --scan 17DRP5sb8fy --steps 10
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dasa_tpu.sim import Simulator  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--connectivity",
                   default="/root/reference/connectivity")
    p.add_argument("--scan", default="17DRP5sb8fy")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    sim = Simulator(args.connectivity)
    sim.setRenderingEnabled(False)
    sim.setDiscretizedViewingAngles(True)
    sim.setSeed(args.seed)
    sim.init()
    sim.newEpisode(args.scan)
    rng = random.Random(args.seed)
    for t in range(args.steps):
        st = sim.getState()
        print(f"step {st.step}: at {st.location.viewpointId} "
              f"view {st.viewIndex} heading {st.heading:.2f} "
              f"({len(st.navigableLocations) - 1} neighbors)")
        ix = rng.randrange(len(st.navigableLocations))
        sim.makeAction(ix, rng.choice([-1, 0, 1]), rng.choice([-1, 0, 1]))
    print("done")


if __name__ == "__main__":
    main()
