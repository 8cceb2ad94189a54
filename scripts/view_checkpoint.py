"""Render a saved checkpoint (map/checkpoint.py npz) to an interactive
standalone HTML viewer. Offline analog of the reference's Rerun stream
(viz/rerun.rs) for a zero-egress environment.

Usage: python scripts/view_checkpoint.py checkpoint.npz [out.html] [traj.tum]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    ckpt = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else ckpt.rsplit(".", 1)[0] + ".html"

    from orbslam3_tpu.map.checkpoint import load_map
    from orbslam3_tpu.viz.html_view import save_html_view

    st = load_map(ckpt)
    traj = None
    if len(sys.argv) > 3:
        rows = np.loadtxt(sys.argv[3])
        traj = rows[:, 1:4]
    save_html_view(out, map_state=st, traj=traj)
    print(out)


if __name__ == "__main__":
    sys.exit(main() or 0)
