"""RAFT flow demo (ref models_video/RAFT/demo.py): estimate bidirectional
flow on a clip and write Middlebury color-wheel visualizations.

    python scripts/flow_demo.py INPUT.mp4 OUT_DIR [--weights raft-things.pth]
                                [--small] [--iters 20] [--frames 8]

Without ``--weights`` RAFT runs random-init (structure/shape demo only).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("out_dir")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from upscale_a_video_tpu.models.raft import (
        compute_bidirectional_flows,
        load_raft,
    )
    from upscale_a_video_tpu.utils.flow_viz import flow_to_image
    from upscale_a_video_tpu.utils.video_io import (
        read_video,
        to_model_range,
        write_frames,
    )

    frames_u8, _, _ = read_video(args.input)
    frames = to_model_range(frames_u8[: args.frames])  # (T, H, W, 3) [-1, 1]
    runner = load_raft(args.weights, iters=args.iters)
    flows_f, flows_b = compute_bidirectional_flows(
        runner, jnp.asarray(frames)[None])

    for name, flows in (("fwd", flows_f), ("bwd", flows_b)):
        arr = np.asarray(flows[0])  # (T-1, H, W, 2)
        maps = np.stack([flow_to_image(fl) for fl in arr])
        write_frames(os.path.join(args.out_dir, name), maps)
    print(f"wrote {2 * (frames.shape[0] - 1)} flow maps to {args.out_dir}")


if __name__ == "__main__":
    main()
